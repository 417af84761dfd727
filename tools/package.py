"""Package the engine for spark-submit --py-files.

Builds dist/datasketches_rust_spark.zip (pure-python package, importable
from the zip on every executor) and prints the spark-submit line.

Usage: python tools/package.py
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "datasketches_rust_spark"


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    p = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"built {p}")
    print("run with:")
    print(f"  spark-submit --master <cluster> --py-files {p} \\")
    print("    tools/run_dedup_job.py --input <iceberg-or-parquet> "
          "--output <dir> --checkpoint <dir>")
