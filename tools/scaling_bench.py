"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule demands throughput scaling efficiency >= 0.8 going N -> 4N
executors; in-sandbox the proxy is the same job at local[8] vs local[32]
on identical input (task instructions). This script runs the full image
dedup pipeline (synthesis excluded from the timed section — it's input
generation) at both parallelism levels in SEPARATE JVMs (fresh
SparkSession each, sequential so runs don't contend) and reports:

  efficiency = (throughput_32 / throughput_8) / 4

Usage: python tools/scaling_bench.py [n_images] [> result.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); n = int(sys.argv[2])
from datasketches_rust_spark.config import DedupConfig, spark_session
from datasketches_rust_spark.pipeline_images import image_cluster_assignments
from datasketches_rust_spark.sources.images import images_spark_df

spark = spark_session("scaling", cpus=cpus, shuffle_partitions=max(32, cpus))
spark.range(1000).selectExpr("sum(id)").collect()  # warm-up
cfg = DedupConfig()
imgs, _ = images_spark_df(spark, n, seed=42, partitions=max(32, cpus))
imgs = imgs.localCheckpoint()  # materialize input before timing
t0 = time.time()
n_out = image_cluster_assignments(imgs, cfg).count()
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "n": n, "sec": round(dt, 2),
                  "images_per_sec": round(n / dt, 1), "rows_out": n_out}))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), str(n)],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)})
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    r8 = run(8, n)
    r32 = run(32, n)
    eff = (r32["images_per_sec"] / r8["images_per_sec"]) / 4.0
    print(json.dumps({
        "job": "image_dedup_clusters",
        "n_images": n,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }, indent=1))


if __name__ == "__main__":
    main()
