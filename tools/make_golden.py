"""Generate committed golden files for the deterministic rows-only
queries (VERDICT r1 item 10): winnow_fingerprints and lcs_confirm_pairs
are fully deterministic given the fixed seed, so their expected outputs
at sf0.01 are computed here FROM THE NUMPY KERNELS (no Spark) and
committed under tests/golden/. tests/test_golden_queries.py then holds
the Spark queries to byte-equality against them — the same
"oracle shares the kernels, the test gates the distributed plumbing"
philosophy as oracle.py.

Usage: python tools/make_golden.py   (rewrites tests/golden/*.json)
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from datasketches_rust_spark.config import DedupConfig  # noqa: E402
from datasketches_rust_spark.functions.text import \
    shingle_hashes_batch  # noqa: E402
from datasketches_rust_spark.operators.suffix import \
    longest_common_substring  # noqa: E402
from datasketches_rust_spark.oracle import oracle_pairs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECT", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
CFG = DedupConfig()
WINNOW_WINDOW = 8  # functions/text.py winnow_fingerprints_udf default


def _docs():
    rows = duckdb.sql(
        f"select doc_id, text from '{SF_DIR}/documents.parquet' "
        "order by doc_id").fetchall()
    return [r[0] for r in rows], [r[1] for r in rows]


def winnow_golden(ids, texts):
    """Mirror of winnow_fingerprints_udf + q_winnow_fingerprints's
    (n_fps, min_fp, max_fp) projection, computed kernel-side."""
    lowered = pd.Series([(t or "").lower() for t in texts])
    flat, offsets = shingle_hashes_batch(lowered, CFG.shingle_k, CFG.seed)
    out = []
    for i, doc_id in enumerate(ids):
        h = flat[offsets[i]:offsets[i + 1]]
        if h.size == 0:
            fps = np.empty(0, dtype=np.int64)
        elif h.size <= WINNOW_WINDOW:
            fps = np.unique(h.min(keepdims=True)).view(np.int64)
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_WINDOW)
            fps = np.unique(win.min(axis=1)).view(np.int64)
        out.append({
            "doc_id": int(doc_id),
            "n_fps": int(fps.size),
            "min_fp": int(fps.min()) if fps.size else None,
            "max_fp": int(fps.max()) if fps.size else None,
        })
    return out


def lcs_golden(ids, texts):
    """Mirror of q_lcs_confirm_pairs: verified jaccard pairs (oracle.py,
    identical kernels) -> LCS bytes over lowered texts, keep
    lcs / max(min(char_len), 1) >= 0.3 (confirm_pairs_substring uses
    F.length = characters for the ratio, bytes for the LCS)."""
    text_of = {i: (t or "").lower() for i, t in zip(ids, texts)}
    rows = []
    for a, b in sorted(oracle_pairs(ids, texts, CFG)):
        ta, tb = text_of[a], text_of[b]
        lcs = longest_common_substring(ta.encode(), tb.encode())
        ratio = lcs / max(min(len(ta), len(tb)), 1)
        if ratio >= 0.3:
            rows.append({"id_a": int(a), "id_b": int(b), "lcs_len": int(lcs)})
    return rows


def simhash_golden(ids, texts):
    """Mirror of q_simhash_near_docs: simhash over lowered texts (same
    shingle kernel), exact all-pairs Hamming <= cfg.simhash_hamming —
    the pigeonhole banding in the Spark plan has recall exactly 1.0, so
    the distributed output must equal this O(n^2) kernel computation."""
    from datasketches_rust_spark.sketches.simhash import hamming, simhash
    lowered = pd.Series([(t or "").lower() for t in texts])
    flat, offsets = shingle_hashes_batch(lowered, CFG.shingle_k, CFG.seed)
    fp = simhash(flat, offsets)
    n = len(ids)
    rows = []
    for i in range(n):
        d = hamming(np.repeat(fp[i], n - i - 1), fp[i + 1:])
        for j in np.nonzero(d <= CFG.simhash_hamming)[0]:
            a, b = ids[i], ids[i + 1 + j]
            rows.append({"id_a": int(min(a, b)), "id_b": int(max(a, b)),
                         "hamming": int(d[j])})
    return rows


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    ids, texts = _docs()
    for name, rows in [("winnow_fingerprints_sf0.01", winnow_golden(ids, texts)),
                       ("lcs_confirm_pairs_sf0.01", lcs_golden(ids, texts)),
                       ("simhash_near_docs_sf0.01",
                        simhash_golden(ids, texts))]:
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(rows, f, indent=0, sort_keys=True)
        print(f"wrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
