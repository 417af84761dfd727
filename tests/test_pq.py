"""IVF-PQ ANN gates: recall vs brute-force truth, code invariants,
determinism, and output contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_rust_spark.operators.pq import (
    PQ_KSUB, PQ_M, ann_ivfpq_topk, pq_codes_udf, train_pq_codebooks)


@pytest.fixture(scope="module")
def emb(spark, sf_correct_dir):
    return spark.read.parquet(f"{sf_correct_dir}/embeddings.parquet")


def _truth(sub, k=3):
    from datasketches_rust_spark.operators.similarity import \
        cosine_topk_bruteforce
    t = {}
    for r in cosine_topk_bruteforce(sub, sub, k=k + 1).collect():
        if r["query_id"] != r["neighbor_id"]:
            t.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return {q: set(v[:k]) for q, v in t.items()}


def test_ivfpq_recall(spark, emb):
    """IVF-PQ (nlist=8, nprobe=6, m=16, ksub=16, shortlist=64) must
    recover >= 0.85 of true top-3 on the fixture (measured 0.923 — the
    ivf_8x6 cell ceiling; the ADC shortlist loses almost nothing at
    this operating point). i.i.d. Gaussian embeddings are PQ's worst
    case, so real embedding tables only do better."""
    sub = emb.where(F.col("vec_id") < 200).localCheckpoint()
    truth = _truth(sub)
    got = {}
    for r in ann_ivfpq_topk(sub, k=3, dim=64).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.85, f"IVF-PQ recall {hits/total:.3f}"


def test_pq_codes_shape_and_range(spark, emb):
    """Every vector encodes to exactly m codes in [0, ksub); encoding is
    deterministic given the codebooks."""
    sub = emb.where(F.col("vec_id") < 50)
    books = train_pq_codebooks(sub, dim=64)
    assert books.shape == (PQ_M, PQ_KSUB, 64 // PQ_M)
    enc = pq_codes_udf(books)
    rows = sub.select("vec_id", enc("embedding").alias("c")).collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["c"]) == PQ_M
        assert all(0 <= c < PQ_KSUB for c in r["c"])
    again = {r["vec_id"]: r["c"] for r in
             sub.select("vec_id", enc("embedding").alias("c")).collect()}
    assert all(again[r["vec_id"]] == r["c"] for r in rows)


def test_pq_codes_match_numpy(spark, emb):
    """The Arrow-batched encoder must agree with a plain numpy argmin
    over the same codebooks (normalization included)."""
    sub = emb.where(F.col("vec_id") < 40)
    books = train_pq_codebooks(sub, dim=64)
    rows = sub.select("vec_id", "embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dsub = 64 // PQ_M
    want = {}
    for r, v in zip(rows, x):
        want[r["vec_id"]] = [
            int(((v[i * dsub:(i + 1) * dsub] - books[i]) ** 2)
                .sum(-1).argmin()) for i in range(PQ_M)]
    enc = pq_codes_udf(books)
    got = {r["vec_id"]: list(r["c"]) for r in
           sub.select("vec_id", enc("embedding").alias("c")).collect()}
    assert got == want


def test_ivfpq_output_contract(spark, emb):
    """Ranks are 1..k per query, no self-matches, deterministic across
    two runs (fixed seeds + id tie-breaks)."""
    sub = emb.where(F.col("vec_id") < 120).localCheckpoint()
    a = ann_ivfpq_topk(sub, k=3, dim=64).collect()
    by_q = {}
    for r in a:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    b = ann_ivfpq_topk(sub, k=3, dim=64).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {key(r): r["neighbor_id"] for r in a} == \
           {key(r): r["neighbor_id"] for r in b}
