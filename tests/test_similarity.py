"""Similarity-search tests: brute-force correctness vs numpy, LSH-ANN
recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_correct_dir):
    return spark.read.parquet(f"{sf_correct_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(sf_correct_dir):
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding from "
        f"'{sf_correct_dir}/embeddings.parquet' order by vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    E = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, E / np.linalg.norm(E, axis=1, keepdims=True)


def test_bruteforce_topk_matches_numpy(spark, emb, emb_np):
    from datasketches_rust_spark.operators.similarity import \
        cosine_topk_bruteforce
    ids, En = emb_np
    q = emb.where(F.col("vec_id") < 5)
    c = emb.where(F.col("vec_id") >= 5)
    got = {}
    for r in cosine_topk_bruteforce(q, c, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    S = En[:5] @ En[5:].T
    for qi in range(5):
        order = np.argsort(-S[qi], kind="stable")[:3]
        want = [int(ids[5 + j]) for j in order]
        assert [n for _, n in sorted(got[qi])] == want


def test_ann_lsh_recall(spark, emb):
    """LSH-ANN top-3 must recover >= 70% of true top-3 neighbors on this
    small table (24-bit hashes, 8 bands -> measured 0.84 offline). The
    point is plumbing + a measurable recall floor; production tunes
    nbits/bands (32/16 reaches ~1.0 here)."""
    from datasketches_rust_spark.operators.similarity import (
        ann_lsh_topk, cosine_topk_bruteforce)
    sub = emb.where(F.col("vec_id") < 200).localCheckpoint()
    truth = {}
    for r in cosine_topk_bruteforce(sub, sub, k=4).collect():
        if r["query_id"] != r["neighbor_id"]:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    truth = {k: set(list(v)[:3]) for k, v in truth.items()}
    got = {}
    for r in ann_lsh_topk(sub, k=3, nbits=24, num_bands=8).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.7, f"ANN recall {hits/total:.2f}"


def test_ann_ivf_recall(spark, emb):
    """IVF-ANN top-3 (KMeans coarse quantizer, nlist=8, nprobe=3) must
    recover >= 70% of true top-3 neighbors on this small table. Probing
    3/8 cells bounds the candidate set to ~3n/8 per query while keeping
    near-neighbors (which cluster into the same or adjacent cells) —
    production scales nlist ~ sqrt(n) and tunes nprobe for the
    recall/cost point."""
    from datasketches_rust_spark.operators.similarity import (
        ann_ivf_topk, cosine_topk_bruteforce)
    sub = emb.where(F.col("vec_id") < 200).localCheckpoint()
    truth = {}
    for r in cosine_topk_bruteforce(sub, sub, k=4).collect():
        if r["query_id"] != r["neighbor_id"]:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    truth = {k: set(list(v)[:3]) for k, v in truth.items()}
    got = {}
    for r in ann_ivf_topk(sub, k=3, nlist=8, nprobe=3).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.7, f"IVF recall {hits/total:.2f}"


def test_ann_recall_report_gates(spark, emb):
    """The in-engine recall report (the driver-visible query) must show
    >= 0.9 recall at the high-recall operating points (lsh 32x16 measured
    1.0, ivf 8x6 measured 0.923 on this fixture — i.i.d. Gaussian
    embeddings are IVF's worst case: no cluster structure for the coarse
    quantizer, so probing 6/8 cells is what honest 0.9 recall costs
    here) and >= 0.7 at the cheap defaults. Deterministic: fixed seeds,
    fixed input, ties broken by id everywhere."""
    from datasketches_rust_spark.operators.similarity import \
        ann_recall_report
    sub = emb.where(F.col("vec_id") < 200).localCheckpoint()
    rep = {r["method"]: r["recall"]
           for r in ann_recall_report(sub, k=3, dim=64).collect()}
    assert rep["lsh_32x16"] >= 0.9, rep
    assert rep["ivf_8x6"] >= 0.9, rep
    assert rep["lsh_24x8"] >= 0.7, rep
    assert rep["ivf_8x3"] >= 0.7, rep


def test_ann_ivf_no_self_and_ranked(spark, emb):
    """Ranks are 1..k, dense per query, and a vector never returns
    itself."""
    from datasketches_rust_spark.operators.similarity import ann_ivf_topk
    sub = emb.where(F.col("vec_id") < 60).localCheckpoint()
    rows = ann_ivf_topk(sub, k=2, nlist=4, nprobe=2).collect()
    assert rows, "empty IVF result"
    by_q = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_embedding_dup_pairs_symmetric(spark, emb, emb_np):
    from datasketches_rust_spark.operators.similarity import \
        cosine_pairs_bruteforce
    ids, En = emb_np
    S = En @ En.T
    want = {(int(ids[i]), int(ids[j]))
            for i in range(len(ids)) for j in range(i + 1, len(ids))
            if S[i, j] >= 0.45}
    got = {(r["id_a"], r["id_b"]) for r in
           cosine_pairs_bruteforce(emb, 0.45).collect()}
    assert got == want


def test_embedding_keep_central_matches_exact(spark, emb, emb_np):
    """keep_central must pick, per dup cluster, the member with max
    summed edge cosine (min-id tiebreak) — recomputed exactly with
    numpy + union-find from the same threshold."""
    from datasketches_rust_spark.operators.similarity import (
        embedding_dedup_keep_central)

    got = {r["cluster_id"]: (r["rep_id"], r["cluster_size"]) for r in
           embedding_dedup_keep_central(emb, threshold=0.45, dim=64)
           .collect()}

    ids, mat = emb_np
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    n = len(ids)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
             if sims[i, j] >= 0.45]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in pairs:
        parent[find(i)] = find(j)
    cent = np.zeros(n)
    for i, j in pairs:
        cent[i] += sims[i, j]
        cent[j] += sims[i, j]
    members = {}
    for i in range(n):
        members.setdefault(find(i), []).append(i)
    want = {}
    for grp in members.values():
        if len(grp) < 2:
            continue
        cl = min(ids[i] for i in grp)
        best = max(cent[i] for i in grp)
        rep = min(ids[i] for i in grp if cent[i] == best)
        want[cl] = (rep, len(grp))
    assert got == want and len(want) > 0
