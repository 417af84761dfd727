"""Synthetic text-corpus fixture (sources/documents.py): determinism,
parallel-consistency, and end-to-end dedup recall/precision vs its own
ground truth — the text-axis analog of tests/test_images.py."""

from __future__ import annotations

from collections import defaultdict

from datasketches_rust_spark.config import DedupConfig
from datasketches_rust_spark.oracle import assignment_pair_recall
from datasketches_rust_spark.pipeline import cluster_assignments
from datasketches_rust_spark.sources.documents import (documents_spark_df,
                                                       make_vocab,
                                                       materialize_docs,
                                                       plan_clusters)


def _pairs(assign: dict) -> set:
    by_c = defaultdict(list)
    for k, v in assign.items():
        by_c[v].append(k)
    return {(min(a, b), max(a, b)) for m in by_c.values()
            for i, a in enumerate(m) for b in m[i + 1:]}


def test_materialize_is_slice_independent():
    """Any worker can materialize any slice: rows from a scattered index
    set must equal the same rows from a full materialization."""
    n, seed = 500, 42
    plan = plan_clusters(n, seed)
    vocab = make_vocab(seed, size=2000)
    full = materialize_docs(range(n), plan, seed, vocab)
    idx = [3, 17, 255, 499, 42]
    part = materialize_docs(idx, plan, seed, vocab).reset_index(drop=True)
    want = full.iloc[idx].reset_index(drop=True)
    assert part.equals(want)


def test_dup_structure_and_pipeline_recall(spark):
    """The dedup pipeline must recover the injected clusters exactly:
    pair recall 1.0 AND no extra pairs (every near-dup variant sits
    above the 0.8 jaccard verify threshold by construction; hard
    negatives below it)."""
    docs, truth = documents_spark_df(spark, 2000, seed=42)
    docs = docs.localCheckpoint()
    t = {r.doc_id: r.cluster_id for r in truth.collect()}
    got = {r.doc_id: r.cluster_id for r in
           cluster_assignments(docs, DedupConfig(), "doc_id", "text")
           .collect()}
    assert len(got) == 2000
    assert assignment_pair_recall(got, t) == 1.0
    gp, tp = _pairs(got), _pairs(t)
    assert gp == tp and len(tp) > 300
