"""End-to-end dedup pipeline vs the single-node numpy oracle — the
dup-pair recall >= 0.99 gate (BASELINE.json) on the driver's documents
tables. Both sides run the identical shingle/signature config, so we
require exact pair-set equality, which is stronger than recall 0.99."""

import duckdb
import pytest

from datasketches_rust_spark.config import DedupConfig
from datasketches_rust_spark.oracle import (cluster_pairs, dup_pair_recall,
                                            oracle_clusters, oracle_pairs)
from datasketches_rust_spark.pipeline import (cluster_assignments,
                                              dedup_keep_canonical,
                                              dedup_pairs)

CFG = DedupConfig()


@pytest.fixture(scope="module")
def docs_pdf(sf_correct_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from '{sf_correct_dir}/documents.parquet' "
        "order by doc_id").fetchall()
    return [r[0] for r in rows], [r[1] for r in rows]


@pytest.fixture(scope="module")
def docs_df(spark, sf_correct_dir):
    return spark.read.parquet(f"{sf_correct_dir}/documents.parquet")


def test_pairs_match_oracle_exactly(spark, docs_df, docs_pdf):
    ids, texts = docs_pdf
    want = oracle_pairs(ids, texts, CFG)
    got = {(r["id_a"], r["id_b"]) for r in
           dedup_pairs(docs_df, CFG, "doc_id", "text").collect()}
    assert got == want
    assert len(got) == 25  # injected near-dups in the driver table


def test_clusters_match_oracle(spark, docs_df, docs_pdf):
    ids, texts = docs_pdf
    want = oracle_clusters(ids, texts, CFG)
    got = {r["doc_id"]: r["cluster_id"] for r in
           cluster_assignments(docs_df, CFG, "doc_id", "text").collect()}
    assert got == want
    assert dup_pair_recall(got, want) == 1.0
    # every input row got an assignment
    assert len(got) == len(ids)


def test_dedup_keep_canonical(spark, docs_df, docs_pdf):
    ids, texts = docs_pdf
    want = oracle_clusters(ids, texts, CFG)
    n_clusters = len(set(want.values()))
    kept = dedup_keep_canonical(docs_df, CFG, "doc_id", "text")
    rows = kept.collect()
    assert len(rows) == n_clusters
    # canonical = min id per cluster
    want_keep = {min(v for v, c in want.items() if c == cl)
                 for cl in set(want.values())}
    assert {r["doc_id"] for r in rows} == want_keep


def test_jaccard_column_sane(spark, docs_df):
    rows = dedup_pairs(docs_df, CFG, "doc_id", "text").collect()
    for r in rows:
        assert CFG.jaccard_threshold <= r["jaccard"] <= 1.0
