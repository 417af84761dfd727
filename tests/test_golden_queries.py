"""Golden-file gates for the deterministic rows-only queries (VERDICT r1
item 10): the Spark outputs of winnow_fingerprints and lcs_confirm_pairs
must equal the kernel-computed goldens committed under tests/golden/
(regenerate with tools/make_golden.py), and hll_users_by_type gets a
tolerance gate against exact group counts. With these, every queries()
entry has either a DuckDB oracle, a committed golden, or a tolerance
pytest.
"""

from __future__ import annotations

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


def test_winnow_fingerprints_matches_golden(spark, sf_correct_dir):
    from datasketches_rust_spark import queries as Q
    got = {r["doc_id"]: (r["n_fps"], r["min_fp"], r["max_fp"])
           for r in Q.q_winnow_fingerprints(spark, sf_correct_dir).collect()}
    want = {r["doc_id"]: (r["n_fps"], r["min_fp"], r["max_fp"])
            for r in _load("winnow_fingerprints_sf0.01.json")}
    assert got == want and len(want) == 500


def test_lcs_confirm_pairs_matches_golden(spark, sf_correct_dir):
    from datasketches_rust_spark import queries as Q
    got = {(r["id_a"], r["id_b"]): r["lcs_len"]
           for r in Q.q_lcs_confirm_pairs(spark, sf_correct_dir).collect()}
    want = {(r["id_a"], r["id_b"]): r["lcs_len"]
            for r in _load("lcs_confirm_pairs_sf0.01.json")}
    assert got == want and len(want) > 0


def test_hll_users_by_type_tolerance(spark, sf_correct_dir):
    """Grouped HLL estimates within the lg_k=12 error band (3 * 1.04 /
    sqrt(4096) ~= 4.9%) of exact distinct counts."""
    import duckdb
    from datasketches_rust_spark import queries as Q
    got = {r["event_type"]: r["approx_users"]
           for r in Q.q_hll_users_by_type(spark, sf_correct_dir).collect()}
    truth = dict(duckdb.sql(
        f"select event_type, count(distinct user_id) from "
        f"'{sf_correct_dir}/events.parquet' group by 1").fetchall())
    assert set(got) == set(truth)
    for k, v in truth.items():
        assert got[k] == pytest.approx(v, rel=0.05), (k, got[k], v)


def test_hll_distinct_orders_tolerance(spark, sf_correct_dir):
    """hll_distinct_orders (merged partials -> composite estimator) within
    the reference's <2% band at lg_k 14 (tests/hll_serialization_test.rs
    uses the same bound against cross-impl goldens)."""
    import duckdb
    from datasketches_rust_spark import queries as Q
    got = Q.q_hll_distinct_orders(spark, sf_correct_dir) \
        .collect()[0]["approx_orders"]
    truth = duckdb.sql(
        f"select count(distinct l_orderkey) from "
        f"'{sf_correct_dir}/lineitem.parquet'").fetchone()[0]
    assert got == pytest.approx(truth, rel=0.02), (got, truth)


def test_cpc_distinct_orders_tolerance(spark, sf_correct_dir):
    """cpc_distinct_orders (merged partials -> ICON) within the lg_k=12
    kappa=3 band of the exact count."""
    import duckdb
    from datasketches_rust_spark import queries as Q
    got = Q.q_cpc_distinct_orders(spark, sf_correct_dir) \
        .collect()[0]["approx_orders"]
    truth = duckdb.sql(
        f"select count(distinct o_orderkey) from "
        f"'{sf_correct_dir}/orders.parquet'").fetchone()[0]
    assert got == pytest.approx(truth, rel=0.04), (got, truth)


def test_simhash_near_docs_matches_golden(spark, sf_correct_dir):
    """Pigeonhole banding has recall exactly 1.0, so the distributed
    simhash query must EQUAL the kernel-computed all-pairs golden."""
    from datasketches_rust_spark import queries as Q
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in Q.q_simhash_near_docs(spark, sf_correct_dir).collect()}
    want = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in _load("simhash_near_docs_sf0.01.json")}
    assert got == want and len(want) > 0
