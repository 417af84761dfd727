"""Weighted sampling without replacement (operators/sampling.py) —
A-ES semantics pinned against an independent Python recomputation."""

import hashlib
import math

import pytest

from datasketches_rust_spark.operators.sampling import (
    weighted_sample_without_replacement)


def _u(doc_id: int) -> float:
    u32 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return (u32 + 0.5) / 4294967296.0


def _expected(rows, k):
    """Independent A-ES: per stratum, top-k by ln(u)/w desc, id asc."""
    by_s = {}
    for s, i, w in rows:
        if w is not None and w > 0:
            by_s.setdefault(s, []).append((math.log(_u(i)) / w, i, w))
    out = {}
    for s, items in by_s.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rk, (_, i, w) in enumerate(items[:k], start=1):
            out[(s, i)] = rk
    return out


ROWS = ([("a", i, 100 + i) for i in range(12)]
        + [("b", 100 + i, 5) for i in range(8)]
        + [("a", 50, 0), ("b", 51, -3), ("a", 52, None)])  # excluded


def test_matches_independent_recomputation(spark):
    df = spark.createDataFrame(ROWS, "s string, id long, w long")
    got = {(r.s, r.id): r.rk
           for r in weighted_sample_without_replacement(
               df, 5, id_col="id", weight_col="w", strata_col="s"
           ).collect()}
    assert got == _expected(ROWS, 5)


def test_k_larger_than_stratum_keeps_all_positive_weight_rows(spark):
    df = spark.createDataFrame(ROWS, "s string, id long, w long")
    res = weighted_sample_without_replacement(
        df, 1000, id_col="id", weight_col="w", strata_col="s").collect()
    # every positive-weight row kept; zero/negative/NULL weights excluded
    assert len(res) == 20
    assert {r.id for r in res} == ({i for i in range(12)}
                                   | {100 + i for i in range(8)})


def test_global_sample_without_strata(spark):
    df = spark.createDataFrame(ROWS, "s string, id long, w long")
    res = weighted_sample_without_replacement(
        df, 3, id_col="id", weight_col="w").collect()
    assert len(res) == 3
    assert [r.rk for r in sorted(res, key=lambda r: r.rk)] == [1, 2, 3]


def test_weight_bias_is_directional(spark):
    # one row with overwhelming weight: ln(u)/w -> 0^- beats every
    # small-weight key with probability ~1 (u is fixed by content hash,
    # so this is deterministic for the chosen ids)
    rows = [("x", i, 1) for i in range(1, 40)] + [("x", 999, 10**9)]
    df = spark.createDataFrame(rows, "s string, id long, w long")
    top = weighted_sample_without_replacement(
        df, 1, id_col="id", weight_col="w", strata_col="s").collect()
    assert len(top) == 1 and top[0].id == 999


@pytest.mark.parametrize("doc_id", [0, 1, 17, 999999])
def test_content_uniform_cross_engine_convention(spark, doc_id):
    """The Spark-side uniform must equal the hashlib recomputation the
    DuckDB oracle mirrors (('0x'||substr(md5,1,8))::bigint + 0.5)/2^32."""
    from datasketches_rust_spark.operators.sampling import content_uniform
    df = spark.createDataFrame([(doc_id,)], "id long")
    got = df.select(content_uniform("id").alias("u")).collect()[0].u
    assert got == _u(doc_id)
