"""operators/skew.py — salted join must be indistinguishable from the
plain equi-join on crafted skewed inputs, for inner and left joins,
across the hot/cold routing boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_rust_spark.operators.skew import hot_keys, salted_join


def _fact(spark):
    # key 7 owns 40 rows (hot), key 3 owns 10 (exactly at a threshold
    # of 10 -> NOT hot: strictly greater), keys 100..104 one row each,
    # key 999 has no dim match (inner drops / left keeps with nulls)
    rows = ([(7, i) for i in range(40)]
            + [(3, i) for i in range(10)]
            + [(100 + i, i) for i in range(5)]
            + [(999, 0)])
    return spark.createDataFrame(rows, "k long, payload long")


def _dim(spark):
    # keys 0..199 (999 absent); dim key 55 matches no fact row
    return spark.createDataFrame(
        [(i, f"d{i}") for i in range(200)], "dk long, dval string")


def _sorted(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_hot_keys_strict_threshold(spark):
    got = sorted(r["k"] for r in hot_keys(_fact(spark), "k", 10).collect())
    assert got == [7]  # 40 > 10 hot; 10 rows of key 3 is NOT > 10


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    fact, dim = _fact(spark), _dim(spark)
    cols = ["k", "payload", "dk", "dval"]
    got = salted_join(fact, dim, "k", "dk", how=how,
                      salts=4, hot_threshold=10)
    want = fact.join(dim, fact["k"] == dim["dk"], how)
    assert _sorted(got, cols) == _sorted(want, cols)


def test_both_paths_carry_rows(spark):
    # with threshold 10 the hot path carries key 7's 40 rows and the
    # cold path everything else — pin the split so a refactor can't
    # silently send everything down one branch
    fact, dim = _fact(spark), _dim(spark)
    hot = hot_keys(fact, "k", 10)
    out = salted_join(fact, dim, "k", "dk", salts=4, hot=hot)
    n_hot = out.where(F.col("k") == 7).count()
    n_cold = out.where(F.col("k") != 7).count()
    assert (n_hot, n_cold) == (40, 15)  # 999 dropped by inner


def test_precomputed_hot_list_reused(spark):
    fact, dim = _fact(spark), _dim(spark)
    # force key 3 hot via an external list: routing must follow the
    # override, results must stay identical to the plain join
    hot = spark.createDataFrame([(3,), (7,)], "k long")
    got = salted_join(fact, dim, "k", "dk", salts=3, hot=hot)
    want = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert _sorted(got, ["k", "payload", "dk", "dval"]) == \
        _sorted(want, ["k", "payload", "dk", "dval"])


def test_salts_one_degenerates_cleanly(spark):
    fact, dim = _fact(spark), _dim(spark)
    got = salted_join(fact, dim, "k", "dk", salts=1, hot_threshold=0)
    want = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert got.count() == want.count()


def test_contract_errors(spark):
    fact, dim = _fact(spark), _dim(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", "dk", how="right")
    with pytest.raises(ValueError, match="salts"):
        salted_join(fact, dim, "k", "dk", salts=0)
    with pytest.raises(ValueError, match="disjoint"):
        salted_join(fact, fact.withColumnRenamed("k", "k2"), "k", "k2")
