"""operators/bucketed_rank.py pinned EQUIVALENT to the naive
unpartitioned-window forms it replaces (the whole point: identical
semantics, distributed plan) — on fixtures with heavy ties, constant
keys (the degenerate one-bucket case), descending order, per-group
partitions, and ntile sizes around the divisibility edges."""

import random

import pytest
from pyspark.sql import Window, functions as F

from datasketches_rust_spark.operators.bucketed_rank import (
    ntile_expr, strict_prefix_max, with_global_ranks)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, id long, v long, g string")


@pytest.fixture(scope="module")
def fixture(spark):
    rng = random.Random(9001)
    rows = [(rng.randrange(0, 40), i, rng.randrange(0, 1000),
             rng.choice("AB")) for i in range(500)]
    # heavy tie block + extremes
    rows += [(7, 1000 + i, 5, "A") for i in range(50)]
    return _df(spark, rows).localCheckpoint()


def test_rn_and_cum_match_naive_global(spark, fixture):
    w = Window.orderBy("k", "id")
    naive = fixture.select(
        "id", F.row_number().over(w).cast("long").alias("rn"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)).alias("cv"))
    got = with_global_ranks(fixture, "k", ["id"], rn_col="rn",
                            cum_cols={"cv": "v"}).select("id", "rn", "cv")
    assert naive.exceptAll(got).count() == 0
    assert got.exceptAll(naive).count() == 0


def test_rn_descending_match(spark, fixture):
    w = Window.orderBy(F.col("k").desc(), "id")
    naive = fixture.select(
        "id", F.row_number().over(w).cast("long").alias("rn"))
    got = with_global_ranks(fixture, "k", ["id"], ascending=False,
                            rn_col="rn").select("id", "rn")
    assert naive.exceptAll(got).count() == 0


def test_partitioned_groups_match(spark, fixture):
    w = Window.partitionBy("g").orderBy("k", "id")
    naive = fixture.select(
        "id", F.row_number().over(w).cast("long").alias("rn"))
    got = with_global_ranks(fixture, "k", ["id"], partition_cols=("g",),
                            rn_col="rn").select("id", "rn")
    assert naive.exceptAll(got).count() == 0


def test_constant_key_degenerates_correctly(spark):
    rows = [(5, i, i, "A") for i in range(20)]
    d = _df(spark, rows)
    got = {r["id"]: r["rn"] for r in
           with_global_ranks(d, "k", ["id"], rn_col="rn").collect()}
    assert got == {i: i + 1 for i in range(20)}


@pytest.mark.parametrize("n,k", [(10, 4), (9, 5), (5, 5), (3, 5),
                                 (100, 10), (101, 10)])
def test_ntile_matches_engine(spark, n, k):
    d = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    w = Window.orderBy("id")
    naive = d.select("id", F.ntile(k).over(w).cast("long").alias("t"))
    got = (d.withColumn("rn", F.col("id"))
           .withColumn("n", F.lit(n).cast("long"))
           .select("id", ntile_expr("rn", "n", k).alias("t")))
    assert naive.exceptAll(got).count() == 0
    assert got.exceptAll(naive).count() == 0


def test_strict_prefix_max_matches_naive(spark, fixture):
    fr = (Window.orderBy(F.col("k").desc())
          .rangeBetween(Window.unboundedPreceding, -1))
    naive = fixture.select("id", F.max("v").over(fr).alias("m"))
    got = strict_prefix_max(fixture, "k", "v", "m").select("id", "m")
    assert naive.exceptAll(got).count() == 0
    assert got.exceptAll(naive).count() == 0


def test_strict_prefix_max_null_on_max_key(spark):
    # equal top keys: neither sees the other (strict), both NULL
    d = _df(spark, [(9, 1, 100, "A"), (9, 2, 200, "A"), (3, 3, 1, "A")])
    got = {r["id"]: r["m"] for r in
           strict_prefix_max(d, "k", "v", "m").collect()}
    assert got == {1: None, 2: None, 3: 200}
