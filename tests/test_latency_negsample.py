"""Semantic pins for the conversion-latency and negative-sampling
classes."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import Row

D = datetime.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=0.0,
             props="{}") for i, (ts, u, t) in enumerate(rows)])


def test_latency_first_pair_and_direction(spark, tmp_path):
    """Latency = FIRST purchase minus FIRST view; a purchase-before-
    any-view user-day does not convert; exact med2/p90 on a crafted
    odd set."""
    from datasketches_rust_spark.queries import q_conversion_latency_daily
    t0 = D(2024, 1, 1, 9, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        # user 1: views at 0s and 10s, purchases at 30s and 40s
        # -> latency 30s (first to first), later events ignored
        (t0, 1, "view"), (t0 + 10 * s, 1, "view"),
        (t0 + 30 * s, 1, "purchase"), (t0 + 40 * s, 1, "purchase"),
        # user 2: 10s latency
        (t0, 2, "view"), (t0 + 10 * s, 2, "purchase"),
        # user 3: 50s latency
        (t0, 3, "view"), (t0 + 50 * s, 3, "purchase"),
        # user 4: purchase BEFORE any view -> no conversion
        (t0, 4, "purchase"), (t0 + 5 * s, 4, "view"),
        # user 5: view only -> no conversion
        (t0, 5, "view"),
    ]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = q_conversion_latency_daily(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    # latencies sorted: [10s, 30s, 50s] (micros)
    assert r["n_conversions"] == 3
    assert r["med2_latency_us"] == 2 * 30_000_000
    assert r["p90_latency_us"] == 30_000_000   # (3-1)*9//10+1 = rank 2


def test_negative_samples_exclude_bought_and_deterministic(spark,
                                                           tmp_path):
    """Negatives never include a bought part; ranks follow draw index;
    the sample reproduces the md5 derivation exactly (computed
    independently in python)."""
    from datasketches_rust_spark.queries import (
        NEG_SAMPLE_DRAWS, NEG_SAMPLE_KEEP, q_negative_samples)
    d = str(tmp_path / "t")
    NP = 50
    spark.createDataFrame(
        [Row(p_partkey=k, p_name=f"p{k}", p_brand="B", p_type="T",
             p_size=1, p_retailprice=1.0)
         for k in range(1, NP + 1)]).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [Row(c_custkey=1, c_name="c1", c_nationkey=0, c_acctbal=0.0,
             c_mktsegment="S")]).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [Row(o_orderkey=1, o_custkey=1, o_orderstatus="O",
             o_totalprice=1.0, o_orderdate=D(2024, 1, 1),
             o_orderpriority="1")]).write.parquet(f"{d}/orders.parquet")

    def draw(ck, i):
        h = hashlib.md5(f"neg:{ck}:{i}".encode()).hexdigest()
        return int(h[:12], 16) % NP + 1

    # make the user buy the parts produced by the FIRST TWO draws, so
    # the anti join provably knocks them out
    bought = {draw(1, 0), draw(1, 1)}
    spark.createDataFrame(
        [Row(l_orderkey=1, l_partkey=pk, l_suppkey=1, l_linenumber=i,
             l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0,
             l_tax=0.0, l_returnflag="N", l_linestatus="O",
             l_shipdate=D(2024, 1, 1))
         for i, pk in enumerate(sorted(bought))]).write.parquet(
        f"{d}/lineitem.parquet")
    out = sorted((r["neg_rank"], r["p_partkey"])
                 for r in q_negative_samples(spark, d).collect())
    # expected: earliest-draw-dedup of surviving candidates, first KEEP
    seen, expect = {}, []
    for i in range(NEG_SAMPLE_DRAWS):
        pk = draw(1, i)
        if pk in bought or pk in seen:
            continue
        seen[pk] = i
    for rk, (i, pk) in enumerate(
            sorted((i, pk) for pk, i in seen.items())[:NEG_SAMPLE_KEEP],
            start=1):
        expect.append((rk, pk))
    assert out == sorted(expect)
    assert all(pk not in bought for _, pk in out)
