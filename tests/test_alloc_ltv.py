"""Semantic pins for the largest-remainder allocation and cohort-LTV
classes."""

from __future__ import annotations

import datetime

from pyspark.sql import Row, functions as F

D = datetime.datetime


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=1, o_orderstatus="O",
             o_totalprice=p, o_orderdate=D(2024, 1, 1),
             o_orderpriority="1-URGENT") for (k, p) in rows])


def _lineitem(spark, rows):
    return spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=1, l_suppkey=1, l_linenumber=ln,
             l_quantity=q, l_extendedprice=1.0, l_discount=0.0,
             l_tax=0.0, l_returnflag="N", l_linestatus="O",
             l_shipdate=D(2024, 1, 1)) for (o, ln, q) in rows])


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=v,
             props="{}") for i, (ts, u, t, v) in enumerate(rows)])


def test_penny_allocation_exact_and_deterministic(spark, tmp_path):
    """100 cents over quantities 1/1/1: base 33 each, 1 leftover
    penny goes to the LOWEST line number (remainders tie at 1/3);
    103 cents over 2/1: shares 68.67/34.33 -> 68+1/34 (line 1 has the
    larger remainder 2/3). Every order's allocations sum exactly to
    its total — the invariant, asserted corpus-wide."""
    from datasketches_rust_spark.queries import q_order_penny_allocation
    d = str(tmp_path / "t")
    _orders(spark, [(1, 1.00), (2, 1.03)]).write.parquet(
        f"{d}/orders.parquet")
    _lineitem(spark, [(1, 1, 1.0), (1, 2, 1.0), (1, 3, 1.0),
                      (2, 1, 2.0), (2, 2, 1.0)]).write.parquet(
        f"{d}/lineitem.parquet")
    df = q_order_penny_allocation(spark, d)
    out = {(r["l_orderkey"], r["l_linenumber"]): r["allocated_cents"]
           for r in df.collect()}
    assert out == {(1, 1): 34, (1, 2): 33, (1, 3): 33,
                   (2, 1): 69, (2, 2): 34}
    sums = {r["l_orderkey"]: r["s"] for r in
            df.groupBy("l_orderkey")
            .agg(F.sum("allocated_cents").alias("s")).collect()}
    assert sums == {1: 100, 2: 103}


def test_cohort_ltv_grid_and_clamp(spark, tmp_path):
    """Two users signing up in the same ISO week form one cohort of 2;
    purchases land at integer week ages from each user's OWN signup
    day; a pre-signup purchase clamps to age 0; LTV divides the
    cohort's cumulative cents by its user count."""
    from datasketches_rust_spark.queries import q_cohort_ltv_weekly
    # 2024-01-01 is a Monday -> both signups share c_week 2024-01-01
    s1, s2 = D(2024, 1, 2), D(2024, 1, 4)
    rows = [(s1, 1, "signup", 0.0), (s2, 2, "signup", 0.0),
            (s1 + datetime.timedelta(days=1), 1, "purchase", 1.00),
            (s1 + datetime.timedelta(days=8), 1, "purchase", 2.00),
            (s2 - datetime.timedelta(days=1), 2, "purchase", 5.00),
            (s2 + datetime.timedelta(days=7), 2, "purchase", 3.00)]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["age_week"]: r for r in
           q_cohort_ltv_weekly(spark, d).collect()}
    assert len(out) == 2 and all(r["n_users"] == 2 for r in out.values())
    # age 0: 100c (u1 day+1) + 500c (u2 pre-signup, CLAMPED) = 600
    assert (out[0]["week_cents"], out[0]["cum_cents"]) == (600, 600)
    # age 1: 200c (u1 day+8) + 300c (u2 day+7) = 500; cum 1100
    assert (out[1]["week_cents"], out[1]["cum_cents"]) == (500, 1100)
    assert out[1]["ltv_cents_per_user"] == 550.0
