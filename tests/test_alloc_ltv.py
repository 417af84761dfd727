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


def test_aging_buckets_boundaries(spark, tmp_path):
    """Bucket boundaries are inclusive on the upper edge (30 -> 00-30,
    31 -> 31-60, 90 -> 61-90, 91 -> 90+); closed orders are excluded;
    shares are of the OPEN total only."""
    from datasketches_rust_spark.queries import q_open_order_aging
    from pyspark.sql import Row
    base = D(2024, 6, 1)

    def o(k, status, price, days_before):
        return Row(o_orderkey=k, o_custkey=1, o_orderstatus=status,
                   o_totalprice=price,
                   o_orderdate=base - datetime.timedelta(days=days_before),
                   o_orderpriority="1-URGENT")

    d = str(tmp_path / "t")
    spark.createDataFrame([
        o(1, "O", 1.00, 0),     # as-of anchor, age 0  -> 00-30
        o(2, "O", 1.00, 30),    # age 30 -> 00-30 (upper edge in)
        o(3, "O", 1.00, 31),    # age 31 -> 31-60
        o(4, "O", 1.00, 90),    # age 90 -> 61-90
        o(5, "O", 1.00, 91),    # age 91 -> 90+
        o(6, "F", 99.0, 10),    # closed: excluded entirely
    ]).write.parquet(f"{d}/orders.parquet")
    out = {r["age_bucket"]: r for r in
           q_open_order_aging(spark, d).collect()}
    assert {k: v["n_orders"] for k, v in out.items()} == \
        {"00-30": 2, "31-60": 1, "61-90": 1, "90+": 1}
    assert out["00-30"]["share_ppm"] == 2 * 1_000_000 // 5


def test_rapid_repeat_pairs_and_deltas(spark, tmp_path):
    """Same-customer orders within one day pair up (0- and 1-day
    gaps); a 2-day gap does not; different customers never pair; the
    amount delta and ppm triage signals are exact."""
    from datasketches_rust_spark.queries import q_rapid_repeat_orders
    d0 = D(2024, 1, 10)
    day = datetime.timedelta(days=1)
    d = str(tmp_path / "t")
    from pyspark.sql import Row
    spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="O",
            o_totalprice=10.00, o_orderdate=d0, o_orderpriority="1"),
        Row(o_orderkey=2, o_custkey=1, o_orderstatus="O",
            o_totalprice=8.00, o_orderdate=d0, o_orderpriority="1"),
        Row(o_orderkey=3, o_custkey=1, o_orderstatus="O",
            o_totalprice=10.00, o_orderdate=d0 + day,
            o_orderpriority="1"),
        Row(o_orderkey=4, o_custkey=1, o_orderstatus="O",
            o_totalprice=10.00, o_orderdate=d0 + 3 * day,
            o_orderpriority="1"),
        Row(o_orderkey=5, o_custkey=2, o_orderstatus="O",
            o_totalprice=10.00, o_orderdate=d0, o_orderpriority="1"),
    ]).write.parquet(f"{d}/orders.parquet")
    out = {(r["orderkey_1"], r["orderkey_2"]): r for r in
           q_rapid_repeat_orders(spark, d).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    r = out[(1, 2)]
    assert (r["day_gap"], r["delta_cents"]) == (0, 200)
    assert r["delta_ppm"] == 200 * 1_000_000 // 1000
    assert out[(1, 3)]["day_gap"] == 1 and out[(1, 3)]["delta_cents"] == 0
