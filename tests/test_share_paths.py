"""Semantic pins for the snowflake ratio-to-report and frequent-path
classes."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

D = datetime.datetime


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=c, o_orderstatus="O",
             o_totalprice=p, o_orderdate=D(2024, 1, 1),
             o_orderpriority="1-URGENT") for i, (c, p) in enumerate(rows)])


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=0.0,
             props="{}") for i, (ts, u, t) in enumerate(rows)])


def test_nation_share_within_region(spark, tmp_path):
    """Shares are of the REGION total, not the grand total; ranks are
    per region with nationkey tie-break; floor ppm."""
    from datasketches_rust_spark.queries import q_nation_revenue_share
    d = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(r_regionkey=1, r_name="EAST"),
         Row(r_regionkey=2, r_name="WEST")]).write.parquet(
        f"{d}/region.parquet")
    spark.createDataFrame(
        [Row(n_nationkey=10, n_name="A", n_regionkey=1),
         Row(n_nationkey=11, n_name="B", n_regionkey=1),
         Row(n_nationkey=20, n_name="C", n_regionkey=2)]).write.parquet(
        f"{d}/nation.parquet")
    spark.createDataFrame(
        [Row(c_custkey=1, c_name="c1", c_nationkey=10, c_acctbal=0.0,
             c_mktsegment="S"),
         Row(c_custkey=2, c_name="c2", c_nationkey=11, c_acctbal=0.0,
             c_mktsegment="S"),
         Row(c_custkey=3, c_name="c3", c_nationkey=20, c_acctbal=0.0,
             c_mktsegment="S")]).write.parquet(f"{d}/customer.parquet")
    # EAST: A=3.00, B=1.00 -> shares 750000/250000; WEST: C alone -> 1e6
    _orders(spark, [(1, 2.00), (1, 1.00), (2, 1.00),
                    (3, 5.00)]).write.parquet(f"{d}/orders.parquet")
    out = {r["n_name"]: r for r in q_nation_revenue_share(spark, d).collect()}
    assert (out["A"]["share_ppm"], out["A"]["rank_in_region"]) == (750000, 1)
    assert (out["B"]["share_ppm"], out["B"]["rank_in_region"]) == (250000, 2)
    assert (out["C"]["share_ppm"], out["C"]["rank_in_region"]) == (1000000, 1)
    assert out["A"]["region_cents"] == 400 and out["C"]["region_cents"] == 500


def test_paths_truncate_at_first_purchase(spark, tmp_path):
    """'vvpc' contributes path 'vvp' (post-purchase tail dropped);
    'vpvp' truncates at the FIRST purchase -> 'vp'; purchase-free
    user-days contribute nothing; identical paths aggregate across
    users."""
    from datasketches_rust_spark.queries import q_top_purchase_paths
    t0 = D(2024, 1, 1, 9, 0)
    s = datetime.timedelta(seconds=1)

    def day_events(uid, types, base):
        return [(base + i * s, uid, t) for i, t in enumerate(types)]

    rows = []
    rows += day_events(1, ["view", "view", "purchase", "click"], t0)
    rows += day_events(2, ["view", "purchase", "view", "purchase"], t0)
    rows += day_events(3, ["view", "view", "purchase"], t0)   # also 'vvp'
    rows += day_events(4, ["view", "click"], t0)              # no purchase
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["path"]: r["n_user_days"]
           for r in q_top_purchase_paths(spark, d).collect()}
    assert out == {"vvp": 2, "vp": 1}
