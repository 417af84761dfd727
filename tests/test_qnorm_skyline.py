"""Semantic pins for the quantile-normalization and skyline classes."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

D = datetime.datetime


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=c, o_orderstatus="O",
             o_totalprice=p, o_orderdate=d, o_orderpriority="1-URGENT")
         for (k, c, p, d) in rows])


def _customer(spark, rows):
    return spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"c{k}", c_nationkey=0, c_acctbal=0.0,
             c_mktsegment=s) for (k, s) in rows])


def test_quantile_normalization_position_mapping(spark, tmp_path):
    """Hand-computed position mapping onto the global order statistics
    (N=10): segment A's 3 values land on global positions 1/5/10,
    segment B's 6 on 1/2/4/6/8/10, and the singleton segment C maps to
    the global lower median (position 5). Within-group order is
    preserved by construction."""
    from datasketches_rust_spark.queries import q_quantile_normalized_orders
    d0 = D(2024, 1, 1)
    d = str(tmp_path / "t")
    _customer(spark, [(1, "A"), (2, "B"), (3, "C")]).write.parquet(
        f"{d}/customer.parquet")
    # A: 10/20/30c; B: 100..600c; C: 50c  -> global sorted:
    # [10,20,30,50,100,200,300,400,500,600]
    rows = [(10, 1, 0.10, d0), (11, 1, 0.20, d0), (12, 1, 0.30, d0)]
    rows += [(20 + i, 2, (i + 1) * 1.00, d0) for i in range(6)]
    rows += [(30, 3, 0.50, d0)]
    _orders(spark, rows).write.parquet(f"{d}/orders.parquet")
    out = {r["o_orderkey"]: r["norm_cents"] for r in
           q_quantile_normalized_orders(spark, d).collect()}
    assert (out[10], out[11], out[12]) == (10, 100, 600)   # A -> 1/5/10
    assert (out[20], out[21], out[22]) == (10, 20, 50)     # B -> 1/2/4
    assert (out[23], out[24], out[25]) == (200, 400, 600)  # B -> 6/8/10
    assert out[30] == 100                                  # C -> pos 5


def test_skyline_strict_dominance_and_price_ties(spark, tmp_path):
    """Dominance is strict on BOTH axes: (95c, d5) is dominated by
    (100c, d10); equal-price rows never dominate each other, so the
    older 100c order stays on the frontier; (80c, d15) falls to
    (90c, d20)."""
    from datasketches_rust_spark.queries import q_order_skyline
    base = D(1992, 1, 1)
    day = datetime.timedelta(days=1)
    d = str(tmp_path / "t")
    _customer(spark, [(1, "S")]).write.parquet(f"{d}/customer.parquet")
    _orders(spark, [
        (1, 1, 1.00, base + 10 * day),   # (100c, d10) frontier
        (2, 1, 0.90, base + 20 * day),   # (90c, d20)  frontier
        (3, 1, 0.95, base + 5 * day),    # dominated by order 1
        (4, 1, 1.00, base + 1 * day),    # price tie with 1 -> frontier
        (5, 1, 0.80, base + 15 * day),   # dominated by order 2
        (6, 1, 0.99, base + 10 * day),   # DATE tie with pricier order 1
                                         # -> NOT dominated (strict)
    ]).write.parquet(f"{d}/orders.parquet")
    out = {r["o_orderkey"] for r in q_order_skyline(spark, d).collect()}
    assert out == {1, 2, 4, 6}
