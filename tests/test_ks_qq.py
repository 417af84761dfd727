"""Semantic pins for the two-sample KS and QQ-table classes."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

D = datetime.datetime


def _fixture(spark, d, seg_values):
    custs, orders, ck, ok = [], [], 0, 0
    for seg, vals in seg_values.items():
        ck += 1
        custs.append(Row(c_custkey=ck, c_name=f"c{ck}", c_nationkey=0,
                         c_acctbal=0.0, c_mktsegment=seg))
        for v in vals:
            ok += 1
            orders.append(Row(o_orderkey=ok, o_custkey=ck,
                              o_orderstatus="O", o_totalprice=v,
                              o_orderdate=D(2024, 1, 1),
                              o_orderpriority="1"))
    spark.createDataFrame(custs).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(orders).write.parquet(f"{d}/orders.parquet")


def test_ks_interleaved_and_disjoint(spark, tmp_path):
    """Interleaved samples: D_scaled = 3 over n1*n2 = 9 -> D = 1/3,
    achieved first at the lowest threshold (10c)."""
    from datasketches_rust_spark.queries import q_two_sample_ks
    d = str(tmp_path / "a")
    _fixture(spark, d, {"BUILDING": [0.10, 0.20, 0.30],
                        "MACHINERY": [0.15, 0.25, 0.35]})
    r = q_two_sample_ks(spark, d).collect()[0]
    assert (r["n1"], r["n2"], r["d_scaled"], r["ks_at_cents"]) == \
        (3, 3, 3, 10)
    assert abs(r["ks_d"] - 1 / 3) < 1e-12


def test_ks_disjoint_is_one(spark, tmp_path):
    """Fully separated samples: D = 1 exactly, at the last A value."""
    from datasketches_rust_spark.queries import q_two_sample_ks
    d = str(tmp_path / "b")
    _fixture(spark, d, {"BUILDING": [0.01, 0.02],
                        "MACHINERY": [0.10, 0.20]})
    r = q_two_sample_ks(spark, d).collect()[0]
    assert (r["d_scaled"], r["ks_at_cents"], r["ks_d"]) == (4, 2, 1.0)


def test_qq_positions_and_delta(spark, tmp_path):
    """20 values per segment shifted by a constant: every matched
    quantile differs by exactly that constant; position convention
    (n-1)*p div 100 + 1 pinned at p5/p50/p95."""
    from datasketches_rust_spark.queries import q_segment_qq_table
    d = str(tmp_path / "c")
    _fixture(spark, d, {
        "BUILDING": [k / 100.0 for k in range(1, 21)],
        "MACHINERY": [(k + 100) / 100.0 for k in range(1, 21)]})
    out = {r["percentile"]: r for r in
           q_segment_qq_table(spark, d).collect()}
    assert sorted(out) == list(range(5, 100, 5))
    assert out[5]["a_cents"] == 1        # rank (19*5)//100+1 = 1
    assert out[50]["a_cents"] == 10      # rank 10
    assert out[95]["a_cents"] == 19      # rank 19
    assert all(r["delta_cents"] == -100 for r in out.values())


def test_gini_extremes_and_tie_invariance(spark, tmp_path):
    """Perfect equality -> Gini 0; total concentration over n
    customers -> (n-1)/n; a tie in revenues gives the same G
    whichever way ranks break (identity is tie-invariant in
    aggregate)."""
    from datasketches_rust_spark.queries import (
        q_gini_revenue_concentration)

    def run(dirname, totals):
        d = str(tmp_path / dirname)
        spark.createDataFrame(
            [Row(o_orderkey=i, o_custkey=ck, o_orderstatus="O",
                 o_totalprice=v, o_orderdate=D(2024, 1, 1),
                 o_orderpriority="1")
             for i, (ck, v) in enumerate(totals)]).write.parquet(
            f"{d}/orders.parquet")
        return q_gini_revenue_concentration(spark, d).collect()[0]

    eq = run("eq", [(1, 5.0), (2, 5.0), (3, 5.0), (4, 5.0)])
    assert eq["gini"] == 0.0
    conc = run("conc", [(1, 0.00001), (2, 0.00001), (3, 0.00001),
                        (4, 100.0)])
    # near-total concentration over 4 customers -> ~3/4 (tiny
    # epsilons from the 0-cent rounding of the dust customers)
    assert abs(conc["gini"] - 0.75) < 1e-9
    # hand check: revenues 1,2,3 (dollars) -> cents 100,200,300
    # G = (2*(1*100+2*200+3*300) - 4*600) / (3*600) = 400/1800 = 2/9
    mid = run("mid", [(1, 1.0), (2, 2.0), (3, 3.0)])
    assert abs(mid["gini"] - 2 / 9) < 1e-12
    # tie: 100,200,200 under either rank order of the tied pair:
    # six = 1*100 + 2*200 + 3*200 = 1100 both ways -> same G
    tie = run("tie", [(1, 1.0), (2, 2.0), (3, 2.0)])
    assert abs(tie["gini"]
               - (2 * 1100 - 4 * 500) / (3 * 500)) < 1e-12
