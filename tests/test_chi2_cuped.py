"""Semantic pins for the chi-square cross-tab and CUPED classes."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import Row

D = datetime.datetime


def _orders_prio(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=c, o_orderstatus="O",
             o_totalprice=1.0, o_orderdate=D(2024, 1, 1),
             o_orderpriority=pr) for i, (c, pr) in enumerate(rows)])


def _customer(spark, rows):
    return spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"c{k}", c_nationkey=0, c_acctbal=0.0,
             c_mktsegment=s) for (k, s) in rows])


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=v,
             props="{}") for i, (ts, u, t, v) in enumerate(rows)])


def test_chi2_association_and_independence(spark, tmp_path):
    """Hand-computed 2x2: diagonal-heavy counts (30/10/10/30) give
    every cell expected=20 and chi term 5.0; a perfectly proportional
    table gives chi terms exactly 0."""
    from datasketches_rust_spark.queries import q_segment_priority_chi2
    d = str(tmp_path / "t")
    _customer(spark, [(1, "A"), (2, "B")]).write.parquet(
        f"{d}/customer.parquet")
    rows = [(1, "URG")] * 30 + [(1, "LOW")] * 10 \
        + [(2, "URG")] * 10 + [(2, "LOW")] * 30
    _orders_prio(spark, rows).write.parquet(f"{d}/orders.parquet")
    out = {(r["segment"], r["priority"]): r for r in
           q_segment_priority_chi2(spark, d).collect()}
    for cell in (("A", "URG"), ("A", "LOW"), ("B", "URG"), ("B", "LOW")):
        assert out[cell]["expected"] == 20.0
        assert abs(out[cell]["chi2_term"] - 5.0) < 1e-12
    assert out[("A", "URG")]["n_segment"] == 40
    assert out[("A", "URG")]["n_priority"] == 40


def test_chi2_zero_under_independence(spark, tmp_path):
    from datasketches_rust_spark.queries import q_segment_priority_chi2
    d = str(tmp_path / "t")
    _customer(spark, [(1, "A"), (2, "B")]).write.parquet(
        f"{d}/customer.parquet")
    # proportional: A is 2x B in both priorities -> independent
    rows = [(1, "URG")] * 20 + [(1, "LOW")] * 10 \
        + [(2, "URG")] * 10 + [(2, "LOW")] * 5
    _orders_prio(spark, rows).write.parquet(f"{d}/orders.parquet")
    for r in q_segment_priority_chi2(spark, d).collect():
        assert abs(r["chi2_term"]) < 1e-12


def _arm(uid):
    h = hashlib.md5(str(uid).encode()).hexdigest()
    return int(h[:8], 16) % 2


def test_cuped_removes_preperiod_imbalance(spark, tmp_path):
    """With y = 2x exactly, theta = 2 and the CUPED-adjusted means of
    BOTH arms collapse to the same value (2 * pooled x-mean) even
    though the raw means differ — the variance-reduction identity,
    exact in integers here."""
    from datasketches_rust_spark.queries import q_cuped_adjusted_metrics
    pre, post = D(2024, 1, 5), D(2024, 1, 20)
    arm0 = [u for u in range(1, 200) if _arm(u) == 0][:2]
    arm1 = [u for u in range(1, 200) if _arm(u) == 1][:2]
    x_by_user = {arm0[0]: 100, arm0[1]: 200,
                 arm1[0]: 300, arm1[1]: 400}
    rows = []
    for u, xc in x_by_user.items():
        rows.append((pre, u, "purchase", xc / 100.0))
        rows.append((post, u, "purchase", 2 * xc / 100.0))
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["arm"]: r for r in
           q_cuped_adjusted_metrics(spark, d).collect()}
    assert out[0]["theta"] == 2.0 and out[1]["theta"] == 2.0
    assert out[0]["raw_mean_cents"] == 300.0    # 2*(100+200)/2
    assert out[1]["raw_mean_cents"] == 700.0    # 2*(300+400)/2
    pooled = 2 * (100 + 200 + 300 + 400) / 4.0  # = 500
    assert abs(out[0]["cuped_mean_cents"] - pooled) < 1e-9
    assert abs(out[1]["cuped_mean_cents"] - pooled) < 1e-9
