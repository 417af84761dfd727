"""Semantic pins for the rolling-correlation / forget-purge /
weekday-anomaly classes on crafted inputs."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import Row

D = datetime.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=v,
             props="{}")
         for i, (ts, u, t, v) in enumerate(rows)])


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=c, o_orderstatus="O",
             o_totalprice=p, o_orderdate=d, o_orderpriority="1-URGENT")
         for (k, c, p, d) in rows])


def _lineitem(spark, rows):
    return spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=1, l_suppkey=1, l_linenumber=i,
             l_quantity=q, l_extendedprice=p, l_discount=0.0, l_tax=0.0,
             l_returnflag="N", l_linestatus="O", l_shipdate=d)
         for i, (o, q, p, d) in enumerate(rows)])


def _customer(spark, rows):
    return spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"c{k}", c_nationkey=0, c_acctbal=0.0,
             c_mktsegment=s) for (k, s) in rows])


# ---------------------------------------------------------------------------
# rolling_corr_daily
# ---------------------------------------------------------------------------

def test_rolling_corr_signs_and_guards(spark, tmp_path):
    """Perfectly co-moving series -> corr +1; perfectly anti-moving ->
    -1; n=1 and flat (zero-variance) windows -> NULL, never NaN."""
    from datasketches_rust_spark.queries import q_rolling_corr_daily
    base = D(2024, 1, 1, 12, 0)
    day = datetime.timedelta(days=1)
    rows = []
    # days 0-2: click and purchase move TOGETHER (x=y): corr -> 1
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows += [(base + i * day, 1, "click", v),
                 (base + i * day, 1, "purchase", v)]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["day"].isoformat(): r for r in
           q_rolling_corr_daily(spark, d).collect()}
    assert out["2024-01-01"]["corr30"] is None          # n=1: no variance
    assert abs(out["2024-01-02"]["corr30"] - 1.0) < 1e-12
    assert abs(out["2024-01-03"]["corr30"] - 1.0) < 1e-12


def test_rolling_corr_anti_and_flat(spark, tmp_path):
    from datasketches_rust_spark.queries import q_rolling_corr_daily
    base = D(2024, 1, 1, 12, 0)
    day = datetime.timedelta(days=1)
    rows = []
    # click rises while purchase falls -> corr -1; then 3 flat days on
    # the CLICK side only (purchase varies) -> zero x-variance once the
    # moving frame contains only flat clicks
    for i, (x, y) in enumerate([(1.0, 3.0), (2.0, 2.0), (3.0, 1.0)]):
        rows += [(base + i * day, 1, "click", x),
                 (base + i * day, 1, "purchase", y)]
    for i in range(40, 43):  # day index 40-42: outside the 30d frame
        rows += [(base + i * day, 1, "click", 5.0),
                 (base + i * day, 1, "purchase", float(i))]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["day"].isoformat(): r for r in
           q_rolling_corr_daily(spark, d).collect()}
    assert abs(out["2024-01-03"]["corr30"] + 1.0) < 1e-12
    # 2024-02-12 = day 42: frame holds only the three flat-click days
    # (the early days fell out of the 30-day range frame)
    assert out["2024-02-12"]["n"] == 3
    assert out["2024-02-12"]["corr30"] is None  # x-variance == 0 -> NULL


# ---------------------------------------------------------------------------
# forget_users_purge_plan
# ---------------------------------------------------------------------------

def _in_cohort(uid):
    h = hashlib.md5(f"forget:{uid}".encode()).hexdigest()
    return int(h[:8], 16) % 20 == 0


def test_purge_cascade_counts(spark, tmp_path):
    """The cascade must count: events by user, orders by custkey,
    lineitem THROUGH the purged orders (two hops), customer rows by
    key — and nothing for retained users."""
    from datasketches_rust_spark.queries import q_forget_users_purge_plan
    # find one opted-out and one retained uid deterministically
    forget_uid = next(u for u in range(1, 1000) if _in_cohort(u))
    keep_uid = next(u for u in range(1, 1000) if not _in_cohort(u))
    t0 = D(2024, 1, 1, 9, 0)
    d = str(tmp_path / "t")
    _events(spark, [(t0, forget_uid, "click", 1.0),
                    (t0, forget_uid, "view", 1.0),
                    (t0, keep_uid, "click", 1.0)]).write.parquet(
        f"{d}/events.parquet")
    _orders(spark, [(100, forget_uid, 10.0, t0),
                    (101, forget_uid, 20.0, t0),
                    (102, keep_uid, 30.0, t0)]).write.parquet(
        f"{d}/orders.parquet")
    # 3 lines on purged order 100, 1 on purged 101, 2 on retained 102
    _lineitem(spark, [(100, 1.0, 1.0, t0)] * 3
              + [(101, 1.0, 1.0, t0)]
              + [(102, 1.0, 1.0, t0)] * 2).write.parquet(
        f"{d}/lineitem.parquet")
    _customer(spark, [(forget_uid, "A"), (keep_uid, "B")]).write.parquet(
        f"{d}/customer.parquet")
    out = {r["tbl"]: (r["n_rows"], r["n_keys"])
           for r in q_forget_users_purge_plan(spark, d).collect()}
    assert out == {"events": (2, 1), "orders": (2, 1),
                   "lineitem": (4, 2), "customer": (1, 1)}


# ---------------------------------------------------------------------------
# weekday_anomaly_flags
# ---------------------------------------------------------------------------

def test_weekday_anomaly_spike_flagged_baseline_not(spark, tmp_path):
    """Five same-weekday observations: four at 100c, one at 1000c.
    Scaled residuals r = cents*5 - 1400: four at -900, spike at 3600;
    mad2 (doubled median of |r|, odd n -> 2x middle) = 1800 — only the
    spike exceeds it. A second flat weekday group contributes zero
    residuals and no flags, and must not perturb the first group
    (per-(type,weekday) isolation)."""
    from datasketches_rust_spark.queries import q_weekday_anomaly_flags
    base = D(2024, 1, 1, 12, 0)   # Monday
    week = datetime.timedelta(days=7)
    rows = [(base + i * week, 1, "click", 1.0) for i in range(4)]
    rows.append((base + 4 * week, 1, "click", 10.0))     # the spike
    # Tuesdays: flat 2.0 -> residuals all zero, mad2 0, no flag
    # (|0| > 0 is false)
    tue = base + datetime.timedelta(days=1)
    rows += [(tue + i * week, 1, "click", 2.0) for i in range(3)]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["day"].isoformat(): r for r in
           q_weekday_anomaly_flags(spark, d).collect()}
    spike = out["2024-01-29"]
    assert (spike["r"], spike["mad2"], spike["anomaly"]) == (3600, 1800, 1)
    for day in ("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22"):
        assert (out[day]["r"], out[day]["anomaly"]) == (-900, 0)
    for day in ("2024-01-02", "2024-01-09", "2024-01-16"):
        assert (out[day]["r"], out[day]["mad2"],
                out[day]["anomaly"]) == (0, 0, 0)


def test_brand_trend_exact_two_point_fit(spark, tmp_path):
    """Two points determine the line exactly: (d0, 100c) and (d10,
    200c) -> slope 10 c/day, intercept 100; a brand whose sales all
    land on ONE day has zero x-variance -> NULL fit, no blowup."""
    from datasketches_rust_spark.queries import q_brand_price_trends
    from pyspark.sql import Row
    base = D(1992, 1, 1)
    d = str(tmp_path / "t")
    spark.createDataFrame([
        Row(p_partkey=1, p_name="a", p_brand="A", p_type="T",
            p_size=1, p_retailprice=1.0),
        Row(p_partkey=2, p_name="b", p_brand="B", p_type="T",
            p_size=1, p_retailprice=1.0)]).write.parquet(
        f"{d}/part.parquet")
    _lineitem_pk = lambda rows: spark.createDataFrame(
        [Row(l_orderkey=i, l_partkey=pk, l_suppkey=1, l_linenumber=i,
             l_quantity=1.0, l_extendedprice=p, l_discount=0.0,
             l_tax=0.0, l_returnflag="N", l_linestatus="O",
             l_shipdate=ts) for i, (pk, p, ts) in enumerate(rows)])
    _lineitem_pk([
        (1, 1.00, base),
        (1, 2.00, base + datetime.timedelta(days=10)),
        (2, 5.00, base), (2, 7.00, base),      # brand B: one day only
    ]).write.parquet(f"{d}/lineitem.parquet")
    out = {r["p_brand"]: r for r in
           q_brand_price_trends(spark, d).collect()}
    assert abs(out["A"]["slope_cents_per_day"] - 10.0) < 1e-9
    assert abs(out["A"]["intercept_cents"] - 100.0) < 1e-9
    assert out["B"]["slope_cents_per_day"] is None
    assert out["B"]["intercept_cents"] is None


def test_winsorize_cuts_and_clip_sides(spark, tmp_path):
    """100 orders at 1..100 cents: the p5 cut is the 5th order
    statistic (rn = 99*0.05 floored + 1 = 5 -> 5c), p95 the 95th
    (95c); 1-4 clip low, 96-100 clip high, the middle passes
    through untouched."""
    from datasketches_rust_spark.queries import q_winsorized_order_values
    d = str(tmp_path / "t")
    _orders(spark, [(k, k, k / 100.0, D(2024, 1, 1))
                    for k in range(1, 101)]).write.parquet(
        f"{d}/orders.parquet")
    out = {r["o_orderkey"]: r for r in
           q_winsorized_order_values(spark, d).collect()}
    assert (out[1]["winsorized_cents"], out[1]["clipped"]) == (5, "low")
    assert (out[4]["winsorized_cents"], out[4]["clipped"]) == (5, "low")
    assert (out[5]["winsorized_cents"], out[5]["clipped"]) == (5, None)
    assert (out[50]["winsorized_cents"], out[50]["clipped"]) == (50, None)
    assert (out[95]["winsorized_cents"], out[95]["clipped"]) == (95, None)
    assert (out[96]["winsorized_cents"], out[96]["clipped"]) == \
        (95, "high")
    assert (out[100]["winsorized_cents"], out[100]["clipped"]) == \
        (95, "high")
