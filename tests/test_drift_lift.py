"""Semantic pins for the PSI drift-monitor and lift/gains classes."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

D = datetime.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=1, event_type=t, value=0.0,
             props="{}") for i, (ts, t) in enumerate(rows)])


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=1, o_orderstatus=st,
             o_totalprice=p, o_orderdate=D(2024, 1, 1),
             o_orderpriority="1-URGENT") for (k, st, p) in rows])


def test_drift_terms_sign_and_null(spark, tmp_path):
    """PSI terms are ALWAYS >= 0 ((p_a-p_b) and ln(p_a/p_b) share
    sign); a stable category contributes ~0; a category absent from
    one window yields NULL, not inf."""
    from datasketches_rust_spark.queries import q_event_type_drift_report
    a_day, b_day = D(2024, 1, 5), D(2024, 1, 20)
    rows = []
    rows += [(a_day, "click")] * 50 + [(b_day, "click")] * 50   # stable
    rows += [(a_day, "view")] * 40 + [(b_day, "view")] * 10     # shrinks
    rows += [(a_day, "error")] * 10 + [(b_day, "error")] * 40   # grows
    rows += [(a_day, "signup")] * 5                             # vanishes
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["event_type"]: r for r in
           q_event_type_drift_report(spark, d).collect()}
    assert out["signup"]["psi_term"] is None
    assert out["signup"]["nb"] == 0
    for t in ("click", "view", "error"):
        assert out[t]["psi_term"] >= 0.0
    # both movers shifted harder than the stable category
    assert out["view"]["psi_term"] > out["click"]["psi_term"]
    assert out["error"]["psi_term"] > out["click"]["psi_term"]
    # integer shares: window A has 105 events, 50 clicks
    assert out["click"]["share_a_ppm"] == 50 * 1_000_000 // 105


def test_lift_table_capture_curve(spark, tmp_path):
    """100 orders priced 1..100; all 20 'F' outcomes sit in the top
    two deciles -> decile 10 captures half of F, decile 9 cumulative
    captures all, lower deciles stay at full capture with zero rate."""
    from datasketches_rust_spark.queries import q_order_value_lift_table
    rows = [(k, "F" if k > 80 else "O", float(k)) for k in range(1, 101)]
    d = str(tmp_path / "t")
    _orders(spark, rows).write.parquet(f"{d}/orders.parquet")
    out = {r["decile"]: r for r in
           q_order_value_lift_table(spark, d).collect()}
    assert len(out) == 10 and all(out[i]["n_orders"] == 10
                                  for i in range(1, 11))
    assert (out[10]["n_f"], out[10]["rate_ppm"],
            out[10]["cum_capture_ppm"]) == (10, 1_000_000, 500_000)
    assert (out[9]["n_f"], out[9]["cum_capture_ppm"]) == (10, 1_000_000)
    assert out[1]["n_f"] == 0 and out[1]["cum_capture_ppm"] == 1_000_000


def test_streaming_drift_window_vs_baseline(spark, tmp_path):
    """End-to-end streaming drift: baseline days (before the split)
    define the training mix; a post-split window with a shifted mix
    gets the hand-computed PSI term; a window matching the baseline
    mix gets PSI exactly 0; a NEW type (absent from the baseline) and
    a VANISHED type (baseline-only) both still get rows — with NULL
    psi_term — instead of being silently dropped."""
    import math
    from datasketches_rust_spark.queries import q_streaming_drift_monitor
    a_day, b_day = D(2024, 1, 5), D(2024, 1, 20)
    rows = [(a_day, "click")] * 50 + [(a_day, "view")] * 50 \
        + [(a_day, "error")] * 20                       # baseline: 120
    rows += [(b_day, "click")] * 30 + [(b_day, "view")] * 10 \
        + [(b_day, "purchase")] * 5                     # window: 45
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {(r["ws_us"], r["event_type"]): r
           for r in q_streaming_drift_monitor(spark, d).collect()}
    us = int(b_day.timestamp() * 1_000_000)
    shifted = out[(us, "click")]
    assert (shifted["n_events"], shifted["tw"],
            shifted["share_ppm"], shifted["base_ppm"]) == \
        (30, 45, 666666, 416666)
    pb, pa = 30 / 45, 50 / 120
    assert abs(shifted["psi_term"]
               - (pb - pa) * math.log(pb / pa)) < 1e-12
    # NEW type: in the window, never in the baseline -> row with NULL
    new = out[(us, "purchase")]
    assert (new["n_events"], new["base_ppm"]) == (5, 0)
    assert new["psi_term"] is None
    # VANISHED type: in the baseline, absent from this window -> row
    # with zero count, its baseline share, NULL psi
    gone = out[(us, "error")]
    assert (gone["n_events"], gone["share_ppm"],
            gone["base_ppm"]) == (0, 0, 166666)
    assert gone["psi_term"] is None
    base_us = int(a_day.timestamp() * 1_000_000)
    # the baseline-period window matches the baseline mix exactly
    assert out[(base_us, "click")]["psi_term"] == 0.0
    # and carries a zero-count row for the later-only type
    assert out[(base_us, "purchase")]["n_events"] == 0
