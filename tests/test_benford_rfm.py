"""Semantic pins for the Benford-forensics and RFM-segmentation
classes."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

D = datetime.datetime


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=c, o_orderstatus="O",
             o_totalprice=p, o_orderdate=d, o_orderpriority="1-URGENT")
         for i, (c, p, d) in enumerate(rows)])


def test_benford_digit_of_cents_and_chi(spark, tmp_path):
    """First digit comes from the CENTS integer (1.00 -> '100' -> 1);
    counts and ppm shares are exact; the expected ppm is the floored
    Benford share; a uniform 1..9 digit mix has strictly positive chi
    terms for every digit (uniform != Benford)."""
    from datasketches_rust_spark.queries import q_benford_digit_report
    d0 = D(2024, 1, 1)
    # amounts 1.00, 2.00, ..., 9.00 -> cents 100..900, digits 1..9
    rows = [(1, float(k), d0) for k in range(1, 10)]
    d = str(tmp_path / "t")
    _orders(spark, rows).write.parquet(f"{d}/orders.parquet")
    out = {r["digit"]: r for r in q_benford_digit_report(spark, d).collect()}
    assert sorted(out) == list(range(1, 10))
    for dig in range(1, 10):
        assert out[dig]["n"] == 1
        assert out[dig]["obs_ppm"] == 1_000_000 // 9
        assert out[dig]["chi2_term"] > 0.0
    assert out[1]["benford_ppm"] == 301029       # floor(log10(2)*1e6)
    assert out[9]["benford_ppm"] == 45757        # floor(log10(10/9)*1e6)
    # Benford shares decrease in the digit
    assert all(out[k]["benford_ppm"] > out[k + 1]["benford_ppm"]
               for k in range(1, 9))


def test_rfm_segments_all_cells(spark, tmp_path):
    """Five customers engineered onto distinct quintiles hit every
    segment: champion (recent+frequent), new (recent+rare), at_risk
    (stale+frequent), hibernating (stale+rare), core (middle)."""
    from datasketches_rust_spark.queries import q_customer_rfm_segments
    base = D(2024, 1, 1)
    day = datetime.timedelta(days=1)
    # (custkey, recency_days, frequency): last order at base+9-recency
    spec = {1: (0, 10), 2: (1, 1), 3: (9, 8), 4: (8, 2), 5: (5, 5)}
    rows = []
    for ck, (rec, freq) in spec.items():
        last = base + (9 - rec) * day
        rows.append((ck, 10.0 * ck, last))
        rows += [(ck, 10.0 * ck, base - k * day) for k in range(1, freq)]
    d = str(tmp_path / "t")
    _orders(spark, rows).write.parquet(f"{d}/orders.parquet")
    out = {r["c_custkey"]: r for r in
           q_customer_rfm_segments(spark, d).collect()}
    assert {k: v["segment"] for k, v in out.items()} == {
        1: "champion", 2: "new", 3: "at_risk", 4: "hibernating",
        5: "core"}
    assert out[1]["recency_days"] == 0 and out[3]["recency_days"] == 9
    assert (out[1]["r"], out[1]["f"]) == (5, 5)
    assert (out[2]["r"], out[2]["f"]) == (4, 1)
    assert (out[5]["r"], out[5]["f"]) == (3, 3)
    # monetary totals: c2=2000 < c4=8000 < c1=10000 < c3=24000 < c5=25000
    assert {k: out[k]["m"] for k in out} == {2: 1, 4: 2, 1: 3, 3: 4, 5: 5}
