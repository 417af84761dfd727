"""Semantic pins for the round-3 sweep-line / LWMA / spatial-grid /
target-encoding / sequence-regex / group-having classes on crafted
inputs (the sf fixtures prove cross-engine agreement; these prove the
SEMANTICS are the intended ones — boundary rules, densification,
weight algebra, leakage exclusion, adjacency, strict thresholds)."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import Row

D = datetime.datetime


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


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=v,
             props="{}")
         for i, (ts, u, t, v) in enumerate(rows)])


def _customer(spark, rows):
    return spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"c{k}", c_nationkey=0, c_acctbal=0.0,
             c_mktsegment=s) for (k, s) in rows])


# ---------------------------------------------------------------------------
# orders_in_flight_daily — sweep line
# ---------------------------------------------------------------------------

def test_in_flight_densifies_and_ends_inclusive(spark, tmp_path):
    """Order A in flight Jan 1-3 (end day INCLUSIVE), order B on Jan 6
    only; Jan 4-5 have zero in-flight but MUST appear (densified
    spine); the end day itself counts, the day after does not."""
    from datasketches_rust_spark.queries import q_orders_in_flight_daily
    d = str(tmp_path / "t")
    _orders(spark, [(1, 1, 10.0, D(2024, 1, 1)),
                    (2, 1, 10.0, D(2024, 1, 6))]).write.parquet(
        f"{d}/orders.parquet")
    # order 1 has two lineitems; the MAX shipdate (Jan 3) ends the window
    _lineitem(spark, [(1, 1.0, 1.0, D(2024, 1, 2)),
                      (1, 1.0, 1.0, D(2024, 1, 3)),
                      (2, 1.0, 1.0, D(2024, 1, 6))]).write.parquet(
        f"{d}/lineitem.parquet")
    out = {r["day"].isoformat(): r["n_in_flight"]
           for r in q_orders_in_flight_daily(spark, d).collect()}
    assert out == {"2024-01-01": 1, "2024-01-02": 1, "2024-01-03": 1,
                   "2024-01-04": 0, "2024-01-05": 0, "2024-01-06": 1}


def test_in_flight_overlap_stacks(spark, tmp_path):
    """Two overlapping orders stack to 2 on the shared days."""
    from datasketches_rust_spark.queries import q_orders_in_flight_daily
    d = str(tmp_path / "t")
    _orders(spark, [(1, 1, 10.0, D(2024, 1, 1)),
                    (2, 1, 10.0, D(2024, 1, 2))]).write.parquet(
        f"{d}/orders.parquet")
    _lineitem(spark, [(1, 1.0, 1.0, D(2024, 1, 3)),
                      (2, 1.0, 1.0, D(2024, 1, 4))]).write.parquet(
        f"{d}/lineitem.parquet")
    out = {r["day"].isoformat(): r["n_in_flight"]
           for r in q_orders_in_flight_daily(spark, d).collect()}
    assert out == {"2024-01-01": 1, "2024-01-02": 2, "2024-01-03": 2,
                   "2024-01-04": 1}


# ---------------------------------------------------------------------------
# lwma_revenue_daily — weight algebra over gaps
# ---------------------------------------------------------------------------

def test_lwma_weights_and_gap_frame(spark, tmp_path):
    """Hand-computed LWMA on a gapped series: day indices 0, 6, 7, 13
    (from the 1992-01-01 epoch the query uses). The RANGE frame is on
    the day INDEX, so d=0 is inside d=6's frame (distance 6, weight 1)
    but outside d=7's (distance 7); gap days contribute nothing."""
    from datasketches_rust_spark.queries import q_lwma_revenue_daily
    base = D(1992, 1, 1)
    d = str(tmp_path / "t")
    _lineitem(spark, [
        (1, 1.0, 1.00, base),                              # d=0, 100c
        (2, 1.0, 2.00, base + datetime.timedelta(days=6)),  # d=6, 200c
        (3, 1.0, 3.00, base + datetime.timedelta(days=7)),  # d=7, 300c
        (4, 1.0, 0.50, base + datetime.timedelta(days=13)),  # d=13, 50c
    ]).write.parquet(f"{d}/lineitem.parquet")
    out = {r["day"].isoformat(): r
           for r in q_lwma_revenue_daily(spark, d).collect()}
    # d=0: only itself, weight 7
    assert (out["1992-01-01"]["lwma_num"],
            out["1992-01-01"]["lwma_den"]) == (700, 7)
    # d=6: {d0 w=1, d6 w=7} -> 1*100 + 7*200 = 1500 / 8
    assert (out["1992-01-07"]["lwma_num"],
            out["1992-01-07"]["lwma_den"]) == (1500, 8)
    # d=7: d0 fell out; {d6 w=6, d7 w=7} -> 6*200 + 7*300 = 3300 / 13
    assert (out["1992-01-08"]["lwma_num"],
            out["1992-01-08"]["lwma_den"]) == (3300, 13)
    # d=13: {d7 w=1, d13 w=7} -> 300 + 350 = 650 / 8
    assert (out["1992-01-14"]["lwma_num"],
            out["1992-01-14"]["lwma_den"]) == (650, 8)
    assert abs(out["1992-01-14"]["lwma_cents"] - 650 / 8) < 1e-12


# ---------------------------------------------------------------------------
# geo_nearby_customers — grid join vs exact all-pairs
# ---------------------------------------------------------------------------

def _geo_coord(tag, key):
    h = hashlib.md5(f"{tag}:{key}".encode()).hexdigest()
    return int(h[:8], 16) % 1000


def test_geo_grid_matches_exact_all_pairs(spark, tmp_path):
    """The 3x3-cell grid join must return EXACTLY the all-pairs
    neighbors-within-R answer — including pairs that straddle cell
    boundaries (asserted non-vacuous below) and pairs at exactly
    distance R (<= boundary)."""
    from datasketches_rust_spark.queries import (GEO_R,
                                                 q_geo_nearby_customers)
    keys = list(range(1, 301))
    d = str(tmp_path / "t")
    _customer(spark, [(k, "SEG") for k in keys]).write.parquet(
        f"{d}/customer.parquet")
    pts = {k: (_geo_coord("gx", k), _geo_coord("gy", k)) for k in keys}
    expect: dict[int, list[int]] = {}
    cross_cell = 0
    for a in keys:
        for b in keys:
            if a == b:
                continue
            d2 = ((pts[a][0] - pts[b][0]) ** 2
                  + (pts[a][1] - pts[b][1]) ** 2)
            if d2 <= GEO_R * GEO_R:
                expect.setdefault(a, []).append(d2)
                if (pts[a][0] // GEO_R, pts[a][1] // GEO_R) != \
                        (pts[b][0] // GEO_R, pts[b][1] // GEO_R):
                    cross_cell += 1
    assert expect and cross_cell > 0  # boundary-straddling pairs exist
    out = {r["c_custkey"]: (r["n_within_r"], r["min_dist2"])
           for r in q_geo_nearby_customers(spark, d).collect()}
    assert out == {k: (len(v), min(v)) for k, v in expect.items()}


# ---------------------------------------------------------------------------
# mkt_target_encoding — leakage exclusion
# ---------------------------------------------------------------------------

def test_target_encoding_excludes_own_row(spark, tmp_path):
    """LOO mean excludes the row's own target: three orders in segment
    A at 100/200/600 cents -> order 1's encoding is (200+600)/2 = 400,
    NOT the naive segment mean 300. A singleton segment yields NULL."""
    from datasketches_rust_spark.queries import q_mkt_target_encoding
    d = str(tmp_path / "t")
    _customer(spark, [(1, "A"), (2, "A"), (3, "A"),
                      (4, "B")]).write.parquet(f"{d}/customer.parquet")
    _orders(spark, [(10, 1, 1.00, D(2024, 1, 1)),
                    (11, 2, 2.00, D(2024, 1, 1)),
                    (12, 3, 6.00, D(2024, 1, 1)),
                    (13, 4, 9.00, D(2024, 1, 1))]).write.parquet(
        f"{d}/orders.parquet")
    out = {r["o_orderkey"]: r for r in
           q_mkt_target_encoding(spark, d).collect()}
    assert out[10]["loo_mean_cents"] == 400.0
    assert out[11]["loo_mean_cents"] == 350.0
    assert out[12]["loo_mean_cents"] == 150.0
    assert out[13]["loo_mean_cents"] is None  # singleton: no leak-free value


# ---------------------------------------------------------------------------
# event_pattern_users — sequence regex semantics
# ---------------------------------------------------------------------------

def test_pattern_adjacency_and_tie_break(spark, tmp_path):
    """v+p requires views IMMEDIATELY before the purchase: 'vvp'
    matches, 'vcp' does not; 'vpvp' matches twice (non-overlapping).
    A ts tie is ordered by event_id — here the tie makes the sequence
    'vp' (match); the reverse id order would read 'pv' (no match)."""
    from datasketches_rust_spark.queries import q_event_pattern_users
    t0 = D(2024, 1, 1, 9, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        # user 1: v v p  -> 1 match
        (t0, 1, "view", 0.0), (t0 + s, 1, "view", 0.0),
        (t0 + 2 * s, 1, "purchase", 0.0),
        # user 2: v c p  -> no match (click breaks adjacency)
        (t0, 2, "view", 0.0), (t0 + s, 2, "click", 0.0),
        (t0 + 2 * s, 2, "purchase", 0.0),
        # user 3: v p v p -> 2 matches
        (t0, 3, "view", 0.0), (t0 + s, 3, "purchase", 0.0),
        (t0 + 2 * s, 3, "view", 0.0), (t0 + 3 * s, 3, "purchase", 0.0),
        # user 4: ts TIE — event_id order is (view, purchase) -> match;
        # rows are appended in that order so ids ascend with the motif
        (t0, 4, "view", 0.0), (t0, 4, "purchase", 0.0),
    ]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["user_id"]: r["n_matches"]
           for r in q_event_pattern_users(spark, d).collect()}
    assert out == {1: 1, 3: 2, 4: 1}  # user 2 absent (no match)


# ---------------------------------------------------------------------------
# tpch_q18_large_orders — strict threshold
# ---------------------------------------------------------------------------

def test_q18_threshold_is_strict(spark, tmp_path):
    """sum(qty) == 250 is EXCLUDED (strict >); 251 is included and
    carries its customer + exact cents."""
    from datasketches_rust_spark.queries import q_tpch_q18_large_orders
    d = str(tmp_path / "t")
    _customer(spark, [(1, "A"), (2, "B")]).write.parquet(
        f"{d}/customer.parquet")
    _orders(spark, [(10, 1, 123.45, D(2024, 1, 1)),
                    (11, 2, 50.00, D(2024, 1, 2))]).write.parquet(
        f"{d}/orders.parquet")
    _lineitem(spark, [(10, 200.0, 1.0, D(2024, 1, 5)),
                      (10, 51.0, 1.0, D(2024, 1, 6)),    # order 10: 251
                      (11, 250.0, 1.0, D(2024, 1, 7))]).write.parquet(
        f"{d}/lineitem.parquet")   # order 11: exactly 250 -> excluded
    rows = q_tpch_q18_large_orders(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["o_orderkey"], r["c_custkey"], r["total_qty"],
            r["totalprice_cents"]) == (10, 1, 251, 12345)


def test_q4_semi_counts_order_once_and_strict_60(spark, tmp_path):
    """An order with TWO late lines counts once (semi join, no
    distinct); a line at exactly orderdate+60 is NOT late (strict >);
    an order with only on-time lines is absent."""
    from datasketches_rust_spark.queries import q_tpch_q4_late_orders
    d = str(tmp_path / "t")
    _orders(spark, [(1, 1, 1.0, D(2024, 1, 1)),     # two late lines
                    (2, 1, 1.0, D(2024, 1, 1)),     # boundary: not late
                    (3, 1, 1.0, D(2024, 1, 1))]).write.parquet(
        f"{d}/orders.parquet")
    _lineitem(spark, [
        (1, 1.0, 1.0, D(2024, 3, 15)), (1, 1.0, 1.0, D(2024, 4, 1)),
        (2, 1.0, 1.0, D(2024, 3, 1)),   # Jan 1 + 60 = Mar 1 exactly
        (3, 1.0, 1.0, D(2024, 1, 20)),
    ]).write.parquet(f"{d}/lineitem.parquet")
    out = {r["o_orderpriority"]: r["n_late_orders"]
           for r in q_tpch_q4_late_orders(spark, d).collect()}
    assert out == {"1-URGENT": 1}   # only order 1, counted once


def test_seasonality_index_two_years(spark, tmp_path):
    """Hand-computed profile: year 1 splits Jan/Feb 75/25, year 2
    50/50 -> Jan avg floor((750000+500000)/2)=625000, Feb 375000;
    min/max carry the per-year extremes."""
    from datasketches_rust_spark.queries import q_monthly_seasonality_index
    d = str(tmp_path / "t")
    _lineitem(spark, [
        (1, 1.0, 3.00, D(2023, 1, 10)), (2, 1.0, 1.00, D(2023, 2, 10)),
        (3, 1.0, 2.00, D(2024, 1, 10)), (4, 1.0, 2.00, D(2024, 2, 10)),
    ]).write.parquet(f"{d}/lineitem.parquet")
    out = {r["mo"]: r for r in
           q_monthly_seasonality_index(spark, d).collect()}
    jan, feb = out[1], out[2]
    assert (jan["n_years"], jan["avg_share_ppm"],
            jan["min_share_ppm"], jan["max_share_ppm"]) == \
        (2, 625000, 500000, 750000)
    assert (feb["avg_share_ppm"], feb["min_share_ppm"],
            feb["max_share_ppm"]) == (375000, 250000, 500000)
