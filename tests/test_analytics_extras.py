"""The four r3 analytics classes pinned against independent
recomputations on crafted fixtures (the DuckDB gate proves both engines
run the same formula; these prove the formula computes the statistic it
claims): A/B hash assignment + Welch t, trailing-7d rolling distinct,
conjunctive search AND-semantics + tie-break, and basket pair
support/lift."""

import datetime as dt
import hashlib
import math

from datasketches_rust_spark.queries import (
    q_ab_experiment_report,
    q_market_basket_pairs,
    q_search_documents,
    q_wau_daily,
)

TS = dt.datetime(2024, 1, 1)


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))


def _arm(user_id: int) -> int:
    """The query's contract: first 8 md5 hex chars of str(user_id)."""
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16) % 2


def test_ab_assignment_and_welch_t(spark, tmp_path):
    # users 1..8; revenue = 100*user cents so arm means differ
    rows = [(u, TS, u, "purchase", float(u), "{}") for u in range(1, 9)]
    # non-purchase value must NOT count as revenue
    rows.append((99, TS, 1, "view", 1000.0, "{}"))
    _events(spark, tmp_path, rows)
    got = q_ab_experiment_report(spark, str(tmp_path)).collect()[0]

    by_arm = {0: [], 1: []}
    for u in range(1, 9):
        by_arm[_arm(u)].append(u * 100)  # cents
    n0, n1 = len(by_arm[0]), len(by_arm[1])
    assert got.n_control == n0 and got.n_treatment == n1
    assert int(got.rev_cents_control) == sum(by_arm[0])
    assert int(got.rev_cents_treatment) == sum(by_arm[1])

    def mv(vals):
        n = len(vals)
        m = sum(vals) / n
        v = (n * sum(x * x for x in vals) - sum(vals) ** 2) \
            / (n * n * (n - 1))
        return m, v

    m0, v0 = mv(by_arm[0])
    m1, v1 = mv(by_arm[1])
    t = (m1 - m0) / math.sqrt(v1 + v0)
    assert abs(got.mean_diff_cents - (m1 - m0)) < 1e-9
    assert abs(got.welch_t - t) < 1e-9


def test_wau_trailing_window_bruteforce(spark, tmp_path):
    # user 1 active day 0 and day 7 (a gap the 7-day window must NOT
    # bridge: day-6 window [0..6] has u1 only via day 0); user 2 active
    # days 2,3 (duplicate activity counted once per window)
    def ev(i, day, user):
        return (i, TS + dt.timedelta(days=day, hours=1), user,
                "click", 1.0, "{}")

    rows = [ev(1, 0, 1), ev(2, 7, 1), ev(3, 2, 2), ev(4, 2, 2),
            ev(5, 3, 2)]
    _events(spark, tmp_path, rows)
    got = {r.day: r.wau for r in q_wau_daily(spark, str(tmp_path))
           .collect()}

    active = {1: {0, 7}, 2: {2, 3}}
    observed_days = {0, 2, 3, 7}
    base = dt.date(2024, 1, 1)
    expect = {}
    for d in observed_days:
        expect[base + dt.timedelta(days=d)] = sum(
            1 for u, ds in active.items()
            if any(d - 6 <= a <= d for a in ds))
    assert got == expect


def test_search_and_semantics_and_tiebreak(spark, tmp_path):
    docs = [
        (1, "hash join filter", "en", "a", 1),        # all 3, score 3
        (2, "hash hash join filter filter", "en", "a", 1),  # score 5
        (3, "hash join", "en", "a", 1),               # missing 'filter'
        (4, "filter hash join", "en", "a", 1),        # score 3 tie w/ 1
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = q_search_documents(spark, str(tmp_path)).collect()
    # doc 3 excluded (AND); ties at score 3 break by doc_id ascending
    assert [(r.doc_id, r.score) for r in got] == [(2, 5), (1, 3), (4, 3)]


def test_basket_support_floor_and_lift(spark, tmp_path):
    # baskets: {1,2,3}, {1,2}, {1,2}, {3} -> pair (1,2) support 3,
    # (1,3) and (2,3) support 1 (dropped by the floor)
    li = []
    for ok, parts in [(10, [1, 2, 3]), (11, [1, 2]), (12, [1, 2]),
                      (13, [3])]:
        for i, p in enumerate(parts):
            li.append((ok, p, 1, i + 1, 1.0, 1.0, 0.0, 0.0,
                       "N", "O", TS))
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice "
            "double, l_discount double, l_tax double, l_returnflag "
            "string, l_linestatus string, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = q_market_basket_pairs(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.pa, r.pb, r.support) == (1, 2, 3)
    # marginals: part1 in 3 baskets, part2 in 3; n_baskets = 4
    assert (r.ca, r.cb) == (3, 3)
    assert abs(r.lift - (3 * 4) / (3 * 3)) < 1e-12


def test_abc_class_boundaries(spark, tmp_path):
    # revenues 50, 30, 15, 5 (cents x100): cum shares 50%, 80%, 95%,
    # 100% -> A, A (exactly 80 is A), B (exactly 95 is B), C
    li = []
    for i, (pk, price) in enumerate([(1, 50.0), (2, 30.0), (3, 15.0),
                                     (4, 5.0)]):
        li.append((100 + i, pk, 1, 1, 1.0, price, 0.0, 0.0, "N", "O",
                   TS))
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice "
            "double, l_discount double, l_tax double, l_returnflag "
            "string, l_linestatus string, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from datasketches_rust_spark.queries import q_abc_parts_by_revenue
    got = {r.l_partkey: (r.cum_cents, r.abc_class) for r in
           q_abc_parts_by_revenue(spark, str(tmp_path)).collect()}
    assert got == {1: (5000, "A"), 2: (8000, "A"), 3: (9500, "B"),
                   4: (10000, "C")}


def test_search_scan_and_index_forms_agree(spark, tmp_path):
    docs = [
        (1, "hash join filter", "en", "a", 1),
        (2, "hash hash join filter filter", "en", "a", 1),
        (3, "hash join", "en", "a", 1),
        (4, "filter hash join", "en", "a", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from datasketches_rust_spark.queries import q_search_documents_indexed
    scan = [(r.doc_id, r.score) for r in
            q_search_documents(spark, str(tmp_path)).collect()]
    idx = [(r.doc_id, r.score) for r in
           q_search_documents_indexed(spark, str(tmp_path)).collect()]
    assert scan == [(2, 5), (1, 3), (4, 3)]
    assert idx == scan


def test_cumulative_users_staggered(spark, tmp_path):
    # u1 joins day0, u2 day0, u3 day2 (no first-appearance on day1:
    # that day must be ABSENT, not zero); u1 re-appearing day2 must
    # not recount
    def ev(i, day, user):
        return (i, TS + dt.timedelta(days=day), user, "click", 1.0,
                "{}")

    _events(spark, tmp_path, [ev(1, 0, 1), ev(2, 0, 2), ev(3, 2, 3),
                              ev(4, 2, 1), ev(5, 1, 2)])
    from datasketches_rust_spark.queries import q_cumulative_users_by_day
    got = [(r.day, r.new_users, r.cum_users) for r in
           q_cumulative_users_by_day(spark, str(tmp_path))
           .orderBy("day").collect()]
    base = dt.date(2024, 1, 1)
    assert got == [(base, 2, 2),
                   (base + dt.timedelta(days=2), 1, 3)]


def test_clamped_balance_fold(spark, tmp_path):
    # u1: +500 (signup), -300, -300 (clamped: 200 deficit -> 0),
    #     +100, -50 -> final 50, clamps 1
    # order ties: two events at the SAME ts resolve by event_id
    def ev(i, sec, user, typ, val):
        return (i, TS + dt.timedelta(seconds=sec), user, typ, val, "{}")

    _events(spark, tmp_path, [
        ev(1, 0, 1, "signup", 5.0), ev(2, 1, 1, "purchase", 3.0),
        ev(3, 2, 1, "purchase", 3.0), ev(4, 3, 1, "signup", 1.0),
        ev(5, 4, 1, "purchase", 0.5),
        # u2: debit FIRST (clamp at rn=1), then credit
        ev(6, 0, 2, "purchase", 2.0), ev(7, 1, 2, "signup", 4.0),
        # ts tie on u3: event_id order decides (debit at id 8 BEFORE
        # credit at id 9 -> clamp; reversed order would not clamp)
        ev(8, 0, 3, "purchase", 1.0), ev(9, 0, 3, "signup", 1.0),
    ])
    from datasketches_rust_spark.queries import q_user_balance_clamped
    got = {r.user_id: (r.n_events, r.final_balance_cents, r.n_clamps)
           for r in q_user_balance_clamped(spark, str(tmp_path))
           .collect()}
    assert got == {1: (5, 50, 1), 2: (2, 400, 1), 3: (2, 100, 1)}


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))


def test_holt_linear_constant_and_trend(spark, tmp_path):
    """Holt semantics on crafted series (r5): a CONSTANT series keeps
    level == x and trend == 0 exactly (0.1*(l-l_prev)=0 at every
    step); a LINEAR ramp's trend converges toward the slope and the
    one-step forecast is level + trend."""
    from datasketches_rust_spark.queries import q_holt_linear_daily
    rows = [(i, 1, "O", 100.0, dt.datetime(2024, 1, 1 + i), "1-URGENT")
            for i in range(10)]
    _orders(spark, tmp_path, rows)
    got = {r["day"]: r for r in
           q_holt_linear_daily(spark, str(tmp_path)).collect()}
    for r in got.values():
        assert abs(r.level - 10000.0) < 1e-9
        assert abs(r.trend) < 1e-9
        assert abs(r.forecast_next - 10000.0) < 1e-9

    # linear ramp: 100, 200, ... -> slope 100/day = 10000 cents
    rows = [(i, 1, "O", 100.0 * (i + 1),
             dt.datetime(2024, 2, 1) + dt.timedelta(days=i),
             "1-URGENT") for i in range(25)]
    import shutil
    shutil.rmtree(tmp_path / "orders.parquet")
    _orders(spark, tmp_path, rows)
    out = sorted(q_holt_linear_daily(spark, str(tmp_path)).collect(),
                 key=lambda r: r["day"])
    last = out[-1]
    # trend approaches the slope from below; after 25 steps it is
    # well inside (0, slope]
    assert 0.5 * 10000 < last.trend <= 10000 + 1e-6
    assert abs(last.forecast_next - (last.level + last.trend)) < 1e-9


def test_revenue_autocorr_perfect_weekly(spark, tmp_path):
    """A strictly 7-periodic series has lag-7 autocorrelation exactly
    1.0 and (for this alternating fixture) negative lag-1
    correlation; the decimal-moment formula must land 1.0 within
    float epsilon, not approximately."""
    from datasketches_rust_spark.queries import q_revenue_autocorr
    week = [100.0, 900.0, 100.0, 900.0, 100.0, 900.0, 500.0]
    rows = [(i, 1, "O", week[i % 7],
             dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
             "1-URGENT") for i in range(70)]
    _orders(spark, tmp_path, rows)
    got = {r.lag: r for r in
           q_revenue_autocorr(spark, str(tmp_path)).collect()}
    assert got[7].n == 63
    assert abs(got[7].autocorr - 1.0) < 1e-12
    assert got[1].autocorr < 0  # alternating neighbors anti-correlate


def test_threshold_sensitivity_exact_dup_bucket(spark, tmp_path):
    """Integer Jaccard banding edge (r5): an EXACT duplicate pair
    (jaccard 1.0) lands in bucket 20 — 20*n div n — not 19 (a float
    jaccard*20 floor can land 19 at representation boundaries; the
    integer form cannot). A near-dup pair in [0.80, 0.85) lands in
    bucket 16."""
    from datasketches_rust_spark.queries import (
        q_dedup_threshold_sensitivity)
    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the band plays on " * 4)
    # docs 1/2: exact dups; docs 3/4: one long shared prefix + a
    # distinct tail (high-but-below-1.0 jaccard)
    tail = " completely different ending segment follows here now"
    rows = [(1, base, "a", len(base), "en"),
            (2, base, "b", len(base), "en"),
            (3, base + tail, "a", len(base + tail), "en"),
            (4, base + tail + " x", "b", len(base + tail) + 2, "en")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, "
              "n_chars long, lang string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.jaccard_bucket: r for r in
           q_dedup_threshold_sensitivity(spark, str(tmp_path))
           .collect()}
    assert 20 in got and got[20].n_pairs >= 1
    # every bucket is within the >=0.8 pipeline floor
    assert all(16 <= b <= 20 for b in got)
