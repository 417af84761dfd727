"""Semantic pins for the OHLC / outlier / fuzzy / Markov / entropy query
classes on crafted inputs (the sf fixtures prove cross-engine agreement;
these prove the SEMANTICS are the intended ones — tie-breaks, boundary
rules, per-group isolation)."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import Row, functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=v,
             props="{}")
         for i, (ts, u, t, v) in enumerate(rows)])


TS0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def test_ohlc_tie_break_on_event_id(spark, tmp_path):
    """Two events at the SAME timestamp: the lower event_id is the open,
    the higher is the close — the struct-(ts, event_id) ordering, not
    arrival order."""
    from datasketches_rust_spark.queries import q_event_ohlc_daily
    rows = [
        (TS0, 1, "click", 5.00),   # event_id 0 — open (ts tie, lower id)
        (TS0, 2, "click", 9.00),   # event_id 1 — close (ts tie, higher id)
        (TS0 - datetime.timedelta(days=1), 3, "click", 7.00),  # other day
    ]
    d = str(tmp_path / "ev")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {(r["day"].isoformat(), r["event_type"]): r
           for r in q_event_ohlc_daily(spark, d).collect()}
    bar = out[("2024-01-01", "click")]
    assert bar["open_cents"] == 500
    assert bar["close_cents"] == 900
    assert bar["low_cents"] == 500 and bar["high_cents"] == 900
    assert bar["n_events"] == 2 and bar["volume_cents"] == 1400
    # the other day is its own bar
    assert out[("2023-12-31", "click")]["open_cents"] == 700


def test_outlier_counts_boundary_is_strict(spark, tmp_path):
    """|v - mean| must EXCEED 3*std: a value exactly on the boundary is
    not an outlier. Crafted group: values symmetric around 10 with one
    far point."""
    from datasketches_rust_spark.queries import q_event_outlier_counts
    # group a: 20 values of 10.0 and one 1000.0 -> the 1000 is >3 sigma
    rows = [(TS0, i, "a", 10.0) for i in range(20)] + [(TS0, 99, "a", 1000.0)]
    # group b: constant -> std 0, |v-mean|=0 is NOT > 0 -> zero outliers
    rows += [(TS0, i, "b", 5.0) for i in range(5)]
    d = str(tmp_path / "ev")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {r["event_type"]: r for r in
           q_event_outlier_counts(spark, d).collect()}
    assert out["a"]["n_outliers"] == 1 and out["a"]["n_events"] == 21
    assert out["b"]["n_outliers"] == 0 and out["b"]["n_events"] == 5


def test_fuzzy_pairs_blocking_and_threshold(spark, tmp_path):
    """Only same-block (first char) pairs are candidates; distance <= 3
    keeps 'red bolt'~'red bolts' and drops 'red bolt'~'red widget';
    cross-block near-misses are (by design) not found."""
    from datasketches_rust_spark.queries import q_fuzzy_part_name_pairs
    names = ["red bolt", "red bolts", "red widget", "blue bolt"]
    rows = [Row(p_partkey=i, p_name=n, p_brand="b", p_type="t",
                p_size=1, p_retailprice=1.0)
            for i, n in enumerate(names + ["red bolt"])]  # dup count=2
    d = str(tmp_path / "parts")
    spark.createDataFrame(rows).write.parquet(f"{d}/part.parquet")
    out = {(r["name_a"], r["name_b"]): r
           for r in q_fuzzy_part_name_pairs(spark, d).collect()}
    assert ("red bolt", "red bolts") in out
    assert out[("red bolt", "red bolts")]["dist"] == 1
    assert out[("red bolt", "red bolts")]["n_a"] == 2  # aggregate count
    assert ("red bolt", "red widget") not in out       # dist > 3
    assert ("blue bolt", "red bolt") not in out        # different block


def test_markov_transitions_per_user_and_ordered(spark, tmp_path):
    """Transitions never cross users, and ordering is (ts, event_id) —
    a ts tie resolves by event_id."""
    from datasketches_rust_spark.queries import q_event_markov_transitions
    t = lambda s: TS0 + datetime.timedelta(seconds=s)
    rows = [
        (t(0), 1, "view", 1.0),     # id 0
        (t(1), 1, "click", 1.0),    # id 1   view->click
        (t(1), 1, "purchase", 1.0), # id 2   ts tie: click->purchase by id
        (t(2), 2, "signup", 1.0),   # id 3   user 2: single event, no pair
    ]
    d = str(tmp_path / "ev")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {(r["prev_type"], r["next_type"]): r["n_transitions"]
           for r in q_event_markov_transitions(spark, d).collect()}
    assert out == {("view", "click"): 1, ("click", "purchase"): 1}


def test_char_entropy_known_values(spark, tmp_path):
    """'aabb' -> ln 2; single-letter docs -> 0; letter-free docs are
    dropped; non-letters don't count."""
    from datasketches_rust_spark.queries import q_doc_char_entropy
    rows = [
        Row(doc_id=1, text="aabb", lang="en", source="s", n_chars=4),
        Row(doc_id=2, text="zzzz!!", lang="en", source="s", n_chars=6),
        Row(doc_id=3, text="123 !?", lang="en", source="s", n_chars=6),
        Row(doc_id=4, text="AaBb", lang="en", source="s", n_chars=4),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in q_doc_char_entropy(spark, d).collect()}
    assert 3 not in out                      # no letters -> dropped
    assert out[1]["n_letters"] == 4
    assert out[1]["entropy_nats"] == pytest.approx(math.log(2), abs=1e-12)
    assert out[2]["n_letters"] == 4          # '!' doesn't count
    assert out[2]["entropy_nats"] == pytest.approx(0.0, abs=1e-12)
    assert out[4]["entropy_nats"] == pytest.approx(math.log(2), abs=1e-12)
