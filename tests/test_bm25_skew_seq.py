"""Semantic pins for the BM25 / skew-profiler / sequence-dataset
classes on crafted inputs."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

D = datetime.datetime


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s",
             n_chars=len(t)) for i, t in enumerate(rows)])


def _lineitem(spark, rows):
    return spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=p, l_suppkey=s, l_linenumber=i,
             l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0,
             l_tax=0.0, l_returnflag="N", l_linestatus="O",
             l_shipdate=D(2024, 1, 1)) for i, (o, p, s) in enumerate(rows)])


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=0.0,
             props="{}")
         for i, (ts, u, t) in enumerate(rows)])


# ---------------------------------------------------------------------------
# bm25_search_scores
# ---------------------------------------------------------------------------

def test_bm25_ordering_properties(spark, tmp_path):
    """Doc matching two terms outranks an equal-length doc matching
    one; of two docs with identical tf, the LONGER scores lower
    (length normalization); docs matching no term are absent."""
    from datasketches_rust_spark.queries import q_bm25_search_scores
    pad = "x y z w"
    docs = [
        "hash join " + pad,          # 0: two terms
        "hash hash " + pad,          # 1: one term twice (tf saturation)
        "hash a b " + pad,           # 2: one term, short
        "hash a b " + pad + " extra words making this much longer doc",
        "nothing relevant here",     # 4: excluded
    ]
    d = str(tmp_path / "t")
    _docs(spark, docs).write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in q_bm25_search_scores(spark, d).collect()}
    assert 4 not in out and len(out) == 4
    assert out[0]["bm25"] > out[2]["bm25"]      # two terms beat one
    assert out[2]["bm25"] > out[3]["bm25"]      # shorter beats longer
    # tf saturation: doubling tf must help, but by LESS than 2x
    assert out[2]["bm25"] < out[1]["bm25"] < 2 * out[2]["bm25"]


# ---------------------------------------------------------------------------
# join_key_skew_report
# ---------------------------------------------------------------------------

def test_skew_report_buckets_and_shares(spark, tmp_path):
    """A crafted skewed suppkey — one hot key with 1000 rows, 24 keys
    with 1 row — must split into bucket 0 (singletons) and bucket 9
    (2^9 <= 1000 < 2^10), with exact integer ppm shares."""
    from datasketches_rust_spark.queries import q_join_key_skew_report
    rows = [(i, i, 777) for i in range(1000)]          # hot suppkey 777
    rows += [(1000 + i, 1000 + i, i) for i in range(24)]   # singletons
    d = str(tmp_path / "t")
    _lineitem(spark, rows).write.parquet(f"{d}/lineitem.parquet")
    out = {(r["key_col"], r["log2_bucket"]): r
           for r in q_join_key_skew_report(spark, d).collect()}
    hot = out[("l_suppkey", 9)]
    assert (hot["n_keys"], hot["n_rows"], hot["max_rows_per_key"]) == \
        (1, 1000, 1000)
    assert hot["share_ppm"] == 1000 * 1_000_000 // 1024
    single = out[("l_suppkey", 0)]
    assert (single["n_keys"], single["n_rows"],
            single["min_rows_per_key"]) == (24, 24, 1)
    # orderkey/partkey are all-singleton: exactly one bucket each
    assert out[("l_orderkey", 0)]["n_keys"] == 1024
    assert ("l_orderkey", 9) not in out


# ---------------------------------------------------------------------------
# next_event_training_pairs
# ---------------------------------------------------------------------------

def test_next_event_context_window(spark, tmp_path):
    """First NEXT_EVENT_CTX events per user produce no row (no padded
    prefixes); the context is the 3 PRECEDING types in (ts, event_id)
    order; contexts never cross users."""
    from datasketches_rust_spark.queries import q_next_event_training_pairs
    t0 = D(2024, 1, 1, 9, 0)
    s = datetime.timedelta(seconds=1)
    rows = [(t0 + i * s, 1, t) for i, t in enumerate(
        ["view", "click", "view", "purchase", "error"])]
    rows += [(t0 + i * s, 2, t) for i, t in enumerate(
        ["signup", "view", "click", "view"])]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = q_next_event_training_pairs(spark, d).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: 5 events -> 2 rows; user 2: 4 events -> 1 row
    assert {u: len(v) for u, v in by_user.items()} == {1: 2, 2: 1}
    u1 = sorted(by_user[1], key=lambda r: r["event_id"])
    assert (u1[0]["ctx3"], u1[0]["ctx2"], u1[0]["ctx1"],
            u1[0]["label"]) == ("view", "click", "view", "purchase")
    assert (u1[1]["ctx3"], u1[1]["ctx2"], u1[1]["ctx1"],
            u1[1]["label"]) == ("click", "view", "purchase", "error")
    u2 = by_user[2][0]
    # user 2's context is strictly its own history, not user 1's
    assert (u2["ctx3"], u2["ctx2"], u2["ctx1"], u2["label"]) == \
        ("signup", "view", "click", "view")


def test_next_event_tie_broken_by_event_id(spark, tmp_path):
    """Two events at the same ts order by event_id in the context."""
    from datasketches_rust_spark.queries import q_next_event_training_pairs
    t0 = D(2024, 1, 1, 9, 0)
    s = datetime.timedelta(seconds=1)
    # event_ids ascend with list order: the two tied events keep id order
    rows = [(t0, 1, "signup"), (t0, 1, "view"),
            (t0 + s, 1, "click"), (t0 + 2 * s, 1, "purchase")]
    d = str(tmp_path / "t")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = q_next_event_training_pairs(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ctx3"], r["ctx2"], r["ctx1"], r["label"]) == \
        ("signup", "view", "click", "purchase")
