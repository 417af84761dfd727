"""Skew-aware (salted) equi-join — the explicit remedy for joins whose
key distribution is power-law, completing the skew toolbox next to
AQE's runtime split and operators/lsh.py's hot-bucket star degrade.

Why AQE isn't enough: adaptive skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in config.py) repairs
oversized *partitions* of a sort-merge join after a shuffle has already
happened, and only for join strategies it can rewrite. It does nothing
for the canonical crawl-scale case where one key (an empty caption, a
default user id, a boilerplate page) owns a fixed *fraction* of a
10^12-row fact table: every row of that key still funnels through the
exchange into one straggler task before AQE can split it, and a
shuffle-hash join build side for that key may not fit at all.

The salted formulation routes around the exchange instead of repairing
it after the fact:

  1. *Detect* — one per-key count aggregate over the fact side. Counts
     are skew-immune by construction (map-side partial aggregation
     collapses each map task's rows to one row per key before any
     exchange), and the hot list it yields is tiny by construction: at
     most |fact| / hot_threshold keys can exceed hot_threshold rows.
  2. *Route* — both inputs are tagged hot/cold via a broadcast join
     against that hot list (the same broadcast-hot-list discipline as
     operators/lsh.py); no isin() literal explosion, no second scan.
  3. *Hot path* — fact rows gain a deterministic salt in [0, salts)
     (xxhash64 of the row's columns — content-derived, so a retried
     task re-emits identical salts and the join stays deterministic);
     the other side replicates each hot-key row to ALL salts via one
     explode. The join key becomes (key, salt): each hot key now spreads
     over `salts` reducer tasks instead of one.
  4. *Cold path* — an ordinary equi-join (Catalyst still broadcasts the
     dim side when it is small); the two paths union.

Cost model at 100 TB: the dim side pays `salts` x replication on hot
KEYS only (a handful of rows), the fact side pays zero extra bytes, and
the straggler task disappears. `salts` should be sized near the ratio
(hot-key rows) / (healthy partition rows) — 8-64 covers most skews.

Join-type contract: `inner` and `left` (left_outer) only. A right/full
outer join is semantically broken under replication — an unmatched
replicated dim row would surface `salts` times. Left rows carry exactly
one salt each, so inner/left semantics are preserved exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hot_keys", "salted_join"]


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys of ``df`` appearing on more than ``threshold`` rows, as a
    one-column DataFrame named ``key``. One skew-immune aggregate:
    map-side combine collapses the scan to |distinct keys| rows, so the
    count itself never suffers the skew it is measuring."""
    return (df.groupBy(key).agg(F.count("*").alias("__n"))
            .where(F.col("__n") > int(threshold))
            .select(key))


def _tag_split(df: DataFrame, key: str, hot_list: DataFrame):
    """(hot_rows, cold_rows) of df via one broadcast anti/semi pair —
    expressed as a single left join on the broadcast hot list so the
    input is scanned once per consumer, not re-filtered twice."""
    hk = F.broadcast(hot_list.select(
        F.col(hot_list.columns[0]).alias("__hk")))
    tagged = df.join(hk, F.col(key) == F.col("__hk"), "left")
    hot = tagged.where(F.col("__hk").isNotNull()).drop("__hk")
    cold = tagged.where(F.col("__hk").isNull()).drop("__hk")
    return hot, cold


def salted_join(left: DataFrame, right: DataFrame, left_on: str,
                right_on: str | None = None, how: str = "inner",
                salts: int = 16, hot_threshold: int = 1_000_000,
                hot: DataFrame | None = None) -> DataFrame:
    """Equi-join ``left`` (the big/skewed fact side) to ``right`` on
    ``left_on == right_on``, with keys hotter than ``hot_threshold``
    fact rows spread over ``salts`` reducer tasks. Returns all columns
    of both inputs (names must be disjoint), exactly like
    ``left.join(right, left[left_on] == right[right_on], how)``.

    ``hot`` overrides detection with a precomputed one-column hot-key
    DataFrame (e.g. reused across several joins of the same fact table,
    or loaded from a previous run's profile).
    """
    right_on = right_on or left_on
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicating the right side breaks right/full-outer "
            "semantics (unmatched right rows would appear `salts` times)")
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both sides "
                         f"have: {sorted(overlap)}")
    if hot is None:
        hot = hot_keys(left, left_on, hot_threshold)

    l_hot, l_cold = _tag_split(left, left_on, hot)
    r_hot, r_cold = _tag_split(right, right_on, hot)

    # content-derived salt: deterministic under task retry (a rand()
    # salt re-rolls on retry — harmless for inner-join results but it
    # de-determinizes partition placement and any downstream sampling)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(salts))
    lh = l_hot.withColumn("__lsalt", salt)
    rh = r_hot.withColumn(
        "__rsalt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))
                             .cast("array<long>")))
    hot_joined = (lh.join(rh, (F.col(left_on) == F.col(right_on))
                          & (F.col("__lsalt") == F.col("__rsalt")), how)
                  .drop("__lsalt", "__rsalt"))
    cold_joined = l_cold.join(
        r_cold, F.col(left_on) == F.col(right_on), how)

    out_cols = list(left.columns) + list(right.columns)
    return (hot_joined.select(*out_cols)
            .unionByName(cold_joined.select(*out_cols)))
