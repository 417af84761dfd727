"""Distributed point-in-interval (range) join — the second time-series
join Spark lacks: ``p.ts >= i.start AND p.ts < i.end`` with no equi key
falls back to BroadcastNestedLoopJoin (O(|P| x |I|) comparisons and a
broadcast of a whole side) in vanilla Spark.

The scalable formulation buckets time: every interval explodes into the
fixed-width buckets it overlaps, every point maps to its single bucket,
and the pair candidates come from an ordinary hash equi-join on the
bucket id, filtered by the exact containment predicate. Each matching
(point, interval) pair meets in exactly ONE bucket — the point's — so
no dedup pass is needed. Join cost: one shuffle on bucket id, candidate
volume |P| x (intervals overlapping the point's bucket), tight when the
bucket width matches the typical interval length. Long skewed intervals
fan out into many buckets (rows, not comparisons) and AQE splits hot
buckets like any skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

US_PER_DAY = 86400 * 10**6


def point_interval_join(points: DataFrame, intervals: DataFrame,
                        point_ts: str, start_ts: str, end_ts: str,
                        bucket_us: int = 7 * US_PER_DAY) -> DataFrame:
    """Inner join of every point row to every interval row with
    start <= point < end (timestamps; end exclusive). Returns all
    columns of both inputs. ``bucket_us`` is the bucketing width —
    choose it near the typical interval length."""
    w = F.lit(int(bucket_us))
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))

    # all-integer bucket math: the bucket id IS the aligned window start
    # (ts - pmod(ts, w)) — no division at all, so no double-precision
    # drift past 2^53 us (same discipline as streaming/dedup.py's window
    # explode). pmod keeps pre-epoch (negative) timestamps aligned too.
    pts = points.withColumn("__bucket", p_us - F.pmod(p_us, w))
    last_us = e_us - F.lit(1)
    ivs = (intervals
           # empty/inverted intervals (end <= start) match no point; drop
           # them instead of letting a descending F.sequence explode them
           # into spurious bucket rows
           .where(e_us > s_us)
           .withColumn(
               "__bucket",
               F.explode(F.sequence(s_us - F.pmod(s_us, w),
                                    last_us - F.pmod(last_us, w),
                                    w))))
    joined = pts.join(ivs, "__bucket")
    return (joined.where((F.col(point_ts) >= F.col(start_ts))
                         & (F.col(point_ts) < F.col(end_ts)))
            .drop("__bucket"))
