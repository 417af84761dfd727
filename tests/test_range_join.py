"""point_interval_join vs brute force on randomized timestamps, with
interval lengths straddling the bucket width (0.5x to 3x) so intervals
span 1..4 buckets, plus the no-BNLJ plan guarantee."""

import io
import re
from contextlib import redirect_stdout

import numpy as np
import pandas as pd

from datasketches_rust_spark.operators.range_join import (
    point_interval_join)

US = 10**6


def _frames():
    rng = np.random.default_rng(11)
    pts = pd.DataFrame({
        "pid": np.arange(300),
        "pts": rng.integers(0, 5000, 300).astype("datetime64[s]"),
    })
    start = rng.integers(0, 4800, 80)
    length = rng.integers(30, 360, 80)  # 0.5x..3x the 120 s bucket
    ivs = pd.DataFrame({
        "iid": np.arange(80),
        "s": start.astype("datetime64[s]"),
        "e": (start + length).astype("datetime64[s]"),
    })
    return pts, ivs


def test_point_interval_join_matches_bruteforce(spark):
    pts, ivs = _frames()
    got = point_interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "pts", "s", "e", bucket_us=120 * US)
    got_pairs = {(r["pid"], r["iid"]) for r in got.collect()}

    m = pts.merge(ivs, how="cross")
    want = m[(m["pts"] >= m["s"]) & (m["pts"] < m["e"])]
    want_pairs = set(zip(want["pid"], want["iid"]))

    assert got_pairs == want_pairs
    assert len(want_pairs) > 100  # fixture is not vacuous
    # no duplicate pairs: each pair meets in exactly one bucket
    assert got.count() == len(got_pairs)


def test_point_interval_join_no_nested_loop(spark):
    pts, ivs = _frames()
    out = point_interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "pts", "s", "e", bucket_us=120 * US)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
                     plan)


def test_inverted_and_empty_intervals_match_nothing(spark):
    """end <= start must yield zero matches — and must NOT explode into
    spurious bucket rows via a descending F.sequence (the pre-filter
    guard). Mixed with one valid interval to prove the filter is
    per-row."""
    pts = pd.DataFrame({"pid": [0, 1],
                        "pts": np.array([100, 500],
                                        dtype="datetime64[s]")})
    ivs = pd.DataFrame({
        "iid": [0, 1, 2],
        "s": np.array([400, 1000, 90], dtype="datetime64[s]"),
        "e": np.array([600, 200, 90], dtype="datetime64[s]"),
    })  # iid=1 inverted, iid=2 empty, iid=0 valid
    got = point_interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "pts", "s", "e", bucket_us=120 * US)
    assert {(r["pid"], r["iid"]) for r in got.collect()} == {(1, 0)}
