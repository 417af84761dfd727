"""Semantic pins for the SCD Type 2 pair (queries.q_scd2_user_versions /
q_scd2_daily_snapshot) on crafted changelogs: the run-collapse rule,
tie-breaks, half-open interval bounds, and the point-in-time no-match
edge. The sf fixtures prove cross-engine agreement; these prove the
semantics are the intended SCD2 ones."""

from __future__ import annotations

import datetime

from pyspark.sql import Row


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=1.0,
             props="{}")
         for i, (ts, u, t) in enumerate(rows)])


T = lambda d, h=0: datetime.datetime(2024, 1, d, h, 0, 0)  # noqa: E731


def _us(dt):
    return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp()
               * 1_000_000)


def test_scd2_run_collapse_and_intervals(spark, tmp_path):
    """Consecutive identical statuses extend the open version (no new
    row); a re-appearing status after a change IS a new version; the
    last version is open-ended and current."""
    from datasketches_rust_spark.queries import q_scd2_user_versions
    rows = [(T(1), 1, "A"), (T(2), 1, "A"),   # A..A collapses
            (T(3), 1, "B"),                   # change -> v2
            (T(4), 1, "A")]                   # A again -> v3 (new version)
    d = str(tmp_path / "ev")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    vs = sorted(q_scd2_user_versions(spark, d).collect(),
                key=lambda r: r["version_n"])
    assert [(v["status"], v["version_n"], v["is_current"]) for v in vs] \
        == [("A", 1, False), ("B", 2, False), ("A", 3, True)]
    # half-open tiling: each valid_to equals the next valid_from
    assert vs[0]["valid_from_us"] == _us(T(1))
    assert vs[0]["valid_to_us"] == vs[1]["valid_from_us"] == _us(T(3))
    assert vs[1]["valid_to_us"] == vs[2]["valid_from_us"] == _us(T(4))
    assert vs[2]["valid_to_us"] is None


def test_scd2_ts_tie_breaks_by_event_id(spark, tmp_path):
    """Two change events at the SAME timestamp order by event_id: the
    later id wins the open version, the earlier becomes a zero-length
    closed version (never nondeterministic)."""
    from datasketches_rust_spark.queries import q_scd2_user_versions
    rows = [(T(1), 7, "X"), (T(2), 7, "Y"), (T(2), 7, "Z")]
    d = str(tmp_path / "ev")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    vs = sorted(q_scd2_user_versions(spark, d).collect(),
                key=lambda r: r["version_n"])
    assert [v["status"] for v in vs] == ["X", "Y", "Z"]
    y = vs[1]
    assert y["valid_from_us"] == y["valid_to_us"] == _us(T(2))
    assert vs[2]["is_current"]


def test_scd2_daily_snapshot_pit_edges(spark, tmp_path):
    """End-of-day probes: a mid-day change means the day reports the
    LAST status of that day; days before a user's first version report
    NULL; users are isolated."""
    from datasketches_rust_spark.queries import q_scd2_daily_snapshot
    rows = [
        (T(1), 1, "A"),
        (T(2, h=6), 1, "B"), (T(2, h=18), 1, "C"),  # two changes on day 2
        (T(3), 2, "Z"),  # user 2 appears only on day 3
    ]
    d = str(tmp_path / "ev")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {(r["user_id"], r["day"].isoformat()):
           (r["status"], r["version_n"])
           for r in q_scd2_daily_snapshot(spark, d).collect()}
    # grid is |users| x |days| = 2 x 3
    assert len(out) == 6
    assert out[(1, "2024-01-01")] == ("A", 1)
    assert out[(1, "2024-01-02")] == ("C", 3)   # end-of-day, not mid-day B
    assert out[(1, "2024-01-03")] == ("C", 3)   # carried forward
    assert out[(2, "2024-01-01")] == (None, None)  # before first version
    assert out[(2, "2024-01-02")] == (None, None)
    assert out[(2, "2024-01-03")] == ("Z", 1)
