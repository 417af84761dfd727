"""event_mad_by_type — the histogram-walk median/MAD pinned against an
independent numpy recomputation on crafted values (the DuckDB gate only
proves both engines run the same walk; this proves the walk computes
the statistic it claims: lower-median convention on even counts, MAD
around that median)."""

import datetime as dt

import numpy as np

from datasketches_rust_spark.queries import q_event_mad_by_type


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def _expected(vals):
    med = _lower_median(vals)
    mad = _lower_median([abs(v - med) for v in vals])
    return med, mad


def test_matches_numpy_style_recomputation(spark, tmp_path):
    ts = dt.datetime(2024, 1, 1)
    # type A: odd count incl. an extreme outlier the median must ignore;
    # type B: even count — the LOWER median, not the interpolated one
    a = [1.00, 2.00, 3.00, 4.00, 1000.00]
    b = [10.00, 20.00, 30.00, 40.00]
    rows = ([(i, ts, 1, "A", v, "{}") for i, v in enumerate(a)]
            + [(100 + i, ts, 1, "B", v, "{}") for i, v in enumerate(b)])
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {r.event_type: r for r in
           q_event_mad_by_type(spark, str(tmp_path)).collect()}

    for name, vals in (("A", a), ("B", b)):
        cents = [round(v * 100) for v in vals]
        med, mad = _expected(cents)
        assert got[name].n == len(vals)
        assert got[name].med_cents == med, name
        assert got[name].mad_cents == mad, name
    # cross-check the helper against numpy on the odd-count type, where
    # the conventions coincide
    assert _lower_median([round(v * 100) for v in a]) == int(
        np.median([round(v * 100) for v in a]))
