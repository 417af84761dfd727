"""asof_join vs pandas merge_asof (backward, inclusive) on randomized
keyed time series, plus edge semantics: exact-timestamp match, no prior
right row, right-side same-timestamp duplicates."""

import numpy as np
import pandas as pd
import pytest

from datasketches_rust_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    left = pd.DataFrame({
        "k": rng.integers(0, 8, n_l),
        "ts": rng.integers(0, 1000, n_l).astype("datetime64[s]"),
        "lid": np.arange(n_l),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "ts": rng.integers(0, 1000, n_r).astype("datetime64[s]"),
        "v": rng.normal(size=n_r).round(6),
    })
    # force same-timestamp duplicates on the right and exact-ts matches
    right = pd.concat([right, right.iloc[:10].assign(v=99.0)],
                      ignore_index=True)
    left.loc[:5, ["k", "ts"]] = right.loc[:5, ["k", "ts"]].values
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark, frames):
    left, right = frames
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on=["k"], ts_col="ts", value_cols=["v"]).toPandas()
    got = got.set_index("lid")["v_asof"].sort_index()

    # oracle: dedupe right per (k, ts) by max(v) — the operator's
    # documented tie rule — then backward inclusive merge_asof per key
    r = right.groupby(["k", "ts"], as_index=False)["v"].max()
    want = pd.merge_asof(
        left.sort_values(["ts", "lid"]), r.sort_values("ts"),
        on="ts", by="k", direction="backward", allow_exact_matches=True)
    want = want.set_index("lid")["v"].sort_index()

    pd.testing.assert_series_equal(got, want, check_names=False)
    # the fixture exercises all three edges
    assert want.isna().any()          # some rows have no prior right row
    assert (want == 99.0).any()       # max-dedup rule visible in output


def test_asof_join_single_exchange(spark, frames):
    """The whole as-of join must cost ONE shuffle (the union's hash
    exchange on the key) — no range join, no second exchange."""
    import io
    import re
    from contextlib import redirect_stdout
    left, right = frames
    out = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on=["k"], ts_col="ts", value_cols=["v"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue().split("== Initial Plan ==")[0]
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
