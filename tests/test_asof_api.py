"""Generic as-of join API vs pandas merge_asof (the reference
semantics every time-series store documents)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from workshop3_etl_spark.operators.advanced import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l),
            "lt": rng.integers(0, 1000, n_l).astype("int64"),
            "lv": rng.normal(size=n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_r),
            "rt": rng.integers(0, 1000, n_r).astype("int64"),
            "rv": rng.normal(size=n_r),
        }
    )
    # merge_asof needs unique, sorted ts per key for determinism --
    # dedupe (k, ts) pairs so "latest right row" is unambiguous
    right = right.drop_duplicates(subset=["k", "rt"])
    return left, right


@pytest.mark.parametrize("direction,allow_exact", [
    ("backward", True), ("backward", False), ("forward", True),
])
def test_asof_matches_pandas_merge_asof(spark, frames, direction, allow_exact):
    left_pd, right_pd = frames
    sl = spark.createDataFrame(left_pd)
    sr = spark.createDataFrame(right_pd)
    got = (
        asof_join(
            sl, sr, on="k", left_ts="lt", right_ts="rt",
            payload_cols=["rv"], direction=direction,
            allow_exact=allow_exact,
        )
        .toPandas()
        .sort_values(["k", "lt", "lv"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left_pd.sort_values("lt"),
        right_pd.sort_values("rt"),
        left_on="lt", right_on="rt", by="k",
        direction=direction, allow_exact_matches=allow_exact,
    ).sort_values(["k", "lt", "lv"]).reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["asof_rv"].reset_index(drop=True),
        exp["rv"].rename("asof_rv").reset_index(drop=True),
        check_exact=True,
    )
