"""Property test: asof_join (union-merge, single-shuffle) agrees with
pandas.merge_asof on randomized inputs — the same oracle idea the
reference used for its SQL↔TS equivalence corpus (00117:5-7)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from japanstockdatapipeline_spark.operators.asof import asof_join


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    n_keys = 4
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, 60),
            "t": rng.integers(0, 1000, 60),
        }
    ).drop_duplicates(["k", "t"])
    left["lid"] = np.arange(len(left))
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, 40),
            "t": rng.integers(0, 1000, 40),
            "v": rng.normal(size=40).round(6),
        }
    ).drop_duplicates(["k", "t"])

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = (
        asof_join(sl, sr, on=["k"], ts="t", value_cols=["v"])
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="k",
        direction="backward",  # latest right.t <= left.t, inclusive
    ).sort_values("lid").reset_index(drop=True)

    pd.testing.assert_series_equal(
        got["v"], exp["v"], check_names=False, check_exact=True
    )
