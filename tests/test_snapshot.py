"""Grouped-map technical snapshot: one row per key, numpy parity for
the window pieces."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from japanstockdatapipeline_spark.operators.snapshot import technical_snapshot


@pytest.fixture(scope="module")
def snap(spark):
    rng = np.random.default_rng(42)
    rows = []
    for key in range(3):
        v = np.cumsum(rng.normal(0, 1, 250)) + 100
        rows += [(key, i, float(v[i])) for i in range(250)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = technical_snapshot(df, "k", "t", "v").collect()
    data = {r["key"]: r.asDict() for r in out}
    return df, data


def test_one_row_per_key(snap):
    _, data = snap
    assert set(data) == {0, 1, 2}
    assert all(r["n_bars"] == 250 for r in data.values())


def test_sma_and_close_match_numpy(snap):
    df, data = snap
    pdf = df.toPandas().sort_values(["k", "t"])
    for key in range(3):
        v = pdf[pdf["k"] == key]["v"].to_numpy()
        r = data[key]
        assert r["close"] == pytest.approx(v[-1])
        assert r["sma_25"] == pytest.approx(np.mean(v[-25:]))
        assert r["sma_200"] == pytest.approx(np.mean(v[-200:]))
        assert r["dev_25"] == pytest.approx((v[-1] - np.mean(v[-25:])) / np.mean(v[-25:]) * 100)
        assert r["above_sma200"] == bool(v[-1] > np.mean(v[-200:]))
        assert 0 <= r["rsi_14"] <= 100
        mid, sd = np.mean(v[-20:]), np.std(v[-20:])
        assert r["bb_percent_b"] == pytest.approx((v[-1] - (mid - 2 * sd)) / (4 * sd))


def test_short_series_nulls(spark):
    df = spark.createDataFrame([(1, i, float(i)) for i in range(10)], ["k", "t", "v"])
    r = technical_snapshot(df, "k", "t", "v").first()
    assert r["n_bars"] == 10
    assert r["sma_25"] is None or np.isnan(r["sma_25"])
    assert r["rsi_14"] is None or np.isnan(r["rsi_14"])
