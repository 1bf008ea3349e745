"""Recursive-smoother semantics (EMA/RSI/MACD/ATR — SURVEY.md §7.3):
seeding rules pinned against hand-computed values and a brute-force
definition, then Spark applyInPandas parity with the numpy kernels."""

from __future__ import annotations

import numpy as np
import pytest

from japanstockdatapipeline_spark.operators.smoothers import (
    atr_np,
    ema_np,
    macd_np,
    rsi_np,
    with_smoothers,
)


def test_ema_sma_seed_and_recursion():
    v = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    out = ema_np(v, 3)
    assert np.isnan(out[0]) and np.isnan(out[1])
    assert out[2] == pytest.approx(2.0)  # SMA seed over first 3
    k = 2.0 / 4.0
    assert out[3] == pytest.approx(4.0 * k + 2.0 * (1 - k))
    assert out[4] == pytest.approx(5.0 * k + out[3] * (1 - k))


def test_ema_short_series_all_nan():
    assert np.all(np.isnan(ema_np(np.array([1.0, 2.0]), 3)))


def test_rsi_wilder_seed_and_bounds():
    rng = np.random.default_rng(7)
    v = np.cumsum(rng.normal(0, 1, 100)) + 100
    out = rsi_np(v, 14)
    assert np.all(np.isnan(out[:14]))
    w = out[14:]
    assert np.all((w >= 0) & (w <= 100))
    up = np.arange(20, dtype=float)
    assert rsi_np(up, 14)[15] == pytest.approx(100.0)  # all gains -> 100


def test_macd_signal_defined_region():
    rng = np.random.default_rng(11)
    v = np.cumsum(rng.normal(0, 1, 60)) + 50
    macd, signal, hist = macd_np(v)
    assert np.all(np.isnan(macd[:25]))
    assert not np.isnan(macd[25])
    # signal seeds 9 values into the defined region: index 25+8 = 33
    assert np.all(np.isnan(signal[:33]))
    assert not np.isnan(signal[33])
    d = ~np.isnan(hist)
    assert np.allclose(hist[d], macd[d] - signal[d])


def test_atr_wilder():
    rng = np.random.default_rng(3)
    close = np.cumsum(rng.normal(0, 1, 40)) + 100
    high = close + np.abs(rng.normal(0, 0.5, 40))
    low = close - np.abs(rng.normal(0, 0.5, 40))
    out = atr_np(high, low, close, 14)
    assert np.all(np.isnan(out[:14]))
    assert np.all(out[14:] > 0)


def test_with_smoothers_spark_parity(spark):
    rng = np.random.default_rng(5)
    rows = []
    for key in ["a", "b"]:
        v = np.cumsum(rng.normal(0, 1, 50)) + 100
        rows += [(key, i, float(v[i])) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = with_smoothers(df, "k", "t", "v", ema_n=12, rsi_n=14)
    pdf = out.toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    for key in ["a", "b"]:
        sub = pdf[pdf["k"] == key]
        v = sub["v"].to_numpy()
        np.testing.assert_allclose(
            sub["ema_12"].to_numpy(), ema_np(v, 12), rtol=1e-12, equal_nan=True
        )
        np.testing.assert_allclose(
            sub["rsi_14"].to_numpy(), rsi_np(v, 14), rtol=1e-12, equal_nan=True
        )
