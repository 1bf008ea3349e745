"""Golden-vector acceptance test (SURVEY §5; reference
src/lib/analytics/__fixtures__/golden-vectors.json + technical.ts:9-10:
the fixture is shared verbatim across repos to pin cross-repo numeric
parity — 220 OHLCV bars in, one 22-field TechnicalSnapshot out).

The fixture is read from the reference checkout at test time (it is
test DATA, not code); if the checkout is absent the test skips. Every
field is compared after applying the reference's display rounding
(JS Math.round = half-up toward +infinity — technical.ts:64-68),
so any drift in seed rules, sigma conventions, defined-region MACD
signal, cloud displacement, or rounding discipline fails the test.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from japanstockdatapipeline_spark.operators.snapshot import (
    snapshot_from_bars,
    technical_snapshot_ohlcv,
)

FIXTURE = "/root/reference/src/lib/analytics/__fixtures__/golden-vectors.json"

# field -> decimal places, per computeTechnicalSnapshot (technical.ts:385-410)
ROUNDING = {
    "close": 2,
    "sma_25": 4,
    "sma_75": 4,
    "sma_200": 4,
    "dev_25": 2,
    "dev_75": 2,
    "dev_200": 2,
    "rsi_14": 2,
    "macd": 4,
    "macd_signal": 4,
    "macd_hist": 4,
    "stoch_k": 2,
    "stoch_d": 2,
    "bb_percent_b": 4,
    "bb_bandwidth": 4,
    "atr_14": 4,
    "atr_pct": 2,
    "vol_ratio_20": 3,
}


def js_round(x, d: int):
    """JS Math.round(x * 10^d) / 10^d — half rounds toward +infinity."""
    if x is None or (isinstance(x, float) and (math.isnan(x) or math.isinf(x))):
        return None
    f = 10.0**d
    return math.floor(x * f + 0.5) / f


def _load():
    if not os.path.exists(FIXTURE):
        pytest.skip("reference golden-vectors fixture not available")
    with open(FIXTURE) as fh:
        return json.load(fh)


def _rounded(raw: dict) -> dict:
    out = {}
    for field in list(ROUNDING) + [
        "above_sma200",
        "cross_25_75",
        "cross_25_75_age",
        "ichimoku_state",
    ]:
        v = raw[field]
        if field in ROUNDING:
            out[field] = js_round(v, ROUNDING[field])
        else:
            out[field] = v
    return out


def test_golden_snapshot_kernel():
    d = _load()
    bars = d["input"]
    cols = {k: np.array([b[k] for b in bars], dtype=float) for k in
            ("open", "high", "low", "close", "volume")}
    raw = snapshot_from_bars(
        cols["open"], cols["high"], cols["low"], cols["close"], cols["volume"]
    )
    got = _rounded(raw)
    exp = d["expected"]
    mismatches = {
        k: (got.get(k), v) for k, v in exp.items() if got.get(k) != v
    }
    assert not mismatches, f"golden drift: {mismatches}"


def test_golden_snapshot_spark_path(spark):
    d = _load()
    rows = [
        (1, i, float(b["open"]), float(b["high"]), float(b["low"]),
         float(b["close"]), float(b["volume"]))
        for i, b in enumerate(d["input"])
    ]
    df = spark.createDataFrame(rows, ["k", "t", "o", "h", "l", "c", "v"])
    out = technical_snapshot_ohlcv(df, "k", "t", "o", "h", "l", "c", "v").first()
    raw = out.asDict()
    got = _rounded(raw)
    exp = d["expected"]
    mismatches = {
        k: (got.get(k), v) for k, v in exp.items() if got.get(k) != v
    }
    assert not mismatches, f"golden drift (spark path): {mismatches}"
    assert raw["n_bars"] == 220


def test_golden_short_series_nulls():
    """Below-period inputs produce nulls, not garbage (reference: every
    indicator returns null before its warm-up window)."""
    v = np.linspace(100, 110, 10)
    raw = snapshot_from_bars(v, v * 1.01, v * 0.99, v, np.full(10, 1000.0))
    assert math.isnan(raw["sma_25"])
    assert math.isnan(raw["rsi_14"])
    assert raw["ichimoku_state"] is None
    assert raw["cross_25_75"] is None
