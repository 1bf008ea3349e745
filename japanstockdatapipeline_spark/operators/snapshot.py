"""Grouped-map technical snapshot (SURVEY §2.10: computeTechnicalSnapshot,
technical.ts:361-410 — a few hundred ordered bars in, ONE snapshot row out).

Full reference field set (technical.ts:37-59 TechnicalSnapshot):
close, sma_25/75/200, dev_25/75/200, above_sma200, cross_25_75 (+age,
SMA25×SMA75 detectCross, technical.ts:334-353), rsi_14 (Wilder),
macd/signal/hist (12/26/9, defined-region signal), stoch slow %K/%D
(14,3,3), Bollinger %B/bandwidth (20, population sigma), atr_14
(Wilder) + atr_pct, vol_ratio_20, ichimoku_state (9/26/52 midlines,
cloud at n-1-26 — technical.ts:279-329). Values are emitted RAW
(unrounded); the reference's display rounding (2/3/4 dp, JS half-up)
is applied by callers — the golden-vector test pins both.

Execution: repartition by key + sortWithinPartitions, then ONE
mapInPandas call per partition with a pandas-side groupby (per-group
applyInPandas costs ~ms of Arrow overhead per group; amortizing it
per partition measured 8.1s -> ~1s for 1500 groups at sf0.1). The
recursive pieces (EMA/RSI/ATR) come from operators.smoothers; window
pieces are numpy because the whole group is already local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .smoothers import atr_np, ema_np, macd_np, rsi_np

__all__ = ["snapshot_from_bars", "technical_snapshot", "technical_snapshot_ohlcv"]

# the key field's TYPE is substituted from the input frame at call
# time (a string security code is the natural key for Japanese
# stocks); the output column is always NAMED `key` — callers rename
SNAPSHOT_SCHEMA = (
    "key {key_type}, n_bars bigint, close double, sma_25 double, sma_75 double, "
    "sma_200 double, dev_25 double, dev_75 double, dev_200 double, "
    "above_sma200 boolean, cross_25_75 string, cross_25_75_age bigint, "
    "rsi_14 double, macd double, macd_signal double, macd_hist double, "
    "stoch_k double, stoch_d double, bb_percent_b double, bb_bandwidth double, "
    "atr_14 double, atr_pct double, vol_ratio_20 double, "
    "ichimoku_state string, obv double"
)


def _sma_series(v: np.ndarray, n: int) -> np.ndarray:
    """Full SMA series, NaN before index n-1 (technical.ts:75-86)."""
    out = np.full(len(v), np.nan)
    if n <= 0 or len(v) < n:
        return out
    c = np.cumsum(np.concatenate([[0.0], v]))
    out[n - 1 :] = (c[n:] - c[:-n]) / n
    return out


def _midline_at(h: np.ndarray, low: np.ndarray, period: int, idx: int) -> float:
    """(HH+LL)/2 over the `period` bars ending at idx (technical.ts:280-292)."""
    if idx < period - 1:
        return np.nan
    win = slice(idx - period + 1, idx + 1)
    return (np.max(h[win]) + np.min(low[win])) / 2.0


def _detect_cross(short: np.ndarray, long: np.ndarray):
    """Last golden/dead cross of two (NaN-padded) series + age in bars
    (technical.ts:334-353): sign of (short-long) over rows where both
    are defined; zeros carry the previous sign; last flip wins."""
    valid = ~(np.isnan(short) | np.isnan(long))
    idxs = np.where(valid)[0]
    if len(idxs) == 0:
        return None, None
    sign = np.sign(short[idxs] - long[idxs]).astype(int)
    nz = sign != 0
    pos, s = idxs[nz], sign[nz]
    if len(s) < 2:
        return None, None
    flips = np.where(s[1:] != s[:-1])[0]
    if len(flips) == 0:
        return None, None
    last = flips[-1] + 1
    kind = "golden" if s[last] > 0 else "dead"
    return kind, int(len(short) - 1 - pos[last])


def snapshot_from_bars(
    o: np.ndarray, h: np.ndarray, low: np.ndarray, c: np.ndarray, vol: np.ndarray
) -> dict:
    """Pure kernel: one bar-series in, the reference snapshot dict out
    (raw, unrounded values; None where the reference emits null)."""
    n = len(c)
    close = float(c[-1]) if n else np.nan

    s25, s75, s200 = (_sma_series(c, k) for k in (25, 75, 200))

    def dev(m):
        return (close - m) / m * 100.0 if not np.isnan(m) and m != 0 else np.nan

    cross, cross_age = _detect_cross(s25, s75)

    r = rsi_np(c, 14)[-1] if n > 14 else np.nan
    macd, signal, hist = (x[-1] if n else np.nan for x in macd_np(c))

    stoch_k = stoch_d = np.nan
    if n >= 14:
        # trailing 14-bar HH/LL via strided windows (a pandas .rolling
        # object per group costs ~40% of the whole kernel at 1500 groups)
        hh = np.full(n, np.nan)
        ll = np.full(n, np.nan)
        hh[13:] = np.lib.stride_tricks.sliding_window_view(h, 14).max(axis=1)
        ll[13:] = np.lib.stride_tricks.sliding_window_view(low, 14).min(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            raw_k = np.where(hh != ll, 100.0 * (c - ll) / (hh - ll), np.nan)
        # smaNullable: any NaN in the window -> NaN (technical.ts:88-102)
        # — NaN propagation through the plain window mean gives exactly that
        k_s = np.full(n, np.nan)
        k_s[2:] = np.lib.stride_tricks.sliding_window_view(raw_k, 3).mean(axis=1)
        d_s = np.full(n, np.nan)
        d_s[2:] = np.lib.stride_tricks.sliding_window_view(k_s, 3).mean(axis=1)
        stoch_k, stoch_d = float(k_s[-1]), float(d_s[-1])

    bb_pb = bb_bw = np.nan
    if n >= 20:
        mid = float(np.mean(c[-20:]))
        sd = float(np.std(c[-20:]))  # population sigma (technical.ts:189-208)
        u, lo_b = mid + 2 * sd, mid - 2 * sd
        if mid != 0:
            bb_bw = (u - lo_b) / mid
        if u != lo_b:
            bb_pb = (close - lo_b) / (u - lo_b)

    a14 = atr_np(h, low, c, 14)[-1] if n > 14 else np.nan
    atr_pct = a14 / close * 100.0 if not np.isnan(a14) and close != 0 else np.nan

    avg_vol20 = float(np.mean(vol[-20:])) if n >= 20 else np.nan
    vol_ratio = (
        float(vol[-1]) / avg_vol20 if not np.isnan(avg_vol20) and avg_vol20 != 0 else np.nan
    )

    # ichimoku cloud at displacement 26 (technical.ts:311-329): today's
    # cloud is the span computed 26 bars ago; senkou B needs 52 bars
    ich = None
    idx = n - 1 - 26
    if idx >= 0:
        tenkan = _midline_at(h, low, 9, idx)
        kijun = _midline_at(h, low, 26, idx)
        a = (tenkan + kijun) / 2.0 if not (np.isnan(tenkan) or np.isnan(kijun)) else np.nan
        b = _midline_at(h, low, 52, idx)
        if not (np.isnan(a) or np.isnan(b)):
            top, bot = max(a, b), min(a, b)
            ich = "above" if close > top else ("below" if close < bot else "inside")

    diff = np.sign(np.diff(c)) if n > 1 else np.array([])
    obv = float(np.sum(diff * vol[1:])) if n > 1 else 0.0

    return {
        "n_bars": n,
        "close": close,
        "sma_25": s25[-1] if n else np.nan,
        "sma_75": s75[-1] if n else np.nan,
        "sma_200": s200[-1] if n else np.nan,
        "dev_25": dev(s25[-1]) if n else np.nan,
        "dev_75": dev(s75[-1]) if n else np.nan,
        "dev_200": dev(s200[-1]) if n else np.nan,
        "above_sma200": bool(close > s200[-1]) if n and not np.isnan(s200[-1]) else None,
        "cross_25_75": cross,
        "cross_25_75_age": cross_age,
        "rsi_14": r,
        "macd": macd,
        "macd_signal": signal,
        "macd_hist": hist,
        "stoch_k": stoch_k,
        "stoch_d": stoch_d,
        "bb_percent_b": bb_pb,
        "bb_bandwidth": bb_bw,
        "atr_14": a14,
        "atr_pct": atr_pct,
        "vol_ratio_20": vol_ratio,
        "ichimoku_state": ich,
        "obv": obv,
    }


def technical_snapshot_ohlcv(
    df: DataFrame,
    key_col: str,
    order_col: str,
    open_col: str,
    high_col: str,
    low_col: str,
    close_col: str,
    vol_col: str,
) -> DataFrame:
    """One full-reference snapshot row per key from its ordered OHLCV series."""

    cols = [open_col, high_col, low_col, close_col, vol_col]

    def per_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        rows = []
        for key, g in pdf.groupby(key_col, sort=False):
            arrs = [g[c].to_numpy(dtype=float) for c in cols]
            row = snapshot_from_bars(*arrs)
            row["key"] = key
            rows.append(row)
        yield pd.DataFrame(rows)

    src = (
        df.select(key_col, order_col, *cols)
        .repartition(key_col)
        .sortWithinPartitions(key_col, order_col)
    )
    key_type = df.schema[key_col].dataType.simpleString()
    return src.mapInPandas(
        per_partition, schema=SNAPSHOT_SCHEMA.format(key_type=key_type)
    )


def technical_snapshot(
    df: DataFrame, key_col: str, order_col: str, value_col: str
) -> DataFrame:
    """Close-only convenience form: high=low=close=value, volume=value
    (rolling max/min of closes drive the range indicators, value plays
    volume for OBV/vol_ratio — the shape the events table provides)."""
    src = df.select(
        df[key_col],
        df[order_col],
        df[value_col].alias("__o"),
        df[value_col].alias("__h"),
        df[value_col].alias("__l"),
        df[value_col].alias("__c"),
        df[value_col].alias("__v"),
    )
    return technical_snapshot_ohlcv(
        src, key_col, order_col, "__o", "__h", "__l", "__c", "__v"
    )
