"""Recursive smoothers: EMA / RSI / MACD / ATR (Wilder).

These are the only operators in SURVEY.md §2 that a window frame
cannot express (the recurrence references its own previous output).
Reference semantics pinned exactly:
  - EMA  (technical.ts:105-119): SMA seed over the first n values at
    index n-1, then v*k + prev*(1-k), k = 2/(n+1).
  - RSI  (technical.ts:131-152): seed avg gain/loss over first n
    deltas at index n, then Wilder (prev*(n-1)+x)/n.
  - MACD (technical.ts:161-178): EMA12-EMA26; signal = EMA9 over the
    *defined region* of MACD; hist = macd - signal.
  - ATR  (technical.ts:242-265): true range via prev close, Wilder
    recursion seeded with SMA of first n TRs at index n.

Execution shape: applyInPandas per entity key — one shuffle on the
key, then a vectorized numpy pass per group. This is the sanctioned
slow path (Arrow batches, not row-at-a-time), and the per-key series
(hundreds to thousands of rows) fit comfortably in a pandas group
even at 100 TB total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ema_np", "rsi_np", "macd_np", "atr_np", "with_smoothers"]


def ema_np(values: np.ndarray, n: int) -> np.ndarray:
    """EMA with SMA seed; NaN before index n-1. NaN-safe only for
    leading NaNs (reference feeds a clean region)."""
    out = np.full(len(values), np.nan)
    if len(values) < n:
        return out
    k = 2.0 / (n + 1.0)
    seed = np.mean(values[:n])
    out[n - 1] = seed
    for i in range(n, len(values)):
        out[i] = values[i] * k + out[i - 1] * (1.0 - k)
    return out


def _rsi_from(ag: float, al: float) -> float:
    # reference rsiFrom (technical.ts:122-127): flat series -> 50,
    # all-gain -> 100, all-loss -> 0
    if al == 0:
        return 50.0 if ag == 0 else 100.0
    if ag == 0:
        return 0.0
    return 100.0 - 100.0 / (1.0 + ag / al)


def rsi_np(close: np.ndarray, n: int = 14) -> np.ndarray:
    out = np.full(len(close), np.nan)
    if len(close) <= n:
        return out
    delta = np.diff(close)
    gain = np.where(delta > 0, delta, 0.0)
    loss = np.where(delta < 0, -delta, 0.0)
    ag = np.mean(gain[:n])
    al = np.mean(loss[:n])
    out[n] = _rsi_from(ag, al)
    for i in range(n + 1, len(close)):
        ag = (ag * (n - 1) + gain[i - 1]) / n
        al = (al * (n - 1) + loss[i - 1]) / n
        out[i] = _rsi_from(ag, al)
    return out


def macd_np(close: np.ndarray, fast: int = 12, slow: int = 26, sig: int = 9):
    macd = ema_np(close, fast) - ema_np(close, slow)
    defined = ~np.isnan(macd)
    signal = np.full(len(close), np.nan)
    if defined.sum() >= sig:
        region = macd[defined]
        signal[np.where(defined)[0]] = ema_np(region, sig)
    return macd, signal, macd - signal


def atr_np(high: np.ndarray, low: np.ndarray, close: np.ndarray, n: int = 14) -> np.ndarray:
    m = len(close)
    out = np.full(m, np.nan)
    if m <= n:
        return out
    prev_close = np.concatenate([[np.nan], close[:-1]])
    tr = np.maximum(
        high - low,
        np.maximum(np.abs(high - prev_close), np.abs(low - prev_close)),
    )
    tr[0] = high[0] - low[0]
    atr = np.mean(tr[1 : n + 1])
    out[n] = atr
    for i in range(n + 1, m):
        atr = (atr * (n - 1) + tr[i]) / n
        out[i] = atr
    return out


def with_smoothers(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    ema_n: int = 12,
    rsi_n: int = 14,
) -> DataFrame:
    """Attach ema_{n} and rsi_{n} columns per key via applyInPandas."""
    ema_name = f"ema_{ema_n}"
    rsi_name = f"rsi_{rsi_n}"
    schema_str = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + f", {ema_name} double, {rsi_name} double"
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        v = pdf[value_col].to_numpy(dtype=float)
        pdf[ema_name] = ema_np(v, ema_n)
        pdf[rsi_name] = rsi_np(v, rsi_n)
        return pdf

    return df.groupBy(key_col).applyInPandas(compute, schema=schema_str)
