"""Grouped-map technical snapshot (SURVEY §2.10: computeTechnicalSnapshot,
technical.ts:361-410 — a few hundred ordered bars in, ONE snapshot row out).

Execution: applyInPandas per entity — one shuffle on the key, then a
vectorized numpy pass per group; output is one row per key (the
snapshot table, rebuilt wholesale each run per ST5). The recursive
pieces (EMA/RSI) come from operators.smoothers; the window pieces are
computed in numpy here because the whole group is already local —
re-shuffling through SQL windows would cost a second pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .smoothers import ema_np, macd_np, rsi_np

__all__ = ["technical_snapshot"]

SNAPSHOT_SCHEMA = (
    "key bigint, n_bars bigint, close double, sma_25 double, sma_75 double, "
    "sma_200 double, dev_25 double, above_sma200 boolean, rsi_14 double, "
    "macd double, macd_signal double, macd_hist double, stoch_k double, "
    "stoch_d double, bb_percent_b double, bb_bandwidth double, "
    "obv double, cross_25_75 int, cross_age bigint"
)


def _sma_tail(v: np.ndarray, n: int) -> float:
    return float(np.mean(v[-n:])) if len(v) >= n else np.nan


def technical_snapshot(df: DataFrame, key_col: str, order_col: str, value_col: str) -> DataFrame:
    """One snapshot row per key from its full ordered series.

    Execution: repartition by key + sortWithinPartitions, then ONE
    mapInPandas call per partition with a pandas-side groupby. With
    many small entities, per-group applyInPandas pays ~ms of Arrow +
    Python-call overhead per group (measured 8.1s for 1500 groups at
    sf0.1); amortizing it per partition cut that to the numpy cost.
    """

    def compute_one(key, v: np.ndarray) -> dict:
        n = len(v)
        close = v[-1] if n else np.nan
        sma25, sma75, sma200 = (_sma_tail(v, k) for k in (25, 75, 200))
        dev25 = (close - sma25) / sma25 * 100.0 if sma25 and not np.isnan(sma25) else np.nan

        rsi = rsi_np(v, 14)[-1] if n > 14 else np.nan
        macd, signal, hist = macd_np(v)
        stoch_k = stoch_d = np.nan
        if n >= 14:
            hh = pd.Series(v).rolling(14).max().to_numpy()
            ll = pd.Series(v).rolling(14).min().to_numpy()
            with np.errstate(invalid="ignore", divide="ignore"):
                raw_k = np.where(hh != ll, 100.0 * (v - ll) / (hh - ll), np.nan)
            k_s = pd.Series(raw_k).rolling(3).mean()
            d_s = k_s.rolling(3).mean()
            stoch_k, stoch_d = float(k_s.iloc[-1]), float(d_s.iloc[-1])

        bb_pb = bb_bw = np.nan
        if n >= 20:
            mid = np.mean(v[-20:])
            sd = np.std(v[-20:])  # population sigma (technical.ts:189-208)
            if sd > 0:
                bb_pb = (close - (mid - 2 * sd)) / (4 * sd)
                bb_bw = 4 * sd / mid

        diff = np.sign(np.diff(v)) if n > 1 else np.array([])
        obv = float(np.sum(diff * v[1:])) if n > 1 else 0.0

        cross = cross_age = None
        e25 = ema_np(v, 25) if n >= 25 else None
        e75 = ema_np(v, 75) if n >= 75 else None
        if e25 is not None and e75 is not None:
            state = np.where(
                np.isnan(e25) | np.isnan(e75), 0, np.where(e25 >= e75, 1, -1)
            )
            valid = state != 0
            if valid.any():
                cross = int(state[valid][-1])
                changes = np.where((state[1:] != state[:-1]) & (state[1:] != 0) & (state[:-1] != 0))[0]
                cross_age = int(n - 1 - (changes[-1] + 1)) if len(changes) else None

        return {
            "key": key,
            "n_bars": n,
            "close": close,
            "sma_25": sma25,
            "sma_75": sma75,
            "sma_200": sma200,
            "dev_25": dev25,
            "above_sma200": bool(close > sma200) if not np.isnan(sma200) else None,
            "rsi_14": rsi,
            "macd": macd[-1] if n else np.nan,
            "macd_signal": signal[-1] if n else np.nan,
            "macd_hist": hist[-1] if n else np.nan,
            "stoch_k": stoch_k,
            "stoch_d": stoch_d,
            "bb_percent_b": bb_pb,
            "bb_bandwidth": bb_bw,
            "obv": obv,
            "cross_25_75": cross,
            "cross_age": cross_age,
        }

    def per_partition(batches):
        # the partition arrives in (key, order) sorted batches; keys
        # never straddle partitions (hash repartition by key), but may
        # straddle Arrow batches — concat first
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        rows = [
            compute_one(key, g[value_col].to_numpy(dtype=float))
            for key, g in pdf.groupby(key_col, sort=False)
        ]
        yield pd.DataFrame(rows)

    src = (
        df.select(key_col, order_col, value_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, order_col)
    )
    return src.mapInPandas(per_partition, schema=SNAPSHOT_SCHEMA)
