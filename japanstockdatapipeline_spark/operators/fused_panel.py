"""Fused per-event indicator panel: every event_indicator_panel member
computed in ONE pass over events.

The join-of-members panel (plans/panels.py) is the *correctness
vehicle*: 11 members that each re-scan and re-shuffle events on the
same (user_id) key, then chain 10 full-outer joins. This operator is
the *production materialization* of the same wide row set: ONE
repartition on the key (one Exchange), sortWithinPartitions, then one
mapInPandas whose pandas-side groupby computes the full indicator
family per user series — window pieces in numpy over the already-local
group, recursive pieces (EMA/RSI/MACD/ATR — technical.ts:105-265) from
operators.smoothers, and the click→purchase as-of merge inline.

Output columns and value semantics are IDENTICAL to the panel's
full-outer join of: event_golden_cross, event_ichimoku_midlines,
event_obv, event_running_argmax, event_running_high, event_stochastic,
rolling_event_stats, user_value_atr, user_value_macd,
user_value_smoothers, purchase_asof_click — asserted by an
equivalence test (tests/test_fused_panel.py) and by the shared DuckDB
oracle (the fused member reuses the panel's FULL-JOIN oracle).

Rounding (6dp) and NaN→NULL happen Spark-side after mapInPandas with
the same F.round/F.isnan expressions the members use, so both forms
round identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .smoothers import atr_np, ema_np, macd_np, rsi_np

__all__ = ["fused_event_indicators", "fused_event_indicators_jvm"]

FUSED_SCHEMA = (
    "user_id bigint, event_id bigint, "
    # rolling_event_stats
    "sma5 double, bb_up double, bb_dn double, "
    # event_running_high
    "value double, prior_max double, is_new_high boolean, "
    # event_obv
    "obv double, "
    # event_running_argmax
    "best_value double, best_event_id bigint, "
    # event_stochastic
    "raw_k double, slow_k double, slow_d double, "
    # event_golden_cross
    "state int, is_cross boolean, bars_since_cross bigint, "
    # event_ichimoku_midlines
    "tenkan double, kijun double, senkou_a double, above_cloud boolean, "
    # recursive members
    "atr_14 double, macd double, macd_signal double, macd_hist double, "
    "ema_12 double, rsi_14 double, "
    # purchase_asof_click (purchase rows only; NULL elsewhere)
    "ts_us bigint, last_click_value double"
)

_ROUND6 = (
    "sma5", "bb_up", "bb_dn", "prior_max", "obv", "best_value",
    "tenkan", "kijun", "senkou_a",
    "atr_14", "macd", "macd_signal", "macd_hist", "ema_12", "rsi_14",
    "last_click_value",
)
# emitted ALREADY-exact (integer-arithmetic 6dp rounding inside the
# operator, matching event_stochastic's q-chain — see that member's
# exactness note); only NaN->NULL applies, never a float re-round
_EXACT6 = ("raw_k", "slow_k", "slow_d")


def _trail(v: np.ndarray, w: int, fn) -> np.ndarray:
    """fn over the trailing w-row window, NaN until the window is full
    (the count(*)==w full-window gate every member applies)."""
    out = np.full(len(v), np.nan)
    if len(v) >= w:
        sw = np.lib.stride_tricks.sliding_window_view(v, w)
        out[w - 1 :] = fn(sw)
    return out


def _trail_mean(v: np.ndarray, w: int) -> np.ndarray:
    """Trailing mean with SEQUENTIAL frame-order accumulation — the
    bit-exact twin of Spark's window avg, which re-sums each sliding
    frame oldest-row-first (SlidingWindowFunctionFrame has no retract
    path). numpy's mean (pairwise/unrolled reduce) and pandas
    rolling().mean() (add/subtract accumulator) associate differently
    and drift 1 ulp from the member form — enough to flip a
    round(x, 6) boundary (slow_k 17.3828125 at sf0.1)."""
    out = np.full(len(v), np.nan)
    if len(v) >= w:
        sw = np.lib.stride_tricks.sliding_window_view(v, w)
        acc = sw[:, 0].astype(float, copy=True)
        for j in range(1, w):
            acc = acc + sw[:, j]
        out[w - 1 :] = acc / float(w)
    return out


def _trail_std_pop(v: np.ndarray, w: int) -> np.ndarray:
    """Trailing population stddev via the SAME Welford recurrence
    Spark's stddev_pop (CentralMomentAgg) runs per frame in row order:
    delta = x - mean; mean += delta/n; m2 += delta*(x - mean);
    sqrt(m2/n). numpy's two-pass std associates differently — same
    1-ulp class as _trail_mean (sqrt itself is correctly rounded, so
    identical m2 in means identical stddev out)."""
    out = np.full(len(v), np.nan)
    if len(v) >= w:
        sw = np.lib.stride_tricks.sliding_window_view(v, w)
        mean = np.zeros(sw.shape[0])
        m2 = np.zeros(sw.shape[0])
        for j in range(w):
            x = sw[:, j]
            delta = x - mean
            mean = mean + delta / float(j + 1)
            m2 = m2 + delta * (x - mean)
        out[w - 1 :] = np.sqrt(m2 / float(w))
    return out


def _shift(v: np.ndarray, k: int) -> np.ndarray:
    out = np.full(len(v), np.nan)
    if k < len(v):
        out[k:] = v[: len(v) - k]
    return out


def _bool_or_none(cond: np.ndarray, defined: np.ndarray) -> pd.Series:
    return pd.Series(np.where(defined, cond, None), dtype="boolean")


def _group_frame(g: pd.DataFrame) -> pd.DataFrame:
    """One user's (ts_us, event_id)-ordered series in, all indicator
    columns out (raw doubles; rounding/NaN→NULL applied Spark-side)."""
    v = g["value"].to_numpy(dtype=float)
    ids = g["event_id"].to_numpy(dtype=np.int64)
    ts = g["ts_us"].to_numpy(dtype=np.int64)
    et = g["event_type"].to_numpy()
    n = len(g)
    rn = np.arange(1, n + 1, dtype=float)

    out = pd.DataFrame(
        {"user_id": g["user_id"].to_numpy(), "event_id": ids}
    )

    # rolling_event_stats: SMA5 + Bollinger, population sigma (W9/W13)
    s5 = _trail_mean(v, 5)
    sd5 = _trail_std_pop(v, 5)
    out["sma5"], out["bb_up"], out["bb_dn"] = s5, s5 + 2 * sd5, s5 - 2 * sd5

    # event_running_high: prior running max excluding current (W20)
    prior = _shift(np.maximum.accumulate(v), 1) if n else np.array([])
    out["value"] = v
    out["prior_max"] = prior
    out["is_new_high"] = _bool_or_none(v > prior, ~np.isnan(prior))

    # event_obv: cumulative signed value (W16); first row contributes 0
    lag_v = _shift(v, 1)
    with np.errstate(invalid="ignore"):
        signed = np.where(v > lag_v, v, np.where(v < lag_v, -v, 0.0))
    out["obv"] = np.cumsum(signed)

    # event_running_argmax: running max(struct(v, id)) (W5) — among
    # rows tying the running max, the largest event_id wins (struct
    # comparison order), so cummax candidate ids within each cmax run
    cmax = np.maximum.accumulate(v)
    cand = np.where(v >= cmax, ids, -1)
    run_break = np.concatenate([[1], (cmax[1:] != cmax[:-1]).astype(np.int64)])
    seg = np.cumsum(run_break)
    out["best_value"] = cmax
    out["best_event_id"] = pd.Series(cand).groupby(seg).cummax().to_numpy()

    # event_stochastic: the member's exact integer q-chain (see
    # event_stochastic's exactness note): raw %K = half-up 6dp of the
    # cent rational 100*(v_c-ll)/(hh-ll) as an int64 q; each SMA3 pass
    # averages the ROUNDED previous stage ((q1+q2+q3)/3e6, re-rounded
    # as (2*sq+3)//6 — all int64, bit-identical to the Spark/SQL rails;
    # NaN lanes mark the count-gates)
    # cents via HALF-AWAY-FROM-ZERO, the rule the other two rails use
    # (the members' F.round(value*100) is Spark HALF_UP, the oracle's
    # DuckDB round() is half away from zero): np.rint is half-EVEN
    # (12.5 cents -> 12 vs 13 on the other rails), and .astype(int64)
    # on a NaN lane manufactures INT64_MIN garbage instead of an
    # undefined lane. |v|*100 + 0.5 is exact for cent magnitudes
    # << 2^51, so floor IS the exact half-up decision; NaN propagates
    # through where/floor and keeps the lane — and every 14-row window
    # that sees it — undefined, the conservative NULL.
    v_c = np.where(
        np.isnan(v), np.nan, np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)
    )
    hh = _trail(v_c, 14, lambda s: s.max(axis=1))
    ll = _trail(v_c, 14, lambda s: s.min(axis=1))
    defined = ~np.isnan(hh) & (hh != ll)
    rawq = np.full(n, np.nan)
    if defined.any():
        # defined implies the whole 14-row window (current row included)
        # was NaN-free, so these casts are exact int-valued floats
        dv = v_c[defined].astype(np.int64) - ll[defined].astype(np.int64)
        dd = hh[defined].astype(np.int64) - ll[defined].astype(np.int64)
        num = 100 * dv * 1000000
        rawq[defined] = (2 * num + dd) // (2 * dd)  # q in [0, 1e8]: float-exact

    def _sma3_q(q: np.ndarray) -> np.ndarray:
        sq = _shift(q, 2) + _shift(q, 1) + q  # sums of exact ints: order-free
        out_q = np.full(len(q), np.nan)
        m = ~np.isnan(sq)
        if m.any():
            out_q[m] = (2 * sq[m].astype(np.int64) + 3) // 6
        return out_q

    skq = _sma3_q(rawq)
    sdq = _sma3_q(skq)
    out["raw_k"] = rawq / 1e6
    out["slow_k"] = skq / 1e6
    out["slow_d"] = sdq / 1e6

    # event_golden_cross: sign of SMA5-SMA20, flips + age (W18)
    sma20 = _trail_mean(v, 20)
    with np.errstate(invalid="ignore"):
        state = np.where(
            np.isnan(s5) | np.isnan(sma20), np.nan, np.where(s5 >= sma20, 1.0, -1.0)
        )
    prev_state = _shift(state, 1)
    with np.errstate(invalid="ignore"):
        change = (~np.isnan(state)) & (~np.isnan(prev_state)) & (state != prev_state)
    change_rn = np.where(change, rn, np.nan)
    last_change = np.fmax.accumulate(change_rn)  # NaN-skipping running max
    out["state"] = pd.array(state, dtype="Int32")
    out["is_cross"] = change
    out["bars_since_cross"] = pd.array(rn - last_change, dtype="Int64")

    # event_ichimoku_midlines: 9/26 midlines, senkou A = lag-26 (W17)
    mid9 = (_trail(v, 9, lambda s: s.max(axis=1)) + _trail(v, 9, lambda s: s.min(axis=1))) / 2
    mid26 = (
        _trail(v, 26, lambda s: s.max(axis=1)) + _trail(v, 26, lambda s: s.min(axis=1))
    ) / 2
    senkou_a = _shift((mid9 + mid26) / 2, 26)
    out["tenkan"], out["kijun"], out["senkou_a"] = mid9, mid26, senkou_a
    out["above_cloud"] = _bool_or_none(v > senkou_a, ~np.isnan(senkou_a))

    # recursive family (technical.ts:105-265), ±1% synthesized band for ATR
    out["atr_14"] = atr_np(v * 1.01, v * 0.99, v, 14)
    m, s, h = macd_np(v)
    out["macd"], out["macd_signal"], out["macd_hist"] = m, s, h
    out["ema_12"] = ema_np(v, 12)
    out["rsi_14"] = rsi_np(v, 14)

    # purchase_asof_click (J6): forward-fill click values over
    # (ts, click-before-purchase, event_id) order; emit at purchases
    is_left = np.where(et == "click", 0, 1)
    order = np.lexsort((ids, is_left, ts))
    click_val = np.where(et == "click", v, np.nan)[order]
    ff = pd.Series(click_val).ffill().to_numpy()
    last_click = np.empty(n)
    last_click[order] = ff
    is_purchase = et == "purchase"
    out["ts_us"] = pd.array(np.where(is_purchase, ts, -1), dtype="Int64")
    out.loc[~is_purchase, "ts_us"] = pd.NA
    out["last_click_value"] = np.where(is_purchase, last_click, np.nan)
    return out


def fused_event_indicators(events: DataFrame) -> DataFrame:
    """events (user_id, event_id, ts_us, event_type, value) -> the full
    wide indicator panel, one Exchange total."""

    def per_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        # ONE Arrow batch out per partition: yielding per group hands
        # Arrow ~#users tiny batches (measured 2.5x the serialization
        # wall of one concatenated frame at sf0.1)
        yield pd.concat(
            [_group_frame(g) for _, g in pdf.groupby("user_id", sort=False)],
            ignore_index=True,
        )

    src = (
        events.select("user_id", "event_id", "ts_us", "event_type", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "event_id")
    )
    raw = src.mapInPandas(per_partition, schema=FUSED_SCHEMA)

    cols = []
    for c in raw.columns:
        if c in _ROUND6:
            cols.append(F.round(F.when(~F.isnan(c), F.col(c)), 6).alias(c))
        elif c in _EXACT6:
            # already exact 6dp from the integer q-chain: NaN->NULL only
            cols.append(F.when(~F.isnan(c), F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return raw.select(*cols)


def fused_event_indicators_jvm(events: DataFrame) -> DataFrame:
    """The shared-window-frame fused form: all window-expressible
    members as Catalyst expressions over ONE Exchange on user_id
    (consecutive WindowExec operators share the partitioning; the
    as-of member only adds a sort, not a shuffle), then a single
    mapInPandas appends the recursive family (ATR/MACD/EMA/RSI) —
    pandas computes ONLY the recursions, everything else stays
    JVM-side. Same output contract as fused_event_indicators and the
    join-of-members panel (equivalence-tested, same FULL-JOIN oracle).

    Measured at sf0.1/local[32] (warm, round 9 — after the
    one-Arrow-batch-per-partition + 4-WindowExec restructure): this
    form 2.4s vs the panel's ~3.3s, so the cluster shape now wins
    LOCALLY too. The fused forms remain the CLUSTER shapes: 1 scan +
    1 Exchange of the fact table instead of 11 of each, which is what
    dominates when the fact table is 100 TB and an Exchange is a
    network pass. Keep all three equivalence-locked and pick per
    deployment.
    """
    from pyspark.sql import Window

    ev = events.select("user_id", "event_id", "ts_us", "event_type", "value")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prior_f = w.rowsBetween(Window.unboundedPreceding, -1)
    w5 = w.rowsBetween(-4, 0)
    w20 = w.rowsBetween(-19, 0)
    w14 = w.rowsBetween(-13, 0)
    w3 = w.rowsBetween(-2, 0)
    w9 = w.rowsBetween(-8, 0)
    w26 = w.rowsBetween(-25, 0)

    def gated(frame, n, agg):
        return F.when(F.count(F.lit(1)).over(frame) == n, agg.over(frame))

    def midline(frame, n):
        return F.when(
            F.count(F.lit(1)).over(frame) == n,
            (F.max("value").over(frame) + F.min("value").over(frame)) / 2,
        )

    from ..functions import semantics as SEM

    # The window chain is built in explicit DEPENDENCY LEVELS, each one
    # select(): every window expression in a level shares the same
    # (partitionBy, orderBy), so ExtractWindowExpressions packs a whole
    # level into ONE WindowExec — the r8 withColumn chain produced 11
    # sequential Window operators (one per dependency hop) and the
    # window passes dominated the fused wall (~90% measured at sf0.1);
    # this shape runs the identical functions over the identical frames
    # (bit-identical outputs, equivalence-tested) in 4 passes. The
    # as-of member's different sort order runs FIRST so the plan sorts
    # asof-order -> main-order once instead of main -> asof -> main.

    # level 0: the as-of forward fill (its own ordering)
    is_left = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w_asof = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", is_left, "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w_asof)
    d = ev.select("*", last_click.alias("__asof_click"))

    # level 1: everything that reads only the base row (one WindowExec)
    lag_v = F.lag("value").over(w)
    best = F.max(
        F.struct(F.col("value").alias("v"), F.col("event_id").alias("id"))
    ).over(run)
    v_c = F.round(F.col("value") * 100).cast("bigint")
    d = d.select(
        "*",
        gated(w5, 5, F.avg("value")).alias("sma5"),
        gated(w5, 5, F.stddev_pop("value")).alias("__sd5"),
        F.col("value").alias("value_out"),
        F.max("value").over(prior_f).alias("prior_max"),
        lag_v.alias("__lag_v"),
        best["v"].alias("best_value"),
        best["id"].alias("best_event_id"),
        v_c.alias("__v_c"),
        gated(w20, 20, F.avg("value")).alias("__sma20"),
        F.row_number().over(w).alias("__rn"),
        midline(w9, 9).alias("tenkan"),
        midline(w26, 26).alias("kijun"),
        F.max(v_c).over(w14).alias("__hh"),
        F.min(v_c).over(w14).alias("__ll"),
        F.count(F.lit(1)).over(w14).alias("__n14"),
    )

    # level 2: windows over level-1 expressions (one WindowExec);
    # __rawq/state/signed/senkou inputs are plain expressions of
    # level-1 columns, so their windows all share this pass
    signed = (
        F.when(F.col("value") > F.col("__lag_v"), F.col("value"))
        .when(F.col("value") < F.col("__lag_v"), -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    rawq = F.when(
        (F.col("__n14") == 14) & (F.col("__hh") != F.col("__ll")),
        SEM.round6_q("100 * (__v_c - __ll)", "__hh - __ll"),
    )
    state = F.when(
        F.col("sma5").isNull() | F.col("__sma20").isNull(), F.lit(None).cast("int")
    ).otherwise(F.when(F.col("sma5") >= F.col("__sma20"), 1).otherwise(-1))
    d = d.select(
        "*",
        F.sum(signed).over(run).alias("obv"),
        rawq.alias("__rawq"),
        F.when(
            F.count(rawq).over(w3) == 3, F.sum(rawq).over(w3)
        ).alias("__sq"),
        state.alias("state"),
        F.lag(state).over(w).alias("__prev_state"),
        F.lag((F.col("tenkan") + F.col("kijun")) / 2, 26).over(w).alias("senkou_a"),
    )

    # level 3: windows over level-2 expressions (one WindowExec)
    skq = F.when(F.col("__sq").isNotNull(), SEM.round6_q("__sq", "3000000"))
    change_rn = F.when(
        F.col("state").isNotNull()
        & F.col("__prev_state").isNotNull()
        & (F.col("state") != F.col("__prev_state")),
        F.col("__rn"),
    )
    d = d.select(
        "*",
        skq.alias("__skq"),
        F.when(F.count(skq).over(w3) == 3, F.sum(skq).over(w3)).alias("__sq2"),
        change_rn.alias("__change_rn"),
        F.max(change_rn).over(run).alias("__last_change"),
    )

    # level 4: pure expressions — no further windows
    is_purchase = F.col("event_type") == "purchase"
    d = d.select(
        "*",
        (F.col("__rawq").cast("double") / 1000000.0).alias("raw_k"),
        (F.col("__skq").cast("double") / 1000000.0).alias("slow_k"),
        F.when(
            F.col("__sq2").isNotNull(), SEM.round6_ratio("__sq2", "3000000")
        ).alias("slow_d"),
        F.col("__change_rn").isNotNull().alias("is_cross"),
        (F.col("__rn") - F.col("__last_change")).cast("bigint").alias(
            "bars_since_cross"
        ),
        F.when(
            F.col("senkou_a").isNotNull(), F.col("value") > F.col("senkou_a")
        ).alias("above_cloud"),
        F.when(is_purchase, F.col("ts_us")).alias("ts_asof"),
        F.when(is_purchase, F.col("__asof_click")).alias("last_click_value"),
        (F.col("sma5") + 2 * F.col("__sd5")).alias("bb_up"),
        (F.col("sma5") - 2 * F.col("__sd5")).alias("bb_dn"),
    )
    d = d.drop(
        "__sd5", "__lag_v", "__sma20", "__rn", "__change_rn", "__last_change",
        "__prev_state", "__asof_click", "__v_c", "__hh", "__ll", "__n14",
        "__rawq", "__sq", "__skq", "__sq2",
    )

    # recursive family appended pandas-side; partitioning from the
    # window Exchange is preserved, so this adds NO shuffle
    in_schema = d.schema
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)
        + ", atr_14 double, macd double, macd_signal double, macd_hist double"
        + ", ema_12 double, rsi_14 double"
    )

    def per_partition(batches):
        # one pandas frame per partition in, ONE Arrow batch out: the
        # r8 form yielded one small frame per user (1500 Arrow batches
        # per partition at sf0.1) and re-sorted + .assign-copied each
        # group — measured, that overhead dwarfed the recursions
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        uid = pdf["user_id"].to_numpy()
        ts = pdf["ts_us"].to_numpy()
        eid = pdf["event_id"].to_numpy()
        # the window chain upstream REQUIRES (user_id, ts_us, event_id)
        # ordering and WindowExec preserves it, so group slices arrive
        # contiguous and time-ordered; guard (cheap vector compare) and
        # re-sort only if an upstream change ever breaks the contract
        same_u = uid[1:] == uid[:-1]
        ordered = np.all(
            ~same_u
            | (ts[1:] > ts[:-1])
            | ((ts[1:] == ts[:-1]) & (eid[1:] >= eid[:-1]))
        ) and np.all(uid[1:] >= uid[:-1])
        if not ordered:
            pdf = pdf.sort_values(
                ["user_id", "ts_us", "event_id"], ignore_index=True
            )
            uid = pdf["user_id"].to_numpy()
        v_all = pdf["value"].to_numpy(dtype=float)
        n = len(pdf)
        starts = np.nonzero(np.concatenate(([True], uid[1:] != uid[:-1])))[0]
        ends = np.concatenate((starts[1:], [n]))
        atr = np.empty(n)
        macd = np.empty(n)
        sig = np.empty(n)
        ema = np.empty(n)
        rsi = np.empty(n)
        for s0, e0 in zip(starts, ends):
            v = v_all[s0:e0]
            atr[s0:e0] = atr_np(v * 1.01, v * 0.99, v, 14)
            m, s, _h = macd_np(v)
            macd[s0:e0] = m
            sig[s0:e0] = s
            ema[s0:e0] = ema_np(v, 12)
            rsi[s0:e0] = rsi_np(v, 14)
        pdf["atr_14"] = atr
        pdf["macd"] = macd
        pdf["macd_signal"] = sig
        pdf["macd_hist"] = macd - sig
        pdf["ema_12"] = ema
        pdf["rsi_14"] = rsi
        yield pdf

    raw = d.mapInPandas(per_partition, schema=out_schema)

    nan2null = lambda c: F.when(~F.isnan(c), F.col(c))  # noqa: E731
    recursive = ("atr_14", "macd", "macd_signal", "macd_hist", "ema_12", "rsi_14")
    cols = [F.col("user_id"), F.col("event_id")]
    for c in _ROUND6:
        if c in recursive:
            cols.append(F.round(nan2null(c), 6).alias(c))
        elif c == "obv":
            cols.append(F.round(F.col(c), 6).alias(c))
        else:
            cols.append(F.round(F.col(c), 6).alias(c))
    cols += [F.col(c) for c in _EXACT6]  # exact 6dp from the q-chain
    cols += [
        F.col("value_out").alias("value"),
        F.when(F.col("prior_max").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.col("value_out") > F.col("prior_max"))
        .alias("is_new_high"),
        F.col("best_event_id"),
        F.col("state"),
        F.col("is_cross"),
        F.col("bars_since_cross"),
        F.col("above_cloud"),
        F.col("ts_asof").alias("ts_us"),
    ]
    return raw.select(*cols)
