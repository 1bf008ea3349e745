"""ST8 split-event re-statement (rebase-adjusted-bars.ts:39-218,
00093_rebase_adjusted_bars.sql:40-96).

Semantics (00093:9-14): for each entity and date t,
    adj_value(t)  = raw_value(t)  × Π{s > t} factor(s)
    adj_volume(t) = raw_volume(t) ÷ Π{s > t} factor(s)   (rounded)
i.e. the *suffix* product of adjustment factors strictly after t,
so history is restated whenever a late split arrives. The recompute
is idempotent by construction: given raw values + the factor column,
one deterministic pass rebuilds the whole adjusted history.

Detection (the incremental trigger): factors ≠ 1 inside a recent
lookback window → recompute only the affected entities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .windows import suffix_product

__all__ = ["detect_restatement_keys", "rebase_adjusted"]


def detect_restatement_keys(
    bars: DataFrame, key_col: str, ts_col: str, factor_col: str, *, since
) -> DataFrame:
    """Entities with a split factor (≠1, non-null) on/after `since` —
    the 7-day-lookback detection query (rebase-adjusted-bars.ts:129-150)."""
    return (
        bars.filter(
            (F.col(ts_col) >= F.lit(since))
            & F.col(factor_col).isNotNull()
            & (F.col(factor_col) != 1.0)
        )
        .select(key_col)
        .distinct()
    )


def rebase_adjusted(
    bars: DataFrame,
    key_col: str,
    ts_col: str,
    factor_col: str,
    value_cols: list[str],
    volume_cols: list[str] = (),
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Recompute adj_<col> columns from raw × suffix factor product.

    Exact product per the reference's numeric_product rule (no
    exp(sum(ln))); NULL factors count as 1. One shuffle on the key.
    """
    order = [F.col(ts_col).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    w_desc = Window.partitionBy(key_col).orderBy(*order)
    factor = F.coalesce(F.col(factor_col), F.lit(1.0))
    cum: Column = suffix_product(factor, w_desc)
    out = bars.withColumn("__cum_factor", cum)
    for c in value_cols:
        out = out.withColumn(f"adj_{c}", F.col(c) * F.col("__cum_factor"))
    for c in volume_cols:
        out = out.withColumn(
            f"adj_{c}", F.round(F.col(c) / F.col("__cum_factor"), 0).cast("long")
        )
    return out.drop("__cum_factor")
