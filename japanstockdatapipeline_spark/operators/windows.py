"""Window-family operators (SURVEY.md §2.5, the non-recursive ones).

Everything here is a built-in Catalyst window — one shuffle on the
partition key, then local sort + frame evaluation. At 100 TB the
rule is: partition by the entity key (code/user), never by date,
so a single shuffle serves the whole window family; see §4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..functions.semantics import product_of_list

__all__ = [
    "latest_per_key",
    "top_n_per_key",
    "sma",
    "rolling_stddev_pop",
    "bollinger",
    "obv",
    "running_max_excluding_current",
    "suffix_product",
    "complete_window_guard",
]


def _w(key_cols: list[str], order_by: list[Column]) -> WindowSpec:
    return Window.partitionBy(*key_cols).orderBy(*order_by)


def latest_per_key(df: DataFrame, key_cols: list[str], order_by: list[Column]) -> DataFrame:
    """W1: rn=1 dedup-collapse (latest disclosure per key, 00116:95-102)."""
    w = _w(key_cols, order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def top_n_per_key(
    df: DataFrame, key_cols: list[str], order_by: list[Column], n: int, rank_col: str = "rk"
) -> DataFrame:
    """J9/T3: lateral top-N-per-key as a rank window (00042:17-25)."""
    w = _w(key_cols, order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)


def sma(col: Column, w: WindowSpec, n: int, *, require_full: bool = True) -> Column:
    """W9: n-row simple moving average; NULL until the window is full
    (technical.ts:75-102 null-window variant)."""
    frame = w.rowsBetween(-(n - 1), 0)
    avg = F.avg(col).over(frame)
    if not require_full:
        return avg
    return F.when(F.count(col).over(frame) == n, avg)


def rolling_stddev_pop(col: Column, w: WindowSpec, n: int, *, require_full: bool = True) -> Column:
    frame = w.rowsBetween(-(n - 1), 0)
    sd = F.stddev_pop(col).over(frame)
    if not require_full:
        return sd
    return F.when(F.count(col).over(frame) == n, sd)


def bollinger(col: Column, w: WindowSpec, n: int = 20, k: float = 2.0) -> tuple[Column, Column, Column]:
    """W13: SMA_n +/- k * population sigma (technical.ts:189-208)."""
    mid = sma(col, w, n)
    sd = rolling_stddev_pop(col, w, n)
    return mid, mid + k * sd, mid - k * sd


def obv(value: Column, direction: Column, w: WindowSpec) -> Column:
    """W16: cumulative signed volume (technical.ts:268-275).
    direction: +1/-1/0 column (computed from close vs prev close)."""
    return F.sum(direction * value).over(w.rowsBetween(Window.unboundedPreceding, 0))


def running_max_excluding_current(col: Column, w: WindowSpec) -> Column:
    """W20: running max over all prior rows, excluding the current one
    (new-high rule, market-breadth.ts:121-275). NULL on the first row."""
    return F.max(col).over(w.rowsBetween(Window.unboundedPreceding, -1))


def suffix_product(col: Column, w_desc: WindowSpec) -> Column:
    """W6: product of *later* rows' factors — the split-adjustment
    suffix product (00093:50-71). Pass a DESC-ordered window; frame is
    [unbounded preceding, 1 preceding] in that order, i.e. all rows
    strictly after the current one in natural order. Empty frame -> 1.0.

    Exact product via collect_list + fold (the reference rejects
    exp(sum(ln)) — 00093:24-37). Frames are small (split events per
    code are rare), so the list stays tiny.
    """
    lst = F.collect_list(col).over(w_desc.rowsBetween(Window.unboundedPreceding, -1))
    return product_of_list(lst)


def complete_window_guard(col: Column, w: WindowSpec, n: int) -> Column:
    """W19 completeness: value only when exactly n rows present."""
    frame = w.rowsBetween(-(n - 1), 0)
    return F.when(F.count(F.lit(1)).over(frame) == n, col)
