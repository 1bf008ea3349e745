"""Pinned numeric semantics (SURVEY.md §4 "Decimal-vs-double discipline").

The reference computes in IEEE-754 double with JS-style half-up
rounding (reference: supabase/migrations/00116:32-35, 221-225) and
rejects exp(sum(ln)) for products on precision grounds (00093:24-37).
This module pins those choices as reusable column expressions so
every operator shares one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "round_half_up",
    "product_of_list",
    "product_agg",
    "zscore",
    "safe_div",
    "clamp",
]


def round_half_up(col: Column, scale: int = 2) -> Column:
    """JS Math.round-style half-up rounding.

    Spark's ``round`` is HALF_UP (away from zero for the .5 case),
    matching the reference's floor(x*100+0.5)/100 emulation for
    positive values; we use the builtin, which stays JVM-side.
    """
    return F.round(col, scale)


def product_of_list(lst: Column) -> Column:
    """Exact sequential product of an array<double>.

    The reference defines a custom Postgres aggregate
    ``numeric_product`` instead of exp(sum(ln)) (00093:24-37);
    the Spark-native exact equivalent is a left fold over the
    collected values. Empty list => 1.0 (multiplicative identity).
    """
    return F.aggregate(lst, F.lit(1.0), lambda acc, x: acc * x)


def product_agg(col: Column) -> Column:
    """Product aggregate for use inside groupBy().agg(...).

    collect_list + fold: exact to double semantics. Fine for
    bounded group sizes (split factors per code: a handful of
    events). For huge groups prefer a two-phase tree product.
    """
    return product_of_list(F.collect_list(col))


def zscore(col: Column, mean: Column, stddev_pop: Column) -> Column:
    """Population z-score with the reference's sigma=0 -> 0 convention
    (factor-vectors.ts:191-260)."""
    return F.when(stddev_pop == 0, F.lit(0.0)).otherwise((col - mean) / stddev_pop)


def safe_div(num: Column, den: Column) -> Column:
    """NULL (not error / inf) when the denominator is NULL or <= 0 —
    the reference's harmonic-ratio guard (basket-valuation.ts:517-556)."""
    return F.when(den > 0, num / den)


def clamp(col: Column, lo: float, hi: float) -> Column:
    return F.greatest(F.least(col, F.lit(hi)), F.lit(lo))
