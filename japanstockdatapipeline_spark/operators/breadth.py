"""Nikkei-style year-bucket new-high/new-low state as pure windows
(SURVEY §2.5 W20; reference market-breadth.ts:121-275 BreadthAccumulator).

The reference keeps per-code mutable state {curYear bucket max/min,
prevYear bucket max/min} fed strictly date-ascending. Re-expressed
declaratively:

  base period for day d (year y, month m), per entity:
    - current-year rows of year y strictly before d
      (window: partitionBy(key, y).orderBy(day).rowsBetween(-inf, -1))
    - plus, when m in 1..3 ("前年来"), ALL rows of year y-1 — and only
      exactly y-1: an entity with a >=2-year gap has an empty prior
      bucket (rolledState, market-breadth.ts:211-240)
  new high: base max exists AND today's high > base max of highs
  new low:  base min exists AND today's low  < base min of lows
  (first-ever row of an entity has no base -> never counted)

Scale shape: one shuffle on (key) for the intra-year running window,
one tiny per-(key, year) aggregate joined back on (key, y-1) — no
stateful iteration, no driver loop; identical plan at any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["year_bucket_high_low"]


def year_bucket_high_low(
    daily: DataFrame,
    key_col: str = "user_id",
    day_col: str = "day",
    hi_col: str = "hi",
    lo_col: str = "lo",
) -> DataFrame:
    """Input: one row per (key, epoch-day) with hi/lo. Output adds
    base_max/base_min/is_new_high/is_new_low per row."""
    d = (
        daily.withColumn(
            "__dt", F.date_add(F.lit("1970-01-01").cast("date"), F.col(day_col).cast("int"))
        )
        .withColumn("__y", F.year("__dt"))
        .withColumn("__m", F.month("__dt"))
    )
    wcur = (
        Window.partitionBy(key_col, "__y")
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("__cur_max", F.max(hi_col).over(wcur)).withColumn(
        "__cur_min", F.min(lo_col).over(wcur)
    )
    yearly = daily.withColumn(
        "__y",
        F.year(F.date_add(F.lit("1970-01-01").cast("date"), F.col(day_col).cast("int"))),
    ).groupBy(key_col, "__y").agg(
        F.max(hi_col).alias("__prev_max"), F.min(lo_col).alias("__prev_min")
    )
    prev = yearly.select(
        F.col(key_col), (F.col("__y") + 1).alias("__y"), "__prev_max", "__prev_min"
    )
    j = d.join(prev, [key_col, "__y"], "left")

    use_prev = F.col("__m") <= 3

    def merged(cur, prv, pick_max: bool):
        # greatest/least skip NULLs natively, so the Jan-Mar merge of
        # the two buckets is one call (NULL only when both are NULL)
        combine = F.greatest if pick_max else F.least
        return F.when(use_prev, combine(F.col(cur), F.col(prv))).otherwise(
            F.col(cur)
        )

    base_max = merged("__cur_max", "__prev_max", True)
    base_min = merged("__cur_min", "__prev_min", False)
    return (
        j.withColumn("base_max", base_max)
        .withColumn("base_min", base_min)
        .withColumn(
            "is_new_high",
            F.when(F.col("base_max").isNotNull(), F.col(hi_col) > F.col("base_max")),
        )
        .withColumn(
            "is_new_low",
            F.when(F.col("base_min").isNotNull(), F.col(lo_col) < F.col("base_min")),
        )
        .drop("__dt", "__y", "__m", "__cur_max", "__cur_min", "__prev_max", "__prev_min")
    )
