"""Skew mitigation: key salting for joins and aggregations
(SURVEY §4 "skewed keys hurt"; SCALE.md global posture).

AQE's skew-join handles most cases at runtime; explicit salting is
the structural fix when one key dominates so heavily that even split
partitions bottleneck (e.g. a null-ish default key holding 30% of a
100 TB fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_broadcast_join"]


def salted_aggregate(
    df: DataFrame, key_cols: list[str], aggs: dict[str, str], *, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation with an explicit salt: groupBy(key, salt)
    partial-aggregates locally-skewed keys across `salt_buckets`
    reducers, then a cheap final groupBy(key) combines them.

    `aggs` maps column -> 'sum'|'count'|'min'|'max' (re-aggregable
    functions only; avg must be decomposed by the caller into
    sum+count, which is exactly why this helper doesn't accept it).
    """
    allowed = {"sum", "count", "min", "max"}
    bad = {fn for fn in aggs.values() if fn not in allowed}
    if bad:
        raise ValueError(
            f"salted_aggregate supports only re-aggregable functions "
            f"{sorted(allowed)}, got {sorted(bad)}: e.g. an avg of per-salt "
            "avgs is unweighted and silently wrong — decompose avg into "
            "sum+count"
        )
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    first = {c: getattr(F, fn)(c).alias(c) for c, fn in aggs.items()}
    partial = salted.groupBy(*key_cols, "__salt").agg(*first.values())
    refn = {"count": "sum"}  # counts combine by summing
    final = [
        getattr(F, refn.get(fn, fn))(c).alias(c) for c, fn in aggs.items()
    ]
    return partial.groupBy(*key_cols).agg(*final)


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, on: str, *, salt_buckets: int = 16
) -> DataFrame:
    """Skew-proof join: salt the big side, explode the (broadcastable)
    small side across all salt values, join on (key, salt). Every hot
    key's rows spread over `salt_buckets` tasks instead of one."""
    b = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(F.broadcast(s), [on, "__salt"]).drop("__salt")
