"""Vector column expressions (cosine / dot / norm) over array columns.

Reference parity: factor-vectors.ts:319-333 computes cosine as
dot/(||a||*||b||) in doubles; 00101_stock_factor_vectors.sql uses
pgvector ``1 - (a <=> b)``. Here it is a pure Catalyst expression
(zip_with + aggregate), fully JVM-side — no UDF, codegen-friendly,
and scales with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine_similarity", "as_double_array"]


def as_double_array(col: Column) -> Column:
    """Cast array<float> to array<double> so arithmetic is in f64."""
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(||a||*||b||); NULL when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
