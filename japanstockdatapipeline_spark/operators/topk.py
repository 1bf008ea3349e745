"""Similarity search: brute-force cosine top-k + LSH-bucketed variant.

Reference: 00101_stock_factor_vectors.sql:59-96 — exact kNN by
cosine distance (deliberately no ANN index at ~3.7k vectors).
Scale path (BASELINE.json): at 100 TB the corpus side is huge but
the *query* side is small — broadcast the queries, compute cosine
at scan speed as a Catalyst expression, TakeOrdered per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine_similarity

__all__ = ["brute_force_topk", "lsh_bucketed_topk"]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: crossJoin(broadcast(queries)) + rank.

    Output: (q_id, neighbor_id, cos, rank) with deterministic
    tie-break (cos desc, neighbor_id asc).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("__cv")
    )
    q = queries.select(F.col(q_id_col), as_double_array(F.col(q_vec_col)).alias("__qv"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col(q_id_col))
    scored = pairs.select(
        q_id_col,
        "neighbor_id",
        cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane (sign) LSH bucketing, then
    exact cosine within bucket. The scale path — turns the cross join
    into an equi-join on the bucket signature, i.e. a shuffle instead
    of an O(n*m) product. Recall < 1.0 by construction; raise recall
    with multiple hash tables (union of signatures).
    """
    import random

    dim = len(corpus.select(vec_col).first()[0])
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]

    def signature(vec_dbl):
        bits = []
        for p in planes:
            plane = F.array(*[F.lit(x) for x in p])
            d = F.aggregate(
                F.zip_with(vec_dbl, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
            )
            bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("__cv")
    ).withColumn("__sig", signature(F.col("__cv")))
    q = queries.select(
        F.col(q_id_col), as_double_array(F.col(q_vec_col)).alias("__qv")
    ).withColumn("__sig", signature(F.col("__qv")))
    pairs = c.join(F.broadcast(q), "__sig").filter(F.col("neighbor_id") != F.col(q_id_col))
    scored = pairs.select(
        q_id_col, "neighbor_id", cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cos")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
