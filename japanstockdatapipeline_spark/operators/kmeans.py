"""K-means coarse quantizer for IVF-style ANN (Lloyd iterations as
pure DataFrame ops).

The stress run in SCALE.md showed `ivf_topk` recall is bounded by the
coarse quantizer: the testdata `label` column is geometrically random,
so probed cells rarely contain the true neighbors. This operator
builds GEOMETRIC cells: deterministic seeding (the k smallest ids),
then `iters` Lloyd rounds, each one crossJoin(broadcast(centroids)) →
rounded-cosine argmax assignment → per-cell elementwise mean. The
plan is fully lazy (no driver loop over data, no plan-time job): the
iteration count is a compile-time unroll, each round adding one
shuffle (the centroid re-agg) — the classic distributed-k-means
shape, scaling by rows like any aggregation.

Determinism (oracle-portability): argmax compares cosines ROUNDED to
6 dp with ascending cell id as tie-break, so Spark and the SQL oracle
(which may accumulate dot products in a different order) always pick
the same cell even for near-ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine_similarity

__all__ = ["kmeans_cells", "semdedup"]


def _centroids_of(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Per-cell elementwise mean via posexplode (one shuffle)."""
    ex = assigned.select("cell", F.posexplode(vec_col).alias("pos", "x"))
    return (
        ex.groupBy("cell", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["m"]).alias("__cvec"))
    )


def kmeans_cells(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to a k-means cell (cosine Lloyd iterations).

    Output: (vec_id, cell, cell_cos) — `cell` is the 0-based id of the
    winning centroid after the last assignment round, `cell_cos` the
    rounded cosine to it. `iters` counts ASSIGNMENT rounds: seeds →
    assign → [recompute → assign] × (iters-1).

    Empty cells shrink away naturally (a centroid with no members
    drops out of the next round); the oracle replays the identical
    schedule, seeding, quantized argmax, and shrinkage.
    """
    v = vecs.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("__v"))
    # deterministic seeds: the k smallest ids, cell = dense order
    seed_w = Window.orderBy(F.col(id_col).asc())
    seeds = (
        v.withColumn("__rn", F.row_number().over(seed_w))
        .filter(F.col("__rn") <= k)
        .select((F.col("__rn") - 1).alias("cell"), F.col("__v").alias("__cvec"))
    )

    def assign(cents: DataFrame) -> DataFrame:
        cos = F.round(cosine_similarity(F.col("__v"), F.col("__cvec")), 6)
        w = Window.partitionBy(id_col).orderBy(
            F.col("__cos").desc(), F.col("cell").asc()
        )
        return (
            v.crossJoin(F.broadcast(cents))
            .withColumn("__cos", cos)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(id_col, "cell", F.col("__cos").alias("cell_cos"), "__v")
        )

    a = assign(seeds)
    for _ in range(iters - 1):
        a = assign(_centroids_of(a, "__v"))
    return a.select(id_col, "cell", "cell_cos")


def semdedup(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings into k-means cells, then
    find near-duplicates ONLY within each cell — the pairwise cosine
    pass is bounded by cell occupancy (sum of occ^2), never corpus^2.

    Keep-rule: within a cell, a vector whose cosine to some
    lower-id cell-mate is >= `threshold` is a semantic duplicate of
    the smallest such id (the paper keeps the member farthest from
    the centroid; the min-id rule used here is deterministic and
    oracle-portable — the policy is one line to swap).

    Output: (vec_id, sem_cell, sem_dup_of, sem_kept) — one row per
    vector; `sem_dup_of` NULL for kept representatives.

    Scale: the cell self-join is an equi-join on the cell id (a
    shuffle, no all-pairs product); at real scale k grows with the
    corpus (k ~ n / target_occupancy) so per-cell work stays flat,
    which is exactly the published algorithm's design point. A
    production run persists the assignment once instead of letting
    both join sides recompute it (here kept lazy for the oracle
    gate).
    """
    a = kmeans_cells(vecs, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    v = vecs.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("__v"))
    av = a.join(v, id_col).select(id_col, "cell", "__v")
    left = av.select(
        F.col(id_col).alias("id_a"), "cell", F.col("__v").alias("__va")
    )
    right = av.select(
        F.col(id_col).alias("id_b"), "cell", F.col("__v").alias("__vb")
    )
    dups = (
        left.join(right, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6)
            >= F.lit(threshold)
        )
        .groupBy("id_b")
        .agg(F.min("id_a").alias("sem_dup_of"))
    )
    return (
        av.join(dups, av[id_col] == dups["id_b"], "left")
        .select(
            id_col,
            F.col("cell").cast("bigint").alias("sem_cell"),
            "sem_dup_of",
            F.col("sem_dup_of").isNull().alias("sem_kept"),
        )
    )
