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

__all__ = [
    "brute_force_topk",
    "brute_force_topk_matmul",
    "lsh_bucketed_topk",
    "ivf_topk",
    "lsh_planes",
    "lsh_signature_expr",
    "lsh_near_dup_pairs",
]


def lsh_planes(
    dim: int, n_planes: int = 4, n_tables: int = 8, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic random-hyperplane tables: tables[t][p] is a dim-long
    Gaussian vector. Shared by the Spark operator and the DuckDB oracle
    (which inlines these exact float literals), so both engines bucket
    identically."""
    import random

    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


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


def lsh_signature_expr(tables):
    """Builder for the per-vector LSH signature array expression.

    For hyperplane tables[t][p], the signature for table t is
    "t:<sign bits>" where bit p is 1 iff dot(vec, plane) >= 0 —
    pure Catalyst array folds, no UDF. Vectors share a signature
    exactly when all plane signs agree, so bucket candidacy is an
    equi-join on the signature string.
    """

    def signatures(vec_dbl):
        sigs = []
        for ti, planes in enumerate(tables):
            bits = []
            for p in planes:
                plane = F.array(*[F.lit(x) for x in p])
                d = F.aggregate(
                    F.zip_with(vec_dbl, plane, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
            sigs.append(F.concat(F.lit(f"{ti}:"), *bits))
        return F.array(*sigs)

    return signatures


def lsh_near_dup_pairs(
    vecs: DataFrame,
    threshold: float,
    *,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs with LSH blocking: candidates are pairs
    sharing >= 1 bucket signature (equi-join on the signature — a
    shuffle, never an all-pairs product), then the exact cosine >=
    threshold filter runs only on candidates.

    Output (id_a, id_b, cos), id_a < id_b, each pair once. Recall < 1
    by construction (pairs whose signs differ in every table are
    missed) and grows with n_tables; the brute-force all-pairs form is
    the test-only cross-check. This is the shape that survives 100 TB:
    per-bucket work is bounded by bucket occupancy, not corpus^2.
    """
    signatures = lsh_signature_expr(lsh_planes(dim, n_planes, n_tables, seed))
    v = vecs.select(
        F.col(id_col).alias("__id"), as_double_array(F.col(vec_col)).alias("__v")
    ).withColumn("__sig", F.explode(signatures(F.col("__v"))))
    a = v.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), "__sig"
    )
    b = v.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), "__sig"
    )
    pairs = (
        a.join(b, "__sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a", "id_b", cosine_similarity(F.col("__va"), F.col("__vb")).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane (sign) LSH bucketing, then
    exact cosine within bucket. The scale path — turns the cross join
    into an equi-join on the bucket signature, i.e. a shuffle instead
    of an O(n*m) product. Recall < 1.0 by construction; `n_tables`
    independent hash tables union their candidates (each vector gets
    n_tables (table, signature) keys, so the join stays an equi-join).

    Pass `dim` explicitly to keep plan construction action-free; the
    fallback peeks one row from the (small by construction) query side,
    never the corpus.
    """
    if dim is None:
        row = queries.select(q_vec_col).first()
        if row is None or row[0] is None:
            raise ValueError("lsh_bucketed_topk: empty query set and no dim given")
        dim = len(row[0])
    tables = lsh_planes(dim, n_planes, n_tables, seed)
    signatures = lsh_signature_expr(tables)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("__cv")
    ).withColumn("__sig", F.explode(signatures(F.col("__cv"))))
    q = queries.select(
        F.col(q_id_col), as_double_array(F.col(q_vec_col)).alias("__qv")
    ).withColumn("__sig", F.explode(signatures(F.col("__qv"))))
    pairs = c.join(F.broadcast(q), "__sig").filter(F.col("neighbor_id") != F.col(q_id_col))
    scored = pairs.dropDuplicates([q_id_col, "neighbor_id"]).select(
        q_id_col, "neighbor_id", cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cos")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_probe: int = 2,
    coarse_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k, IVF-style: the corpus is inverted-listed by a
    coarse quantizer (here: an existing cluster/label column — in a
    full system, k-means cell ids), each query probes its `n_probe`
    nearest cell centroids, and exact cosine runs only inside probed
    cells.

    Scale shape: centroids are tiny (one row per cell) and broadcast;
    the probe assignment is a small cross join (queries x cells); the
    expensive scan is an equi-join corpus⋈probes on the cell id — a
    shuffle, never a full cross product. Recall grows with n_probe.
    """
    c = corpus.select(
        F.col(coarse_col).alias("__cell"),
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("__cv"),
    )
    # cell centroids via posexplode + per-position mean (one shuffle) —
    # the SAME helper the k-means quantizer uses, so the registered
    # IVF-over-kmeans composition has one centroid definition that
    # cannot drift between build and probe
    from .kmeans import _centroids_of

    centroids = _centroids_of(
        c.select(F.col("__cell").alias("cell"), "__cv"), "__cv"
    ).select(F.col("cell").alias("__cell"), F.col("__cvec").alias("__centroid"))
    q = queries.select(F.col(q_id_col), as_double_array(F.col(q_vec_col)).alias("__qv"))
    probe_w = Window.partitionBy(q_id_col).orderBy(
        F.col("__ccos").desc(), F.col("__cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        # probe ranking cosine ROUNDED to 6dp (ascending-cell
        # tie-break): centroids are float avg() aggregates whose
        # accumulation order the engines don't fix, so an unrounded
        # near-tie could probe different cells per engine
        .withColumn(
            "__ccos",
            F.round(cosine_similarity(F.col("__qv"), F.col("__centroid")), 6),
        )
        .withColumn("__prank", F.row_number().over(probe_w))
        .filter(F.col("__prank") <= n_probe)
        .select(q_id_col, "__qv", "__cell")
    )
    pairs = c.join(F.broadcast(probes), "__cell").filter(
        F.col("neighbor_id") != F.col(q_id_col)
    )
    scored = pairs.select(
        q_id_col, "neighbor_id", cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cos")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k via numpy/BLAS: queries collected to a (q, d) matrix
    (they are small by construction), corpus streamed through
    mapInPandas in Arrow batches, one `batch @ Q.T` matrix multiply per
    batch, per-batch top-k, then a global re-rank of the per-batch
    candidates (correct because per-query global top-k ⊆ union of
    per-batch top-k).

    This is the vectorized-Pandas-UDF fast path for wide embeddings:
    same results as brute_force_topk (ties aside at ~1e-15), ~BLAS
    throughput instead of per-element Catalyst expression evaluation.
    """
    import numpy as np
    import pandas as pd

    # the Arrow batch path packs ids as int64 — reject other id types
    # loudly instead of silently coercing (strings would crash deep in
    # numpy, floats would round)
    for df_, col_ in ((corpus, id_col), (queries, q_id_col)):
        dt = df_.schema[col_].dataType.simpleString()
        if dt not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"brute_force_topk_matmul needs an integral id column; "
                f"{col_!r} is {dt} (use brute_force_topk for other id types)"
            )

    qrows = queries.select(q_id_col, q_vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    # zero-norm queries get the same norm=1 guard as the corpus side:
    # cosine 0.0 to everything (deterministic rank by neighbor_id)
    # instead of a NaN row that each engine orders differently
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn

    def batches(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            norms = np.linalg.norm(C, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cos = (C / norms) @ Qn.T  # (batch, q)
            # k+1: the self-match (filtered downstream) may occupy one slot
            top = min(k + 1, len(ids))
            idx = np.argpartition(-cos, top - 1, axis=0)[:top]  # per query
            out = {
                q_id_col: np.repeat(q_ids, top),
                "neighbor_id": ids[idx].T.ravel(),
                "cos": np.take_along_axis(cos, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(out)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        batches, schema=f"{q_id_col} bigint, neighbor_id bigint, cos double"
    ).filter(F.col("neighbor_id") != F.col(q_id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negative_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    q_label_col: str = "q_label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the k corpus vectors MOST cosine-similar whose label DIFFERS from
    the query's — the near-miss negatives a contrastive/embedding
    trainer samples (north-star: training-data prep over an embedding
    column).

    Same BLAS shape as brute_force_topk_matmul: queries (small by
    construction) collected to a matrix, corpus streamed through
    mapInPandas, one matmul per Arrow batch — but same-label pairs are
    masked to -inf BEFORE the per-batch top-k, so the per-query global
    top-k over the allowed (different-label) set is still ⊆ the union
    of per-batch top-k. Self-pairs share the query's label and are
    masked with the rest; NULL-label rows on EITHER side are excluded
    (a NULL label can't be asserted different, matching SQL <>
    semantics — a NULL-label query yields no rows).

    Output: (q_id, neighbor_id, cos, rank), tie-break (cos desc, id).
    """
    import numpy as np
    import pandas as pd

    # labels get the same loud upfront dtype check as the ids: they are
    # compared as int64 inside the BLAS batch, and an int64 that
    # round-tripped through float64 silently corrupts above 2^53
    for df_, col_ in (
        (corpus, id_col),
        (queries, q_id_col),
        (corpus, label_col),
        (queries, q_label_col),
    ):
        dt = df_.schema[col_].dataType.simpleString()
        if dt not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"hard_negative_topk_matmul needs integral id/label columns; "
                f"{col_!r} is {dt}"
            )

    qrows = [
        r
        for r in queries.select(q_id_col, q_vec_col, q_label_col).collect()
        if r[2] is not None
    ]
    if not qrows:
        return (
            corpus.sparkSession.range(0)
            .select(
                F.col("id").alias(q_id_col),
                F.col("id").alias("neighbor_id"),
                F.lit(0.0).alias("cos"),
                F.lit(0).alias("rank"),
            )
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    q_labels = np.array([int(r[2]) for r in qrows], dtype=np.int64)
    # same zero-norm guard as brute_force_topk_matmul: a zero-norm
    # query scores cosine 0.0 everywhere instead of NaN rows that
    # np.isfinite would silently drop (divergent vs the SQL oracle)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn

    def batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # NULL-label rows are filtered JVM-side BEFORE mapInPandas
            # (below): an Arrow batch containing a null would reach
            # pandas as float64, silently corrupting labels above 2^53
            # — with the nulls gone the column stays int64 end to end
            labels = pdf[label_col].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            norms = np.linalg.norm(C, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cos = (C / norms) @ Qn.T  # (batch, q)
            cos[labels[:, None] == q_labels[None, :]] = -np.inf
            top = min(k, len(ids))
            idx = np.argpartition(-cos, top - 1, axis=0)[:top]
            flat_cos = np.take_along_axis(cos, idx, axis=0).T.ravel()
            out = pd.DataFrame(
                {
                    q_id_col: np.repeat(q_ids, top),
                    "neighbor_id": ids[idx].T.ravel(),
                    "cos": flat_cos,
                }
            )
            yield out[np.isfinite(flat_cos)]

    cand = (
        corpus.select(id_col, vec_col, label_col)
        .filter(F.col(label_col).isNotNull())
        .mapInPandas(
            batches, schema=f"{q_id_col} bigint, neighbor_id bigint, cos double"
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
