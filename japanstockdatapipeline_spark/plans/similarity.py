"""Similarity-search plans over the embeddings table.

Reference: 00101_stock_factor_vectors.sql:59-96 (exact cosine kNN);
north-star: ANN over an embedding column at 100 TB. Brute-force
top-k is the oracle-checked baseline; the LSH-bucketed variant is
the scale path (equi-join on signature instead of a cross join) and
gets a rows-only check (approximate by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine_similarity
from ..operators.topk import brute_force_topk, brute_force_topk_matmul, lsh_bucketed_topk
from ..sources import load_table
from .registry import query


def _queries_df(emb: DataFrame, every: int = 50) -> DataFrame:
    return emb.filter(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


@query(
    "embedding_knn_topk",
    doc="T2/J8 exact cosine top-k (00101:86-96): crossJoin(broadcast("
    "queries)) + per-query rank; deterministic tie-break (cos desc, id).",
    oracle="""
    WITH q AS (
      SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
      FROM embeddings WHERE vec_id % 50 = 0
    ), scored AS (
      SELECT q.q_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.q_vec) AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    bench=True,
)
def embedding_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact brute force via the BLAS path (4.6x the Catalyst-expression
    # form, bit-identical ranks on the testdata); brute_force_topk is
    # the pure-expression fallback with the same contract
    emb = load_table(spark, sf_dir, "embeddings")
    out = brute_force_topk_matmul(emb, _queries_df(emb), k=5)
    return out.select(
        "q_id", "neighbor_id", F.round("cos", 6).alias("cos"), F.col("rank").cast("int")
    )


@query(
    "embedding_lsh_topk",
    doc="ANN scale path (north-star): random-hyperplane LSH bucketing "
    "then exact cosine within bucket — no cross join, shuffle on the "
    "signature only. Approximate: rows-only check.",
)
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = lsh_bucketed_topk(emb, _queries_df(emb), k=5)  # planes=4, tables=8: ~0.76 recall at ~half-corpus candidate cost (sf0.01)
    return out.select(
        "q_id", "neighbor_id", F.round("cos", 6).alias("cos"), F.col("rank").cast("int")
    )


@query(
    "embedding_label_centroid_sim",
    doc="F7 cosine against an aggregate centroid (factor-vectors.ts:"
    "319-333): per-label mean vector, each member's cosine to its "
    "label centroid — array agg + zip_with, no UDF.",
    oracle="""
    WITH ex AS (
      SELECT label, r.i AS i, (embedding::DOUBLE[])[r.i] AS x
      FROM embeddings, LATERAL unnest(range(1, 65)) AS r(i)
    ), comp AS (
      SELECT label, i, avg(x) AS m FROM ex GROUP BY label, i
    ), cent AS (
      SELECT label, list(m ORDER BY i) AS centroid FROM comp GROUP BY label
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS centroid_cos
    FROM embeddings e JOIN cent c ON e.label = c.label
    """,
)
def embedding_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "emb_d", as_double_array(F.col("embedding"))
    )
    dim = 64
    # centroid per label: elementwise mean = sum of arrays / count,
    # computed as aggregate over collected arrays would shuffle big
    # lists; instead explode-free: posexplode is the scalable form,
    # but at dim=64 an array-of-avg via explode is one shuffle:
    ex = emb.select("label", F.posexplode("emb_d").alias("pos", "x"))
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )
    joined = emb.join(F.broadcast(cent), "label")
    return joined.select(
        "vec_id",
        "label",
        F.round(cosine_similarity(F.col("emb_d"), F.col("centroid")), 6).alias("centroid_cos"),
    )


@query(
    "embedding_ivf_topk",
    doc="ANN scale path #2 (north-star): IVF — inverted lists by coarse "
    "cell (label column as the quantizer), queries probe their 2 "
    "nearest cell centroids, exact cosine only inside probed cells. "
    "Approximate: rows-only check; recall vs brute force unit-tested.",
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, _queries_df(emb), k=5, n_probe=2)
    return out.select(
        "q_id", "neighbor_id", F.round("cos", 6).alias("cos"), F.col("rank").cast("int")
    )


@query(
    "embedding_near_dup_pairs",
    doc="Embedding-cosine near-dup (north-star dedup family): pairs "
    "with cosine >= 0.3 — brute-force on the query slice here; at "
    "scale the identical predicate runs after LSH/IVF blocking.",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 = 0
      AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    a = emb.select(F.col("vec_id").alias("id_a"), as_double_array(F.col("embedding")).alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), as_double_array(F.col("embedding")).alias("vb"))
    pairs = a.join(b, a.id_a < b.id_b)
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return pairs.select("id_a", "id_b", cos.alias("cos")).filter(
        F.col("cos") >= 0.3
    ).select("id_a", "id_b", F.round("cos", 6).alias("cos"))
