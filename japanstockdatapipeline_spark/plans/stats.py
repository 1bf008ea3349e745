"""Statistical pipelines: winsorize/z/clamp (F6) and the water-fill
weight cap (A5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.semantics import clamp, zscore
from ..operators.waterfill import water_fill_cap
from ..sources import load_table
from .registry import member, query


@member(
    "winsorized_price_z",
    doc="F6 winsorize + z-score + clamp pipeline (factor-vectors.ts:"
    "191-260): 1%/99% linear-interp percentile clip (type-7 — exact "
    "`percentile`, not approx), population z over the clipped column, "
    "clamp to ±3, NULL→0. Global stats broadcast back as a 1-row "
    "cross join — no per-row recompute.",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_extendedprice, 0.01) AS p01,
             quantile_cont(l_extendedprice, 0.99) AS p99
      FROM lineitem
    ), clipped AS (
      SELECT l_orderkey, l_linenumber,
             least(greatest(l_extendedprice, p01), p99) AS cp
      FROM lineitem, b
    ), stats AS (
      SELECT avg(cp) AS mu, stddev_pop(cp) AS sigma FROM clipped
    )
    SELECT l_orderkey, l_linenumber,
           round(cp, 6) AS clipped_price,
           round(coalesce(
             least(greatest(CASE WHEN sigma = 0 THEN 0.0 ELSE (cp - mu) / sigma END,
                            -3.0), 3.0), 0.0), 6) AS z_clamped
    FROM clipped, stats
    """,
)
def winsorized_price_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.expr("percentile(l_extendedprice, 0.01)").alias("p01"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    )
    clipped = li.crossJoin(F.broadcast(bounds)).select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99")).alias("cp"),
    )
    stats = clipped.agg(
        F.avg("cp").alias("mu"), F.stddev_pop("cp").alias("sigma")
    )
    z = zscore(F.col("cp"), F.col("mu"), F.col("sigma"))
    return clipped.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        F.round("cp", 6).alias("clipped_price"),
        F.round(F.coalesce(clamp(z, -3.0, 3.0), F.lit(0.0)), 6).alias("z_clamped"),
    )


@query(
    "nation_capped_weights",
    doc="A5 water-filling weight cap (basket-valuation.ts:279-318) in "
    "closed form: capped prefix via running-AND over the desc-sorted "
    "weights — pure windows, no driver loop, scales to all groups at "
    "once. Cap 0.3 within nation; groups of >=5 positive balances.",
    oracle="""
    WITH pos AS (
      SELECT c_nationkey, c_custkey, c_acctbal FROM customer WHERE c_acctbal > 0
    ), big AS (
      SELECT c_nationkey FROM pos GROUP BY 1 HAVING count(*) >= 5
    ), w AS (
      SELECT p.c_nationkey, p.c_custkey,
             p.c_acctbal / sum(p.c_acctbal) OVER (PARTITION BY p.c_nationkey) AS w
      FROM pos p JOIN big b USING (c_nationkey)
    ), o AS (
      SELECT *, row_number() OVER wo AS i,
             sum(w) OVER (PARTITION BY c_nationkey ORDER BY w DESC, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM w
      WINDOW wo AS (PARTITION BY c_nationkey ORDER BY w DESC, c_custkey)
    ), fl AS (
      SELECT *, min(CASE WHEN w * (1 - (i - 1) * 0.3) / (1 - (cum - w)) >= 0.3
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY c_nationkey ORDER BY w DESC, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS flag
      FROM o
    ), k AS (
      SELECT *, max(CASE WHEN flag = 1 THEN i END) OVER (PARTITION BY c_nationkey) AS k_star,
                max(CASE WHEN flag = 1 THEN cum END) OVER (PARTITION BY c_nationkey) AS cum_k
      FROM fl
    )
    SELECT c_nationkey, c_custkey,
           round(CASE WHEN flag = 1 THEN 0.3
                 ELSE w * (CASE WHEN k_star IS NULL THEN 1.0
                           ELSE (1 - k_star * 0.3) / (1 - cum_k) END) END, 6) AS capped_weight
    FROM k
    """,
)
def nation_capped_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0)
    big = (
        pos.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .select("c_nationkey")
    )
    grp = pos.join(F.broadcast(big), "c_nationkey")
    out = water_fill_cap(
        grp, ["c_nationkey"], "c_acctbal", 0.3, tiebreak="c_custkey"
    )
    return out.select(
        "c_nationkey", "c_custkey", F.round("capped_weight", 6).alias("capped_weight")
    )


@member(
    "cardinality_sketch_accuracy",
    doc="Sketch-based distinct counting for the 100 TB path (SURVEY "
    "§2.4 note: approx_count_distinct is the scale substitute for "
    "exact distinct shuffles): per event_type, the exact user "
    "cardinality (oracle-checked) next to the HLL++ estimate and its "
    "relative error ×1e4 floored to an int, asserting the sketch "
    "stays within rsd=0.01 bounds in-plan. The exact count shuffles "
    "(type, user) pairs once; the sketch is a single map-side-"
    "mergeable pass — at cluster scale only the sketch survives.",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BIGINT) AS sketch_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def cardinality_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
            )
            <= 0.05
        )
        .cast("bigint")
        .alias("sketch_within_5pct"),
    )


@member(
    "quantile_sketch_accuracy",
    doc="Quantile sketch for the 100 TB path (twin of the HLL query; "
    "SURVEY §2.4 / F6 note that exact percentile collects full-column "
    "digests): per order priority, exact totalprice median/p95 "
    "(oracle-checked) beside approx_percentile estimates, asserting "
    "the sketch lands within 5% relative error in-plan (the sketch returns a real element, not an interpolation, so tiny groups sit a gap away from the exact interpolated value). Exact "
    "percentile is the reference-parity operator at group scale; the "
    "sketch is the map-side-mergeable substitute for global columns.",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(round(quantile_cont(o_totalprice, 0.5), 2) AS DOUBLE) AS p50_exact,
           CAST(round(quantile_cont(o_totalprice, 0.95), 2) AS DOUBLE) AS p95_exact,
           CAST(1 AS BIGINT) AS sketch_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def quantile_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50_exact"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95_exact"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("p50_approx"),
        F.expr("approx_percentile(o_totalprice, 0.95, 10000)").alias("p95_approx"),
    )
    within = (
        (F.abs(F.col("p50_approx") - F.col("p50_exact")) / F.col("p50_exact") <= 0.05)
        & (F.abs(F.col("p95_approx") - F.col("p95_exact")) / F.col("p95_exact") <= 0.05)
    )
    return agg.select(
        "priority",
        "p50_exact",
        "p95_exact",
        within.cast("bigint").alias("sketch_within_5pct"),
    )


@member(
    "audience_overlap_sketch",
    doc="Sketch set algebra for audience overlap (completes the "
    "sketch family: HLL cardinalities compose by inclusion-"
    "exclusion, |A∩B| ≈ |A|+|B|-|A∪B|): exact distinct-user overlap "
    "of click vs purchase audiences (oracle-checked) beside the "
    "estimate from three mergeable HLL sketches, asserting <=5% "
    "relative error in-plan. The exact side shuffles user_ids twice "
    "(per-set distinct + intersect); the sketch side is one "
    "conditional-agg pass with three map-side-mergeable sketches — "
    "at 100 TB only the sketch side is feasible, and sketches also "
    "persist/merge across partitions and days.",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS click_users,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS purchase_users,
           CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT)
             AS overlap_exact,
           CAST(1 AS BIGINT) AS sketch_within_5pct
    """,
)
def audience_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    click_u = F.when(F.col("event_type") == "click", F.col("user_id"))
    purch_u = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    agg = ev.agg(
        F.countDistinct(click_u).cast("bigint").alias("click_users"),
        F.countDistinct(purch_u).cast("bigint").alias("purchase_users"),
        (
            F.countDistinct(click_u)
            + F.countDistinct(purch_u)
            - F.countDistinct("user_id")
        )
        .cast("bigint")
        .alias("overlap_exact"),
        (
            F.approx_count_distinct(click_u, rsd=0.01)
            + F.approx_count_distinct(purch_u, rsd=0.01)
            - F.approx_count_distinct("user_id", rsd=0.01)
        ).alias("overlap_sketch"),
    )
    return agg.select(
        "click_users",
        "purchase_users",
        "overlap_exact",
        (
            F.abs(F.col("overlap_sketch") - F.col("overlap_exact"))
            / F.col("overlap_exact")
            <= 0.05
        )
        .cast("bigint")
        .alias("sketch_within_5pct"),
    )
