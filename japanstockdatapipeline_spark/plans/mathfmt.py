"""Math/formatting/cleaning plans (F5, F8, P5, W15)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.semantics import clamp, safe_div
from ..sources import load_table
from .registry import member, query


@member(
    "order_math_features",
    doc="F5 math expression family (factor-vectors.ts:162-234): log "
    "market-cap, sqrt, pow, clamp ±3, inverse-PER earnings yield with "
    "the ≤0→NULL guard.",
    oracle="""
    SELECT o_orderkey,
           round(ln(o_totalprice), 6) AS log_price,
           round(sqrt(o_totalprice), 6) AS sqrt_price,
           round(pow(o_totalprice / 100000, 2), 6) AS pow_price,
           round(least(greatest((o_totalprice - 150000) / 50000, -3.0), 3.0), 6) + 0.0 AS clamped,
           round(CASE WHEN o_totalprice > 0 THEN 100000.0 / o_totalprice END, 6) AS inv_yield
    FROM orders
    """,
)
def order_math_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.log(tp), 6).alias("log_price"),
        F.round(F.sqrt(tp), 6).alias("sqrt_price"),
        F.round(F.pow(tp / 100000, 2), 6).alias("pow_price"),
        # + 0.0 canonicalizes IEEE -0.0 to +0.0 (engines disagree on the
        # sign of round(-2e-7, 6) and a value-hash would see "-0" != "0")
        (F.round(clamp((tp - 150000) / 50000, -3.0, 3.0), 6) + 0.0).alias("clamped"),
        F.round(safe_div(F.lit(100000.0), tp), 6).alias("inv_yield"),
    )


@member(
    "embedding_vector_literal",
    doc="F8 vector literal formatting (factor-vectors.ts:314-316): "
    "'[x.xxxxxx,...]' with 6-dp fixed-point per element — printf-style "
    "%.6f in both engines.",
    oracle="""
    SELECT vec_id,
           '[' || array_to_string(list_transform(embedding::DOUBLE[],
                                  x -> printf('%.6f', x)), ',') || ']' AS vec_literal
    FROM embeddings WHERE vec_id % 100 = 0
    """,
)
def embedding_vector_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)
    lit = F.concat(
        F.lit("["),
        F.concat_ws(
            ",",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.format_string("%.6f", x),
            ),
        ),
        F.lit("]"),
    )
    return emb.select("vec_id", lit.alias("vec_literal"))


@member(
    "doc_source_null_normalization",
    doc="P5 null normalization (fins-summary.ts:156-161: empty-string→"
    "NULL across numeric columns; PostgREST numeric-as-string→number): "
    "blank-out sentinel values, cast digit-strings, coalesce-fill.",
    oracle="""
    SELECT doc_id,
           nullif(trim(source), '') AS source_clean,
           CASE WHEN regexp_extract(source, '([0-9]+)$', 1) <> ''
                THEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) END AS source_num,
           coalesce(nullif(lang, ''), 'und') AS lang_filled
    FROM documents
    """,
)
def doc_source_null_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    num_str = F.regexp_extract(F.col("source"), r"([0-9]+)$", 1)
    return d.select(
        "doc_id",
        F.nullif(F.trim("source"), F.lit("")).alias("source_clean"),
        F.when(num_str != "", num_str.try_cast("bigint")).alias("source_num"),
        F.coalesce(F.nullif(F.col("lang"), F.lit("")), F.lit("und")).alias("lang_filled"),
    )


@member(
    "user_value_atr",
    doc="W15 ATR (Wilder, technical.ts:242-265) on a synthesized "
    "high/low band (±1% of value — events carry no OHLC): true range "
    "via prev close, Wilder recursion seeded over the first 14 TRs. "
    "Recursive → applyInPandas; oracle replays the recurrence as a "
    "RECURSIVE CTE.",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id, event_id, value,
             value * 1.01 AS high, value * 0.99 AS low,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), tr AS (
      SELECT user_id, event_id, rn,
             CASE WHEN rn = 1 THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(value) OVER w),
                                abs(low - lag(value) OVER w)) END AS tr
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY rn)
    ), seeds AS (
      SELECT user_id, avg(tr) AS seed FROM tr WHERE rn BETWEEN 2 AND 15
      GROUP BY user_id HAVING count(*) = 14
    ), atr AS (
      SELECT t.user_id, t.rn, s.seed AS atr
      FROM tr t JOIN seeds s ON t.user_id = s.user_id WHERE t.rn = 15
      UNION ALL
      SELECT t.user_id, t.rn, (a.atr * 13 + t.tr) / 14
      FROM tr t JOIN atr a ON t.user_id = a.user_id AND t.rn = a.rn + 1
    )
    SELECT b.user_id, b.event_id, round(a.atr, 6) AS atr_14
    FROM base b LEFT JOIN atr a ON b.user_id = a.user_id AND b.rn = a.rn
    """,
)
def user_value_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.smoothers import atr_np

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts_us", "value")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_us").reset_index(drop=True)
        v = pdf["value"].to_numpy(dtype=float)
        high, low = v * 1.01, v * 0.99
        pdf["atr_14"] = atr_np(high, low, v, 14)
        return pdf

    out = ev.groupBy("user_id").applyInPandas(
        compute,
        schema="user_id bigint, event_id bigint, ts_us bigint, value double, atr_14 double",
    )
    atr = F.when(~F.isnan("atr_14"), F.col("atr_14"))  # numpy NaN -> NULL
    return out.select("user_id", "event_id", F.round(atr, 6).alias("atr_14"))
