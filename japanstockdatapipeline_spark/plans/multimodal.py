"""Multimodal + era-date plans (north-star multimodal columns; S7
era-date scan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import semantics as _SEM
from ..functions.japanese import era_date_to_iso, iso_to_era_date
from ..operators.multimodal import attach_fake_payload, frame_sample_plan, image_stats
from ..sources import load_table
from .registry import member, query


@query(
    "multimodal_image_stats",
    doc="North-star multimodal: binary payload column + typed metadata, "
    "Arrow-batched mapInPandas feature extraction (decode is a "
    "deterministic fake — see operators/multimodal.py). Oracle: the "
    "payload is the UTF-8 encoding of the text column, so DuckDB "
    "recomputes every statistic over the actual UTF-8 octets (hex-"
    "decoded, so non-ASCII corpora match too) plus the sha256 digest "
    "— a true value-level check of the binary-column plumbing, not "
    "rows-only.",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, hex(encode(text)) AS h,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT doc_id,
           CAST(nb AS BIGINT) AS n_bytes,
           CASE WHEN nb = 0 THEN 0.0 ELSE {MEAN} END AS mean_byte,
           CAST(coalesce(list_max(list_transform(range(1, nb + 1),
                        i -> CAST('0x' || substr(h, 2*i - 1, 2) AS INT))), 0)
                AS INT) AS max_byte,
           sha256(text) AS sha256,
           CAST(length(text) % 640 + 16 AS INT) AS width,
           CAST(length(text) % 480 + 16 AS INT) AS height
    FROM b
    """.replace(
        "{MEAN}",
        _SEM.round6_ratio_sql(
            "list_sum(list_transform(range(1, nb + 1),"
            " i -> CAST('0x' || substr(h, 2*i - 1, 2) AS INT)))",
            "nb",
        ),
    ),
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_payload(docs)
    out = image_stats(media)
    # exact 6dp mean from the integer byte sum (sum/len is a rational
    # that lands on .5e-6 boundaries — 4 rows at sf0.01; SCALE.md rule
    # 5 extended); zero-byte payloads keep the 0.0 convention
    mean = F.when(
        F.col("n_bytes") > 0, _SEM.round6_ratio("sum_byte", "n_bytes")
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_bytes",
        mean.alias("mean_byte"),
        "max_byte",
        "sha256",
        "width",
        "height",
    )


@query(
    "multimodal_frame_plan",
    doc="North-star multimodal: metadata-only frame-sampling plan "
    "(explode of sequence over n_frames) — the binary payload is "
    "pruned out of the scan entirely.",
    oracle="""
    SELECT doc_id, CAST(u.f AS INT) AS frame_idx
    FROM (
      SELECT doc_id, length(text) % 24 + 1 AS n_frames FROM documents
    ), LATERAL unnest(range(0, n_frames, 4)) AS u(f)
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_payload(docs)
    return frame_sample_plan(media, every_n=4).select(
        "doc_id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


@member(
    "era_date_roundtrip",
    doc="S7 Japanese era-date parse (mof/client.ts:29-104): format each "
    "distinct order date as <era>N年M月D日 (元年 for year 1) and parse "
    "it back — both directions as pure expressions, same rules in the "
    "oracle.",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders),
    based AS (
      -- era chosen ONCE by the FULL transition date (令和 from
      -- 2019-05-01, 平成 from 1989-01-08), matching
      -- functions/japanese.py; era name derives from the base year
      SELECT d,
             CASE WHEN d >= DATE '2019-05-01' THEN 2018
                  WHEN d >= DATE '1989-01-08' THEN 1988 ELSE 1925 END AS base
      FROM days
    ),
    fmt AS (
      SELECT d,
             (CASE base WHEN 2018 THEN '令和'
                        WHEN 1988 THEN '平成' ELSE '昭和' END)
             || (CASE WHEN year(d) - base = 1
                 THEN '元' ELSE CAST(year(d) - base AS VARCHAR) END)
             || '年' || CAST(month(d) AS VARCHAR) || '月'
             || CAST(day(d) AS VARCHAR) || '日' AS era_str
      FROM based
    )
    SELECT strftime(d, '%Y-%m-%d') AS order_date, era_str,
           strftime(make_date(
             (CASE WHEN era_str LIKE '令和%' THEN 2018
                   WHEN era_str LIKE '平成%' THEN 1988 ELSE 1925 END)
             + (CASE WHEN regexp_extract(era_str, '^(?:令和|平成|昭和)(元|\\d+)年', 1) = '元'
                THEN 1 ELSE CAST(regexp_extract(era_str, '^(?:令和|平成|昭和)(\\d+)年', 1) AS INT) END),
             CAST(regexp_extract(era_str, '(\\d+)月', 1) AS INT),
             CAST(regexp_extract(era_str, '(\\d+)日', 1) AS INT)), '%Y-%m-%d') AS parsed_back
    FROM fmt
    """,
)
def era_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    days = o.select(F.col("o_orderdate").cast("date").alias("d")).distinct()
    fmt = days.withColumn("era_str", iso_to_era_date(F.col("d")))
    return fmt.select(
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        "era_str",
        F.date_format(era_date_to_iso(F.col("era_str")), "yyyy-MM-dd").alias(
            "parsed_back"
        ),
    )
