"""S9 scraper-parse plans: the pure parsing halves of the reference's
HTML/JS scrapers, exercised as format->parse round trips over testdata
(same pattern as era_date_roundtrip: synthesize the wire format from
table columns in-engine, parse it back with the expression library,
oracle computes the expected values directly from the source columns).

Reference: nikkei225jp-client.ts:101-230 (JS var-array payload,
column range checks, epoch-ms JST dates), kabuyutai-client.ts:36-84
(benefit value/category heuristics, local-code extraction). The
network clients are out of scope; these plans prove the parsers are
Catalyst expressions that run at scan speed over a payload lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scrapers import (
    NIKKEI_RANGE_CHECKS,
    epoch_ms_to_jst_date,
    estimate_benefit_value,
    estimate_category,
    extract_local_code,
    in_range,
    js_var_array_to_json,
)
from ..sources import load_table
from .registry import member, query


@query(
    "scraper_var_array_roundtrip",
    doc="S9 nikkei225jp JS-var payload parse (nikkei225jp-client.ts:"
    "115-175): build a `var D = [[epoch_ms, close,, vi,]];` payload "
    "per order (with empty elements), normalize to JSON, from_json, "
    "explode, then JST date + per-column range checks. Oracle computes "
    "the expected values directly from the source columns, so the "
    "whole format->parse->check path is value-verified.",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS jst_date,
           CASE WHEN o_totalprice >= 5000 AND o_totalprice <= 200000
                THEN o_totalprice END AS close,
           CASE WHEN (o_orderkey % 120) >= 8 AND (o_orderkey % 120) <= 100
                THEN CAST(o_orderkey % 120 AS DOUBLE) END AS vi,
           true AS gap_is_null
    FROM orders
    """,
)
def scraper_var_array_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # date-based epoch ms (00:00 UTC = 09:00 JST same calendar day)
    ms = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).cast(
        "bigint"
    ) * F.lit(86400000)
    vi_raw = (F.col("o_orderkey") % 120).cast("double")
    payload = F.concat(
        F.lit("var D = [["),
        ms.cast("string"),
        F.lit(","),
        F.col("o_totalprice").cast("string"),
        F.lit(",,"),
        vi_raw.cast("string"),
        F.lit(",]];"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_json(js_var_array_to_json(payload), "array<array<double>>").alias("__rows"),
    ).select("o_orderkey", F.element_at("__rows", 1).alias("__r"))
    return parsed.select(
        "o_orderkey",
        epoch_ms_to_jst_date(F.element_at("__r", 1)).alias("jst_date"),
        in_range(F.element_at("__r", 2), NIKKEI_RANGE_CHECKS["nikkei_close"]).alias("close"),
        in_range(F.element_at("__r", 4), NIKKEI_RANGE_CHECKS["nikkei_vi"]).alias("vi"),
        F.element_at("__r", 3).isNull().alias("gap_is_null"),
    )


@query(
    "benefit_parse_roundtrip",
    doc="S9 kabuyutai benefit heuristics (kabuyutai-client.ts:36-84): "
    "synthesize a benefit line per part — category keyword + yen "
    "amount + local code in full-width parens (numeric old format and "
    "letter new format, mixed case) — then extract value, category, "
    "and 5-digit code with the expression parsers. Oracle derives the "
    "expected values from the same arithmetic.",
    oracle="""
    SELECT p_partkey,
           CASE WHEN amt > 0 AND amt < 1000000 THEN amt END AS benefit_value,
           CASE WHEN p_partkey % 3 = 0 THEN '金券'
                WHEN p_partkey % 3 = 1 THEN '食品' ELSE 'その他' END AS category,
           CASE WHEN p_partkey % 2 = 0
                THEN lpad(CAST(p_partkey % 10000 AS VARCHAR), 4, '0') || '0'
                ELSE lpad(CAST(p_partkey % 1000 AS VARCHAR), 3, '0')
                     || chr(65 + CAST(p_partkey % 26 AS INT)) || '0' END AS local_code
    FROM (SELECT p_partkey, CAST(round(p_retailprice) AS BIGINT) * 100 AS amt FROM part)
    """,
)
def benefit_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    amt = F.round("p_retailprice").cast("bigint") * 100
    kw = (
        F.when(F.col("p_partkey") % 3 == 0, F.lit("クオカード "))
        .when(F.col("p_partkey") % 3 == 1, F.lit("お米詰め合わせ "))
        .otherwise(F.lit("記念品 "))
    )
    # old format: 4-digit numeric; new format: 3 digits + letter,
    # lower-cased on the wire to exercise the uppercase normalization
    code = F.when(
        F.col("p_partkey") % 2 == 0,
        F.lpad((F.col("p_partkey") % 10000).cast("string"), 4, "0"),
    ).otherwise(
        F.concat(
            F.lpad((F.col("p_partkey") % 1000).cast("string"), 3, "0"),
            F.lower(F.expr("char(65 + pmod(p_partkey, 26))")),
        )
    )
    content = F.concat(
        kw,
        F.format_number(amt, 0),
        F.lit("円相当 （"),
        code,
        F.lit("）"),
    )
    out = p.select("p_partkey", content.alias("__c"))
    return out.select(
        "p_partkey",
        estimate_benefit_value(F.col("__c")).alias("benefit_value"),
        estimate_category(F.col("__c")).alias("category"),
        extract_local_code(F.col("__c")).alias("local_code"),
    )


@member(
    "yahoo_chart_roundtrip",
    doc="S8 Yahoo chart parse (yahoo-chart-client.ts:93-126): build a "
    "chart-API JSON payload per order-year in-engine (timestamps at "
    "JST midnight, close = daily avg price with injected null holes, "
    "open with independent holes), then parse it back with "
    "parse_yahoo_chart — zip/explode, drop null-close rows, 2 dp "
    "rounding, JST dates, last-wins dedup. Oracle computes the "
    "expected bars directly from orders.",
    oracle="""
    -- 2 dp via floor(x*100+0.5)/100 on BOTH sides: engine round()
    -- semantics differ at representation half-way points, identical
    -- IEEE floor arithmetic does not
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             floor(avg(o_totalprice) * 100 + 0.5) / 100 AS c
      FROM orders GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS order_date,
           c AS yc_close,
           CASE WHEN day(d) % 7 <> 0
                THEN floor(c * 0.99 * 100 + 0.5) / 100 END AS yc_open,
           floor(c * 1.01 * 100 + 0.5) / 100 AS yc_high,
           floor(c * 0.98 * 100 + 0.5) / 100 AS yc_low
    FROM daily
    WHERE day(d) % 29 <> 0
    """,
)
def yahoo_chart_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scrapers import parse_yahoo_chart

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        (F.floor(F.avg("o_totalprice") * 100 + F.lit(0.5)) / 100.0).alias("c")
    )
    # JST-midnight epoch seconds for date d: days*86400 - 9h
    ts = (
        F.datediff("d", F.lit("1970-01-01").cast("date")).cast("bigint") * 86400 - 32400
    )
    feat = daily.select(
        F.year("d").alias("yr"),
        F.struct(
            ts.alias("ts"),
            # day%29==0 -> null close: the whole bar must be dropped
            F.when(F.dayofmonth("d") % 29 != 0, F.col("c")).alias("close"),
            # day%7==0 -> null open: hole preserved independently
            F.when(
                F.dayofmonth("d") % 7 != 0,
                F.floor(F.col("c") * 0.99 * 100 + F.lit(0.5)) / 100.0,
            ).alias("open"),
            (F.floor(F.col("c") * 1.01 * 100 + F.lit(0.5)) / 100.0).alias("high"),
            (F.floor(F.col("c") * 0.98 * 100 + F.lit(0.5)) / 100.0).alias("low"),
        ).alias("bar"),
    )
    payload = (
        feat.groupBy("yr")
        .agg(F.sort_array(F.collect_list("bar")).alias("rows"))
        .select(
            "yr",
            F.to_json(
                F.struct(
                    F.struct(
                        F.array(
                            F.struct(
                                F.transform("rows", lambda r: r["ts"]).alias("timestamp"),
                                F.struct(
                                    F.array(
                                        F.struct(
                                            F.transform("rows", lambda r: r["close"]).alias("close"),
                                            F.transform("rows", lambda r: r["open"]).alias("open"),
                                            F.transform("rows", lambda r: r["high"]).alias("high"),
                                            F.transform("rows", lambda r: r["low"]).alias("low"),
                                        )
                                    ).alias("quote")
                                ).alias("indicators"),
                            )
                        ).alias("result")
                    ).alias("chart")
                ),
                {"ignoreNullFields": "false"},
            ).alias("payload"),
        )
    )
    bars = parse_yahoo_chart(payload, "payload")
    return bars.select(
        F.col("bar_date").alias("order_date"),
        F.col("bar_close").alias("yc_close"),
        F.col("bar_open").alias("yc_open"),
        F.col("bar_high").alias("yc_high"),
        F.col("bar_low").alias("yc_low"),
    )


@member(
    "estat_obs_roundtrip",
    doc="S6 e-Stat observation parse (estat/client.ts:190-358): per "
    "order date, synthesize a raw observation — a time code in one of "
    "the reference's positional formats (YYYY00MM00 / YYYYMM) and a "
    "value string with missing-markers mixed in — then parse back "
    "with estat_clean_value + estat_time_code_to_date (missing/non-"
    "numeric -> NULL, time code -> month-end date). Oracle computes "
    "the expected values directly.",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(floor(avg(o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS order_date,
           CASE WHEN day(d) % 11 = 0 OR day(d) % 13 = 0 THEN NULL
                ELSE cents / 100.0 END AS es_value,
           strftime(last_day(d), '%Y-%m-%d') AS es_month_end
    FROM daily
    """,
)
def estat_obs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scrapers import estat_clean_value, estat_time_code_to_date

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.floor(F.avg("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents")
    )
    # wire format: positional time code + raw value string with the
    # reference's missing markers sprinkled in
    code = F.when(
        F.dayofmonth("d") % 2 == 0,
        F.concat(F.date_format("d", "yyyy"), F.lit("00"), F.date_format("d", "MM"), F.lit("00")),
    ).otherwise(F.date_format("d", "yyyyMM"))
    raw = (
        F.when(F.dayofmonth("d") % 11 == 0, F.lit("-"))
        .when(F.dayofmonth("d") % 13 == 0, F.lit("x"))
        .otherwise(F.col("cents").cast("string"))
    )
    wire = daily.select("d", code.alias("time_code"), raw.alias("raw_value"))
    return wire.select(
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        (estat_clean_value(F.col("raw_value")) / 100.0).alias("es_value"),
        estat_time_code_to_date(F.col("time_code")).alias("es_month_end"),
    )
