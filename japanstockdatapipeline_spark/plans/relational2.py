"""Second batch of relational plans: unpivot (UDTF-shaped), calendar
algebra (F1-F3), SCD2 as-of lookup (P3), set diff (J12), nulls-last
ranking (T4), ID synthesis (F10), format checks (P4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import build_validity_spans
from ..sources import load_table
from .registry import member, query


@query(
    "lineitem_unpivot",
    doc="UDTF-shaped 1-row→N-rows unpivot (investor-types wide→52 "
    "narrow rows, investor-types.ts:110-141; session explosion "
    "equity-bars-daily.ts:125-144): melt 4 metrics into (metric, value).",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS metric_value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "metric_value",
    ).withColumn("metric", F.regexp_replace("metric", "^l_", ""))


@member(
    "order_calendar_math",
    doc="F1/F2/F3 date calculus (date.ts:38-136, business-day.ts, "
    "add_months clamp): JST shift (+9h fixed, as the reference "
    "hardcodes), day index, prev/next distinct order date via lag/lead, "
    "day diffs, month-add with end-of-month clamp.",
    oracle="""
    WITH days AS (SELECT DISTINCT o_orderdate AS d FROM orders)
    SELECT strftime(d, '%Y-%m-%d') AS order_date,
           strftime(d + INTERVAL 9 HOUR, '%Y-%m-%d %H:%M:%S') AS jst_ts,
           strftime(lag(d) OVER (ORDER BY d), '%Y-%m-%d') AS prev_date,
           strftime(lead(d) OVER (ORDER BY d), '%Y-%m-%d') AS next_date,
           CAST(date_diff('day', lag(d) OVER (ORDER BY d), d) AS BIGINT) AS gap_days,
           strftime(CAST(d + INTERVAL 12 MONTH AS DATE), '%Y-%m-%d') AS plus_12m,
           CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) AS days_since_epoch_start
    FROM days
    """,
)
def order_calendar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    days = o.select(F.col("o_orderdate").alias("d")).distinct()
    w = Window.orderBy("d")
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        F.date_format(
            F.col("d") + F.expr("INTERVAL 9 HOURS"), "yyyy-MM-dd HH:mm:ss"
        ).alias("jst_ts"),
        F.date_format(F.lag("d").over(w), "yyyy-MM-dd").alias("prev_date"),
        F.date_format(F.lead("d").over(w), "yyyy-MM-dd").alias("next_date"),
        F.datediff(F.col("d"), F.lag("d").over(w)).cast("bigint").alias("gap_days"),
        F.date_format(F.add_months("d", 12), "yyyy-MM-dd").alias("plus_12m"),
        F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


@query(
    "user_scd2_asof",
    doc="P3 SCD2 validity-window as-of lookup (00010:33, equity-master."
    "ts:615-637): event-type transitions per user form SCD2 rows via "
    "lead(); the as-of row at a fixed instant is the one with "
    "valid_from <= t AND (valid_to IS NULL OR valid_to > t).",
    oracle="""
    WITH scd AS (
      SELECT user_id, event_type AS attr, epoch_us(ts) AS valid_from, event_id,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events
    )
    SELECT user_id, attr, valid_from, valid_to
    FROM scd
    WHERE valid_from <= 1705276800000000
      AND (valid_to IS NULL OR valid_to > 1705276800000000)
    """,
)
def user_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = 1705276800000000  # 2024-01-15T00:00:00Z in epoch micros
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("attr"), "ts_us", "event_id"
    )
    scd = build_validity_spans(ev, ["user_id"], "ts_us", tiebreak="event_id").select(
        "user_id",
        "attr",
        F.col("eff_from").alias("valid_from"),
        F.col("eff_to").alias("valid_to"),
    )
    return scd.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


@query(
    "customer_cohort_diff",
    doc="J12/U2 set symmetric difference (basket constituent diff, "
    "basket-valuation.ts:442-448): customers ordering in 1995 vs 2000 "
    "— toAdd / toClose via two anti-joins.",
    oracle="""
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
         c00 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2001-01-01')
    SELECT o_custkey, 'to_add' AS change_type FROM c00
    WHERE o_custkey NOT IN (SELECT o_custkey FROM c95)
    UNION ALL
    SELECT o_custkey, 'to_close' FROM c95
    WHERE o_custkey NOT IN (SELECT o_custkey FROM c00)
    """,
)
def customer_cohort_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def cohort(y0, y1):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp_ntz"))
            )
            .select("o_custkey")
            .distinct()
        )

    c95, c00 = cohort(1995, 1996), cohort(2000, 2001)
    to_add = c00.join(c95, "o_custkey", "left_anti").withColumn(
        "change_type", F.lit("to_add")
    )
    to_close = c95.join(c00, "o_custkey", "left_anti").withColumn(
        "change_type", F.lit("to_close")
    )
    return to_add.unionByName(to_close)


@member(
    "segment_rank_nulls_last",
    doc="T4 ranking with NULLS LAST over a liquidity-style partition "
    "(00120:168-177): rank customers per segment by max open-order "
    "price DESC NULLS LAST.",
    oracle="""
    WITH m AS (
      SELECT c_custkey, c_mktsegment,
             max(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS max_p
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment
    )
    SELECT c_custkey, c_mktsegment, round(max_p, 2) AS max_p,
           CAST(row_number() OVER (PARTITION BY c_mktsegment
                ORDER BY max_p DESC NULLS LAST, c_custkey) AS BIGINT) AS seg_rank
    FROM m
    """,
)
def segment_rank_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    m = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.max(
                F.when(F.col("o_orderstatus") == "P", F.col("o_totalprice"))
            ).alias("max_p")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("max_p").desc_nulls_last(), F.col("c_custkey").asc()
    )
    return m.select(
        "c_custkey",
        "c_mktsegment",
        F.round("max_p", 2).alias("max_p"),
        F.row_number().over(w).cast("bigint").alias("seg_rank"),
    )


@member(
    "order_id_synthesis",
    doc="F10 ID synthesis (generateDisclosureId, fins-summary.ts:49-73): "
    "coalesce(native id, composite of code_date_type) — NULLIF models "
    "the missing-DiscNo case.",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderpriority, '1-URGENT'),
                    CAST(o_custkey AS VARCHAR) || '_' ||
                    strftime(o_orderdate, '%Y-%m-%d') || '_' ||
                    o_orderstatus) AS synth_id
    FROM orders
    """,
)
def order_id_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.concat_ws(
                "_",
                F.col("o_custkey").cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.col("o_orderstatus"),
            ),
        ).alias("synth_id"),
    )


@query(
    "part_brand_format_check",
    doc="P4 data-quality regex predicate (code-format CHECK "
    "^[0-9]{3}[0-9A-Z][0-9]$, 00119:1-40): validate p_brand format "
    "and aggregate pass rate per type prefix.",
    oracle="""
    SELECT split_part(p_type, ' ', 1) AS type_prefix,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]{2}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_brand
    FROM part GROUP BY 1
    """,
)
def part_brand_format_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.groupBy(
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_prefix")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(
            F.when(F.col("p_brand").rlike(r"^Brand#[0-9]{2}$"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_valid_brand"),
    )


@query(
    "scd2_master_apply",
    doc="SCD2 write path (equity-master.ts:469-530, 00010:18-53): "
    "apply a snapshot to a Type-2 master — close-old/insert-new on "
    "attribute change, close on delisting, insert on new/relisting; "
    "valid_from inclusive, valid_to exclusive (NULL = current). "
    "Master = each customer's latest-1994 order priority; snapshot = "
    "latest-1995; effective 1995-01-01. One full-outer join, 0-2 "
    "output rows per key via exploded struct array — no driver loop.",
    oracle="""
    WITH m94 AS (
      SELECT o_custkey AS custkey, o_orderpriority AS attr
      FROM (SELECT o_custkey, o_orderpriority,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
            WHERE o_orderdate >= DATE '1994-01-01'
              AND o_orderdate < DATE '1995-01-01')
      WHERE rn = 1
    ), s95 AS (
      SELECT o_custkey AS custkey, o_orderpriority AS attr
      FROM (SELECT o_custkey, o_orderpriority,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
            WHERE o_orderdate >= DATE '1995-01-01'
              AND o_orderdate < DATE '1996-01-01')
      WHERE rn = 1
    ), j AS (
      SELECT m.custkey AS m_key, m.attr AS m_attr,
             s.custkey AS s_key, s.attr AS s_attr
      FROM m94 m FULL JOIN s95 s ON m.custkey = s.custkey
    )
    SELECT custkey, attr, valid_from, valid_to, is_current FROM (
      SELECT m_key AS custkey, m_attr AS attr, '1994-01-01' AS valid_from,
             CAST(NULL AS VARCHAR) AS valid_to, true AS is_current
      FROM j WHERE m_key IS NOT NULL AND s_key IS NOT NULL AND m_attr = s_attr
      UNION ALL
      SELECT m_key, m_attr, '1994-01-01', '1995-01-01', false
      FROM j WHERE m_key IS NOT NULL AND (s_key IS NULL OR m_attr <> s_attr)
      UNION ALL
      SELECT s_key, s_attr, '1995-01-01', CAST(NULL AS VARCHAR), true
      FROM j WHERE s_key IS NOT NULL AND (m_key IS NULL OR m_attr <> s_attr)
    )
    """,
)
def scd2_master_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import scd2_apply

    o = load_table(spark, sf_dir, "orders")

    def latest_priority(year: int) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
        )
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("date"))
            )
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("o_custkey").alias("custkey"),
                F.col("o_orderpriority").alias("attr"),
            )
        )

    master = latest_priority(1994).select(
        "custkey",
        "attr",
        F.lit("1994-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return scd2_apply(
        master, latest_priority(1995), ["custkey"], ["attr"], "1995-01-01"
    )
