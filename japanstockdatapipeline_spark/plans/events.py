"""Time-series query plans over the events table.

The events table plays the role of the reference's daily bar series
(per-entity ordered series); these queries exercise the window
family, as-of joins, and validity-span range joins from SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import semantics as SEM
from ..operators.asof import asof_join, build_validity_spans, span_join
from ..operators.windows import (
    latest_per_key,
    running_max_excluding_current,
    rolling_stddev_pop,
    sma,
)
from ..sources import load_table
from .registry import member, query


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@query(
    "latest_event_per_user",
    doc="W1 row_number latest-per-key dedup-collapse (00116:95-102; "
    "latest disclosure per code).",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return latest_per_key(
        ev, ["user_id"], [F.col("ts_us").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_id", "ts_us", "event_type", "value")


@member(
    "rolling_event_stats",
    doc="W9/W13 SMA + Bollinger with full-window guard "
    "(technical.ts:75-102, 189-208): 5-row mean / population sigma, "
    "NULL until the window is complete.",
    oracle="""
    SELECT event_id, user_id,
           round(CASE WHEN count(value) OVER w5 = 5 THEN avg(value) OVER w5 END, 6) AS sma5,
           round(CASE WHEN count(value) OVER w5 = 5
                 THEN avg(value) OVER w5 + 2 * stddev_pop(value) OVER w5 END, 6) AS bb_up,
           round(CASE WHEN count(value) OVER w5 = 5
                 THEN avg(value) OVER w5 - 2 * stddev_pop(value) OVER w5 END, 6) AS bb_dn
    FROM events
    WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    bench=True,
)
def rolling_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    mid = sma(F.col("value"), w, 5)
    sd = rolling_stddev_pop(F.col("value"), w, 5)
    return ev.select(
        "event_id",
        "user_id",
        F.round(mid, 6).alias("sma5"),
        F.round(mid + 2 * sd, 6).alias("bb_up"),
        F.round(mid - 2 * sd, 6).alias("bb_dn"),
    )


@member(
    "event_running_high",
    doc="W20 running max excluding current row — the Nikkei new-high "
    "rule (market-breadth.ts:121-275): prior max is NULL on the first "
    "row, is_new_high NULL there too.",
    oracle="""
    SELECT event_id, user_id, value,
           round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6) AS prior_max,
           CASE WHEN max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL THEN NULL
                ELSE value > max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS is_new_high
    FROM events
    """,
)
def event_running_high(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prior = running_max_excluding_current(F.col("value"), w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(prior, 6).alias("prior_max"),
        F.when(prior.isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.col("value") > prior)
        .alias("is_new_high"),
    )


@member(
    "event_obv",
    doc="W16 OBV cumulative signed sum (technical.ts:268-275): sign of "
    "value vs previous value, cumulative sum of sign*value per user.",
    oracle="""
    SELECT event_id, user_id,
           round(sum(CASE WHEN value > lag_v THEN value
                          WHEN value < lag_v THEN -value
                          ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS obv
    FROM (
      SELECT *, lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_v
      FROM events
    )
    """,
)
def event_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lag_v = F.lag("value").over(w)
    signed = (
        F.when(F.col("value") > lag_v, F.col("value"))
        .when(F.col("value") < lag_v, -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    ev2 = ev.withColumn("__signed", signed)
    return ev2.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("__signed").over(
                Window.partitionBy("user_id")
                .orderBy("ts_us", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
            6,
        ).alias("obv"),
    )


@member(
    "purchase_asof_click",
    bench=True,
    doc="J6 as-of join (basket-valuation.ts:239-267 pitFy): for each "
    "purchase, the latest click value of the same user at or before it. "
    "Union-merge implementation: ONE shuffle, no non-equi join.",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           round(last_click_value, 6) AS last_click_value
    FROM (
      SELECT event_id, user_id, ts, event_type,
             last_value(click_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_left, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value
      FROM (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN value END AS click_val,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS is_left
        FROM events WHERE event_type IN ('click', 'purchase')
      )
    ) WHERE event_type = 'purchase'
    """,
)
def purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts_us",
        value_cols=["click_value"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round("click_value", 6).alias("last_click_value"),
    )


@query(
    "click_span_purchases",
    doc="J7 interval/range join (00116:146-195): click events open "
    "validity spans via lead(); purchases joined into their span; "
    "per-span count + sum.",
    oracle="""
    WITH spans AS (
      SELECT user_id, event_id AS span_id, ts AS eff_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
      FROM events WHERE event_type = 'click'
    )
    SELECT s.user_id, s.span_id,
           CAST(count(p.event_id) AS BIGINT) AS n_purchases,
           round(coalesce(sum(p.value), 0.0), 6) AS purchase_value
    FROM spans s
    LEFT JOIN events p
      ON p.event_type = 'purchase' AND p.user_id = s.user_id
     AND p.ts >= s.eff_from AND (s.eff_to IS NULL OR p.ts < s.eff_to)
    GROUP BY s.user_id, s.span_id
    """,
)
def click_span_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("span_id"), "ts_us"
    )
    spans = build_validity_spans(clicks, ["user_id"], "ts_us", tiebreak="span_id").select(
        "user_id", "span_id", "eff_from", "eff_to"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), "ts_us", "value"
    )
    joined = span_join(purchases, spans, ["user_id"], "ts_us")
    agg = joined.groupBy("user_id", "span_id").agg(
        F.count("p_id").alias("n_purchases"),
        F.round(F.sum("value"), 6).alias("purchase_value"),
    )
    # left semantics: spans with no purchases keep (0, 0.0)
    return (
        spans.select("user_id", "span_id")
        .join(agg, ["user_id", "span_id"], "left")
        .select(
            "user_id",
            "span_id",
            F.coalesce("n_purchases", F.lit(0)).cast("bigint").alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
        )
    )


@member(
    "event_type_corr",
    doc="A8 Pearson correlation / tracking error (basket-valuation.ts:"
    "623-651): corr(value, props.k) and stddev_samp(diff)*sqrt(252) per "
    "type. Uses the engines' streaming constant-memory aggregates ON "
    "PURPOSE: event_type cardinality is tiny, so a collect-and-fold "
    "determinization would pull corpus-scale groups into single tasks "
    "(the ordered-fold discipline applies only to BOUNDED group axes "
    "-- SCALE.md rule-5 note); the residual cross-engine low-bit "
    "exposure of these merge-order/algorithm-dependent moments is "
    "measured by the boundary canary every round.",
    oracle="""
    SELECT event_type,
           round(corr(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS corr_vk,
           round(stddev_samp(value - CAST(json_extract(props, '$.k') AS DOUBLE))
                 * sqrt(252.0), 6) AS tracking_error,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def event_type_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("double")
    ev2 = ev.withColumn("__k", k)
    return ev2.groupBy("event_type").agg(
        F.round(F.corr("value", "__k"), 6).alias("corr_vk"),
        F.round(F.stddev_samp(F.col("value") - F.col("__k")) * F.sqrt(F.lit(252.0)), 6).alias(
            "tracking_error"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "user_sessions",
    doc="Sessionization (tumbling/sliding windows exist in the "
    "reference as daily cadence; session windows are the Spark-native "
    "extension — SURVEY §2.9 note): per user, a >30-minute gap opens "
    "a new session; emit per-session bounds, event count, value sum. "
    "Batch form via lag+cumsum; the streaming form is "
    "F.session_window in streaming/jobs.py. value_sum folds in value "
    "order (SEM.ordered_fold_sum — per-session axis, bounded by the "
    "gap rule) and stays NULL for an all-NULL session, matching the "
    "plain sum() it replaced.",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY tu, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(tu) AS session_start_us, max(tu) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CASE WHEN count(value) > 0 THEN
             round({SEM.ordered_fold_sum_sql('value')}, 6) END AS value_sum
    FROM s GROUP BY user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_start = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    s = ev.withColumn("is_start", is_start).withColumn(
        "session_id",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        # ordered fold (SEM.ordered_fold_sum): shuffle-order-
        # independent low bits on the equality-hashed 6dp sum;
        # all-NULL sessions stay NULL like the plain sum() before it
        F.when(
            F.count("value") > 0, F.round(SEM.ordered_fold_sum(F.col("value")), 6)
        ).alias("value_sum"),
    )


@query(
    "series_asof_read",
    doc="Macro as-of read with the two-sided PIT predicate "
    "(get_latest_macro_indicators, 00033:8-24): per series, latest row "
    "with released_at <= cutoff AND indicator_date <= cutoff, ordered "
    "by (indicator_date DESC, released_at DESC) — DISTINCT ON form. "
    "events stand-in: series = event_type, indicator ts = ts_us, "
    "released = ts_us + props.k seconds (publication lag).",
    oracle="""
    WITH r AS (
      SELECT event_type AS series_id, event_id, value,
             epoch_us(ts) AS ind_us,
             epoch_us(ts) + CAST(json_extract(props, '$.k') AS BIGINT) * 1000000 AS rel_us
      FROM events
    ), f AS (
      SELECT *, row_number() OVER (
        PARTITION BY series_id ORDER BY ind_us DESC, rel_us DESC, event_id DESC) AS rn
      FROM r
      WHERE rel_us <= 1705881600000000 AND ind_us <= 1705881600000000
    )
    SELECT series_id, event_id, ind_us, rel_us, round(value, 6) AS value
    FROM f WHERE rn = 1
    """,
)
def series_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = 1_705_881_600_000_000  # 2024-01-22T00:00:00Z
    ev = _ev(spark, sf_dir)
    rel = F.col("ts_us") + F.get_json_object("props", "$.k").cast("bigint") * 1_000_000
    r = ev.select(
        F.col("event_type").alias("series_id"),
        "event_id",
        "value",
        F.col("ts_us").alias("ind_us"),
        rel.alias("rel_us"),
    ).filter((F.col("rel_us") <= cutoff) & (F.col("ind_us") <= cutoff))
    w = Window.partitionBy("series_id").orderBy(
        F.col("ind_us").desc(), F.col("rel_us").desc(), F.col("event_id").desc()
    )
    return (
        r.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("series_id", "event_id", "ind_us", "rel_us", F.round("value", 6).alias("value"))
    )


@member(
    "series_vintage_plan",
    doc="S5 FRED/ALFRED vintage fetch planner as a query over watermark "
    "metadata (macro.ts:43-48, 84-116): per series, observation_start = "
    "today-730 on first run (no watermark), today-90 for monthly/"
    "quarterly (vintage re-fetch window), else the last_value watermark. "
    "Planner-as-a-query is the 100 TB shape: the plan derives from the "
    "watermark table, not driver-side loops. Simulated catalog on "
    "events: series = event_type; 'error' plays the never-fetched "
    "series; signup/view are monthly. Day axis = epoch days (timezone-"
    "free); today pinned to day 19760 (2024-02-07). The pure control-"
    "plane twin (sources/ingest.py:vintage_fetch_plan) is property-"
    "checked equal to this plan in tests/test_vintage.py.",
    oracle="""
    WITH meta AS (
      SELECT event_type AS series_id,
             max(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS max_day
      FROM events GROUP BY 1
    ), m AS (
      SELECT series_id,
             CASE WHEN series_id IN ('signup', 'view') THEN 'monthly'
                  ELSE 'daily' END AS frequency,
             CASE WHEN series_id = 'error' THEN NULL ELSE max_day END AS last_value_day
      FROM meta
    ), p AS (
      SELECT *,
             CASE WHEN last_value_day IS NULL THEN 19760 - 730
                  WHEN frequency IN ('monthly', 'quarterly') THEN 19760 - 90
                  ELSE last_value_day END AS start_day,
             CASE WHEN last_value_day IS NULL THEN 'initial_backfill'
                  WHEN frequency IN ('monthly', 'quarterly') THEN 'vintage_refetch'
                  ELSE 'incremental' END AS reason
      FROM m
    )
    SELECT series_id, frequency, last_value_day,
           CAST(start_day AS BIGINT) AS start_day,
           strftime(DATE '1970-01-01' + start_day * INTERVAL 1 DAY, '%Y-%m-%d')
             AS observation_start,
           FALSE AS initial_release, reason,
           CAST(19760 - start_day AS BIGINT) AS planned_days
    FROM p
    """,
)
def series_vintage_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    TODAY = 19760  # pinned epoch day (2024-02-07), injectable like the pure twin
    ev = _ev(spark, sf_dir)
    meta = ev.groupBy(F.col("event_type").alias("series_id")).agg(
        F.max(F.expr("ts_us DIV 86400000000")).alias("max_day")
    )
    freq = F.when(F.col("series_id").isin("signup", "view"), "monthly").otherwise("daily")
    last_day = F.when(
        F.col("series_id") == "error", F.lit(None).cast("bigint")
    ).otherwise(F.col("max_day"))
    m = meta.select("series_id", freq.alias("frequency"), last_day.alias("last_value_day"))
    start = (
        F.when(F.col("last_value_day").isNull(), F.lit(TODAY - 730))
        .when(F.col("frequency").isin("monthly", "quarterly"), F.lit(TODAY - 90))
        .otherwise(F.col("last_value_day"))
    )
    reason = (
        F.when(F.col("last_value_day").isNull(), "initial_backfill")
        .when(F.col("frequency").isin("monthly", "quarterly"), "vintage_refetch")
        .otherwise("incremental")
    )
    return m.select(
        "series_id",
        "frequency",
        "last_value_day",
        start.cast("bigint").alias("start_day"),
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), start.cast("int")), "yyyy-MM-dd"
        ).alias("observation_start"),
        F.lit(False).alias("initial_release"),
        reason.alias("reason"),
        (F.lit(TODAY) - start).cast("bigint").alias("planned_days"),
    )
