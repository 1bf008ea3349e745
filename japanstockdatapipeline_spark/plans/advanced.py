"""Advanced plans: running argmax (W5), latest×published join (J5),
JSON build/parse (F11), catch-up planning (ST2), and the rows-only
recursive operators (EMA/RSI smoothers, grouped-map snapshot)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.smoothers import with_smoothers
from ..operators.snapshot import technical_snapshot
from ..sources import load_table
from .registry import member, query


@member(
    "event_running_argmax",
    doc="W5 running argmax via max(struct) with a frame including "
    "same-ts peers (00116:136-144: max(ARRAY[rank, eps]) OVER ...).",
    oracle="""
    SELECT event_id, user_id,
           round((max({'v': value, 'id': event_id}) OVER w).v, 6) AS best_value,
           (max({'v': value, 'id': event_id}) OVER w).id AS best_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def event_running_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    best = F.max(F.struct(F.col("value").alias("v"), F.col("event_id").alias("id"))).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(best["v"], 6).alias("best_value"),
        best["id"].alias("best_event_id"),
    )


@member(
    "screen_latest_published",
    doc="J5 latest-snapshot LEFT JOIN published-snapshot (stock_screen, "
    "00051:18-53): per-customer latest order joined to the customer's "
    "state at a fixed 'published' cutoff; the cutoff is a scalar "
    "subquery evaluated once (computed literal).",
    oracle="""
    WITH latest AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    ), cutoff AS (
      SELECT max(o_orderdate) - INTERVAL 365 DAY AS pub FROM orders
    ), published AS (
      SELECT o_custkey, max(o_totalprice) AS pub_max_price,
             CAST(count(*) AS BIGINT) AS pub_n_orders
      FROM orders, cutoff WHERE o_orderdate <= pub
      GROUP BY o_custkey
    )
    SELECT l.o_custkey, l.o_orderkey,
           round(l.o_totalprice, 2) AS latest_price,
           round(p.pub_max_price, 2) AS pub_max_price,
           p.pub_n_orders
    FROM latest l LEFT JOIN published p ON l.o_custkey = p.o_custkey
    """,
)
def screen_latest_published(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    # scalar subquery -> computed literal (SURVEY §2.3 J5)
    pub = o.agg(F.max("o_orderdate")).first()[0]
    import datetime as dt

    cutoff = pub - dt.timedelta(days=365)
    published = (
        o.filter(F.col("o_orderdate") <= F.lit(cutoff))
        .groupBy("o_custkey")
        .agg(
            F.max("o_totalprice").alias("pub_max_price"),
            F.count(F.lit(1)).cast("bigint").alias("pub_n_orders"),
        )
    )
    return latest.join(published, "o_custkey", "left").select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("latest_price"),
        F.round("pub_max_price", 2).alias("pub_max_price"),
        "pub_n_orders",
    )


@query(
    "event_json_roundtrip",
    doc="F11 JSON parse + build (00002:13, 00114:60-90): extract props.k, "
    "rebuild a compact JSON payload — to_json(struct) matches DuckDB's "
    "to_json(struct_pack) byte-for-byte for int/string fields.",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS BIGINT),
                               t := event_type)) AS payload
    FROM events
    """,
)
def event_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.to_json(F.struct(k.alias("k"), F.col("event_type").alias("t"))).alias("payload"),
    )


@query(
    "catch_up_missing_days",
    doc="ST2/J10 catch-up planner core (catch-up.ts:86-117): calendar "
    "days (here: all days spanned by orders) anti-joined against days "
    "present, oldest 5 — the distributed form of determineTargetDates.",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ), cal AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM bounds
    ), present AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
    )
    SELECT strftime(d, '%Y-%m-%d') AS missing_day
    FROM cal WHERE d NOT IN (SELECT d FROM present)
    ORDER BY d LIMIT 5
    """,
)
def catch_up_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    present = o.select(F.col("o_orderdate").cast("date").alias("d")).distinct()
    return (
        cal.join(present, "d", "left_anti")
        .orderBy("d")
        .limit(5)
        .select(F.date_format("d", "yyyy-MM-dd").alias("missing_day"))
    )


@member(
    "user_value_smoothers",
    doc="W10/W11 recursive EMA (SMA-seeded) + RSI (Wilder) via "
    "applyInPandas per user (technical.ts:105-152) — not frame-window-"
    "expressible (the recurrence references its own output); the "
    "oracle replays the exact recurrences as RECURSIVE CTEs, so even "
    "the recursive family is value-checked, not just rows-only.",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), eseeds AS (
      SELECT user_id, avg(value) AS seed FROM base WHERE rn <= 12
      GROUP BY user_id HAVING count(*) = 12
    ), ema AS (
      SELECT b.user_id, b.rn, s.seed AS ema
      FROM base b JOIN eseeds s ON b.user_id = s.user_id WHERE b.rn = 12
      UNION ALL
      SELECT b.user_id, b.rn, b.value * (2.0/13.0) + e.ema * (1 - 2.0/13.0)
      FROM base b JOIN ema e ON b.user_id = e.user_id AND b.rn = e.rn + 1
    ), delta AS (
      SELECT user_id, rn,
             greatest(value - lag(value) OVER w, 0) AS g,
             greatest(lag(value) OVER w - value, 0) AS l
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY rn)
    ), rseeds AS (
      SELECT user_id, avg(g) AS ag, avg(l) AS al FROM delta
      WHERE rn BETWEEN 2 AND 15 GROUP BY user_id HAVING count(*) = 14
    ), wilder AS (
      SELECT d.user_id, d.rn, s.ag, s.al
      FROM delta d JOIN rseeds s ON d.user_id = s.user_id WHERE d.rn = 15
      UNION ALL
      SELECT d.user_id, d.rn, (w.ag * 13 + d.g) / 14, (w.al * 13 + d.l) / 14
      FROM delta d JOIN wilder w ON d.user_id = w.user_id AND d.rn = w.rn + 1
    )
    SELECT b.user_id, b.event_id,
           round(e.ema, 6) AS ema_12,
           round(CASE WHEN w.al = 0 AND w.ag = 0 THEN 50.0
                      WHEN w.al = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + w.ag / w.al) END, 6) AS rsi_14
    FROM base b
    LEFT JOIN ema e ON b.user_id = e.user_id AND b.rn = e.rn
    LEFT JOIN wilder w ON b.user_id = w.user_id AND b.rn = w.rn
    """,
)
def user_value_smoothers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us", "value"
    )
    out = with_smoothers(ev, "user_id", "ts_us", "value", ema_n=12, rsi_n=14)

    def nan_to_null(c):
        return F.when(~F.isnan(c), c)  # numpy NaN -> SQL NULL

    return out.select(
        "user_id",
        "event_id",
        F.round(nan_to_null(F.col("ema_12")), 6).alias("ema_12"),
        F.round(nan_to_null(F.col("rsi_14")), 6).alias("rsi_14"),
    )


@query(
    "user_technical_snapshot",
    bench=True,
    doc="§2.10 grouped-map snapshot (computeTechnicalSnapshot, "
    "technical.ts:361-410): full per-user series in, ONE row out — "
    "the complete 22-field reference snapshot (SMA/dev family, "
    "SMA25×75 cross+age, RSI, MACD, stochastic, Bollinger, ATR, "
    "vol_ratio_20, ichimoku cloud state at n-1-26) pinned by the "
    "golden-vector acceptance test. OHLCV synthesized from the value "
    "series (±1%% band, volume=value — events carry no OHLC). "
    "mapInPandas; recursive parts make it non-SQL-expressible: "
    "rows-only check here, golden test carries the numeric parity.",
)
def user_technical_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snapshot import technical_snapshot_ohlcv

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        F.col("value").alias("o"),
        (F.col("value") * 1.01).alias("h"),
        (F.col("value") * 0.99).alias("l"),
        F.col("value").alias("c"),
        F.col("value").alias("v"),
    )
    return technical_snapshot_ohlcv(ev, "user_id", "ts_us", "o", "h", "l", "c", "v")


@member(
    "user_value_macd",
    doc="W12 MACD + defined-region signal (technical.ts:161-178): "
    "EMA12-EMA26; signal = EMA9 *over the defined region of MACD* "
    "(SMA seed at the 9th defined row); hist = macd - signal. Three "
    "recursions, each replayed as a RECURSIVE CTE in the oracle.",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), s12 AS (
      SELECT user_id, avg(value) AS seed FROM base WHERE rn <= 12
      GROUP BY user_id HAVING count(*) = 12
    ), e12 AS (
      SELECT b.user_id, b.rn, s.seed AS v FROM base b JOIN s12 s USING (user_id) WHERE b.rn = 12
      UNION ALL
      SELECT b.user_id, b.rn, b.value * (2.0/13.0) + e.v * (1 - 2.0/13.0)
      FROM base b JOIN e12 e ON b.user_id = e.user_id AND b.rn = e.rn + 1
    ), s26 AS (
      SELECT user_id, avg(value) AS seed FROM base WHERE rn <= 26
      GROUP BY user_id HAVING count(*) = 26
    ), e26 AS (
      SELECT b.user_id, b.rn, s.seed AS v FROM base b JOIN s26 s USING (user_id) WHERE b.rn = 26
      UNION ALL
      SELECT b.user_id, b.rn, b.value * (2.0/27.0) + e.v * (1 - 2.0/27.0)
      FROM base b JOIN e26 e ON b.user_id = e.user_id AND b.rn = e.rn + 1
    ), macd AS (
      SELECT a.user_id, a.rn, a.v - c.v AS macd
      FROM e12 a JOIN e26 c ON a.user_id = c.user_id AND a.rn = c.rn
    ), sseed AS (
      -- defined region starts at rn=26; SMA seed over its first 9 rows
      SELECT user_id, avg(macd) AS seed FROM macd WHERE rn BETWEEN 26 AND 34
      GROUP BY user_id HAVING count(*) = 9
    ), sig AS (
      SELECT m.user_id, m.rn, s.seed AS v FROM macd m JOIN sseed s USING (user_id) WHERE m.rn = 34
      UNION ALL
      SELECT m.user_id, m.rn, m.macd * (2.0/10.0) + g.v * (1 - 2.0/10.0)
      FROM macd m JOIN sig g ON m.user_id = g.user_id AND m.rn = g.rn + 1
    )
    SELECT b.user_id, b.event_id,
           round(m.macd, 6) AS macd,
           round(g.v, 6) AS macd_signal,
           round(m.macd - g.v, 6) AS macd_hist
    FROM base b
    LEFT JOIN macd m ON b.user_id = m.user_id AND b.rn = m.rn
    LEFT JOIN sig g ON b.user_id = g.user_id AND b.rn = g.rn
    """,
)
def user_value_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.smoothers import macd_np

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts_us", "value")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_us").reset_index(drop=True)
        m, s, h = macd_np(pdf["value"].to_numpy(dtype=float))
        pdf["macd"], pdf["macd_signal"], pdf["macd_hist"] = m, s, h
        return pdf

    out = ev.groupBy("user_id").applyInPandas(
        compute,
        schema="user_id bigint, event_id bigint, ts_us bigint, value double, "
        "macd double, macd_signal double, macd_hist double",
    )

    def n2n(c):
        return F.when(~F.isnan(c), c)

    return out.select(
        "user_id",
        "event_id",
        F.round(n2n(F.col("macd")), 6).alias("macd"),
        F.round(n2n(F.col("macd_signal")), 6).alias("macd_signal"),
        F.round(n2n(F.col("macd_hist")), 6).alias("macd_hist"),
    )
