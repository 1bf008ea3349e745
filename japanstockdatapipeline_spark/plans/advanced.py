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
    # scalar subquery as a lazy broadcast 1-row aggregate (SURVEY §2.3 J5):
    # the cutoff is still evaluated once, but inside the job, not at
    # plan-construction time.
    cut = o.agg((F.max("o_orderdate") - F.expr("INTERVAL 365 DAY")).alias("pub"))
    published = (
        o.crossJoin(F.broadcast(cut))
        .filter(F.col("o_orderdate") <= F.col("pub"))
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


_SNAPSHOT_ORACLE = """
    WITH RECURSIVE base AS (
      SELECT user_id, value, value*1.01 AS high, value*0.99 AS low, value AS vol,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    lastbar AS (SELECT user_id, n, value AS close, vol FROM base WHERE rn = n),
    aggs AS (
      SELECT user_id,
        avg(CASE WHEN n >= 25 AND rn > n - 25 THEN value END) AS sma_25,
        avg(CASE WHEN n >= 75 AND rn > n - 75 THEN value END) AS sma_75,
        avg(CASE WHEN n >= 200 AND rn > n - 200 THEN value END) AS sma_200,
        avg(CASE WHEN n >= 20 AND rn > n - 20 THEN value END) AS bb_mid,
        var_pop(CASE WHEN n >= 20 AND rn > n - 20 THEN value END) AS bb_var,
        avg(CASE WHEN n >= 20 AND rn > n - 20 THEN vol END) AS vol_avg20
      FROM base GROUP BY user_id
    ),
    obvc AS (
      SELECT user_id,
             coalesce(sum(CASE WHEN rn > 1 THEN sign(value - pv) * vol END), 0) AS obv
      FROM (SELECT user_id, rn, value, vol,
                   lag(value) OVER (PARTITION BY user_id ORDER BY rn) AS pv FROM base)
      GROUP BY user_id
    ),
    sser AS (
      SELECT user_id, rn, n,
        CASE WHEN rn >= 25 THEN avg(value) OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) END AS s25,
        CASE WHEN rn >= 75 THEN avg(value) OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN 74 PRECEDING AND CURRENT ROW) END AS s75
      FROM base
    ),
    signs AS (
      SELECT user_id, rn, n, sign(s25 - s75) AS sg FROM sser
      WHERE s25 IS NOT NULL AND s75 IS NOT NULL AND s25 <> s75
    ),
    flips AS (
      SELECT user_id, rn, n, sg,
             lag(sg) OVER (PARTITION BY user_id ORDER BY rn) AS psg
      FROM signs
    ),
    lastflip AS (
      SELECT user_id, max(rn) AS frn FROM flips
      WHERE psg IS NOT NULL AND sg <> psg GROUP BY user_id
    ),
    crossinfo AS (
      SELECT f.user_id,
             CASE WHEN f.sg > 0 THEN 'golden' ELSE 'dead' END AS cross_25_75,
             CAST(f.n - f.rn AS BIGINT) AS cross_25_75_age
      FROM flips f JOIN lastflip lf ON f.user_id = lf.user_id AND f.rn = lf.frn
    ),
    sto1 AS (
      SELECT user_id, rn, n, value,
        CASE WHEN rn >= 14 THEN max(high) OVER wst END AS hh,
        CASE WHEN rn >= 14 THEN min(low) OVER wst END AS ll
      FROM base
      WINDOW wst AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    sto2 AS (
      SELECT user_id, rn, n,
        CASE WHEN hh IS NOT NULL AND hh <> ll
             THEN 100.0*(value - ll)/(hh - ll) END AS raw_k
      FROM sto1
    ),
    sto3 AS (
      SELECT user_id, rn, n,
        CASE WHEN rn >= 3 AND count(raw_k) OVER w3 = 3
             THEN avg(raw_k) OVER w3 END AS k_s
      FROM sto2
      WINDOW w3 AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ),
    sto4 AS (
      SELECT user_id, rn, n, k_s,
        CASE WHEN rn >= 3 AND count(k_s) OVER w3b = 3
             THEN avg(k_s) OVER w3b END AS d_s
      FROM sto3
      WINDOW w3b AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ),
    stolast AS (
      SELECT user_id, k_s AS stoch_k, d_s AS stoch_d FROM sto4
      WHERE rn = n AND n >= 14
    ),
    ichrow AS (
      SELECT user_id, rn, n,
        CASE WHEN rn >= 9 THEN (max(high) OVER w9 + min(low) OVER w9)/2 END AS tenkan,
        CASE WHEN rn >= 26 THEN (max(high) OVER w26 + min(low) OVER w26)/2 END AS kijun,
        CASE WHEN rn >= 52 THEN (max(high) OVER w52 + min(low) OVER w52)/2 END AS senkou_b
      FROM base
      WINDOW w9 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
             w26 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
             w52 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
    ),
    ichstate AS (
      SELECT i.user_id,
        CASE WHEN i.tenkan IS NOT NULL AND i.kijun IS NOT NULL AND i.senkou_b IS NOT NULL THEN
          CASE WHEN l.close > greatest((i.tenkan + i.kijun)/2.0, i.senkou_b) THEN 'above'
               WHEN l.close < least((i.tenkan + i.kijun)/2.0, i.senkou_b) THEN 'below'
               ELSE 'inside' END
        END AS ichimoku_state
      FROM ichrow i JOIN lastbar l USING (user_id)
      WHERE i.rn = i.n - 26
    ),
    delta AS (
      SELECT user_id, rn,
             greatest(value - lag(value) OVER wdl, 0) AS g,
             greatest(lag(value) OVER wdl - value, 0) AS l
      FROM base WINDOW wdl AS (PARTITION BY user_id ORDER BY rn)
    ),
    rseeds AS (
      SELECT user_id, avg(g) AS ag, avg(l) AS al FROM delta
      WHERE rn BETWEEN 2 AND 15 GROUP BY user_id HAVING count(*) = 14
    ),
    wilder AS (
      SELECT d.user_id, d.rn, s.ag, s.al
      FROM delta d JOIN rseeds s ON d.user_id = s.user_id WHERE d.rn = 15
      UNION ALL
      SELECT d.user_id, d.rn, (w.ag * 13 + d.g) / 14, (w.al * 13 + d.l) / 14
      FROM delta d JOIN wilder w ON d.user_id = w.user_id AND d.rn = w.rn + 1
    ),
    rsilast AS (
      SELECT l.user_id,
        CASE WHEN w.al = 0 AND w.ag = 0 THEN 50.0 WHEN w.al = 0 THEN 100.0
             ELSE 100.0 - 100.0/(1.0 + w.ag/w.al) END AS rsi_14
      FROM lastbar l JOIN wilder w ON w.user_id = l.user_id AND w.rn = l.n
    ),
    s12 AS (
      SELECT user_id, avg(value) AS seed FROM base WHERE rn <= 12
      GROUP BY user_id HAVING count(*) = 12
    ),
    e12 AS (
      SELECT b.user_id, b.rn, s.seed AS v FROM base b JOIN s12 s USING (user_id) WHERE b.rn = 12
      UNION ALL
      SELECT b.user_id, b.rn, b.value * (2.0/13.0) + e.v * (1 - 2.0/13.0)
      FROM base b JOIN e12 e ON b.user_id = e.user_id AND b.rn = e.rn + 1
    ),
    s26 AS (
      SELECT user_id, avg(value) AS seed FROM base WHERE rn <= 26
      GROUP BY user_id HAVING count(*) = 26
    ),
    e26 AS (
      SELECT b.user_id, b.rn, s.seed AS v FROM base b JOIN s26 s USING (user_id) WHERE b.rn = 26
      UNION ALL
      SELECT b.user_id, b.rn, b.value * (2.0/27.0) + e.v * (1 - 2.0/27.0)
      FROM base b JOIN e26 e ON b.user_id = e.user_id AND b.rn = e.rn + 1
    ),
    macd AS (
      SELECT a.user_id, a.rn, a.v - c.v AS macd
      FROM e12 a JOIN e26 c ON a.user_id = c.user_id AND a.rn = c.rn
    ),
    sseed AS (
      SELECT user_id, avg(macd) AS seed FROM macd WHERE rn BETWEEN 26 AND 34
      GROUP BY user_id HAVING count(*) = 9
    ),
    sig AS (
      SELECT m.user_id, m.rn, s.seed AS v FROM macd m JOIN sseed s USING (user_id) WHERE m.rn = 34
      UNION ALL
      SELECT m.user_id, m.rn, m.macd * (2.0/10.0) + g.v * (1 - 2.0/10.0)
      FROM macd m JOIN sig g ON m.user_id = g.user_id AND m.rn = g.rn + 1
    ),
    macdlast AS (
      SELECT l.user_id, m.macd, g.v AS macd_signal
      FROM lastbar l
      LEFT JOIN macd m ON m.user_id = l.user_id AND m.rn = l.n
      LEFT JOIN sig g ON g.user_id = l.user_id AND g.rn = l.n
    ),
    tr AS (
      SELECT user_id, rn,
             CASE WHEN rn = 1 THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(value) OVER wtr),
                                abs(low - lag(value) OVER wtr)) END AS tr
      FROM base WINDOW wtr AS (PARTITION BY user_id ORDER BY rn)
    ),
    aseeds AS (
      SELECT user_id, avg(tr) AS seed FROM tr WHERE rn BETWEEN 2 AND 15
      GROUP BY user_id HAVING count(*) = 14
    ),
    atr AS (
      SELECT t.user_id, t.rn, s.seed AS atr
      FROM tr t JOIN aseeds s ON t.user_id = s.user_id WHERE t.rn = 15
      UNION ALL
      SELECT t.user_id, t.rn, (a.atr * 13 + t.tr) / 14
      FROM tr t JOIN atr a ON t.user_id = a.user_id AND t.rn = a.rn + 1
    ),
    atrlast AS (
      SELECT l.user_id, a.atr AS atr_14
      FROM lastbar l JOIN atr a ON a.user_id = l.user_id AND a.rn = l.n
    )
    SELECT l.user_id AS key,
      CAST(l.n AS BIGINT) AS n_bars,
      round(l.close, 6) AS close,
      round(a.sma_25, 6) AS sma_25,
      round(a.sma_75, 6) AS sma_75,
      round(a.sma_200, 6) AS sma_200,
      round(CASE WHEN a.sma_25 IS NOT NULL AND a.sma_25 <> 0
            THEN (l.close - a.sma_25)/a.sma_25*100 END, 6) AS dev_25,
      round(CASE WHEN a.sma_75 IS NOT NULL AND a.sma_75 <> 0
            THEN (l.close - a.sma_75)/a.sma_75*100 END, 6) AS dev_75,
      round(CASE WHEN a.sma_200 IS NOT NULL AND a.sma_200 <> 0
            THEN (l.close - a.sma_200)/a.sma_200*100 END, 6) AS dev_200,
      CASE WHEN a.sma_200 IS NOT NULL THEN l.close > a.sma_200 END AS above_sma200,
      c.cross_25_75,
      c.cross_25_75_age,
      round(r.rsi_14, 6) AS rsi_14,
      round(m.macd, 6) AS macd,
      round(m.macd_signal, 6) AS macd_signal,
      round(m.macd - m.macd_signal, 6) AS macd_hist,
      round(s.stoch_k, 6) AS stoch_k,
      round(s.stoch_d, 6) AS stoch_d,
      round(CASE WHEN a.bb_mid IS NOT NULL AND sqrt(a.bb_var) <> 0
            THEN (l.close - (a.bb_mid - 2*sqrt(a.bb_var))) / (4*sqrt(a.bb_var)) END,
            6) AS bb_percent_b,
      round(CASE WHEN a.bb_mid IS NOT NULL AND a.bb_mid <> 0
            THEN 4*sqrt(a.bb_var)/a.bb_mid END, 6) AS bb_bandwidth,
      round(t.atr_14, 6) AS atr_14,
      round(CASE WHEN t.atr_14 IS NOT NULL AND l.close <> 0
            THEN t.atr_14/l.close*100 END, 6) AS atr_pct,
      round(CASE WHEN a.vol_avg20 IS NOT NULL AND a.vol_avg20 <> 0
            THEN l.vol / a.vol_avg20 END, 6) AS vol_ratio_20,
      i.ichimoku_state,
      round(o.obv, 6) AS obv
    FROM lastbar l
    LEFT JOIN aggs a USING (user_id)
    LEFT JOIN crossinfo c USING (user_id)
    LEFT JOIN rsilast r USING (user_id)
    LEFT JOIN macdlast m USING (user_id)
    LEFT JOIN stolast s USING (user_id)
    LEFT JOIN ichstate i USING (user_id)
    LEFT JOIN obvc o USING (user_id)
    LEFT JOIN atrlast t USING (user_id)
    """


@member(
    "user_technical_snapshot",
    bench=True,
    doc="§2.10 grouped-map snapshot (computeTechnicalSnapshot, "
    "technical.ts:361-410): full per-user series in, ONE row out — "
    "the complete 22-field reference snapshot (SMA/dev family, "
    "SMA25×75 cross+age, RSI, MACD, stochastic, Bollinger, ATR, "
    "vol_ratio_20, ichimoku cloud state at n-1-26) pinned by the "
    "golden-vector acceptance test. OHLCV synthesized from the value "
    "series (±1%% band, volume=value — events carry no OHLC). "
    "mapInPandas on the Spark side; the oracle replays the whole "
    "field set in SQL — windows for SMA/stoch/Bollinger/ichimoku/"
    "cross, RECURSIVE CTEs for the Wilder/EMA recurrences — so even "
    "the grouped-map operator is value-checked, not rows-only. "
    "Registered output rounds to 6 dp (NaN->NULL); the golden test "
    "pins the raw unrounded kernel.",
    oracle=_SNAPSHOT_ORACLE,
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
    out = technical_snapshot_ohlcv(ev, "user_id", "ts_us", "o", "h", "l", "c", "v")
    dbl = [
        "close", "sma_25", "sma_75", "sma_200", "dev_25", "dev_75", "dev_200",
        "rsi_14", "macd", "macd_signal", "macd_hist", "stoch_k", "stoch_d",
        "bb_percent_b", "bb_bandwidth", "atr_14", "atr_pct", "vol_ratio_20", "obv",
    ]
    cols = []
    for c in out.columns:
        if c in dbl:
            cols.append(F.round(F.when(~F.isnan(c), F.col(c)), 6).alias(c))
        else:
            cols.append(F.col(c))
    return out.select(*cols)


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


@member(
    "manifest_replay",
    doc="ST2/ST7 manifest replay as a query (job_runs 00002:5-95 + "
    "catch-up.ts:49-117): a deterministic run log is synthesized over "
    "the distinct order dates (attempt 1 fails on every 5th epoch-day; "
    "those days retry, and the retry fails again on every 10th), then "
    "the manifest semantics are evaluated distributed: last-attempt "
    "status, idempotent completion (ANY success counts, like "
    "RunManifest.completed_dates), and the catch-up verdict (oldest 5 "
    "incomplete days get planned). The RunManifest/catch_up_plan code "
    "path is asserted equal to this query in tests/test_incremental2.py.",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date FROM orders
    ), d AS (
      SELECT order_date, datediff('day', DATE '1970-01-01', order_date) AS dn FROM days
    ), runs AS (
      SELECT order_date, 1 AS attempt,
             CASE WHEN dn % 5 = 0 THEN 'failed' ELSE 'success' END AS status
      FROM d
      UNION ALL
      SELECT order_date, 2,
             CASE WHEN dn % 10 = 0 THEN 'failed' ELSE 'success' END
      FROM d WHERE dn % 5 = 0
    ), per_day AS (
      SELECT order_date,
             CAST(count(*) AS BIGINT) AS n_attempts,
             max_by(status, attempt) AS final_status,
             bool_or(status = 'success') AS is_completed
      FROM runs GROUP BY order_date
    )
    SELECT strftime(order_date, '%Y-%m-%d') AS order_date,
           n_attempts, final_status, is_completed,
           (NOT is_completed) AND
           row_number() OVER (PARTITION BY is_completed ORDER BY order_date) <= 5
             AS catch_up_planned
    FROM per_day
    """,
)
def manifest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    days = o.select(F.col("o_orderdate").cast("date").alias("order_date")).distinct()
    dn = F.datediff(F.col("order_date"), F.lit("1970-01-01").cast("date"))
    runs1 = days.select(
        "order_date",
        F.lit(1).alias("attempt"),
        F.when(dn % 5 == 0, "failed").otherwise("success").alias("status"),
    )
    runs2 = days.filter(dn % 5 == 0).select(
        "order_date",
        F.lit(2).alias("attempt"),
        F.when(dn % 10 == 0, "failed").otherwise("success").alias("status"),
    )
    per_day = (
        runs1.unionByName(runs2)
        .groupBy("order_date")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_attempts"),
            F.max_by("status", "attempt").alias("final_status"),
            F.max((F.col("status") == "success").cast("int"))
            .cast("boolean")
            .alias("is_completed"),
        )
    )
    # oldest-5 catch-up pick: the rank runs over the tiny per-day
    # manifest (one row per date), not the fact table
    wrk = Window.partitionBy("is_completed").orderBy("order_date")
    return per_day.select(
        # the calendar panel keys on the formatted date string
        F.date_format("order_date", "yyyy-MM-dd").alias("order_date"),
        "n_attempts",
        "final_status",
        "is_completed",
        ((~F.col("is_completed")) & (F.row_number().over(wrk) <= 5)).alias(
            "catch_up_planned"
        ),
    )
