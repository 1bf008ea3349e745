"""Pure parsing/heuristic halves of the reference's scrapers (S9).

The network clients themselves (HTTP fetch, rate limit, retry, proxy
routing) are out of scope for a Spark engine — but the reference
deliberately keeps its parsers as pure, unit-tested functions
(nikkei225jp-client.ts:115-230, kabuyutai-client.ts:36-84), and those
port directly to Catalyst expressions: a lake of raw scraped payloads
(one row per fetch) parses in parallel at scan speed, no UDFs.

Covered here:
  - JS ``var X = [...]`` payload normalization -> JSON string
    (nikkei225jp-client.ts:115-127: slice from first '[', strip the
    trailing ';', normalize empty elements ``[,`` / ``,,`` / ``,]``
    to null) and `from_json` row explosion
  - epoch-ms -> JST date string (nikkei225jp-client.ts:101-110)
  - per-column range checks that null only the offending column
    (nikkei225jp-client.ts:62-70 RANGE_CHECKS)
  - benefit-value yen extraction (kabuyutai-client.ts:36-48:
    "1,000円相当" -> 1000; 0 and >=1,000,000 rejected)
  - benefit category heuristic (kabuyutai-client.ts:53-71: ordered
    regex buckets, その他 catch-all)
  - local-code extraction (kabuyutai-client.ts:76-84: 4-or-5-char
    code in full/half-width parens, uppercased, 4-char padded with
    '0' — JPX new format 285A -> 285A0)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "js_var_array_to_json",
    "epoch_ms_to_jst_date",
    "in_range",
    "estimate_benefit_value",
    "estimate_category",
    "extract_local_code",
    "NIKKEI_RANGE_CHECKS",
    "YAHOO_CHART_SCHEMA",
    "parse_yahoo_chart",
    "ESTAT_MISSING_VALUES",
    "estat_clean_value",
    "estat_time_code_to_date",
]

# estat/client.ts:20 — e-Stat missing-value markers
ESTAT_MISSING_VALUES = ("-", "...", "***", "x", "X", "")


def estat_clean_value(raw: Column) -> Column:
    """e-Stat observation value: missing markers and non-numeric
    strings -> NULL, else double (estat/client.ts:200-216)."""
    v = F.when(~raw.isin(*ESTAT_MISSING_VALUES), raw)
    return v.try_cast("double")


def estat_time_code_to_date(code: Column) -> Column:
    """e-Stat time code -> month-end date string (YYYY-MM-DD), the
    reference's parseTimeCode (estat/client.ts:316-358):

    - 10 digits ``YYYYaabbcc``: month is digits 7-8 if in 1..12,
      else digits 5-6 (position varies by statistic)
    - 6 digits ``YYYYMM``
    - anything else (or month out of range) -> NULL
    """
    ten = code.rlike("^[0-9]{10}$")
    six = code.rlike("^[0-9]{6}$")
    y = F.substring(code, 1, 4).cast("int")
    g2 = F.substring(code, 5, 2).cast("int")
    g3 = F.substring(code, 7, 2).cast("int")

    def valid(m):
        return F.when((m >= 1) & (m <= 12), m)

    month = F.when(ten, F.coalesce(valid(g3), valid(g2))).when(six, valid(g2))
    return F.when(
        month.isNotNull(),
        F.date_format(F.last_day(F.make_date(y, month, F.lit(1))), "yyyy-MM-dd"),
    )

# yahoo-chart-client.ts:60-76 response shape (only the fields read)
YAHOO_CHART_SCHEMA = (
    "struct<chart: struct<result: array<struct<"
    "timestamp: array<bigint>, "
    "indicators: struct<quote: array<struct<"
    "close: array<double>, open: array<double>, "
    "high: array<double>, low: array<double>>>>>>>>"
)


def parse_yahoo_chart(df, payload_col: str):
    """Yahoo chart JSON payload -> daily bars, as a set-oriented plan
    (yahoo-chart-client.ts:93-126 parseYahooChart):

    - zip timestamp[] with quote.close/open/high/low[]
    - drop rows whose close is null/NaN (reference behavior); open/
      high/low keep their independent null holes
    - values rounded to 2 dp; epoch seconds -> JST calendar date
    - same JST date appearing twice -> LAST wins (intraday snapshot
      mixed into the daily series), then date order

    Input: a DataFrame with a JSON string column `payload_col` (plus
    any passthrough columns); output: passthrough + (bar_date,
    bar_close, bar_open, bar_high, bar_low), one row per surviving
    bar. A malformed payload yields zero rows for that input (the
    reference throws; a lake scan drops and the caller audits counts).
    """
    r = F.from_json(F.col(payload_col), YAHOO_CHART_SCHEMA)["chart"]["result"][0]
    q = r["indicators"]["quote"][0]
    zipped = F.arrays_zip(
        r["timestamp"].alias("ts"),
        q["close"].alias("close"),
        q["open"].alias("open"),
        q["high"].alias("high"),
        q["low"].alias("low"),
    )
    passthrough = [c for c in df.columns if c != payload_col]
    ex = df.select(*passthrough, F.posexplode(zipped).alias("__pos", "__bar"))

    def pick(field):  # pickAt: null/NaN -> null, else round 2
        v = ex["__bar"][field]
        return F.when(v.isNotNull() & ~F.isnan(v), F.round(v, 2))

    bars = ex.select(
        *passthrough,
        "__pos",
        F.date_format(
            F.from_utc_timestamp(F.timestamp_seconds(ex["__bar"]["ts"]), "Asia/Tokyo"),
            "yyyy-MM-dd",
        ).alias("bar_date"),
        pick("close").alias("bar_close"),
        pick("open").alias("bar_open"),
        pick("high").alias("bar_high"),
        pick("low").alias("bar_low"),
    ).filter(F.col("bar_close").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy(*passthrough, "bar_date").orderBy(F.col("__pos").desc())
    return (
        bars.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__pos", "__rn")
    )

# nikkei225jp-client.ts:62-70 (deliberately loose; stress regimes kept)
NIKKEI_RANGE_CHECKS: dict[str, tuple[float, float]] = {
    "nikkei_close": (5000.0, 200000.0),
    "per": (5.0, 120.0),
    "nikkei_vi": (8.0, 100.0),
    "short_selling_restricted": (10.0, 55.0),
    "short_selling_unrestricted": (2.0, 25.0),
    "margin_pl_ratio": (-50.0, 15.0),
}


def js_var_array_to_json(payload: Column) -> Column:
    """``var X = [[1,,2],];`` -> ``[[1,null,2],null]`` (JSON text).

    NULL when no '[' exists (the reference throws; in a set-oriented
    scan a bad payload nulls its row and the caller filters/alerts).
    Empty elements are normalized with the same two rewrites as the
    reference: ``[<ws>,`` -> ``[null,`` then any ``,`` directly
    followed by ``,`` or ``]`` gets a null injected (lookahead, so
    runs of commas all fill).
    """
    body = F.regexp_extract(payload, r"(\[[\s\S]*)", 1)
    body = F.regexp_replace(F.trim(body), r";$", "")
    body = F.regexp_replace(body, r"\[\s*,", "[null,")
    body = F.regexp_replace(body, r",(?=\s*[,\]])", ",null")
    return F.when(body == "", None).otherwise(body)


def epoch_ms_to_jst_date(epoch_ms: Column) -> Column:
    """Epoch milliseconds -> JST calendar date string (YYYY-MM-DD)."""
    return F.date_format(
        F.from_utc_timestamp(F.timestamp_millis(epoch_ms.cast("bigint")), "Asia/Tokyo"),
        "yyyy-MM-dd",
    )


def in_range(col: Column, bounds: tuple[float, float]) -> Column:
    """Reference range check: out-of-range nulls ONLY this column."""
    lo, hi = bounds
    return F.when((col >= lo) & (col <= hi), col)


def estimate_benefit_value(content: Column) -> Column:
    """Yen amount from 「1,000円相当」「2000円分」「500円」; NULL when
    absent, zero, or implausibly large (>= 1,000,000)."""
    raw = F.regexp_replace(F.regexp_extract(content, r"([0-9,]+)\s*円", 1), ",", "")
    v = F.when(raw.rlike("^[0-9]+$"), raw).cast("bigint")  # no-match '' -> NULL (ANSI-safe)
    return F.when((v > 0) & (v < 1_000_000), v)


_CATEGORIES: list[tuple[str, str]] = [
    ("食品", "食品|食事|お米|米|グルメ|飲料|お茶|コーヒー|ビール|ワイン|菓子|食料"),
    ("金券", "クオカード|QUOカード|図書カード|ギフトカード|商品券|お買物券|割引券|金券"),
    ("優待券", "優待券|食事券|飲食券|入場券|宿泊券|施設利用|レジャー|映画"),
    ("カタログ", "カタログ|選べる|ポイント"),
    ("自社製品", "自社製品|自社商品|自社サービス"),
    ("日用品", "日用品|化粧品|ヘルスケア|健康"),
]


def estimate_category(content: Column) -> Column:
    """Ordered regex buckets; その他 catch-all (NULL stays NULL)."""
    expr = F.lit("その他")
    for cat, pattern in reversed(_CATEGORIES):
        expr = F.when(content.rlike(pattern), F.lit(cat)).otherwise(expr)
    return F.when(content.isNotNull(), expr)


def extract_local_code(text: Column) -> Column:
    """4/5-char local code in（全角）or (half-width) parens, uppercased;
    4-char new-format codes padded to 5 with '0' (285A -> 285A0)."""
    code = F.upper(F.regexp_extract(text, r"[（(]([0-9]{3}[0-9A-Za-z][0-9]?)[）)]", 1))
    return F.when(
        code != "", F.when(F.length(code) == 4, F.concat(code, F.lit("0"))).otherwise(code)
    )
