"""Unit tests for the S9 scraper-parse expression library, porting the
reference's test vectors (nikkei225jp-client.test.ts,
kabuyutai-client.test.ts)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from japanstockdatapipeline_spark.functions.scrapers import (
    NIKKEI_RANGE_CHECKS,
    epoch_ms_to_jst_date,
    estimate_benefit_value,
    estimate_category,
    extract_local_code,
    in_range,
    js_var_array_to_json,
)


def _one(spark, col, value, dtype="string"):
    if isinstance(value, int):
        dtype = "bigint"
    return (
        spark.createDataFrame([(value,)], f"x {dtype}").select(col.alias("y")).first()["y"]
    )


def test_js_var_array_strip_and_parse(spark):
    out = _one(spark, js_var_array_to_json(F.col("x")), "var X = [[1,2],[3,4]];")
    assert json.loads(out) == [[1, 2], [3, 4]]


def test_js_var_array_empty_elements_normalized(spark):
    # reference vector: 'var X = [[1,,2,,,3,],[,1]];'
    out = _one(spark, js_var_array_to_json(F.col("x")), "var X = [[1,,2,,,3,],[,1]];")
    assert json.loads(out) == [[1, None, 2, None, None, 3, None], [None, 1]]


def test_js_var_array_no_array_is_null(spark):
    assert _one(spark, js_var_array_to_json(F.col("x")), "<html>404</html>") is None


def test_epoch_ms_to_jst_date(spark):
    # 2026-07-06T00:00:00+09:00 == 2026-07-05T15:00:00Z
    jst_midnight = 1783263600000
    assert _one(spark, epoch_ms_to_jst_date(F.col("x")), jst_midnight) == "2026-07-06"
    # one second before JST midnight is still the previous JST day
    assert _one(spark, epoch_ms_to_jst_date(F.col("x")), jst_midnight - 1000) == "2026-07-05"


def test_in_range_nulls_only_offender(spark):
    df = spark.createDataFrame([(37.36,), (150.0,), (4.0,)], ["x"])
    got = [
        r["y"]
        for r in df.select(in_range(F.col("x"), NIKKEI_RANGE_CHECKS["nikkei_vi"]).alias("y"))
        .orderBy(F.col("x"))
        .collect()
    ]
    assert got == [None, 37.36, None]


def test_estimate_benefit_value_vectors(spark):
    cases = {
        "QUOカード 1,000円相当": 1000,
        "商品券2000円分": 2000,
        "クオカード 500円": 500,
        "食事券 3,000円": 3000,
        "自社製品詰め合わせ": None,
        "1,500,000円": None,  # implausibly large
        "0円": None,
    }
    for content, expected in cases.items():
        assert _one(spark, estimate_benefit_value(F.col("x")), content) == expected


def test_estimate_category_vectors(spark):
    cases = {
        "お米5kg": "食品",
        "QUOカード 1,000円": "金券",
        "入場券 3,000円": "優待券",
        "カタログギフト 3,000円相当": "カタログ",
        "自社製品詰め合わせ": "自社製品",
        "特別なもの": "その他",
    }
    for content, expected in cases.items():
        assert _one(spark, estimate_category(F.col("x")), content) == expected
    assert _one(spark, estimate_category(F.col("x")), None) is None


def test_extract_local_code_vectors(spark):
    cases = {
        "トヨタ自動車 （7203）": "72030",
        "キオクシア （285A)": "285A0",  # new format, 4 chars -> pad
        "キオクシア （285A0）": "285A0",  # already 5
        "キオクシア （285a）": "285A0",  # lowercase -> upper
        "コードなし": None,
    }
    for text, expected in cases.items():
        assert _one(spark, extract_local_code(F.col("x")), text) == expected


def test_parse_yahoo_chart_null_close_and_last_wins(spark):
    import json as _json

    from japanstockdatapipeline_spark.functions.scrapers import parse_yahoo_chart

    # JST midnights for 2026-07-06 and -07; the third entry repeats
    # 07-06 (intraday snapshot) -> LAST occurrence wins
    t1, t2 = 1783263600, 1783350000
    payload = _json.dumps(
        {
            "chart": {
                "result": [
                    {
                        "timestamp": [t1, t2, t1 + 3600],
                        "indicators": {
                            "quote": [
                                {
                                    "close": [100.125, None, 101.5],
                                    "open": [99.0, 98.0, None],
                                    "high": [102.0, 103.0, 104.0],
                                    "low": [97.0, 96.0, 95.0],
                                }
                            ]
                        },
                    }
                ]
            }
        }
    )
    df = spark.createDataFrame([(1, payload)], ["src", "payload"])
    rows = {r["bar_date"]: r for r in parse_yahoo_chart(df, "payload").collect()}
    # t2's bar dropped entirely (null close); t1 appears once, last wins
    assert set(rows) == {"2026-07-06"}
    r = rows["2026-07-06"]
    assert r["bar_close"] == 101.5 and r["bar_open"] is None
    assert r["bar_high"] == 104.0 and r["bar_low"] == 95.0
    # rounding to 2 dp (reference toFixed(2)): first bar would have been 100.13
    # malformed payload -> zero rows, not an exception
    bad = spark.createDataFrame([(1, "<html>404</html>")], ["src", "payload"])
    assert parse_yahoo_chart(bad, "payload").count() == 0


def test_estat_clean_value_vectors(spark):
    from japanstockdatapipeline_spark.functions.scrapers import estat_clean_value

    cases = {
        "123.45": 123.45,
        "-5": -5.0,
        "-": None,       # missing markers (estat/client.ts:20)
        "...": None,
        "***": None,
        "x": None,
        "X": None,
        "": None,
        "abc": None,     # non-numeric -> skipped
    }
    for raw, expected in cases.items():
        assert _one(spark, estat_clean_value(F.col("x")), raw) == expected


def test_estat_time_code_vectors(spark):
    from japanstockdatapipeline_spark.functions.scrapers import estat_time_code_to_date

    cases = {
        "2024001200": "2024-12-31",  # YYYY00MM00: month at digits 7-8
        "2024120000": "2024-12-31",  # month at digits 5-6 fallback
        "2024000101": "2024-01-31",  # digits 7-8 valid -> wins
        "202402": "2024-02-29",      # YYYYMM, leap-year month end
        "2024991399": None,          # no position yields a valid month
        "notacode": None,
    }
    for code, expected in cases.items():
        assert _one(spark, estat_time_code_to_date(F.col("x")), code) == expected
