"""W20 year-bucket new-high/low rule: replay of the reference's
BreadthAccumulator unit cases (market-breadth.test.ts:80-130) through
the declarative window form."""

from __future__ import annotations

import datetime as dt

import pytest

from japanstockdatapipeline_spark.operators.breadth import year_bucket_high_low

EPOCH = dt.date(1970, 1, 1)


def _day(s: str) -> int:
    return (dt.date.fromisoformat(s) - EPOCH).days


def _run(spark, rows):
    df = spark.createDataFrame(
        [(u, _day(d), float(h), float(lo)) for u, d, h, lo in rows],
        ["user_id", "day", "hi", "lo"],
    )
    out = year_bucket_high_low(df).collect()
    return {
        (r["user_id"], r["day"]): (r["is_new_high"], r["is_new_low"]) for r in out
    }


def test_new_high_low_basic(spark):
    # market-breadth.test.ts:80-93: base excludes the current day
    res = _run(
        spark,
        [
            (1, "2026-05-01", 105, 95),
            (1, "2026-05-02", 107, 100),
            (1, "2026-05-07", 100, 88),
        ],
    )
    assert res[(1, _day("2026-05-01"))] == (None, None)  # first day: no base
    assert res[(1, _day("2026-05-02"))] == (True, False)  # 107 > 105
    assert res[(1, _day("2026-05-07"))] == (False, True)  # 88 < 95


def test_year_reset_april(spark):
    # market-breadth.test.ts:101-114: Jan-Mar includes prior year,
    # April resets to the current year only
    res = _run(
        spark,
        [
            (1, "2025-12-30", 150, 90),
            (1, "2026-01-06", 120, 100),
            (1, "2026-04-01", 130, 120),
            (1, "2026-04-02", 100, 95),
        ],
    )
    assert res[(1, _day("2026-01-06"))] == (False, False)  # vs prev-year 150/90
    assert res[(1, _day("2026-04-01"))] == (True, False)  # vs 2026-only high 120
    assert res[(1, _day("2026-04-02"))] == (False, True)  # 95 < 2026-only low 100


def test_january_includes_previous_year(spark):
    # market-breadth.test.ts:116-124
    res = _run(
        spark,
        [
            (1, "2025-06-02", 200, 50),
            (1, "2026-01-06", 180, 160),
            (1, "2026-01-07", 210, 200),
        ],
    )
    assert res[(1, _day("2026-01-06"))] == (False, False)  # 180 < prev-year 200
    assert res[(1, _day("2026-01-07"))][0] is True  # 210 > max(200, 180)


def test_two_year_gap_resets_base(spark):
    # market-breadth.test.ts:126-132: only exactly year-1 counts as
    # the prior bucket
    res = _run(
        spark,
        [
            (1, "2024-06-03", 150, 50),
            (1, "2026-01-06", 210, 190),
        ],
    )
    assert res[(1, _day("2026-01-06"))] == (None, None)
