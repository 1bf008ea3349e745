"""S5 vintage fetch planner (macro.ts:43-48, 84-135): pure control
logic with an injected `today`, plus the wiring check that the pure
planner and the Spark planner query (series_vintage_plan) agree."""

from __future__ import annotations

import datetime as dt

from japanstockdatapipeline_spark.sources.ingest import (
    INITIAL_BACKFILL_DAYS,
    VINTAGE_REFETCH_DAYS,
    advance_watermark,
    is_monthly_or_lower,
    should_fallback_plain,
    vintage_fetch_plan,
)

TODAY = dt.date(2024, 2, 7)  # epoch day 19760, same pin as the query


def _s(series_id, frequency="daily", last=None):
    return {"series_id": series_id, "frequency": frequency, "last_value_date": last}


def test_branch_order_matches_reference():
    series = [
        _s("never_fetched", "daily", None),
        _s("monthly_cpi", "monthly", dt.date(2024, 1, 15)),
        _s("quarterly_gdp", "quarterly", dt.date(2023, 12, 1)),
        _s("daily_rate", "daily", dt.date(2024, 2, 1)),
    ]
    plans = {p["series_id"]: p for p in vintage_fetch_plan(series, today=TODAY)}
    assert plans["never_fetched"]["reason"] == "initial_backfill"
    assert plans["never_fetched"]["observation_start"] == TODAY - dt.timedelta(
        days=INITIAL_BACKFILL_DAYS
    )
    for sid in ("monthly_cpi", "quarterly_gdp"):
        assert plans[sid]["reason"] == "vintage_refetch"
        assert plans[sid]["observation_start"] == TODAY - dt.timedelta(
            days=VINTAGE_REFETCH_DAYS
        )
    assert plans["daily_rate"]["reason"] == "incremental"
    assert plans["daily_rate"]["observation_start"] == dt.date(2024, 2, 1)
    # nightly mode never uses ALFRED initial-release
    assert not any(p["initial_release"] for p in plans.values())


def test_explicit_backfill_wins_and_uses_initial_release():
    # macro.ts:108-116: explicit backfill fetches initial releases so
    # released_at stays the publication date (point-in-time safe)
    series = [_s("monthly_cpi", "monthly", dt.date(2024, 1, 15)), _s("fresh", "daily", None)]
    plans = vintage_fetch_plan(series, backfill_days=30, today=TODAY)
    for p in plans:
        assert p["reason"] == "explicit_backfill"
        assert p["initial_release"] is True
        assert p["observation_start"] == TODAY - dt.timedelta(days=30)


def test_fallback_plain_only_for_empty_initial_release():
    # macro.ts:119-127
    assert should_fallback_plain({"initial_release": True}, 0)
    assert not should_fallback_plain({"initial_release": True}, 5)
    assert not should_fallback_plain({"initial_release": False}, 0)


def test_watermark_advances_and_never_regresses():
    s = _s("x", "daily", dt.date(2024, 1, 10))
    out = advance_watermark(s, [dt.date(2024, 1, 12), dt.date(2024, 1, 11)])
    assert out["last_value_date"] == dt.date(2024, 1, 12)
    # stale re-fetch (all dates before watermark) must not regress it
    out2 = advance_watermark(out, [dt.date(2024, 1, 5)])
    assert out2["last_value_date"] == dt.date(2024, 1, 12)
    # empty fetch leaves metadata untouched
    assert advance_watermark(s, [])["last_value_date"] == dt.date(2024, 1, 10)
    # first fetch sets it
    assert advance_watermark(_s("y"), [dt.date(2024, 1, 3)])["last_value_date"] == dt.date(
        2024, 1, 3
    )


def test_is_monthly_or_lower():
    assert is_monthly_or_lower("monthly")
    assert is_monthly_or_lower("quarterly")
    assert not is_monthly_or_lower("daily")
    assert not is_monthly_or_lower("weekly")


def test_pure_planner_matches_spark_planner_query(spark):
    """Wiring: the Spark planner query and the pure control-plane twin
    produce the same plan from the same simulated catalog."""
    from japanstockdatapipeline_spark.plans import all_members

    rows = all_members()["series_vintage_plan"].fn(spark, "/root/testdata/sf0.001").collect()
    epoch = dt.date(1970, 1, 1)
    catalog = [
        {
            "series_id": r["series_id"],
            "frequency": r["frequency"],
            "last_value_date": (
                None
                if r["last_value_day"] is None
                else epoch + dt.timedelta(days=r["last_value_day"])
            ),
        }
        for r in rows
    ]
    pure = {p["series_id"]: p for p in vintage_fetch_plan(catalog, today=TODAY)}
    for r in rows:
        p = pure[r["series_id"]]
        assert r["reason"] == p["reason"]
        assert r["initial_release"] == p["initial_release"]
        assert r["observation_start"] == p["observation_start"].isoformat()
        assert r["start_day"] == (p["observation_start"] - epoch).days


# --- S4 planning halves (trading-calendar / cron-b / coverage fencing) ---


def test_calendar_sync_range_clamps():
    from japanstockdatapipeline_spark.sources.ingest import calendar_sync_range

    base = dt.date(2024, 2, 7)
    lo, hi = calendar_sync_range(base)
    assert (base - lo).days == 370 and (hi - base).days == 370
    lo, hi = calendar_sync_range(base, 0)  # clamp up to 1
    assert (base - lo).days == 1 and (hi - base).days == 1
    lo, hi = calendar_sync_range(base, 99999)  # clamp down to 3650
    assert (base - lo).days == 3650
    import pytest as _pytest

    with _pytest.raises(ValueError):
        calendar_sync_range(base, float("inf"))


def test_next_business_day_skips_holidays():
    from japanstockdatapipeline_spark.sources.ingest import next_business_day

    holidays = {dt.date(2024, 2, 12)}  # Monday holiday

    def is_bd(d):
        return d.weekday() < 5 and d not in holidays

    # Friday -> skips Sat/Sun and the Monday holiday -> Tuesday
    assert next_business_day(dt.date(2024, 2, 9), is_bd) == dt.date(2024, 2, 13)
    # strictly after: a business-day base still advances
    assert next_business_day(dt.date(2024, 2, 13), is_bd) == dt.date(2024, 2, 14)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        next_business_day(dt.date(2024, 1, 1), lambda d: False, max_scan_days=10)


def test_coverage_ledger_fencing():
    from japanstockdatapipeline_spark.sources.ingest import CoverageLedger

    led = CoverageLedger()
    day = dt.date(2024, 2, 7)
    led.claim(day, "run1", "attempt1")
    assert led.success(day, "attempt1", row_count=10)
    assert led.status(day)["status"] == "success"

    # reclaim fences the previous success and takes ownership
    rec = led.claim(day, "run2", "attempt2")
    assert rec["fenced_previous_success"] is True
    # the zombie attempt can no longer record anything
    assert not led.success(day, "attempt1", row_count=99)
    assert not led.fail(day, "attempt1")
    assert led.status(day)["status"] == "claimed"
    # the current attempt's outcome lands
    assert led.fail(day, "attempt2", row_count=0, error_count=1)
    st = led.status(day)
    assert st["status"] == "failed" and st["run_id"] == "run2"
    # unknown target is rejected
    assert not led.success(dt.date(2030, 1, 1), "attempt2")
