"""Ingestion-side control utilities (S1-S4): the pure logic halves of
the reference's HTTP machinery, with injectable clock/sleep/rng so
they are deterministic under test.

Reference parity:
  - TokenBucket: jquants/rate-limiter.ts:26-108 — token-bucket with
    per-minute refill AND a minimum inter-request interval; capacity
    = requests_per_minute; fractional refill.
  - backoff_delay / with_retry: utils/retry.ts:56-140 — exponential
    backoff base*2^attempt capped at max_delay plus uniform jitter;
    NonRetryableError fails immediately; the last attempt re-raises.
  - classify_status: utils/retry.ts fetchWithRetry — 429/5xx retry
    by default.
  - paginate: equity-master.ts:478-502 — ORDER-BY-stable
    offset/limit paging, stop on short (or empty) page, hard page
    cap as a safety valve (kabuyutai-client.ts MAX_PAGES).

In a Spark deployment these guard the DRIVER-side edge of ingestion:
a foreachBatch sink calling an external API, or the seed scripts
that land raw payload parquet for `plans/scrape.py` to parse at scan
speed. They are deliberately plain Python — no Spark dependency —
because rate limiting belongs at the single choke point, not on
executors.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any, Optional

__all__ = [
    "TokenBucket",
    "RetryableError",
    "NonRetryableError",
    "backoff_delay",
    "classify_status",
    "with_retry",
    "paginate",
    "VINTAGE_REFETCH_DAYS",
    "INITIAL_BACKFILL_DAYS",
    "is_monthly_or_lower",
    "vintage_fetch_plan",
    "should_fallback_plain",
    "advance_watermark",
    "MAX_CALENDAR_RANGE_DAYS",
    "calendar_sync_range",
    "next_business_day",
    "CoverageLedger",
]


class TokenBucket:
    """Token-bucket rate limiter with a minimum inter-request interval.

    `clock` returns milliseconds; `sleep` takes milliseconds. Inject
    fakes for deterministic tests (the reference uses wall time).
    """

    def __init__(
        self,
        requests_per_minute: int = 60,
        min_interval_ms: int = 1000,
        *,
        clock: Callable[[], float] = lambda: time.monotonic() * 1000.0,
        sleep: Callable[[float], None] = lambda ms: time.sleep(ms / 1000.0),
    ):
        self.requests_per_minute = requests_per_minute
        self.min_interval_ms = min_interval_ms
        self.bucket_capacity = float(requests_per_minute)
        self._clock = clock
        self._sleep = sleep
        self.tokens = self.bucket_capacity
        self.last_refill_time = clock()
        # -inf, not 0: with an injectable clock starting at 0, a zero
        # sentinel would make the FIRST request wait out min_interval
        # (the reference's 0 only works because Date.now() is epoch ms)
        self.last_request_time = float("-inf")

    def _refill(self) -> None:
        now = self._clock()
        elapsed_ms = now - self.last_refill_time
        self.tokens = min(
            self.bucket_capacity,
            self.tokens + (elapsed_ms / 60000.0) * self.requests_per_minute,
        )
        self.last_refill_time = now

    def wait_time_ms(self) -> float:
        """Delay before the next request may fire (0 = go now)."""
        self._refill()
        if self.tokens >= 1:
            since_last = self._clock() - self.last_request_time
            if since_last < self.min_interval_ms:
                return self.min_interval_ms - since_last
            return 0.0
        ms_per_token = 60000.0 / self.requests_per_minute
        return (1.0 - self.tokens) * ms_per_token

    def acquire(self) -> None:
        """Block (via the injected sleep) until a token is available,
        then consume it."""
        wait = self.wait_time_ms()
        if wait > 0:
            self._sleep(wait)
            self._refill()
        self.tokens -= 1
        self.last_request_time = self._clock()

    @property
    def available_tokens(self) -> int:
        self._refill()
        return int(self.tokens)

    def reset(self) -> None:
        self.tokens = self.bucket_capacity
        self.last_refill_time = self._clock()
        self.last_request_time = float("-inf")


class RetryableError(Exception):
    def __init__(self, message: str, status_code: Optional[int] = None):
        super().__init__(message)
        self.status_code = status_code


class NonRetryableError(Exception):
    def __init__(self, message: str, status_code: Optional[int] = None):
        super().__init__(message)
        self.status_code = status_code


DEFAULT_RETRY_STATUS_CODES = (429, 500, 502, 503, 504)


def classify_status(
    status: int, retry_status_codes: tuple[int, ...] = DEFAULT_RETRY_STATUS_CODES
) -> type[Exception] | None:
    """None for success (2xx), RetryableError for transient statuses,
    NonRetryableError otherwise (e.g. 403 — the reference notes 403 is
    NOT retried, nikkei225jp-client.ts:244-250)."""
    if 200 <= status < 300:
        return None
    return RetryableError if status in retry_status_codes else NonRetryableError


def backoff_delay(
    attempt: int,
    *,
    base_delay_ms: float = 500.0,
    max_delay_ms: float = 32000.0,
    jitter_ms: float = 100.0,
    rng: Callable[[], float] = None,
) -> float:
    """base * 2^attempt, capped at max_delay, plus uniform jitter in
    [0, jitter_ms). `rng` returns a float in [0, 1)."""
    import random

    r = rng if rng is not None else random.random
    capped = min(base_delay_ms * (2.0**attempt), max_delay_ms)
    return capped + r() * jitter_ms


def with_retry(
    fn: Callable[[], Any],
    *,
    max_retries: int = 5,
    base_delay_ms: float = 500.0,
    max_delay_ms: float = 32000.0,
    jitter_ms: float = 100.0,
    on_retry: Optional[Callable[[int, Exception, float], None]] = None,
    sleep: Callable[[float], None] = lambda ms: time.sleep(ms / 1000.0),
    rng: Callable[[], float] = None,
) -> Any:
    """Run `fn` with exponential-backoff retries. NonRetryableError
    propagates immediately; the final failure re-raises the last
    error; `on_retry(attempt, error, delay_ms)` observes each retry."""
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except NonRetryableError:
            raise
        except Exception as e:  # noqa: BLE001 — reference retries any other error
            last = e
            if attempt == max_retries:
                raise
            delay = backoff_delay(
                attempt,
                base_delay_ms=base_delay_ms,
                max_delay_ms=max_delay_ms,
                jitter_ms=jitter_ms,
                rng=rng,
            )
            if on_retry is not None:
                on_retry(attempt + 1, e, delay)
            sleep(delay)
    raise last  # unreachable


def paginate(
    fetch_page: Callable[[int, int], list],
    *,
    page_size: int = 1000,
    max_pages: int = 1000,
) -> Iterator[Any]:
    """Offset/limit pager: yield rows from fetch_page(offset, limit)
    until a short or empty page, with a hard page cap as a safety
    valve. The caller's query must be ORDER-BY-stable (the reference
    documents Postgres repeating rows across unordered pages)."""
    offset = 0
    for _ in range(max_pages):
        page = fetch_page(offset, page_size)
        if not page:
            return
        yield from page
        if len(page) < page_size:
            return
        offset += page_size


# --- S5: FRED/ALFRED vintage fetch planner (macro.ts:43-48, 84-135) ---

VINTAGE_REFETCH_DAYS = 90  # monthly indicators: re-fetch last 3 months
INITIAL_BACKFILL_DAYS = 730  # first run: 2 years


def is_monthly_or_lower(frequency: str) -> bool:
    """fred/series-config.ts:56-58."""
    return frequency in ("monthly", "quarterly")


def vintage_fetch_plan(
    series_list: list[dict],
    *,
    backfill_days: int = 0,
    today,
) -> list[dict]:
    """Per-series incremental fetch plan (macro.ts:84-116).

    Each series dict carries `series_id`, `frequency`, and
    `last_value_date` (a datetime.date watermark, or None). `today` is
    injected (datetime.date) — no wall clock, so plans are
    deterministic under test and replayable.

    Branch order is the reference's exactly:
      1. backfill_days > 0  -> explicit backfill from today-backfill_days,
         fetched as ALFRED *initial release* (macro.ts:108-116: the
         latest-vintage fetch would stamp every historical observation
         with realtime_start = fetch time, destroying point-in-time
         correctness);
      2. no watermark       -> first run, today-730;
      3. monthly/quarterly  -> vintage window, today-90 (revisions);
      4. else               -> incremental from the watermark.
    """
    import datetime as dt

    plans = []
    for s in series_list:
        if backfill_days > 0:
            start = today - dt.timedelta(days=backfill_days)
            initial_release, reason = True, "explicit_backfill"
        elif s.get("last_value_date") is None:
            start = today - dt.timedelta(days=INITIAL_BACKFILL_DAYS)
            initial_release, reason = False, "initial_backfill"
        elif is_monthly_or_lower(s["frequency"]):
            start = today - dt.timedelta(days=VINTAGE_REFETCH_DAYS)
            initial_release, reason = False, "vintage_refetch"
        else:
            start = s["last_value_date"]
            initial_release, reason = False, "incremental"
        plans.append(
            {
                "series_id": s["series_id"],
                "observation_start": start,
                "initial_release": initial_release,
                "reason": reason,
            }
        )
    return plans


def should_fallback_plain(plan: dict, n_observations: int) -> bool:
    """macro.ts:119-127: an initial-release (ALFRED) fetch that returns
    zero observations falls back to the plain latest-vintage fetch —
    a value with an imprecise released_at beats no value."""
    return bool(plan.get("initial_release")) and n_observations == 0


def advance_watermark(series: dict, observation_dates: list) -> dict:
    """macro.ts:171-186: after a successful upsert, last_value_date
    advances to the max observation date (never regresses)."""
    if not observation_dates:
        return dict(series)
    mx = max(observation_dates)
    prev = series.get("last_value_date")
    out = dict(series)
    out["last_value_date"] = mx if prev is None or mx > prev else prev
    return out


# --- S4: dataset-sync planning halves (trading-calendar.ts:133-185,
#         cron-b.ts:64-95, earnings-calendar.ts fencing) ---

MAX_CALENDAR_RANGE_DAYS = 3650  # ~10 years (trading-calendar.ts:134)


def calendar_sync_range(base_date, range_days: int = 370):
    """Trading-calendar sync window (trading-calendar.ts:143-161):
    (base - N, base + N) with N clamped to [1, 3650]; default ±370
    days covers a year of future holidays. Returns (from, to) dates."""
    import datetime as dt
    import math

    if not math.isfinite(range_days):
        raise ValueError("calendar_sync_range: range_days must be finite")
    r = min(max(1, int(range_days)), MAX_CALENDAR_RANGE_DAYS)
    return base_date - dt.timedelta(days=r), base_date + dt.timedelta(days=r)


def next_business_day(base_date, is_business_day, *, max_scan_days: int = 366):
    """The earnings-calendar target date (cron-b.ts:64-73): the next
    business day strictly after `base_date`, resolved against the
    trading calendar (`is_business_day` predicate) BEFORE the fetch so
    the whole run is pinned to one expected announcement date."""
    import datetime as dt

    d = base_date
    for _ in range(max_scan_days):
        d = d + dt.timedelta(days=1)
        if is_business_day(d):
            return d
    raise ValueError(f"no business day within {max_scan_days} days of {base_date}")


class CoverageLedger:
    """Per-(dataset, target_date) attempt coverage with FENCING tokens
    (earnings-calendar.ts attemptId + claim/fail_earnings_coverage_
    attempt RPCs): a re-claim takes ownership (fencing any previous
    success back to failed-pending), and only the CURRENT attempt may
    record an outcome — a stale attempt's fail/success is rejected,
    so a reclaimed-then-zombie run can never clobber fresh coverage."""

    def __init__(self):
        self._state: dict = {}

    def claim(self, target_date, run_id: str, attempt_id: str) -> dict:
        prev = self._state.get(target_date)
        rec = {
            "status": "claimed",
            "run_id": run_id,
            "attempt_id": attempt_id,
            "fenced_previous_success": bool(prev and prev["status"] == "success"),
        }
        self._state[target_date] = rec
        return dict(rec)

    def _finish(self, target_date, attempt_id: str, status: str, **details) -> bool:
        cur = self._state.get(target_date)
        if cur is None or cur["attempt_id"] != attempt_id:
            return False  # stale attempt: fenced out
        cur["status"] = status
        cur.update(details)
        return True

    def fail(self, target_date, attempt_id: str, *, row_count: int = 0,
             error_count: int = 0, source_observed_at=None) -> bool:
        return self._finish(
            target_date, attempt_id, "failed", row_count=row_count,
            error_count=error_count, source_observed_at=source_observed_at,
        )

    def success(self, target_date, attempt_id: str, *, row_count: int = 0,
                source_observed_at=None) -> bool:
        return self._finish(
            target_date, attempt_id, "success", row_count=row_count,
            source_observed_at=source_observed_at,
        )

    def status(self, target_date):
        rec = self._state.get(target_date)
        return dict(rec) if rec is not None else None
