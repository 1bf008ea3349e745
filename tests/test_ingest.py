"""Unit tests for the ingestion control utilities (S1-S4 logic halves),
with fake clocks so token-bucket and backoff behavior is deterministic
(reference tests: rate-limiter + retry suites)."""

from __future__ import annotations

import pytest

from japanstockdatapipeline_spark.sources.ingest import (
    NonRetryableError,
    RetryableError,
    TokenBucket,
    backoff_delay,
    classify_status,
    paginate,
    with_retry,
)


class FakeClock:
    def __init__(self):
        self.now_ms = 0.0
        self.slept = []

    def clock(self):
        return self.now_ms

    def sleep(self, ms):
        self.slept.append(ms)
        self.now_ms += ms

    def advance(self, ms):
        self.now_ms += ms


def test_token_bucket_capacity_and_min_interval():
    fc = FakeClock()
    tb = TokenBucket(requests_per_minute=60, min_interval_ms=1000, clock=fc.clock, sleep=fc.sleep)
    assert tb.available_tokens == 60
    tb.acquire()  # first request immediate
    assert fc.slept == []
    tb.acquire()  # tokens available but min interval forces a 1s wait
    assert fc.slept == [1000.0]


def test_token_bucket_refill_rate():
    fc = FakeClock()
    tb = TokenBucket(requests_per_minute=60, min_interval_ms=0, clock=fc.clock, sleep=fc.sleep)
    for _ in range(60):
        tb.acquire()
    assert tb.available_tokens == 0
    # empty bucket: next acquire waits ~1 token's worth (1s at 60/min)
    tb.acquire()
    assert fc.slept and abs(fc.slept[-1] - 1000.0) < 1.0
    # half a minute refills ~30 tokens
    fc.advance(30_000)
    assert 29 <= tb.available_tokens <= 30


def test_token_bucket_reset():
    fc = FakeClock()
    tb = TokenBucket(requests_per_minute=5, min_interval_ms=0, clock=fc.clock, sleep=fc.sleep)
    for _ in range(5):
        tb.acquire()
    tb.reset()
    assert tb.available_tokens == 5


def test_backoff_delay_exponential_capped_jittered():
    delays = [
        backoff_delay(a, base_delay_ms=500, max_delay_ms=32000, jitter_ms=0, rng=lambda: 0.0)
        for a in range(8)
    ]
    assert delays == [500, 1000, 2000, 4000, 8000, 16000, 32000, 32000]  # capped
    j = backoff_delay(0, base_delay_ms=500, jitter_ms=100, rng=lambda: 0.5)
    assert j == 550.0


def test_classify_status():
    assert classify_status(200) is None
    assert classify_status(429) is RetryableError
    assert classify_status(503) is RetryableError
    assert classify_status(403) is NonRetryableError  # reference: 403 not retried
    assert classify_status(404) is NonRetryableError


def test_with_retry_recovers_and_observes():
    calls, seen = [], []
    fc = FakeClock()

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RetryableError("boom", 503)
        return "ok"

    out = with_retry(
        flaky,
        max_retries=5,
        base_delay_ms=100,
        jitter_ms=0,
        rng=lambda: 0.0,
        sleep=fc.sleep,
        on_retry=lambda attempt, err, delay: seen.append((attempt, delay)),
    )
    assert out == "ok"
    assert len(calls) == 3
    assert seen == [(1, 100.0), (2, 200.0)]  # exponential


def test_with_retry_nonretryable_fails_fast_and_exhaustion_raises():
    fc = FakeClock()
    calls = []

    def fatal():
        calls.append(1)
        raise NonRetryableError("403", 403)

    with pytest.raises(NonRetryableError):
        with_retry(fatal, sleep=fc.sleep)
    assert len(calls) == 1  # no retries

    calls.clear()

    def always():
        calls.append(1)
        raise RetryableError("503", 503)

    with pytest.raises(RetryableError):
        with_retry(always, max_retries=2, jitter_ms=0, rng=lambda: 0.0, sleep=fc.sleep)
    assert len(calls) == 3  # initial + 2 retries


def test_paginate_stable_offsets_and_short_page_stop():
    data = list(range(2500))

    def fetch(offset, limit):
        return data[offset : offset + limit]

    assert list(paginate(fetch, page_size=1000)) == data  # 3 pages, last short
    # exact-multiple corpus: stops on the empty 3rd page
    data2 = list(range(2000))

    def fetch2(offset, limit):
        return data2[offset : offset + limit]

    assert list(paginate(fetch2, page_size=1000)) == data2
    # hard cap is a safety valve against endless pagination
    assert len(list(paginate(lambda o, l: list(range(l)), page_size=10, max_pages=3))) == 30
