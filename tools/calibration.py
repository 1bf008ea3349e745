"""THE fixed-cost calibration row, shared by bench.py and both stress
harnesses: `range(2e7).sum` (pure JVM, no parquet, no Python),
median of 5. One definition so the calibration ratios between BENCH
and STRESS artifacts stay comparable by construction — if the
constants ever need tuning, every artifact moves together.
"""

from __future__ import annotations

import statistics
import time

CALIBRATION_N = 20_000_000
CALIBRATION_RUNS = 5

# the PINNED normalization anchor: round-7's measured calibration on
# the reference rig (BENCH_r07). Normalized walls are
# wall * CALIBRATION_REF / calibration_this_run, so round-over-round
# deltas self-adjust for rig drift (r8's raw walls moved +37% on a
# +41% calibration move — every raw comparison needed prose to read).
CALIBRATION_REF = 0.152


def calibrate(spark) -> float:
    times = []
    for _ in range(CALIBRATION_RUNS):
        t0 = time.perf_counter()
        spark.range(CALIBRATION_N).selectExpr("sum(id) AS s").collect()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)
