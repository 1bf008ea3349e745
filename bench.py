"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline comparables (BASELINE.md): full-universe metrics refresh
23.4 s over ~1.14 M rows; per-basket 2-yr windowed agg 0.5-7 s over
<=65 k rows. sf0.1 lineitem is ~600 k rows — same order.

Cross-round comparability (round-4 verdict item 2):
- the warm-up query is PINNED (WARMUP below), not dict-order-dependent;
- each query reports min AND median of N_RUNS;
- a fixed-cost `calibration` entry (spark.range(2e7) sum, no parquet,
  no Python) separates rig drift from plan regressions: if calibration
  moves round-over-round, the rig moved, not the plans.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from japanstockdatapipeline_spark.plans import all_members, all_queries
from japanstockdatapipeline_spark.session import get_spark

from tools.calibration import (  # noqa: E402
    CALIBRATION_N,
    CALIBRATION_RUNS,
    calibrate as _calibrate,
)

WARMUP = "pricing_summary"  # pinned: JVM/JIT + parquet-footer warm
N_RUNS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("jsdp-bench")

    bench_set = {
        name: q
        for name, q in {**all_queries(), **all_members()}.items()
        if q.bench
    }
    assert WARMUP in bench_set, f"pinned warm-up {WARMUP!r} not in bench set"
    bench_set[WARMUP].fn(spark, sf_dir).count()

    calibration = _calibrate(spark)
    print(f"# calibration: {calibration:.3f}s (range({CALIBRATION_N}).sum, median of {CALIBRATION_RUNS})",
          file=sys.stderr)

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name, q in bench_set.items():
        runs, n = [], 0
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            n = df.count()  # full materialization without driver transfer
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        medians[name] = round(statistics.median(runs), 3)
        print(
            f"# {name}: min {timings[name]:.3f}s / med {medians[name]:.3f}s ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "calibration": calibration,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
