"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline comparables (BASELINE.md): full-universe metrics refresh
23.4 s over ~1.14 M rows; per-basket 2-yr windowed agg 0.5-7 s over
<=65 k rows. sf0.1 lineitem is ~600 k rows — same order.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from japanstockdatapipeline_spark.plans import all_members, all_queries
from japanstockdatapipeline_spark.session import get_spark


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
    # warm the JVM + parquet footers once with the cheapest query
    next(iter(bench_set.values())).fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, q in bench_set.items():
        best, n = float("inf"), 0
        for _ in range(2):  # steady-state: min of 2 (JIT/footer-cache warmup)
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            n = df.count()  # full materialization without driver transfer
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
