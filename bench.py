"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline comparables (BASELINE.md): full-universe metrics refresh
23.4 s over ~1.14 M rows; per-basket 2-yr windowed agg 0.5-7 s over
<=65 k rows. sf0.1 lineitem is ~600 k rows — same order.

Cross-round comparability (round-4 verdict item 2; round-9 items):
- the warm-up query is PINNED (WARMUP below), not dict-order-dependent;
- each query reports min AND median of N_RUNS;
- a fixed-cost `calibration` entry (spark.range(2e7) sum, no parquet,
  no Python) separates rig drift from plan regressions;
- `queries_normalized` / `value_normalized` scale every wall by
  CALIBRATION_REF / calibration (anchor: the r7 rig), so
  round-over-round deltas are computed on normalized values and rig
  drift self-adjudicates instead of needing prose;
- the ANN flagship is benched as SERVING, not training: the one-off
  `embedding_ivfadc_build` wall (index build, amortized over query
  batches in production) is separated from the per-batch
  `embedding_ivfadc_probe` wall measured over N_RUNS against the
  persisted index — the r8 combined row reported mostly build time
  as if it were query cost.
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
    CALIBRATION_REF,
    CALIBRATION_RUNS,
    calibrate as _calibrate,
)

WARMUP = "pricing_summary"  # pinned: JVM/JIT + parquet-footer warm
N_RUNS = 5
BUILD_RUNS = 2  # the one-off index build: 2 fresh runs, min reported


def bench_ann_split(spark, sf_dir: str, timings, medians) -> None:
    """Build/probe split for the ANN flagship (the shipped IVFADC
    default dial — operators/kmeans.ivf_pq_rerank_topk kwargs): the
    index is built fresh BUILD_RUNS times (unpersisting between runs
    so the shared-plan cache cannot fake a warm build), then the LAST
    build stays persisted and the probe runs N_RUNS against it — the
    per-query-batch serving wall an ANN rollout actually pays."""
    from japanstockdatapipeline_spark.operators.kmeans import (
        ivf_pq_build,
        ivf_pq_probe,
    )
    from japanstockdatapipeline_spark.plans.similarity import _queries_df
    from japanstockdatapipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = _queries_df(emb)

    build_walls = []
    index = cents = None
    handles: list = []
    for _ in range(BUILD_RUNS):
        for h in handles:
            h.unpersist()
        if index is not None:
            index.unpersist()
            cents.unpersist()
        handles = []
        t0 = time.perf_counter()
        index, cents = ivf_pq_build(
            emb, k_coarse=8, m=8, k_cells=16, residual=True,
            persisted_out=handles,
        )
        index = index.persist()
        cents = cents.persist()
        index.count()
        cents.count()
        build_walls.append(time.perf_counter() - t0)
    timings["embedding_ivfadc_build"] = round(min(build_walls), 3)
    medians["embedding_ivfadc_build"] = round(statistics.median(build_walls), 3)
    print(
        f"# embedding_ivfadc_build: min {timings['embedding_ivfadc_build']:.3f}s"
        f" / med {medians['embedding_ivfadc_build']:.3f}s"
        f" ({BUILD_RUNS} fresh builds)",
        file=sys.stderr,
    )

    probe_walls, n = [], 0
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        n = ivf_pq_probe(
            index, cents, queries, emb, k=5, candidates=80, n_probe=2
        ).count()
        probe_walls.append(time.perf_counter() - t0)
    timings["embedding_ivfadc_probe"] = round(min(probe_walls), 3)
    medians["embedding_ivfadc_probe"] = round(statistics.median(probe_walls), 3)
    print(
        f"# embedding_ivfadc_probe: min {timings['embedding_ivfadc_probe']:.3f}s"
        f" / med {medians['embedding_ivfadc_probe']:.3f}s ({n} rows)",
        file=sys.stderr,
    )
    for h in handles:
        h.unpersist()
    index.unpersist()
    cents.unpersist()


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

    calibration_pre = _calibrate(spark)
    print(f"# calibration(pre): {calibration_pre:.3f}s (range({CALIBRATION_N}).sum, median of {CALIBRATION_RUNS})",
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

    bench_ann_split(spark, sf_dir, timings, medians)

    # calibrate AGAIN after the suite: on a shared rig the load can
    # swing mid-run (observed: 0.146 -> 0.248 within an hour), so one
    # snapshot misattributes drift; the pre/post pair bounds it and
    # the mean is the least-bad single normalizer
    calibration_post = _calibrate(spark)
    calibration = round((calibration_pre + calibration_post) / 2, 3)
    print(f"# calibration(post): {calibration_post:.3f}s -> mean {calibration:.3f}s",
          file=sys.stderr)

    scale = CALIBRATION_REF / calibration if calibration else 1.0
    normalized = {k: round(v * scale, 3) for k, v in timings.items()}
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
                "calibration_pre": calibration_pre,
                "calibration_post": calibration_post,
                "calibration_ref": CALIBRATION_REF,
                "queries_normalized": normalized,
                "value_normalized": round(sum(normalized.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
