"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline comparables (BASELINE.md): full-universe metrics refresh
23.4 s over ~1.14 M rows; per-basket 2-yr windowed agg 0.5-7 s over
<=65 k rows. sf0.1 lineitem is ~600 k rows — same order.

Cross-round comparability (round-4 verdict item 2; round-9 items;
round-11 item 4):
- the warm-up query is PINNED (WARMUP below), not dict-order-dependent;
- each query reports min AND median of N_RUNS;
- a fixed-cost calibration (spark.range(2e7) sum, no parquet, no
  Python) separates rig drift from plan regressions — and since r11
  it is INTERLEAVED between query blocks: intra-run drift (r10
  observed pre 0.235 / post 0.162) exceeds the per-query deltas being
  adjudicated, so a single suite-level scalar cannot normalize
  per-query walls. Each query is normalized by the mean of the quick
  calibration samples bracketing ITS block (`queries_normalized`);
  the old single-scalar form is retained as
  `queries_normalized_global` for continuity with BENCH_r<=10.
- a PER-QUERY NOISE BOUND is emitted (`noise_bound_rel`): local
  calibration drift across the block plus the gap between the two
  fastest runs. The mechanical adjudication rule for a future round:
  query X regressed beyond noise iff
    norm_new > norm_old * (1 + bound_old + bound_new).
  `suite_noise_bound_rel` is the wall-weighted average.
- the ANN flagship is benched as SERVING, not training: the one-off
  `embedding_ivfadc_build` wall is separated from the per-batch
  `embedding_ivfadc_probe` wall measured against the persisted index.
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
QUICK_CAL_RUNS = 2  # interleaved sample: min of 2 (one is too noisy)


def quick_cal(spark) -> float:
    """One interleaved calibration sample (min of QUICK_CAL_RUNS
    range-sums, ~0.3 s) — cheap enough to bracket every query block."""
    walls = []
    for _ in range(QUICK_CAL_RUNS):
        t0 = time.perf_counter()
        spark.range(CALIBRATION_N).selectExpr("sum(id) AS s").collect()
        walls.append(time.perf_counter() - t0)
    return round(min(walls), 4)


class BlockTimer:
    """Runs each query block bracketed by interleaved calibration
    samples; accumulates min/median walls, per-block local
    calibrations, and per-query noise bounds."""

    def __init__(self, spark):
        self.spark = spark
        self.timings: dict[str, float] = {}
        self.medians: dict[str, float] = {}
        self.local_cal: dict[str, float] = {}
        self.noise: dict[str, float] = {}
        self.cals: list[float] = [quick_cal(spark)]

    def record(self, name: str, walls: list[float], rows: int | str) -> None:
        self.cals.append(quick_cal(self.spark))
        cal_before, cal_after = self.cals[-2], self.cals[-1]
        local = (cal_before + cal_after) / 2
        self.timings[name] = round(min(walls), 3)
        self.medians[name] = round(statistics.median(walls), 3)
        self.local_cal[name] = round(local, 4)
        # noise bound: calibration drift across the block + the gap
        # between the two fastest runs (the min estimator's jitter)
        cal_drift = abs(cal_before - cal_after) / local
        s = sorted(walls)
        run_gap = (s[1] - s[0]) / s[0] if len(s) > 1 and s[0] > 0 else 0.0
        self.noise[name] = round(cal_drift + run_gap, 4)
        print(
            f"# {name}: min {self.timings[name]:.3f}s / med"
            f" {self.medians[name]:.3f}s ({rows} rows), local_cal"
            f" {local:.3f}s, noise ±{100 * self.noise[name]:.1f}%",
            file=sys.stderr,
        )

    def run_query(self, name: str, fn, sf_dir: str) -> None:
        walls, n = [], 0
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            n = fn(self.spark, sf_dir).count()  # materialize, no transfer
            walls.append(time.perf_counter() - t0)
        self.record(name, walls, n)


def bench_ann_split(bt: BlockTimer, sf_dir: str) -> None:
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

    spark = bt.spark
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
    bt.record("embedding_ivfadc_build", build_walls, f"{BUILD_RUNS} fresh builds")

    probe_walls, n = [], 0
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        n = ivf_pq_probe(
            index, cents, queries, emb, k=5, candidates=80, n_probe=2
        ).count()
        probe_walls.append(time.perf_counter() - t0)
    bt.record("embedding_ivfadc_probe", probe_walls, n)
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
    print(
        f"# calibration(pre): {calibration_pre:.3f}s (range({CALIBRATION_N})"
        f".sum, median of {CALIBRATION_RUNS})",
        file=sys.stderr,
    )

    bt = BlockTimer(spark)
    for name, q in bench_set.items():
        bt.run_query(name, q.fn, sf_dir)

    bench_ann_split(bt, sf_dir)

    # suite-level pre/post pair retained for continuity with
    # BENCH_r<=10 (the old single-scalar normalization)
    calibration_post = _calibrate(spark)
    calibration = round((calibration_pre + calibration_post) / 2, 3)
    print(
        f"# calibration(post): {calibration_post:.3f}s -> mean {calibration:.3f}s",
        file=sys.stderr,
    )

    timings, medians = bt.timings, bt.medians
    # r11: per-query normalization by the LOCAL (per-block) calibration
    normalized = {
        k: round(v * CALIBRATION_REF / bt.local_cal[k], 3)
        for k, v in timings.items()
    }
    scale = CALIBRATION_REF / calibration if calibration else 1.0
    normalized_global = {k: round(v * scale, 3) for k, v in timings.items()}
    total = round(sum(timings.values()), 3)
    total_w = sum(timings.values()) or 1.0
    suite_noise = round(
        sum(bt.noise[k] * timings[k] for k in timings) / total_w, 4
    )
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
                "calibration_blocks": bt.cals,
                "queries_local_calibration": bt.local_cal,
                "queries_normalized": normalized,
                "queries_normalized_global": normalized_global,
                "noise_bound_rel": bt.noise,
                "suite_noise_bound_rel": suite_noise,
                "value_normalized": round(sum(normalized.values()), 3),
                "value_normalized_global": round(
                    sum(normalized_global.values()), 3
                ),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
