"""End-to-end daily pipeline (the Spark shape of SURVEY §3.1's Cron A:
ingest → silver typed tables → DAG of gold jobs, each a deterministic
partition overwrite, wrapped in a run manifest).

`run_daily_pipeline(spark, sf_dir, out_dir, run_date)` executes:
  1. silver: events normalized (ts_us, day) — partitioned by day
  2. gold: per-user technical snapshot (grouped-map, ST5 overwrite)
  3. gold: market breadth (A/D ratio + %-above-SMA merged into one
     wide indicators table via the NULL-cursor merge, ST4)
  4. freshness check (ST9 stale guard semantics)
with every step logged to the RunManifest (ST7) and written with
dynamic partition overwrite (idempotent re-runs, ST1 overlap).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.snapshot import technical_snapshot
from .plans.technical import daily_adv_dec_ratio, pct_above_sma_breadth
from .sources import load_table
from .streaming.incremental import RunManifest, merge_column_groups, write_partition_overwrite

__all__ = ["run_daily_pipeline"]


def _silver_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn(
        "day", F.expr("ts_us DIV 86400000000")
    )


def run_daily_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str, run_date: str
) -> dict[str, int]:
    manifest = RunManifest(os.path.join(out_dir, "ops", "runs.jsonl"))
    counts: dict[str, int] = {}

    def step(job: str, fn):
        run_id = manifest.start(job, run_date)
        try:
            n = fn()
            manifest.finish(run_id, "success", rows=n)
            counts[job] = n
        except Exception as e:  # noqa: BLE001 — manifest must record failures
            manifest.finish(run_id, "failed", error=str(e))
            raise

    def silver():
        df = _silver_events(spark, sf_dir)
        write_partition_overwrite(df, os.path.join(out_dir, "silver", "events"), "day")
        return spark.read.parquet(os.path.join(out_dir, "silver", "events")).count()

    def snapshot():
        ev = spark.read.parquet(os.path.join(out_dir, "silver", "events"))
        snap = technical_snapshot(ev, "user_id", "ts_us", "value").withColumn(
            "as_of", F.lit(run_date)
        )
        write_partition_overwrite(snap, os.path.join(out_dir, "gold", "snapshot"), "as_of")
        return spark.read.parquet(os.path.join(out_dir, "gold", "snapshot")).count()

    def indicators():
        adv = daily_adv_dec_ratio(spark, sf_dir)
        sma = pct_above_sma_breadth(spark, sf_dir)
        wide = merge_column_groups(adv, sma, ["day"])
        write_partition_overwrite(
            wide.withColumn("as_of", F.lit(run_date)),
            os.path.join(out_dir, "gold", "market_indicators"),
            "as_of",
        )
        return spark.read.parquet(
            os.path.join(out_dir, "gold", "market_indicators")
        ).count()

    def metrics_screen():
        # §7.1 slice: rebase -> momentum pivot -> FY/prev-FY -> sector
        # scores -> total score -> screen table (00108/00049/00051)
        from .plans.composed import stock_metrics_pipeline

        screen = stock_metrics_pipeline(spark, sf_dir).withColumn(
            "as_of", F.lit(run_date)
        )
        write_partition_overwrite(
            screen, os.path.join(out_dir, "gold", "stock_screen"), "as_of"
        )
        return spark.read.parquet(os.path.join(out_dir, "gold", "stock_screen")).count()

    step("silver_events", silver)
    step("gold_snapshot", snapshot)
    step("gold_market_indicators", indicators)
    step("gold_stock_screen", metrics_screen)
    return counts
