"""Structured Streaming jobs (SURVEY §2.9 mapped to real streams).

The reference is batch-cron, but its incremental semantics (late
corrections, watermark fills, stateful breadth) map to Structured
Streaming: readStream → watermark → windowed agg / dedup →
writeStream. These jobs run with Trigger.availableNow over file
sources so tests exercise the full streaming path deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["events_stream", "windowed_event_counts", "dedup_stream", "run_to_parquet"]

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of event batches (parquet drops into a dir —
    the streaming analog of the reference's per-day ingest batches)."""
    raw = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def windowed_event_counts(stream: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-day windowed per-type aggregation with late-data
    watermark — the streaming form of the daily batch cadence (ST1's
    watermark + the daily market_indicators fill ST4)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def dedup_stream(stream: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark — the
    corrections-safe idempotent ingest (the reference's ON CONFLICT
    upsert semantics, batch.ts:81-141, in stream form)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_parquet(
    out: DataFrame, target_dir: str, checkpoint_dir: str, *, mode: str = "append"
) -> None:
    """Drain all available input (Trigger.availableNow) into parquet and
    stop — deterministic for tests; on a cluster the same query runs
    continuously with the checkpoint providing exactly-once."""
    q = (
        out.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(mode)
        .format("parquet")
        .option("path", target_dir)
        .start()
    )
    q.awaitTermination()
