"""Parquet table sources.

The driver testdata is a TPC-H-ish star schema plus an `events`
stream table and `documents`/`embeddings` for the LLM-pipeline
operators (TESTDATA.md). Reads are lazy; Catalyst prunes columns
and pushes predicates into the parquet scan, so loading "all"
tables costs nothing until an action runs.

At 100 TB these would be date-partitioned directories; the reader
API is the same (`spark.read.parquet(dir)` + partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as a long and normalize to epoch micros
        # (bigint `ts_us`) — the same truncation DuckDB applies when it
        # coerces ns to its µs TIMESTAMP, so orderings/values agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts_us", F.expr("ts DIV 1000").cast("bigint")).drop("ts")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
