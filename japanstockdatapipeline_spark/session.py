"""SparkSession factory tuned for the local[N] test rig.

On a real cluster these configs move to spark-submit/cluster conf;
the knobs that matter at 100 TB (AQE, shuffle partitions, Arrow)
are the same ones set here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "jsdp-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # one shuffle partition per core locally; on a cluster this is
        # sized to ~128MB per task and AQE coalesces the tail
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fewer, larger Arrow batches for the pandas-backed operators
        # (mapInPandas/applyInPandas concat every batch per partition;
        # 64k cuts that overhead ~10% on the fused panel at sf0.1 —
        # ~14 MB/batch at 27 doubles, trivial against task memory)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
