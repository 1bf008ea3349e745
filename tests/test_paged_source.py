"""The S1-S4 control loop as a registered Spark data source: the scan
runs in executors (one InputPartition per shard) with per-task rate
limiting and retry, and matches the pure-driver control loop."""

from __future__ import annotations

from japanstockdatapipeline_spark.sources.ingest import paginate
from japanstockdatapipeline_spark.sources.paged_source import (
    PagedApiDataSource,
    _fake_server,
)


def _load(spark, **opts):
    spark.dataSource.register(PagedApiDataSource)
    r = spark.read.format("paged_api")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_paged_source_scans_all_shards_in_parallel(spark):
    df = _load(spark, shards=4, rowsPerShard=2500)
    assert df.rdd.getNumPartitions() == 4  # one task per shard
    assert df.count() == 10000  # retries survived the injected 503s
    per_shard = dict(
        (r["shard"], r["count"]) for r in df.groupBy("shard").count().collect()
    )
    assert per_shard == {0: 2500, 1: 2500, 2: 2500, 3: 2500}
    # offsets are dense per shard (short-page stop fired at 2500, not
    # at a page boundary: 2500 % 1000 = 500-row final page)
    offs = sorted(r["offset"] for r in df.filter("shard = 2").collect())
    assert offs == list(range(2500))


def test_paged_source_matches_driver_control_loop(spark):
    df = _load(spark, shards=2, rowsPerShard=1500, flaky=False)
    got = sorted(tuple(r) for r in df.filter("shard = 1").collect())
    want = sorted(paginate(_fake_server(1, 1500, False), page_size=1000))
    assert got == want


def test_paged_source_retry_path_is_exercised(spark):
    # flaky=true injects one retryable 503 on every shard's second
    # page; the scan must still produce every row exactly once
    df = _load(spark, shards=3, rowsPerShard=2000, flaky=True)
    rows = df.collect()
    assert len(rows) == 6000
    assert len({(r["shard"], r["offset"]) for r in rows}) == 6000


def test_paged_stream_source_incremental_exactly_once(spark, tmp_path):
    """Two availableNow runs over the same checkpoint: each drains the
    rows published since the last committed offset; the union has no
    duplicates and no gaps (exactly-once across restarts)."""
    spark.dataSource.register(PagedApiDataSource)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    def run_once():
        stream = (
            spark.readStream.format("paged_api")
            .option("shards", 2)
            .option("rowsPerTick", 500)
            .option("maxRows", 1500)
            .load()
        )
        q = (
            stream.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", cp)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).count()
    assert first > 0
    run_once()  # restart: resumes from the checkpointed offset
    rows = spark.read.parquet(out).collect()
    assert len(rows) > first  # the second run ingested NEW rows only
    keys = [(r["shard"], r["offset"]) for r in rows]
    assert len(keys) == len(set(keys))  # no duplicates across restarts
    # no gaps: offsets are dense from 0 per shard
    for s in (0, 1):
        offs = sorted(o for sh, o in keys if sh == s)
        assert offs == list(range(len(offs)))


def test_paged_sink_batches_under_both_caps(spark, tmp_path):
    """The writer must chunk every request under BOTH the row cap and
    the payload-byte cap, deliver every row exactly once, and survive
    an injected transient failure per task."""
    import glob
    import json

    spark.dataSource.register(PagedApiDataSource)
    endpoint = str(tmp_path / "api")
    df = spark.range(5000).selectExpr(
        "cast(id as int) AS k", "repeat('x', 200) AS payload"
    ).repartition(4)
    (
        df.write.format("paged_api")
        .option("endpointDir", endpoint)
        .option("maxRowsPerRequest", 300)
        .option("maxBytesPerRequest", 32 * 1024)
        .option("flaky", "true")
        .mode("append")
        .save()
    )
    seen = []
    for f in glob.glob(f"{endpoint}/req-*.json"):
        body = open(f).read()
        rows = json.loads(body)
        assert len(rows) <= 300
        assert len(body) <= 32 * 1024 + 256  # cap + bracket slack
        seen.extend(r["k"] for r in rows)
    assert sorted(seen) == list(range(5000))


def test_stream_source_composes_with_drift_gate(spark, tmp_path):
    """End-to-end: the custom streaming source feeds the PSI ingestion
    gate, which lands passing batches as partitioned gold — custom
    source, governance gate, and idempotent sink interoperate."""
    from pyspark.sql import functions as F

    from japanstockdatapipeline_spark.streaming.jobs import (
        drift_gated_ingest,
        score_histogram,
    )

    spark.dataSource.register(PagedApiDataSource)
    # reference distribution from a batch read of the same API
    ref = (
        spark.read.format("paged_api")
        .option("shards", 2)
        .option("rowsPerShard", 2000)
        .option("flaky", "false")
        .load()
        .withColumn("score", F.col("value") / 100.0)
    )
    hist = score_histogram(ref, "score")

    stream = (
        spark.readStream.format("paged_api")
        .option("shards", 2)
        .option("rowsPerTick", 2000)
        .option("maxRows", 2000)
        .load()
        .withColumn("score", F.col("value") / 100.0)
    )
    target = str(tmp_path / "gold")
    verdicts = drift_gated_ingest(
        stream, target, str(tmp_path / "cp"), "shard", "score", hist, threshold=0.25
    )
    assert verdicts and all(v["ingested"] for v in verdicts)  # same distribution
    assert spark.read.parquet(target).count() == 4000
