"""Multimodal plumbing + era-date expression tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from japanstockdatapipeline_spark.functions.japanese import era_date_to_iso, iso_to_era_date
from japanstockdatapipeline_spark.operators.multimodal import (
    attach_fake_payload,
    frame_sample_plan,
    image_stats,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 100), (3, "")], ["doc_id", "text"]
    )
    return attach_fake_payload(docs)


def test_payload_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.select("meta.*").first()
    assert meta["mime"] == "image/fake" and meta["width"] >= 16


def test_image_stats_fake_decode(media):
    rows = {r["doc_id"]: r for r in image_stats(media).collect()}
    buf = b"hello world"
    assert rows[1]["n_bytes"] == len(buf)
    assert rows[1]["mean_byte"] == pytest.approx(sum(buf) / len(buf))
    assert rows[1]["sha256"] == hashlib.sha256(buf).hexdigest()
    assert rows[3]["n_bytes"] == 0 and rows[3]["mean_byte"] == 0.0


def test_resize_nearest_neighbor(media):
    rows = {r["doc_id"]: r for r in resize_images(media, 8, 4).collect()}
    # every output payload is exactly the target pixel count, any input
    assert all(len(r["payload"]) == 8 * 4 for r in rows.values())
    assert all(r["width"] == 8 and r["height"] == 4 for r in rows.values())
    # deterministic: same input -> same bytes
    again = {r["doc_id"]: r for r in resize_images(media, 8, 4).collect()}
    assert all(bytes(rows[k]["payload"]) == bytes(again[k]["payload"]) for k in rows)
    # a constant image stays constant under nearest-neighbor
    src = media.filter(F.col("doc_id") == 2)  # "x" * 100 payload
    out = resize_images(src, 5, 5).first()
    body = set(bytes(out["payload"]))
    assert body <= {ord("x"), 0}  # payload bytes, zero-padded tail


def test_frame_plan_prunes_payload(media):
    plan = frame_sample_plan(media, every_n=2)
    # metadata-only: the binary payload must not appear in the scan
    assert "payload" not in plan.schema.fieldNames()
    n1 = plan.filter(F.col("doc_id") == 1).count()
    meta = media.filter(F.col("doc_id") == 1).select("meta.n_frames").first()[0]
    assert n1 == len(range(0, meta, 2))


def test_era_roundtrip_edges(spark):
    df = spark.createDataFrame(
        [("2019-05-01",), ("2024-01-05",), ("1989-01-08",), ("1975-03-03",)], ["d"]
    ).select(F.col("d").cast("date").alias("d"))
    out = df.select(
        "d",
        iso_to_era_date(F.col("d")).alias("era"),
        F.date_format(era_date_to_iso(iso_to_era_date(F.col("d"))), "yyyy-MM-dd").alias("back"),
    ).collect()
    got = {str(r["d"]): (r["era"], r["back"]) for r in out}
    assert got["2019-05-01"] == ("令和元年5月1日", "2019-05-01")  # 元年
    assert got["2024-01-05"] == ("令和6年1月5日", "2024-01-05")
    assert got["1989-01-08"] == ("平成元年1月8日", "1989-01-08")
    assert got["1975-03-03"] == ("昭和50年3月3日", "1975-03-03")


def test_era_parse_garbage_is_null(spark):
    df = spark.createDataFrame([("not a date",), ("令和年月日",)], ["s"])
    out = df.select(era_date_to_iso(F.col("s")).alias("d")).collect()
    assert all(r["d"] is None for r in out)


def test_image_stats_non_ascii_bytes(spark):
    """Byte stats are over UTF-8 octets, not codepoints — a non-ASCII
    corpus must produce multi-byte-aware means/maxes (the oracle
    hex-decodes the same octets)."""
    from japanstockdatapipeline_spark.operators.multimodal import (
        attach_fake_payload,
        image_stats,
    )

    docs = spark.createDataFrame(
        [(1, "aé"), (2, "日本語"), (3, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in image_stats(attach_fake_payload(docs)).collect()}
    for doc_id, text in [(1, "aé"), (2, "日本語"), (3, "")]:
        raw = text.encode("utf-8")
        assert out[doc_id]["n_bytes"] == len(raw)
        assert out[doc_id]["max_byte"] == (max(raw) if raw else 0)
        expected_mean = sum(raw) / len(raw) if raw else 0.0
        assert abs(out[doc_id]["mean_byte"] - expected_mean) < 1e-9


def test_frame_plan_zero_frames_emits_no_rows(spark):
    """Review fix: n_frames = 0 made sequence(0, -1, +step) raise an
    illegal-boundaries error killing the job; it must emit zero frame
    rows for that doc instead."""
    rows = spark.createDataFrame([(1, 0), (2, 3)], ["doc_id", "nf"]).select(
        "doc_id",
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.col("nf").cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    got = {
        (r["doc_id"], r["frame_idx"])
        for r in frame_sample_plan(rows, every_n=2).collect()
    }
    assert got == {(2, 0), (2, 2)}


def test_era_boundaries_and_invalid_dates(spark):
    """Review fixes: era chosen by the FULL transition date (Jan-Apr
    2019 is 平成 31, Jan 1-7 1989 is 昭和 64), and out-of-range
    month/day parse to NULL instead of an ANSI DateTimeException."""
    df = spark.createDataFrame(
        [("2019-01-05",), ("2019-05-01",), ("1989-01-05",), ("1989-01-08",)],
        ["iso"],
    ).select(F.col("iso").cast("date").alias("d"))
    got = {str(r["d"]): r["era"] for r in df.select(
        "d", iso_to_era_date(F.col("d")).alias("era")).collect()}
    assert got["2019-01-05"] == "平成31年1月5日"
    assert got["2019-05-01"] == "令和元年5月1日"
    assert got["1989-01-05"] == "昭和64年1月5日"
    assert got["1989-01-08"] == "平成元年1月8日"

    bad = spark.createDataFrame(
        [("令和6年13月5日",), ("平成2年2月30日",), ("令和6年1月5日",)], ["s"]
    )
    parsed = [r["d"] for r in bad.select(era_date_to_iso(F.col("s")).alias("d")).collect()]
    assert parsed[0] is None and parsed[1] is None
    assert str(parsed[2]) == "2024-01-05"


def test_era_roundtrip_oracle_exercises_boundaries(spark, tmp_path):
    """The gate's TPC-H dates (1992-98) sit entirely inside Heisei, so
    the oracle's era-boundary logic is never exercised by the driver —
    run Spark member AND DuckDB oracle on synthetic boundary dates and
    require identical output (a year-only regression in either side
    fails here)."""
    import duckdb

    from japanstockdatapipeline_spark.plans import all_members

    days = ["2019-01-05", "2019-05-01", "1989-01-05", "1989-01-08", "1995-06-15"]
    spark.createDataFrame([(d,) for d in days], ["o_orderdate"]).select(
        F.col("o_orderdate").cast("date").alias("o_orderdate")
    ).write.parquet(str(tmp_path / "orders.parquet"))

    m = all_members()["era_date_roundtrip"]
    spark_rows = {
        r["order_date"]: (r["era_str"], r["parsed_back"])
        for r in m.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    oracle_rows = {r[0]: (r[1], r[2]) for r in con.execute(m.oracle).fetchall()}
    assert spark_rows == oracle_rows
    assert spark_rows["2019-01-05"][0] == "平成31年1月5日"
    assert spark_rows["1989-01-05"][0] == "昭和64年1月5日"
    # every date round-trips through the era string
    assert all(k == v[1] for k, v in spark_rows.items())
