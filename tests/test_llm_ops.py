"""Unit vectors for LLM-pipeline doc operators added in round 4."""

from __future__ import annotations


def test_chunk_dedup_signal(spark, tmp_path):
    """Chunk-level dedup: an 8-token chunk repeated across docs is
    flagged in every doc carrying it; unique chunks are not; a short
    doc forms a single (tail) chunk."""
    from japanstockdatapipeline_spark.plans.llm import doc_chunk_dedup

    shared = "a1 a2 a3 a4 a5 a6 a7 a8"
    rows = [
        (1, shared + " b1 b2 b3 b4 b5 b6 b7 b8"),  # 2 chunks, first duplicated
        (2, shared),                                # 1 chunk, duplicated
        (3, "u1 u2 u3 u4 u5 u6 u7 u8"),            # 1 unique chunk
        (4, "t1 t2 t3"),                            # short tail chunk
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r for r in doc_chunk_dedup(spark, sf_dir).collect()}
    assert (got[1]["n_chunks"], got[1]["n_dup_chunks"], got[1]["dup_chunk_frac"]) == (2, 1, 0.5)
    assert (got[2]["n_chunks"], got[2]["n_dup_chunks"], got[2]["dup_chunk_frac"]) == (1, 1, 1.0)
    assert (got[3]["n_chunks"], got[3]["n_dup_chunks"], got[3]["dup_chunk_frac"]) == (1, 0, 0.0)
    assert (got[4]["n_chunks"], got[4]["n_dup_chunks"], got[4]["dup_chunk_frac"]) == (1, 0, 0.0)
