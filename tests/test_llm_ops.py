"""Unit vectors for LLM-pipeline doc operators added in round 4."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


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


def test_mixture_plan_conservation_and_sample_tracks_allocation(spark, sf_dir):
    """The planner allocates exactly min(budget, capacity) in total,
    rates are in (0, 1], and the deterministic hash sampler realizes
    each source's planned token mass within sampling noise."""
    from japanstockdatapipeline_spark.plans.llm import (
        doc_mixture_plan,
        doc_mixture_sample,
    )

    plan = {r["source"]: r for r in doc_mixture_plan(spark, sf_dir).collect()}
    total_cap = sum(r["capacity_tokens"] for r in plan.values())
    total_alloc = sum(r["alloc_tokens"] for r in plan.values())
    assert total_alloc == pytest.approx(0.9 * total_cap, rel=0.01)
    assert all(0 < r["sample_rate"] <= 1.0 for r in plan.values())
    assert any(r["saturated"] for r in plan.values()) or all(
        r["sample_rate"] < 1.0 for r in plan.values()
    )

    kept = doc_mixture_sample(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source")
    realized = {
        r["source"]: r["kept"]
        for r in kept.join(docs, "doc_id")
        .groupBy("source")
        .agg(F.sum(F.col("mx_keep").cast("int")).alias("kept"), F.count("*").alias("n"))
        .select("source", (F.col("kept") / F.col("n")).alias("kept"))
        .collect()
    }
    for src, r in plan.items():
        # ~25 docs/source at sf0.01: allow generous hash-sampling noise
        assert abs(realized[src] - r["sample_rate"]) < 0.35


def test_simhash_pairs_banding_is_lossless(spark, sf_dir):
    """Pigeonhole guarantee: with hamming <= 3 and 4 bands, band
    blocking must find EXACTLY the pairs a brute-force all-pairs
    hamming scan finds — unlike MinHash, zero recall loss."""
    from japanstockdatapipeline_spark.operators.dedup import simhash, simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blocked = {
        (r["id_a"], r["id_b"]): r["sh_hamming"]
        for r in simhash_pairs(docs, max_hamming=3, bands=4).collect()
    }
    s = simhash(docs)
    a = s.selectExpr("doc_id AS id_a", "simhash AS sh_a")
    b = s.selectExpr("doc_id AS id_b", "simhash AS sh_b")
    brute = {
        (r["id_a"], r["id_b"]): r["ham"]
        for r in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("ham"),
        )
        .where(F.col("ham") <= 3)
        .collect()
    }
    assert blocked == brute
    assert len(brute) > 0  # non-degenerate on the fixture


def test_lsh_verified_pairs_subset_of_exact_with_true_jaccard(spark, sf_dir):
    """Two-stage production near-dup (round 6): every verified pair
    must appear in the exact inverted-index result with the IDENTICAL
    Jaccard (stage 2 is exact, so no false positives and no estimated
    values); missed pairs are banding recall only."""
    from japanstockdatapipeline_spark.operators.dedup import (
        lsh_verified_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, k=3).collect()
    }
    verified = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in lsh_verified_pairs(docs, threshold=0.5, n_hashes=16, bands=4).collect()
    }
    assert verified  # non-degenerate on the fixture
    assert set(verified) <= set(exact)
    for pair, j in verified.items():
        assert exact[pair] == j


def test_simhash_pairs_empty_docs_do_not_collide(spark):
    """Review fix: zero-token docs all hash to simhash 0 and would
    collide in every band (quadratic spurious candidates) — they are
    excluded from pair generation, same guard as minhash_signature."""
    from japanstockdatapipeline_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(i, "") for i in range(5)]
        + [(8, "   ")]
        + [(10, "a b c"), (11, "a b c")],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_pairs(docs).collect()}
    assert pairs == {(10, 11)}


def test_minhash_bands_must_divide_hashes(spark):
    """Review fix: a non-dividing band count silently dropped trailing
    minhashes from banding — now a loud ValueError."""
    from japanstockdatapipeline_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(docs, n_hashes=16, bands=5)


def test_persisted_members_release_cache_across_sweep(spark, tmp_path):
    """The three members that persist() an intermediate (vocab / unigram
    tf / DSIR buckets) expose the semdedup-style persisted_out hook so
    a long-lived session sweeping many directories can release each
    directory's cache entry: after unpersisting the handles, the
    session's persistent-RDD count returns to its starting value
    (r8 verdict #3 / ADVICE closure)."""
    import pandas as pd

    from japanstockdatapipeline_spark.plans.llm import (
        doc_bpe_apply,
        doc_bpe_train,
        doc_dsir_weight,
        doc_priority_sample,
        doc_unigram_logprob,
        doc_vocab_stats,
    )

    dirs = []
    for d in ("sweep_a", "sweep_b"):
        p = tmp_path / d
        p.mkdir()
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["the quick brown fox", "jumps over the lazy dog"],
                "lang": ["en", "en"],
            }
        ).to_parquet(p / "documents.parquet")
        dirs.append(str(p))

    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    base = n_cached()
    for sf_dir in dirs:
        handles = []
        doc_vocab_stats(spark, sf_dir, persisted_out=handles).count()
        doc_unigram_logprob(spark, sf_dir, persisted_out=handles).count()
        doc_dsir_weight(spark, sf_dir, persisted_out=handles).count()
        doc_bpe_apply(spark, sf_dir, persisted_out=handles).count()
        doc_bpe_train(spark, sf_dir, persisted_out=handles).count()
        doc_priority_sample(spark, sf_dir, persisted_out=handles).count()
        assert len(handles) == 6
        for h in handles:
            assert h.storageLevel.useMemory or h.storageLevel.useDisk  # was persisted
            h.unpersist()
            assert not (h.storageLevel.useMemory or h.storageLevel.useDisk)
    # <= not ==: the async ContextCleaner may reap OTHER tests'
    # unreferenced checkpoint RDDs between the base measurement and
    # here (observed flaking in the full-suite run); the per-handle
    # storageLevel assertions above are the exact release check
    assert n_cached() <= base


def test_dup_span_removal_hand_vector(spark, tmp_path):
    """8-token windows: a window duplicated across docs survives only
    at its globally-first (doc_id, chunk_idx) occurrence; partial tail
    windows are never removed even when their text repeats; empty/NULL
    docs keep a zeroed row."""
    from japanstockdatapipeline_spark.plans.llm import doc_dup_span_removal

    w8 = "w1 w2 w3 w4 w5 w6 w7 w8"  # one full window
    u8 = "u1 u2 u3 u4 u5 u6 u7 u8"  # another full window
    rows = [
        (1, f"{w8} {u8}"),          # first occurrence of both windows
        (2, f"{w8} tail bit"),      # window dup (removed) + partial tail
        (3, f"{u8} {w8}"),          # both windows dup -> all removed
        (4, "tail bit"),            # partial-only doc, same text as doc2's
                                    # tail: partials are NEVER dedup'd
        (5, ""),
        (6, None),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in doc_dup_span_removal(spark, sf_dir).collect()}

    assert got[1]["span_n_chunks"] == 2 and got[1]["span_dup_removed"] == 0
    assert got[1]["span_tokens_before"] == 16 and got[1]["span_tokens_after"] == 16

    assert got[2]["span_n_chunks"] == 2 and got[2]["span_dup_removed"] == 1
    assert got[2]["span_tokens_after"] == 2  # only the partial tail kept

    assert got[3]["span_dup_removed"] == 2 and got[3]["span_tokens_after"] == 0

    assert got[4]["span_dup_removed"] == 0 and got[4]["span_tokens_after"] == 2

    for d in (5, 6):
        assert got[d]["span_n_chunks"] == 0
        assert got[d]["span_tokens_before"] == 0
        assert got[d]["span_tokens_after"] == 0

    # rebuilt text: doc2 keeps exactly 'tail bit', doc4 is identical
    assert got[2]["span_clean_fp"] == got[4]["span_clean_fp"]
    # fully-emptied doc3 hashes like the empty docs
    assert got[3]["span_clean_fp"] == got[5]["span_clean_fp"] == got[6]["span_clean_fp"]


def test_dup_span_removal_within_one_doc(spark, tmp_path):
    """The SAME window repeated inside one document is removed at its
    later chunk positions (self-repetition is cross-position dup)."""
    from japanstockdatapipeline_spark.plans.llm import doc_dup_span_removal

    w8 = "a b c d e f g h"
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, f"{w8} {w8} {w8}")], ["doc_id", "text"]
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = doc_dup_span_removal(spark, sf_dir).collect()[0]
    assert got["span_n_chunks"] == 3
    assert got["span_dup_removed"] == 2
    assert got["span_tokens_before"] == 24 and got["span_tokens_after"] == 8


def test_dup_span_removal_matches_python_reference(spark, tmp_path):
    """Seeded random small-vocab corpus (forces window collisions both
    within and across docs): per-doc counts, kept token mass, and the
    rebuilt-text fingerprint must all match a straightforward Python
    implementation of keep-globally-first chunk dedup."""
    import hashlib
    import random
    import re

    from japanstockdatapipeline_spark.plans.llm import (
        DUP_SPAN_CHUNK as C,
        doc_dup_span_removal,
    )

    rng = random.Random(97)
    vocab = ["aa", "bb", "cc"]
    texts = {}
    for did in range(60):
        n = rng.randrange(0, 30)
        texts[did] = " ".join(rng.choice(vocab) for _ in range(n))
    texts[60] = ""
    texts[61] = None

    def py_ref():
        chunks = []
        nt = {}
        for did in sorted(texts):
            toks = [x for x in re.split(r"\s+", (texts[did] or "").strip()) if x]
            nt[did] = len(toks)
            for i in range((len(toks) + C - 1) // C):
                sl = toks[i * C : (i + 1) * C]
                chunks.append((did, i, " ".join(sl), len(sl)))
        seen, out = set(), {}
        for did in sorted(texts):
            out[did] = {"n": 0, "rm": 0, "after": 0, "kept": []}
        for did, i, txt, sz in sorted(chunks):
            key = ("f", txt) if sz == C else ("p", did, i)
            out[did]["n"] += 1
            if key in seen:
                out[did]["rm"] += 1
            else:
                seen.add(key)
                out[did]["after"] += sz
                out[did]["kept"].append(txt)
        for did, o in out.items():
            o["before"] = nt[did]
            o["fp"] = hashlib.md5(" ".join(o["kept"]).encode()).hexdigest()
        return out

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        sorted(texts.items()), ["doc_id", "text"]
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r for r in doc_dup_span_removal(spark, sf_dir).collect()}
    want = py_ref()
    assert set(got) == set(want)
    for did, o in want.items():
        g = got[did]
        assert g["span_n_chunks"] == o["n"], did
        assert g["span_dup_removed"] == o["rm"], did
        assert g["span_tokens_before"] == o["before"], did
        assert g["span_tokens_after"] == o["after"], did
        assert g["span_clean_fp"] == o["fp"], did
