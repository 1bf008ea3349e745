"""Unit vectors for the round-8 training-data members: BPE adjacent-
pair counting (tokenizer-training step) and hard-negative mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from japanstockdatapipeline_spark.operators.topk import (
    brute_force_topk,
    hard_negative_topk_matmul,
)
from japanstockdatapipeline_spark.plans.llm import doc_bpe_pair_counts


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    return sf_dir


def test_bpe_pair_counts_hand_vector(spark, tmp_path):
    """'ab cd ab' pre-tokenizes to [ab, cd, ab] -> pairs (ab,cd),(cd,ab);
    punctuation splits into its own piece; counts sum across docs."""
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (1, "ab cd ab"),
            (2, "ab cd!"),
            (3, "x"),  # single piece: no pair
            (4, ""),  # no pieces at all
            (5, None),  # NULL text drops out entirely
        ],
    )
    got = {
        (r["left_piece"], r["right_piece"]): r["pair_count"]
        for r in doc_bpe_pair_counts(spark, sf_dir).collect()
    }
    assert got == {
        ("ab", "cd"): 2,  # docs 1 and 2
        ("cd", "ab"): 1,  # doc 1
        ("cd", "!"): 1,  # doc 2: punctuation is its own piece
    }


def test_bpe_pair_counts_deterministic_top_cut(spark, tmp_path):
    """The top-100 cut orders by (count desc, left, right) — ties at the
    boundary resolve by pair text, so repeated runs agree."""
    def word(prefix, i):
        return f"{prefix}{chr(97 + i // 26)}{chr(97 + i % 26)}"

    rows = [(i, f"{word('t', i)} {word('u', i)}") for i in range(150)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = doc_bpe_pair_counts(spark, sf_dir).collect()
    assert len(out) == 100
    assert all(r["pair_count"] == 1 for r in out)
    lefts = [r["left_piece"] for r in out]
    assert lefts == sorted(lefts)
    assert lefts[0] == word("t", 0) and lefts[-1] == word("t", 99)


def _vec_rows(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_hard_negatives_excludes_same_label_and_self(spark):
    """Neighbors share no label with the query; the top hit is the most
    cosine-similar different-label vector; NULL labels drop out."""
    emb = _vec_rows(
        spark,
        [
            (0, [1.0, 0.0], 1),
            (1, [0.99, 0.1], 1),  # most similar but SAME label -> excluded
            (2, [0.9, 0.2], 2),
            (3, [0.5, 0.8], 2),
            (4, [1.0, 0.01], None),  # NULL label: never a negative
        ],
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    got = hard_negative_topk_matmul(emb, q, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [2, 3]
    assert got[0]["rank"] == 1 and got[0]["cos"] > got[1]["cos"]


def test_hard_negatives_null_label_query_yields_no_rows(spark):
    emb = _vec_rows(spark, [(0, [1.0, 0.0], None), (1, [0.9, 0.1], 2)])
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    out = hard_negative_topk_matmul(emb, q, k=3)
    # q_id=0 has a NULL label (no rows — <> can't hold); q_id=1's only
    # different-label candidate is vec 0, which has a NULL label (dropped)
    assert out.count() == 0


def test_hard_negatives_matches_expression_path_with_label_filter(spark, sf_dir):
    """The masked-matmul fast path returns the same ranks as composing
    the pure-expression brute_force_topk with an explicit label join."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    fast = hard_negative_topk_matmul(emb, q, k=5)

    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    qlab = q.select("q_id", "q_label")
    slow = (
        brute_force_topk(emb, q.select("q_id", "q_vec"), k=emb.count(), exclude_self=False)
        .join(labels, "neighbor_id")
        .join(qlab, "q_id")
        .filter(F.col("label") != F.col("q_label"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    slow = (
        slow.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "neighbor_id", "rank")
    )
    a = {(r["q_id"], r["rank"]): r["neighbor_id"] for r in fast.collect()}
    b = {(r["q_id"], r["rank"]): r["neighbor_id"] for r in slow.collect()}
    assert a == b


def test_selection_curve_monotone_and_exact(spark, tmp_path):
    """Kept mass is monotone non-increasing in the threshold; the
    decision is exact integer arithmetic (a doc whose logit lands
    EXACTLY on a grid threshold is kept at that threshold)."""
    from japanstockdatapipeline_spark.plans.llm import doc_selection_curve

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "delta epsilon", "en"), (3, "  ", "en")],
        ["doc_id", "text", "lang"],
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(doc_selection_curve(spark, sf_dir).collect(), key=lambda r: r["thr_milli"])
    assert [r["thr_milli"] for r in rows] == list(range(-50, 51, 10))
    assert all(r["total_docs"] == 3 for r in rows)
    kept = [r["kept_docs"] for r in rows]
    assert kept == sorted(kept, reverse=True)
    toks = [r["kept_tokens"] for r in rows]
    assert toks == sorted(toks, reverse=True)
    # the whitespace-only doc is never kept at any threshold
    assert max(kept) <= 2


def test_hard_negatives_zero_norm_query_is_deterministic(spark):
    """A zero-norm query gets the same norm=1 guard as the corpus side:
    cosine 0.0 to every candidate (ranked by neighbor_id), never NaN
    rows that np.isfinite would silently drop (r8 ADVICE)."""
    emb = _vec_rows(
        spark,
        [(0, [0.0, 0.0], 1), (1, [0.9, 0.1], 2), (2, [0.1, 0.9], 2)],
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    got = hard_negative_topk_matmul(emb, q, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [1, 2]
    assert all(r["cos"] == 0.0 for r in got)


def test_hard_negatives_rejects_non_integral_labels(spark):
    """Labels are compared as int64 inside the BLAS batch — non-integral
    label columns fail loudly upfront, like the id columns."""
    import pytest

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], "a"), (1, [0.9, 0.1], "b")],
        ["vec_id", "embedding", "label"],
    )
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    with pytest.raises(ValueError, match="integral id/label"):
        hard_negative_topk_matmul(emb, q, k=1)


def test_brute_force_matmul_zero_norm_query(spark):
    """Same guard on the exact path: zero-norm query ranks all corpus
    vectors at cosine 0.0 deterministically by id."""
    from japanstockdatapipeline_spark.operators.topk import brute_force_topk_matmul

    emb = _vec_rows(
        spark, [(0, [0.0, 0.0], 1), (1, [0.9, 0.1], 2), (2, [0.1, 0.9], 2)]
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = brute_force_topk_matmul(emb, q, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [1, 2]
    assert all(r["cos"] == 0.0 for r in got)


def test_bpe_apply_hand_vector(spark, tmp_path):
    """Pins the merge-apply semantics end to end on a corpus where the
    learned table and its application are checkable by hand:
    'a a a a b' + 'ab cd ab cd' learn (a,a) rank1, (ab,cd) rank2,
    (a,b) rank3, (cd,ab) rank4; application is leftmost-greedy
    non-overlapping per rank ('a a a a' -> [aa, aa], 'a a a' would be
    [aa, a])."""
    from japanstockdatapipeline_spark.plans.llm import doc_bpe_apply

    sf_dir = _write_docs(
        spark,
        tmp_path,
        [(1, "a a a a b"), (2, "ab cd ab cd"), (3, "x"), (4, ""), (5, None)],
    )
    got = {r["doc_id"]: r for r in doc_bpe_apply(spark, sf_dir).collect()}
    assert got[1]["bpe_pieces_before"] == 5 and got[1]["bpe_pieces_after"] == 3
    assert got[2]["bpe_pieces_before"] == 4 and got[2]["bpe_pieces_after"] == 2
    assert got[3]["bpe_pieces_before"] == 1 and got[3]["bpe_pieces_after"] == 1
    # empty / NULL text: zero pieces in, zero out
    assert got[4]["bpe_pieces_after"] == 0 and got[5]["bpe_pieces_after"] == 0
    # same input text -> same fingerprint class: docs 4 and 5 encode
    # identically (empty stream)
    assert got[4]["bpe_fp"] == got[5]["bpe_fp"]


def test_bpe_apply_overlap_is_leftmost_greedy(spark, tmp_path):
    """'c c c' under merge (c,c) yields [cc, c] — the overlapping
    middle site must NOT merge (one pass, non-overlapping)."""
    from japanstockdatapipeline_spark.plans.llm import doc_bpe_apply

    sf_dir = _write_docs(spark, tmp_path, [(1, "c c c"), (2, "c c c c c")])
    got = {r["doc_id"]: r for r in doc_bpe_apply(spark, sf_dir).collect()}
    assert got[1]["bpe_pieces_after"] == 2  # [cc, c]
    assert got[2]["bpe_pieces_after"] == 3  # [cc, cc, c]


def _py_bpe_train(texts, k):
    """The shared pure-Python iterative reference (tests/helpers_bpe),
    merge table only."""
    from helpers_bpe import py_bpe_train

    return py_bpe_train(texts, k)[0]


def test_bpe_train_is_iterative_not_one_shot(spark, tmp_path):
    """Three copies of 'a b c': rank 1 resolves the (a,b)/(b,c) count
    tie lexicographically to (a,b); rank 2 must then be (ab,c) — a pair
    that does NOT exist in the initial counts, so a one-shot learner
    (doc_bpe_apply's table) could never produce it. After rank 2 every
    doc is one piece: no pairs remain, so the table stops at 2 rows
    even though BPE_TRAIN_ROUNDS is larger."""
    from japanstockdatapipeline_spark.plans.llm import doc_bpe_train

    sf_dir = _write_docs(spark, tmp_path, [(i, "a b c") for i in range(3)])
    rows = [tuple(r) for r in doc_bpe_train(spark, sf_dir).collect()]
    assert rows == [(1, "a", "b", 3), (2, "ab", "c", 3)]


def test_bpe_train_matches_python_reference(spark, tmp_path):
    """Full-table equality vs the pure-Python iterative reference on a
    small-vocab corpus crafted to chain merges across rounds (merged
    pieces re-pair with their neighbors) and to exercise count ties."""
    from japanstockdatapipeline_spark.plans.llm import (
        BPE_TRAIN_ROUNDS,
        doc_bpe_train,
    )

    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and a rat sat",
        "on and on and on",
        "rat cat mat rat cat",
        "the the the cat cat",
        "sat on a mat, sat on a rat!",
        "",
        None,
        "x",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in doc_bpe_train(spark, sf_dir).collect()]
    want = _py_bpe_train(texts, BPE_TRAIN_ROUNDS)
    assert got == want
    assert len(got) == BPE_TRAIN_ROUNDS  # this corpus never runs dry


def test_minhash_max_bucket_noop_when_large(spark):
    """max_bucket far above any occupancy must be pair-for-pair
    identical to the uncapped form (est_jaccard included)."""
    from japanstockdatapipeline_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, f"alpha beta gamma delta{i % 3} epsilon zeta{i % 2} eta") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = sorted(map(tuple, minhash_lsh_pairs(df, n_hashes=8, bands=4).collect()))
    capped = sorted(
        map(
            tuple,
            minhash_lsh_pairs(df, n_hashes=8, bands=4, max_bucket=10_000).collect(),
        )
    )
    assert base == capped


def test_minhash_max_bucket_star_bounds_hot_bucket_keeps_components(spark):
    """r12 verdict #6: a mega-bucket (here 40 identical docs — every
    band collides) must emit O(occ) star pairs instead of occ^2, and
    connected components over the capped pairs must equal the
    uncapped components (the star keeps each hot bucket connected)."""
    from japanstockdatapipeline_spark.operators.dedup import (
        dup_clusters,
        minhash_lsh_pairs,
    )

    hot = [(i, "the exact same boilerplate footer text every time") for i in range(40)]
    cold = [(100 + i, f"unique{i} filler{i} content{i} tokens{i} here{i}") for i in range(10)]
    df = spark.createDataFrame(hot + cold, "doc_id long, text string")

    uncapped = minhash_lsh_pairs(df, n_hashes=8, bands=4).select("id_a", "id_b")
    capped = minhash_lsh_pairs(
        df, n_hashes=8, bands=4, max_bucket=8
    ).select("id_a", "id_b")
    n_unc, n_cap = uncapped.count(), capped.count()
    assert n_unc == 40 * 39 // 2  # the quadratic the cap exists to stop
    assert n_cap == 39  # star: hub (min id 0) x 39 members
    # identical components: all 40 hot docs in ONE cluster either way
    cu = {
        (r["id"], r["cluster"]) for r in dup_clusters(uncapped).collect()
    }
    cc = {(r["id"], r["cluster"]) for r in dup_clusters(capped).collect()}
    assert cu == cc


def test_lsh_verified_pairs_capped_still_exact_on_survivors(spark):
    """Verified pairs under a cap are a SUBSET of the uncapped verified
    set with identical Jaccard values on the shared pairs (the verify
    stage computes TRUE Jaccard either way)."""
    from japanstockdatapipeline_spark.operators.dedup import lsh_verified_pairs

    hot = [(i, "the exact same boilerplate footer text every time") for i in range(20)]
    cold = [(100 + i, f"unique{i} filler{i} content{i} tokens{i} here{i}") for i in range(5)]
    df = spark.createDataFrame(hot + cold, "doc_id long, text string")
    unc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_verified_pairs(df, threshold=0.5, n_hashes=8, bands=4).collect()
    }
    cap = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_verified_pairs(
            df, threshold=0.5, n_hashes=8, bands=4, max_bucket=6
        ).collect()
    }
    assert set(cap) <= set(unc)
    assert all(unc[p] == j for p, j in cap.items())
