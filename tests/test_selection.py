"""Unit vectors for the model-based selection members added in round 7:
the hashed-feature quality classifier and DSIR importance weights."""

from __future__ import annotations

import hashlib
import math

from japanstockdatapipeline_spark.plans.llm import (
    _CLF_BIAS,
    _CLF_D,
    _CLF_W,
    _DSIR_D,
    doc_dsir_weight,
    doc_quality_classifier,
)


def _bucket(tok: str, salt: str, d: int) -> int:
    """Mirror of the portable md5 bucket (plans/llm._hash_bucket)."""
    return int(hashlib.md5((salt + tok).encode()).hexdigest()[:15], 16) % d


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    return sf_dir


def test_classifier_exact_score_and_mean_pooling(spark, tmp_path):
    """A single-token doc scores exactly bias + w[bucket]; repeating a
    doc's tokens leaves the mean-pooled logit unchanged; keep == logit
    >= 0; whitespace-only text yields NULLs."""
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (1, "alpha", "en"),
            (2, "alpha beta", "en"),
            (3, "alpha beta alpha beta alpha beta", "en"),
            (4, "   ", "en"),
        ],
    )
    got = {r["doc_id"]: r for r in doc_quality_classifier(spark, sf_dir).collect()}

    w_alpha = _CLF_W[_bucket("alpha", "qb:", _CLF_D)]
    assert got[1]["clf_logit"] == round(_CLF_BIAS + w_alpha, 6)
    # mean pooling: token proportions, not counts, set the score
    assert got[2]["clf_logit"] == got[3]["clf_logit"]
    for doc_id in (1, 2, 3):
        r = got[doc_id]
        assert r["clf_keep"] == (r["clf_logit"] >= 0)
        assert abs(r["clf_prob"] - 1.0 / (1.0 + math.exp(-r["clf_logit"]))) < 1e-5
        assert 0.0 < r["clf_prob"] < 1.0
    assert got[4]["clf_logit"] is None
    assert got[4]["clf_prob"] is None
    assert got[4]["clf_keep"] is None


def test_dsir_exact_llr_and_target_preference(spark, tmp_path):
    """Hand-computed log-likelihood ratios on a 3-doc corpus: the
    target-token doc outranks the raw-token doc, the mixed doc sits
    between, and the 70th-percentile selection keeps a top set whose
    minimum clears every unselected score."""
    # target domain (en) speaks 'tgt'; the raw remainder speaks 'raw'
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (1, "tgt tgt tgt tgt", "en"),
            (2, "raw raw raw raw", "de"),
            (3, "tgt raw", "fr"),
        ],
    )
    got = {r["doc_id"]: r for r in doc_dsir_weight(spark, sf_dir).collect()}

    b_tgt, b_raw = _bucket("tgt", "dsir:", _DSIR_D), _bucket("raw", "dsir:", _DSIR_D)
    assert b_tgt != b_raw, "pick different test tokens: bucket collision"
    # bucket counts: 'tgt' 5 raw / 4 target, 'raw' 5 raw / 0 target;
    # totals 10 raw, 4 target; add-one smoothing over D buckets
    def llr(n_tgt, n_raw):
        return math.log((n_tgt + 1) / (4 + _DSIR_D)) - math.log(
            (n_raw + 1) / (10 + _DSIR_D)
        )

    llr_tgt, llr_raw = llr(4, 5), llr(0, 5)
    assert got[1]["dsir_logw"] == round(llr_tgt, 6)
    assert got[2]["dsir_logw"] == round(llr_raw, 6)
    assert got[3]["dsir_logw"] == round((llr_tgt + llr_raw) / 2, 6)
    assert got[1]["dsir_logw"] > got[3]["dsir_logw"] > got[2]["dsir_logw"]

    selected = [r for r in got.values() if r["dsir_selected"]]
    unselected = [r for r in got.values() if not r["dsir_selected"]]
    assert selected and unselected
    assert min(r["dsir_logw"] for r in selected) >= max(
        r["dsir_logw"] for r in unselected
    )


def test_dsir_selection_rate_on_corpus(spark, sf_dir):
    """On the real documents table the 70th-percentile cut keeps about
    30% of docs (exact fraction depends on ties at the cut)."""
    rows = doc_dsir_weight(spark, sf_dir).collect()
    frac = sum(1 for r in rows if r["dsir_selected"]) / len(rows)
    assert 0.25 <= frac <= 0.35


def test_winnowed_spans_alignment_robust(spark, tmp_path):
    """The winnowing guarantee: a shared run of >= k+W-1 (=15) tokens
    is caught at ANY offset — including offsets that break fixed-chunk
    alignment; unique docs share nothing; short docs (< 15 tokens)
    yield zero fingerprints."""
    from japanstockdatapipeline_spark.plans.llm import doc_winnowed_spans

    run = " ".join(f"r{i}" for i in range(15))  # exactly the guarantee bound
    rows = [
        (1, "a1 a2 a3 " + run + " a4 a5", "en"),            # run at offset 3
        (2, "b1 b2 b3 b4 b5 b6 b7 " + run + " b8", "en"),   # same run at offset 7
        (3, " ".join(f"u{i}" for i in range(30)), "en"),     # fully unique
        (4, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10", "en"),        # 10 < 15 tokens
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in doc_winnowed_spans(spark, sf_dir).collect()}

    # offsets 3 vs 7 differ mod 4 AND mod 8: any fixed-stride scheme
    # with stride > 1 can miss this pair; winnowing must not
    assert got[1]["wn_shared"] >= 1
    assert got[2]["wn_shared"] >= 1
    assert got[3]["wn_shared"] == 0 and got[3]["wn_fingerprints"] > 0
    assert got[4]["wn_fingerprints"] == 0
    assert got[4]["wn_shared_frac"] is None and got[4]["wn_dup_flag"] is None
    for doc_id in (1, 2, 3):
        r = got[doc_id]
        assert r["wn_dup_flag"] == (r["wn_shared"] * 2 >= r["wn_fingerprints"])


def test_winnowing_guarantee_sweep(spark, tmp_path):
    """Property sweep of the winnowing theorem: for 40 seeded random
    (run_len >= 15, offset_a, offset_b) cases — each a pair of docs
    sharing one run inside otherwise-unique text — BOTH docs of every
    pair carry at least one shared fingerprint. One Spark pass covers
    all cases (disjoint token namespaces keep pairs independent)."""
    import random

    from japanstockdatapipeline_spark.plans.llm import doc_winnowed_spans

    rng = random.Random(20260814)
    rows, expect_pairs = [], []
    doc_id = 0
    for case in range(40):
        run_len = rng.randint(15, 30)
        off_a, off_b = rng.randint(0, 9), rng.randint(0, 9)
        run = [f"c{case}r{i}" for i in range(run_len)]
        pad_a = [f"c{case}a{i}" for i in range(off_a + 16)]
        pad_b = [f"c{case}b{i}" for i in range(off_b + 16)]
        text_a = " ".join(pad_a[:off_a] + run + pad_a[off_a:])
        text_b = " ".join(pad_b[:off_b] + run + pad_b[off_b:])
        rows.append((doc_id, text_a, "en"))
        rows.append((doc_id + 1, text_b, "en"))
        expect_pairs.append((doc_id, doc_id + 1))
        doc_id += 2
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in doc_winnowed_spans(spark, sf_dir).collect()}
    misses = [
        (a, b)
        for a, b in expect_pairs
        if got[a]["wn_shared"] < 1 or got[b]["wn_shared"] < 1
    ]
    assert not misses, f"winnowing guarantee violated for pairs {misses}"


def test_classifier_exact_rounding_at_half_boundary(spark, tmp_path):
    """Regression for the sf0.1 oracle flips (round-7 verdict): a doc
    whose exact logit lands EXACTLY on a round(x, 6) half-way boundary
    (the doc-1693 class: logit*1e6 has fraction .5 — possible because
    logits are rationals with denominator 1000*n_tok). The emitted
    clf_logit must be the exact HALF-UP rounding computed in integer
    arithmetic, not whatever the engine's float round does to a double
    1 ulp off the boundary."""
    from fractions import Fraction

    # 32 tokens: 31 copies of A + 1 B, searched so that
    # (wsum - 50*32) % 4 == 2  =>  logit*1e6 fraction is exactly .5
    words = [f"bw{i}" for i in range(400)]
    wint = {w: (1103515245 * _bucket(w, "qb:", _CLF_D) + 12345) % 2001 - 1000 for w in words}
    pick = None
    for a in words:
        for b in words:
            wsum = 31 * wint[a] + wint[b]
            if (wsum - 1600) % 4 == 2 and wsum != 1600:
                pick = (a, b, wsum)
                break
        if pick:
            break
    assert pick, "no boundary-hitting token pair found"
    a, b, wsum = pick
    exact = Fraction(wsum - 1600, 32000)
    assert (exact * 10**6) % 1 == Fraction(1, 2)  # exactly on the boundary
    # exact HALF-UP (away from zero) at 6dp
    num, den = (exact * 10**6).numerator, (exact * 10**6).denominator
    q = (2 * abs(num) + den) // (2 * den) * (1 if num >= 0 else -1)
    expected = q / 1e6

    sf_dir = _write_docs(spark, tmp_path, [(1, " ".join([a] * 31 + [b]), "en")])
    row = doc_quality_classifier(spark, sf_dir).collect()[0]
    assert row["clf_logit"] == expected
    assert row["clf_keep"] == (expected >= 0)


def _ps_key(doc_id: int, weight: int) -> float:
    """Mirror of doc_priority_sample's sort key: u ~ 52-bit md5, key =
    (h+1)/w via one IEEE division (exact in both engines)."""
    h = int(hashlib.md5(f"ps:{doc_id}".encode()).hexdigest()[:13], 16)
    return (h + 1) / weight


def test_priority_sample_small_corpus_takes_everything(spark, tmp_path):
    """With <= K eligible docs the whole corpus is the sample, ranks
    follow the key order, and the estimator is exactly the weight
    (no threshold exists). Zero-token and NULL docs are ineligible."""
    from japanstockdatapipeline_spark.plans.llm import doc_priority_sample

    rows = [(i, " ".join(["w"] * (i + 1)), "en") for i in range(10)]
    rows += [(100, "", "en"), (101, None, "en")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = doc_priority_sample(spark, sf_dir).orderBy("sample_rank").collect()
    assert len(got) == 10
    assert [r["sample_rank"] for r in got] == list(range(1, 11))
    for r in got:
        assert r["est_weight"] == float(r["weight"])
    keys = [_ps_key(r["doc_id"], r["weight"]) for r in got]
    assert keys == sorted(keys)


def test_priority_sample_matches_python_reference(spark, tmp_path):
    """On a 200-doc corpus the sample must be EXACTLY the K smallest
    (h+1)/w keys (doc_id tie-break), in key order; the subset-sum
    estimator is max(weight, tau) with tau = the (K+1)-th priority —
    always >= the raw weight and equal for items heavier than tau."""
    from japanstockdatapipeline_spark.plans.llm import (
        PRIORITY_SAMPLE_K,
        doc_priority_sample,
    )

    rows = [(i, " ".join(["t"] * (1 + (i * 7) % 40)), "en") for i in range(200)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = doc_priority_sample(spark, sf_dir).orderBy("sample_rank").collect()
    assert len(got) == PRIORITY_SAMPLE_K

    weights = {i: 1 + (i * 7) % 40 for i in range(200)}
    ordered = sorted(weights, key=lambda i: (_ps_key(i, weights[i]), i))
    want_ids = ordered[:PRIORITY_SAMPLE_K]
    assert [r["doc_id"] for r in got] == want_ids

    # tau = the (K+1)-th priority w/u = w * 2^52 / (h+1)
    t = ordered[PRIORITY_SAMPLE_K]
    h_t = int(hashlib.md5(f"ps:{t}".encode()).hexdigest()[:13], 16)
    tau = weights[t] * 4503599627370496 / (h_t + 1)
    for r in got:
        assert r["est_weight"] >= float(r["weight"])
        if r["weight"] > tau:
            assert r["est_weight"] == float(r["weight"])
        else:
            # rails-rounded tau: within a half-ulp of 6dp
            assert abs(r["est_weight"] - tau) < 1e-6
