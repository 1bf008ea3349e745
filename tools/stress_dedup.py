"""Dedup-family stress at 10x the largest local testdata.

Builds a 50k-document corpus in /tmp by replicating sf0.1 documents
K=10 times: replica 0 is verbatim (so exact dedup has real work),
replicas i>0 drop the first 2*i tokens (so the copies are *near*
dups with decreasing Jaccard — the realistic crawl-dup shape).
Then times the operators that SCALE.md claims survive scale-up:

  exact_dedup, ngram_jaccard_pairs (max_df capped AND exact),
  minhash_lsh_pairs, simhash, dup_clusters

and prints one JSON line per measurement. Run manually:

    python tools/stress_dedup.py [K] [sf_dir]

Results are recorded in SCALE.md ("Measured" section); this is a
tool, not a test — it takes minutes.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from tools.calibration import calibrate as _calibrate  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from japanstockdatapipeline_spark.operators.dedup import (  # noqa: E402
    dup_clusters,
    exact_dedup,
    lsh_verified_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from japanstockdatapipeline_spark.session import get_spark  # noqa: E402

OUT = "/tmp/stress_documents.parquet"


def build(spark, sf_dir: str, k: int) -> None:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = []
    for i in range(k):
        r = d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                else F.array_join(
                    F.slice(
                        F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""),
                        2 * i + 1,
                        1_000_000,
                    ),
                    " ",
                )
            ).alias("text"),
            "lang",
            "source",
        )
        reps.append(r)
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u = u.withColumn("n_chars", F.length("text"))
    u.write.mode("overwrite").parquet(OUT)


def build_hot_span_corpus(spark, *, n_docs: int, hot_frac: float):
    """Synthesize a corpus where one DUP_SPAN_CHUNK-token chunk is the
    FIRST chunk of `hot_frac` of the docs (chunk-aligned, so the fixed
    windows all fingerprint it identically) followed by unique filler
    tokens — the maximally skewed fingerprint distribution."""
    from japanstockdatapipeline_spark.plans.llm import DUP_SPAN_CHUNK

    hot_chunk = " ".join(f"boiler{j}" for j in range(DUP_SPAN_CHUNK))
    # percent-bucket selection: `id % round(1/frac) == 0` (the r10
    # review finding) degenerates to 100% for any frac > 2/3 —
    # `id % 100 < frac*100` holds the requested fraction across the
    # whole dial (2-decimal granularity)
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(
                (F.col("id") % 100) < F.lit(int(round(hot_frac * 100))),
                F.lit(hot_chunk + " "),
            ).otherwise(F.lit("")),
            # 16 unique filler tokens per doc
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{j}_"), F.col("id").cast("string"))
                    for j in range(16)
                ],
            ),
        ).alias("text"),
    )
    return base


def _dup_span_removal_window_form(d):
    """The PRE-r10 keep-first idiom (row_number over the fingerprint)
    kept here solely as the stress comparison baseline — the shipped
    plans/llm.dup_span_removal resolves keep-first with a partial-
    aggregatable min(struct) instead. Output-identical; only the
    physical shape under a hot key differs."""
    from pyspark.sql.window import Window

    from japanstockdatapipeline_spark.plans.llm import DUP_SPAN_CHUNK

    C = DUP_SPAN_CHUNK
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = d.select("doc_id", toks.alias("__toks"))
    nch = F.floor((F.size("__toks") + F.lit(C - 1)) / F.lit(C)).cast("int")
    idxs = F.when(nch > 0, F.sequence(F.lit(0), nch - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunk_structs = F.transform(
        idxs,
        lambda i: F.struct(
            i.cast("bigint").alias("idx"),
            F.array_join(F.slice("__toks", i * C + 1, C), " ").alias("txt"),
            F.size(F.slice("__toks", i * C + 1, C)).cast("bigint").alias("sz"),
        ),
    )
    ch = base.select("doc_id", F.explode(chunk_structs).alias("c")).select(
        "doc_id", F.col("c.idx").alias("idx"), F.col("c.txt").alias("txt"),
        F.col("c.sz").alias("sz"),
    )
    fp = F.when(F.col("sz") == C, F.md5(F.col("txt"))).otherwise(
        F.concat(
            F.lit("p:"), F.col("doc_id").cast("string"),
            F.lit(":"), F.col("idx").cast("string"),
        )
    )
    st = ch.withColumn("__fp", fp).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__fp").orderBy("doc_id", "idx")),
    )
    agg = st.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("span_n_chunks"),
        F.sum(F.when(F.col("__rn") > 1, 1).otherwise(0))
        .cast("bigint").alias("span_dup_removed"),
        F.sum(F.when(F.col("__rn") == 1, F.col("sz")).otherwise(0))
        .cast("bigint").alias("span_tokens_after"),
    )
    return base.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("span_dup_removed", F.lit(0).cast("bigint")).alias(
            "span_dup_removed"
        ),
    )


def timed(name: str, fn, extra=None) -> object:
    t0 = time.time()
    try:
        n = fn()
        rec = {"op": name, "rows": n, "sec": round(time.time() - t0, 2)}
        rec.update(extra or {})
        print(json.dumps(rec))
        return n
    except Exception as e:  # keep going; a stress failure is a finding
        print(json.dumps({"op": name, "error": str(e)[:200], "sec": round(time.time() - t0, 2)}))
        return None


def calibrate(spark) -> None:
    """THE shared fixed-cost row (tools/calibration.py, same as
    bench.py) — separates rig drift from operator regressions round
    over round (the round-6 stress walls moved without one,
    unadjudicable)."""
    print(json.dumps({"op": "calibration", "sec": _calibrate(spark)}))


def build_boiler_corpus(
    spark, *, n_docs: int, boiler_frac: float = 0.3, twins: bool = False
):
    """r11 verdict #6: the corpus the max_df cap exists for — one
    shared boilerplate snippet (a footer/disclaimer) in `boiler_frac`
    of the docs, unique filler otherwise. Its k=3 shingles have
    df = boiler_frac * n, so the UNCAPPED posting-list join emits
    ~grams * (frac*n)^2 candidate pairs (superlinear in n), while the
    cap drops those grams from the join keys entirely. Boiler-only
    overlap is J ~ 0.25 < the 0.5 threshold, so BOTH forms return the
    same (empty) verified set — identical answers, divergent cost.

    `twins=True` (r13, r12-verdict #6): docs with id%100 == 31 become
    near-twins of doc id-1 (same 12 filler tokens + one extra, shingle
    J = 10/11 ~ 0.91 >= the 0.5 threshold), so the verified-pair set
    is NON-EMPTY (1 true pair per 100 docs) and the capped-vs-uncapped
    equivalence row compares real answer sets, not 0 == 0. The twins
    are non-boiler docs, so their band buckets are cold 2-doc buckets
    the max_bucket star reduction never touches."""
    snippet = " ".join(f"footer{j}" for j in range(10))

    def filler(idcol):
        return F.concat_ws(
            " ",
            *[F.concat(F.lit(f"v{j}_"), idcol.cast("string")) for j in range(12)],
        )

    body = filler(F.col("id"))
    if twins:
        body = F.when(
            F.col("id") % 100 == 31,
            F.concat(filler(F.col("id") - 1), F.lit(" twinx")),
        ).otherwise(body)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(
                (F.col("id") % 100) < F.lit(int(round(boiler_frac * 100))),
                F.lit(snippet + " "),
            ).otherwise(F.lit("")),
            body,
        ).alias("text"),
    )


def _focus_maxdf(spark) -> None:
    """Capped-vs-uncapped crossover sweep on the boilerplate corpus
    (the r10 blemish: at 150k replica docs the cap COST 9% with no
    measured upside — this corpus is the upside). The uncapped form's
    per-shingle pair generation materializes a df^2 struct array in
    ONE expression row (~32 B/struct), so the blowup is not a slow
    tail — at df = 6,000 (20k docs, 30% boiler) the ~18M-struct rows
    KILL the rig's 8g JVM outright (first measured in the r11 suite:
    executor lost ~42 s in, session dead). The sweep therefore prices
    the uncapped curve at survivable df (4k/6k/8k docs -> 1.2k/1.8k/
    2.4k df) and probes the lethal 20k point in a SUBPROCESS with its
    own session, so the outcome is recorded without poisoning the
    suite's JVM."""
    # capped: flat in n — the cap's cost side of the trade
    for n in (20_000, 150_000, 400_000):
        d = build_boiler_corpus(spark, n_docs=n).persist()
        d.count()
        timed(
            f"ngram_jaccard_maxdf_boiler_{n // 1000}k",
            lambda dd=d: ngram_jaccard_pairs(
                dd, threshold=0.5, k=3, max_df=256
            ).count(),
            extra={"n_docs": n, "boiler_frac": 0.3, "max_df": 256},
        )
        d.unpersist()
    # uncapped: superlinear in n (8 hot 3-grams at df = 0.3n; pair
    # volume ~ 8 * df^2 / 2)
    for n in (4_000, 6_000, 8_000):
        d = build_boiler_corpus(spark, n_docs=n).persist()
        d.count()
        timed(
            f"ngram_jaccard_uncapped_boiler_{n // 1000}k",
            lambda dd=d: ngram_jaccard_pairs(
                dd, threshold=0.5, k=3, max_df=None
            ).count(),
            extra={"n_docs": n, "boiler_frac": 0.3, "df_hot": int(0.3 * n)},
        )
        d.unpersist()
    # the CLIFF probe, contained: uncapped at 20k docs in a subprocess
    import subprocess

    t0 = time.time()
    code = (
        "import sys; sys.path.insert(0, '.')\n"
        "from japanstockdatapipeline_spark.session import get_spark\n"
        "from japanstockdatapipeline_spark.operators.dedup import ngram_jaccard_pairs\n"
        "from tools.stress_dedup import build_boiler_corpus\n"
        "s = get_spark('maxdf-cliff')\n"
        "d = build_boiler_corpus(s, n_docs=20_000)\n"
        "print('CLIFF_ROWS', ngram_jaccard_pairs(d, threshold=0.5, k=3, max_df=None).count())\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, check=False, timeout=1200,
        )
        out = proc.stdout
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        out, rc = "", -1
    wall = round(time.time() - t0, 2)
    if rc == 0 and "CLIFF_ROWS" in out:
        rows = int(out.split("CLIFF_ROWS")[-1].split()[0])
        print(json.dumps({
            "op": "ngram_jaccard_uncapped_boiler_20k",
            "sec": wall, "rows": rows, "n_docs": 20_000, "df_hot": 6_000,
        }))
    else:
        print(json.dumps({
            "op": "ngram_jaccard_uncapped_boiler_20k",
            "sec": wall, "n_docs": 20_000, "df_hot": 6_000,
            "outcome": "jvm_lost",
            "note": "df=6000 posting lists -> ~18M-struct pair arrays "
            "in single expression rows; the executor JVM dies at the "
            "rig's 8g heap (subprocess-contained by design) — the "
            "cliff max_df=256 exists to cap",
        }))


def _band_occupancy(docs, n_hashes: int, bands: int, k: int = 3):
    """Band-bucket occupancy profile for the minhash banding — the
    direct evidence of the hot-bucket skew the max_bucket cap bounds
    (same banding expression as minhash_lsh_pairs)."""
    from japanstockdatapipeline_spark.operators.dedup import minhash_signature

    rpb = n_hashes // bands
    sig = minhash_signature(docs, n_hashes, k)
    banded = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", bi * rpb + j + 1).cast("string")
                                for j in range(rpb)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb")
    ).select("bb.band", "bb.bucket")
    occ = banded.groupBy("band", "bucket").count().persist()
    top = [int(r["count"]) for r in occ.orderBy(F.col("count").desc()).limit(5).collect()]
    over = {
        str(t): occ.filter(F.col("count") > t).count()
        for t in (256, 1024, 16384, 262144)
    }
    nb = occ.count()
    occ.unpersist()
    return top, over, nb


def _focus_lshadv(spark) -> None:
    """r12 verdict #6: adversarial LSH/cluster stress on the
    30%-boilerplate corpus — the SHAPE that broke the uncapped Jaccard
    join. dedup10x's replica corpus truncates replicas toward empty,
    so its LSH walls ride a gentler pair curve than a real
    boilerplate-heavy crawl: here one shared footer dominates the
    shingle minima, so per band a single bucket collects
    O(boiler_frac * n * p^2) docs and the bucket self-join emits occ^2
    pairs — superlinear in n with no cap. Measures (1) the uncapped
    pair-volume curve at survivable sizes (the n^2 slope), (2) the
    bucket-occupancy histogram at 1.5M docs under the production 32/16
    banding, (3) the max_bucket-capped wall flat to 1.5M with
    clustering over the star-reduced pairs, and (4) capped-vs-uncapped
    VERIFIED-set equivalence at 50k (boiler-only overlap is J ~ 0.25 <
    the 0.5 threshold, so the verified answers agree while the costs
    diverge — the max_df argument, replayed for band buckets)."""
    CAP = 1024
    # uncapped: the superlinear curve. Measured anchor: 5k docs emit
    # ~1.0M candidate pairs (the mega bucket captures ~75% of the
    # boiler docs per band), so volume ~ 40n^2 — 50k is ~100M pairs
    # and 100k would be ~400M (tens of minutes); the curve stops at
    # the survivable sizes, like the maxdf sweep
    for n in (10_000, 25_000, 50_000):
        d = build_boiler_corpus(spark, n_docs=n).persist()
        d.count()
        timed(
            f"lsh_pairs_uncapped_boiler_{n // 1000}k",
            lambda dd=d: minhash_lsh_pairs(dd, n_hashes=32, bands=16).count(),
            extra={"n_docs": n, "boiler_frac": 0.3},
        )
        d.unpersist()
    # answer equivalence at 50k: capped and uncapped verified SETS on
    # the twin-dialed corpus (r13, r12-verdict #6 — the r12 row
    # compared 0 rows against 0 rows because the boiler-only overlap
    # sits below the threshold; the twins put 1 true pair per 100 docs
    # ABOVE it, so this row now asserts identical non-empty answers)
    d = build_boiler_corpus(spark, n_docs=50_000, twins=True).persist()
    d.count()
    unc_pairs: set = set()
    cap_pairs: set = set()

    def collect_pairs(into: set, **kw) -> int:
        rows = (
            lsh_verified_pairs(d, threshold=0.5, n_hashes=32, bands=16, **kw)
            .select("id_a", "id_b")
            .collect()
        )
        into.update((r["id_a"], r["id_b"]) for r in rows)
        return len(rows)

    unc = timed(
        "lsh_verified_uncapped_boiler_50k",
        lambda: collect_pairs(unc_pairs),
        extra={"n_docs": 50_000, "twins": True},
    )
    cap = timed(
        "lsh_verified_capped_boiler_50k",
        lambda: collect_pairs(cap_pairs, max_bucket=CAP),
        extra={"n_docs": 50_000, "max_bucket": CAP, "twins": True},
    )
    print(json.dumps({
        "op": "lsh_verified_cap_equivalence_50k",
        "uncapped_rows": unc, "capped_rows": cap,
        "equal": unc == cap,
        "equal_sets": unc_pairs == cap_pairs,
        "nonvacuous": unc > 0,
    }))
    d.unpersist()
    # capped: flat to 1.5M — occupancy histogram, verified pairs, and
    # connected components over the star-reduced candidates (one
    # ~450k-doc boilerplate component exercises pointer doubling on a
    # giant star)
    for n in (400_000, 1_500_000):
        d = build_boiler_corpus(spark, n_docs=n).persist()
        d.count()
        if n == 1_500_000:
            t0 = time.time()
            top, over, nb = _band_occupancy(d, 32, 16)
            print(json.dumps({
                "op": "lsh_bucket_occupancy_1500k",
                "sec": round(time.time() - t0, 2),
                "n_buckets": nb, "top5_occupancy": top,
                "buckets_over": over, "n_docs": n,
            }))
        timed(
            f"lsh_verified_capped_boiler_{n // 1000}k",
            lambda dd=d: lsh_verified_pairs(
                dd, threshold=0.5, n_hashes=32, bands=16, max_bucket=CAP
            ).count(),
            extra={"n_docs": n, "max_bucket": CAP},
        )
        if n == 1_500_000:
            timed(
                "dup_clusters_capped_boiler_1500k",
                lambda dd=d: dup_clusters(
                    minhash_lsh_pairs(
                        dd, n_hashes=32, bands=16, max_bucket=CAP
                    ).select("id_a", "id_b")
                ).count(),
                extra={"n_docs": n, "max_bucket": CAP},
            )
        d.unpersist()


def _focus_dedup10x(spark, sf_dir: str, k: int) -> None:
    """r11 verdict #7: the dedup extrapolations validated an order of
    magnitude up (~10x the K=30 suite): exact dedup, the production
    LSH-verified 32/16 dial, clusters, and the hot-key dup-span form
    at 1.5M docs."""
    t0 = time.time()
    build(spark, sf_dir, k)
    d = spark.read.parquet(OUT)
    n_docs = d.count()
    print(json.dumps({"op": "build", "rows": n_docs, "k": k, "sec": round(time.time() - t0, 2)}))
    calibrate(spark)
    timed("exact_dedup", lambda: exact_dedup(d).count(), extra={"n_docs": n_docs})
    timed(
        "lsh_verified_pairs_32x16",
        lambda: lsh_verified_pairs(d, threshold=0.5, n_hashes=32, bands=16).count(),
        extra={"n_hashes": 32, "bands": 16, "n_docs": n_docs},
    )
    timed(
        "dup_clusters_on_lsh",
        lambda: dup_clusters(
            minhash_lsh_pairs(d, n_hashes=16, bands=4)
            .where(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b")
        ).count(),
        extra={"n_docs": n_docs},
    )
    from japanstockdatapipeline_spark.plans.llm import dup_span_removal

    hot = build_hot_span_corpus(spark, n_docs=1_500_000, hot_frac=0.9)
    timed(
        "dup_span_removal_hotkey_1500k",
        lambda: dup_span_removal(hot).where(F.col("span_dup_removed") > 0).count(),
        extra={"n_docs": 1_500_000, "hot_frac": 0.9},
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-dedup")
    if "--focus-maxdf" in sys.argv:
        print(json.dumps({"op": "calibration", "sec": _calibrate(spark)}))
        _focus_maxdf(spark)
        return
    if "--focus-dedup10x" in sys.argv:
        _focus_dedup10x(spark, sf_dir, k)
        return
    if "--focus-lshadv" in sys.argv:
        print(json.dumps({"op": "calibration", "sec": _calibrate(spark)}))
        _focus_lshadv(spark)
        return
    t0 = time.time()
    build(spark, sf_dir, k)
    d = spark.read.parquet(OUT)
    n_docs = d.count()
    print(json.dumps({"op": "build", "rows": n_docs, "k": k, "sec": round(time.time() - t0, 2)}))
    calibrate(spark)

    timed("exact_dedup", lambda: exact_dedup(d).count())
    timed("simhash", lambda: simhash(d).count())
    # alignment-robust repeated-span signal (round-7): the replica
    # corpus is its worst case by construction — every replica shares
    # almost every span with its siblings, so the posting lists are
    # maximally hot. Count flagged docs, not pairs.
    from japanstockdatapipeline_spark.plans.llm import winnowed_spans

    timed(
        "winnowed_spans",
        lambda: winnowed_spans(d).where(F.col("wn_dup_flag")).count(),
    )
    # the eager production BPE trainer (round 9): K=16 merge rounds on
    # the full replica corpus — prices the per-round scan + Heaps-
    # bounded pair shuffle SCALE.md claims. checkpoint_every=5 fires
    # rotations at ranks 5/10/15 (the condition is rank % ce == 0 AND
    # rank < k), so the delete-older-generation path runs twice at
    # stress scale, not just the first write
    import shutil

    from japanstockdatapipeline_spark.operators.bpe import bpe_train

    timed(
        "bpe_train_k16",
        lambda: len(
            bpe_train(d, 16, checkpoint_every=5, checkpoint_dir="/tmp/stress_bpe_ck")
        ),
        extra={"k_merges": 16, "checkpoint_rotations": 3},
    )
    shutil.rmtree("/tmp/stress_bpe_ck", ignore_errors=True)

    # duplicated-span REMOVAL (round 9): fixed 8-token windows. The
    # replica corpus exercises both sides of its alignment trade-off:
    # replicas shifted by a multiple of 8 re-align (real removals),
    # other shifts escape the fixed windows (winnowed_spans is the
    # alignment-robust detector). Count docs that lost a span.
    from japanstockdatapipeline_spark.plans.llm import dup_span_removal

    timed(
        "dup_span_removal",
        lambda: dup_span_removal(d).where(F.col("span_dup_removed") > 0).count(),
    )
    # ADVERSARIAL hot-fingerprint corpus (r9 verdict #1): one 8-token
    # boilerplate chunk planted in ~50% of a 100k-doc corpus — the
    # planet-hot-key shape a global footer/disclaimer produces at
    # 100 TB. The shipped plan resolves keep-first with a partial-
    # aggregatable min(struct) (one candidate row per map partition
    # reaches the shuffle), while the pre-r10 row_number window makes
    # ONE reducer sort the whole 50k-row hot group — both are timed so
    # the artifact shows the skewed-key wall, not just claims it.
    for n_hot, frac in ((100_000, 0.5), (400_000, 0.9)):
        hot = build_hot_span_corpus(spark, n_docs=n_hot, hot_frac=frac)
        timed(
            f"dup_span_removal_hotkey_{n_hot // 1000}k",
            lambda h=hot: dup_span_removal(h)
            .where(F.col("span_dup_removed") > 0)
            .count(),
            extra={"n_docs": n_hot, "hot_frac": frac},
        )
        timed(
            f"dup_span_removal_hotkey_{n_hot // 1000}k_window_baseline",
            lambda h=hot: _dup_span_removal_window_form(h)
            .where(F.col("span_dup_removed") > 0)
            .count(),
            extra={
                "n_docs": n_hot,
                "hot_frac": frac,
                "note": "pre-r10 row_number form; locally faster (a "
                "single-task sort of <1M rows is trivial) — the shipped "
                "min-struct form is chosen for its BOUNDED reduce input "
                "(one row per map partition per fingerprint), the "
                "property that survives a billion-row hot group",
            },
        )
    timed(
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(d, n_hashes=16, bands=4).count(),
    )
    timed(
        "ngram_jaccard_maxdf",
        lambda: ngram_jaccard_pairs(d, threshold=0.5, k=3, max_df=256).count(),
    )
    timed(
        "dup_clusters_on_lsh",
        lambda: dup_clusters(
            minhash_lsh_pairs(d, n_hashes=16, bands=4)
            .where(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b")
        ).count(),
    )
    exact_n = timed(
        "ngram_jaccard_exact",
        lambda: ngram_jaccard_pairs(d, threshold=0.5, k=3, max_df=None).count(),
    )

    # the PRODUCTION two-stage composition (round-6): LSH candidates ->
    # exact verify. Verified pairs are a SUBSET of the exact pairs
    # (property-tested), so recall = verified/exact by count. The
    # banding sweep (round-7 verdict #3) prices the recall dial. Two
    # levers: more bands at the same rows-per-band r = hashes/bands
    # tighten the J estimate (16/4, 32/8, 64/16 are all r=4:
    # P(candidate) = 1-(1-J^4)^b), while DROPPING r widens the
    # candidate net near the threshold — 32/16 is r=2, giving
    # P(candidate at J=0.5) = 1-(1-0.25)^16 ~ 0.99; the extra false
    # candidates cost only exact-verify work, which the second stage
    # prunes exactly.
    for n_hashes, bands in ((16, 4), (32, 8), (64, 16), (32, 16)):
        name = (
            "lsh_verified_pairs"
            if (n_hashes, bands) == (16, 4)
            else f"lsh_verified_pairs_{n_hashes}x{bands}"
        )
        got = timed(
            name,
            lambda nh=n_hashes, b=bands: lsh_verified_pairs(
                d, threshold=0.5, n_hashes=nh, bands=b
            ).count(),
            extra={"n_hashes": n_hashes, "bands": bands},
        )
        if got is not None and exact_n:
            print(
                json.dumps(
                    {
                        "op": f"{name}_recall",
                        "recall_vs_exact": round(got / exact_n, 3),
                        "n_hashes": n_hashes,
                        "bands": bands,
                    }
                )
            )


if __name__ == "__main__":
    main()
