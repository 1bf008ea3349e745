"""Deduplication operators over the documents table.

Training-data-pipeline primitives (BASELINE.json north-star):
 - exact dedup: canonicalize -> md5 -> groupBy fingerprint
 - n-gram Jaccard near-dup: shingle sets + bounded pair generation
 - MinHash + LSH: shingle -> minhash signature -> band buckets ->
   candidate pairs via equi-join (the 100 TB path: no cross join,
   only shuffles on band keys)
 - SimHash: 64-bit signed-bit aggregate of token hashes

All hashing uses md5/conv (identical results reproducible in ANSI
SQL), so correctness is oracle-checkable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, shingles, tokens

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_lsh_pairs",
    "lsh_verified_pairs",
    "simhash",
    "simhash_pairs",
    "dup_clusters",
    "ClusteringNotConverged",
]


def _md5_hash64(col: Column, seed: int | str) -> Column:
    """Deterministic 63-bit hash from md5 hex — portable across engines
    (same value computable in DuckDB SQL), unlike xxhash64. `seed` may
    be an int or a string salt; either way the hashed prefix is
    "<seed>:" — the single home of the portable-hash idiom.
    """
    h = F.md5(F.concat(F.lit(str(seed) + ":"), col))
    # first 15 hex chars => 60 bits, fits bigint exactly
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def exact_dedup(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: canonical md5 fingerprint, keep min id.

    One hash-shuffle on the fingerprint; at 100 TB this is the classic
    map-side-combine groupBy — no state beyond the aggregation.
    """
    return (
        docs.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by k-token-shingle Jaccard >= threshold.

    Pair generation by inverted index: explode shingles, group the
    posting list per shingle, count shared shingles per pair, then
    J = shared / (|A| + |B| - shared). Each pair is emitted once
    (id_a < id_b). This is the exact-Jaccard path; MinHash+LSH below
    is the approximate scale path.

    `max_df=None` (default) is EXACT Jaccard: every co-occurring pair
    is counted, so J is the true shingle Jaccard. Setting `max_df=N`
    opts into df-blocking: posting lists longer than N are dropped
    before pair generation, bounding the per-shingle pair blowup at
    N^2 (without it, one stop-shingle shared by 10^6 docs emits 10^12
    pairs from a single row). Blocking undercounts `shared` for pairs
    that overlap via hot shingles while the denominator still uses
    full |A|+|B|, so J becomes a lower bound — callers at the 100 TB
    scale choose the cap consciously. The operator DEFAULT stays
    exact; every registered plan passes max_df=256 explicitly, and
    its oracle encodes the identical cap (round-6: engine and oracle
    agree even when the cap binds). The measured trade at K=30 is in
    SCALE.md; `lsh_verified_pairs` is the two-stage production
    alternative.
    """
    # hash shingles to int64 BEFORE the shuffle: 8-byte keys instead of
    # ~k*word-length strings cuts shuffle volume several-fold at scale;
    # shared-shingle counts are preserved (distinct-per-doc shingling +
    # 64-bit xxhash => collision probability ~n^2/2^65, negligible).
    # (A hash-the-token-TUPLE variant that skips building shingle
    # strings measured FASTER in stage isolation but 15-30% slower
    # end-to-end under codegen fusion — keep the string form; re-A/B
    # before changing this. An array_sort + slice(i+2..) pair emit
    # that skips generating the discarded id_a >= id_b half also
    # measured SLOWER warm at sf0.1 — min 2.62s vs 2.30s over 5 runs
    # — the comparator-lambda sort costs more than the struct churn
    # codegen already fuses away.)
    # r13 (guide §1 measured): stage the lower-token array in its own
    # projection before shingling — `shingles` references its token
    # input ~2k times (size, k slices, the n>=k guard) and Catalyst
    # does not merge HOF subtrees differing only in lambda ids, so the
    # inline form re-tokenizes per reference (0.60 vs 0.37 s noop for
    # the shingle stage at sf0.1). Value-identical: same expression
    # over the same staged array.
    sh = docs.select(
        F.col(id_col).alias("id"),
        tokens(F.lower(F.col(text_col))).alias("__tkl"),
    ).select(
        "id", shingles(F.col("__tkl"), k, toks=F.col("__tkl")).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select(
        "id", "n_sh", F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("shingle")
    )
    # Join-free pair generation: group the (id, n_sh) posting list per
    # shingle, emit ordered pairs with nested array transforms. Evaluates
    # the (expensive) shingle expression once instead of twice as the two
    # sides of a self-join, and the per-shingle pair blowup is bounded by
    # the posting-list length (df^2), which stays small after distinct-
    # per-doc shingling. Two shuffles total: by shingle, then by pair.
    posting = ex.groupBy("shingle").agg(
        F.collect_list(F.struct("id", "n_sh")).alias("members")
    )
    if max_df is not None:
        posting = posting.filter(F.size("members") <= max_df)
    m = F.col("members")
    # r13 (guide §1 measured): filter the PARTNER list BEFORE building
    # pair structs — the m x m inner transform used to allocate a
    # 4-field struct for every combination and then discard >half;
    # filtering on the existing member structs first allocates pair
    # structs only for survivors. Same pairs, same order semantics
    # (flatten of per-a lists; the downstream groupBy is order-free).
    # Measured min 2.21 -> 1.87 s end-to-end at sf0.1 (6/7 rounds
    # faster, cal-interleaved).
    pair_arr = F.flatten(
        F.transform(
            m,
            lambda a: F.transform(
                F.filter(
                    m,
                    # AllPairs/PPJoin-style length filter, exact-
                    # preserving: shared <= min(n_a, n_b), so
                    # J <= min/max; a pair whose shingle-count ratio is
                    # below the threshold can never pass the final
                    # J >= t cut — prune it BEFORE the pair shuffle
                    # instead of after the shared-count agg.
                    lambda b: (a["id"] < b["id"])
                    & (
                        F.least(a["n_sh"], b["n_sh"]).cast("double")
                        >= F.lit(threshold) * F.greatest(a["n_sh"], b["n_sh"])
                    ),
                ),
                lambda b: F.struct(
                    a["id"].alias("id_a"),
                    b["id"].alias("id_b"),
                    a["n_sh"].alias("n_a"),
                    b["n_sh"].alias("n_b"),
                ),
            ),
        )
    )
    pairs = posting.select(F.explode(pair_arr).alias("p")).select("p.*")
    shared = pairs.groupBy("id_a", "id_b", "n_a", "n_b").agg(
        F.count(F.lit(1)).alias("shared")
    )
    # the float jaccard drives the threshold cut (safe: one correctly-
    # rounded division of exact ints — the minimal excess over any
    # threshold is >= 1/(2U), orders above 1 ulp); the integer pieces
    # ride along so callers emitting a 6dp value can round EXACTLY
    # (functions/semantics.round6_ratio — the rational I/U lands on
    # .5e-6 boundaries, where engine float rounds disagree)
    return shared.select(
        "id_a",
        "id_b",
        (
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared"))
        ).alias("jaccard"),
        "shared",
        "n_a",
        "n_b",
    ).filter(F.col("jaccard") >= threshold)


def minhash_signature(
    docs: DataFrame,
    n_hashes: int = 16,
    k: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature: per seed, min over shingle hashes.

    Computed as array expressions over the shingle array — stays
    JVM-side, no UDF, no explode (signature built per row).
    """
    # Docs shorter than k tokens have no shingles; array_min over an
    # empty array would yield an all-NULL signature, and concat_ws drops
    # NULLs, so every such doc would share one degenerate bucket in every
    # band -> quadratic spurious candidates. Filter them out up front
    # (mirrors the oracle's len(tokens) >= k predicate).
    # staged lower-token array before shingling (r13 — see
    # ngram_jaccard_pairs for the measurement; value-identical)
    sh = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__tkl")
    ).select(
        id_col, shingles(F.col("__tkl"), k, toks=F.col("__tkl")).alias("sh")
    ).filter(F.size("sh") >= 1)

    def hash_with_seed(seed):
        # closure factory (a default-arg lambda would be treated as a
        # two-param (element, index) HOF lambda by pyspark)
        def f(s):
            return _md5_hash64(s, seed)

        return f

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), hash_with_seed(i)))
            for i in range(n_hashes)
        ]
    )
    return sh.select(id_col, sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: split signature into bands, bucket-join on
    (band_idx, band_hash). Emits distinct candidate pairs (id_a < id_b)
    with estimated Jaccard = fraction of matching minhashes.

    Scale shape: explode to bands (xN rows), shuffle on band key,
    join within buckets only — never a cross join... UNLESS a bucket
    itself goes quadratic. `max_bucket` (r12 verdict #6) is the
    band-bucket analog of ngram_jaccard's max_df: on a corpus where a
    shared boilerplate snippet dominates the shingle mins (the shape
    that killed the uncapped Jaccard join), a single band bucket can
    collect O(boiler_frac * n) docs and its self-join emits occ^2
    pairs — superlinear in n with no cap. Buckets whose occupancy
    exceeds `max_bucket` are STAR-REDUCED instead of all-paired: every
    member pairs with the bucket's min id only (O(occ) edges). The
    star keeps the bucket CONNECTED, so dup_clusters over the pairs
    yields the same components as the uncapped form (property-tested);
    what is lost is exhaustive pair ENUMERATION inside hot buckets —
    a non-hub pair is emitted only if some other, colder band catches
    it. Default None preserves the exact historical behavior (the
    registered members' oracle replays it); production corpus-prep
    passes a cap sized like max_df (hot buckets are boilerplate
    artifacts, and the verified stage prunes false star edges
    exactly).
    """
    if n_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide n_hashes ({n_hashes}): a remainder "
            "would silently drop trailing minhashes from banding, changing "
            "the effective recall curve P = 1-(1-J^r)^b"
        )
    rows_per_band = n_hashes // bands
    sig = minhash_signature(docs, n_hashes, k, id_col=id_col, text_col=text_col)
    banded = sig.select(
        F.col(id_col).alias("id"),
        F.col("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", bi * rows_per_band + j + 1).cast("string")
                                for j in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    if max_bucket is not None:
        # occupancy + hub in ONE aggregation on the same (band, bucket)
        # shuffle key the pair join uses — no new shuffle axis
        occ = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__occ"), F.min("id").alias("__hub")
        )
        banded = banded.join(occ, ["band", "bucket"])
        cold = banded.filter(F.col("__occ") <= max_bucket)
        hot = banded.filter(F.col("__occ") > max_bucket)
    else:
        cold, hot = banded, None
    a = cold.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    b = cold.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
    )
    if hot is not None:
        # star reduction: hub (the bucket's min id) x every other
        # member — O(occ) rows per hot bucket, id_a < id_b by
        # construction (hub is the min)
        hubs = hot.filter(F.col("id") == F.col("__hub")).select(
            "band", "bucket",
            F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
        )
        star = (
            hot.filter(F.col("id") != F.col("__hub"))
            .select(
                "band", "bucket",
                F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
            )
            .join(hubs, ["band", "bucket"])
            .select("id_a", "id_b", "sig_a", "sig_b")
        )
        cand = cand.unionByName(star)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / F.lit(float(n_hashes))
    return cand.select("id_a", "id_b", est.alias("est_jaccard"))


def lsh_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 32,
    bands: int = 16,
    k: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """PRODUCTION two-stage near-dup: MinHash-LSH candidate generation
    -> EXACT shingle-Jaccard verification on the candidates only.

    DEFAULT dials are the measured-dominant r=2 point (32 hashes /
    16 bands): 0.999 recall at 1.8x below exact cost in the round-7
    sweep — strictly better than the old 16/4 narrative default
    (0.712 recall) and than r=4 64/16 (0.943 at higher wall) on both
    axes. Pass 16/4 or 32/8 explicitly for the cheap 0.7-0.85-recall
    regime (natural corpora whose dup pairs sit well above the
    threshold).

    This is the composition every real corpus dedup runs (the round-5
    verdict's missing registration): stage 1 bounds the pair space by
    band-bucket equi-joins (never corpus^2, recall set by the band/row
    split), stage 2 removes LSH's false positives by computing the
    TRUE Jaccard — but only over |candidates| rows, so the exact
    inverted-index path's shingle-pair blowup never happens. Pairs the
    banding misses (probabilistic recall) are missed — that is the
    documented trade; dup_pair_panel surfaces them as NULLs against
    the exact member.

    Choosing the dials (measured sweep, SCALE.md round 7): rows per
    band r = n_hashes/bands sets candidate recall near the threshold
    (P = 1-(1-J^r)^bands). Use the smallest r >= 2 that keeps buckets
    selective — r=2 at thresholds around 0.5 (J^2=0.25, so b=16
    already gives P~0.99 at the threshold), r=3-4 for high thresholds
    (J >= 0.8) where J^r stays large anyway; r=1 degenerates to
    single-MinHash buckets (any one shared shingle-min collides) and
    floods the verifier. The false candidates a low r admits cost
    only verify work, which this stage prunes exactly. Measured at
    K=30/150k docs, J>=0.5: r=2 (32/16) reaches 0.999 recall at 1.8x
    below exact cost; r=4 configs (16/4, 32/8) are the cheap
    0.7-0.85-recall points.

    Scale: stage 2 is two equi-joins of the (small) candidate list
    back to the per-doc distinct-shingle arrays, then a pure array
    expression (array_intersect) per candidate row — no shuffle grows
    with the corpus beyond the signature pass itself. On
    boilerplate-dominated corpora pass `max_bucket` (see
    minhash_lsh_pairs): hot band buckets go occ^2 without it, and the
    exact verify stage makes the star-reduced candidates precise for
    free.
    """
    cand = minhash_lsh_pairs(
        docs, n_hashes=n_hashes, bands=bands, k=k, id_col=id_col,
        text_col=text_col, max_bucket=max_bucket,
    ).select("id_a", "id_b")
    # staged lower-token array before shingling (r13 — see
    # ngram_jaccard_pairs for the measurement; value-identical)
    sh = docs.select(
        F.col(id_col).alias("id"),
        tokens(F.lower(F.col(text_col))).alias("__tkl"),
    ).select(
        "id", shingles(F.col("__tkl"), k, toks=F.col("__tkl")).alias("shs")
    ).filter(F.size("shs") >= 1)
    a = sh.select(F.col("id").alias("id_a"), F.col("shs").alias("shs_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shs").alias("shs_b"))
    shared = F.size(F.array_intersect("shs_a", "shs_b"))
    jac = shared.cast("double") / (
        F.size("shs_a") + F.size("shs_b") - shared
    )
    # integer pieces ride along for exact 6dp emission (see
    # ngram_jaccard_pairs)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jac.alias("jaccard"),
            shared.cast("bigint").alias("shared"),
            F.size("shs_a").cast("bigint").alias("n_a"),
            F.size("shs_b").cast("bigint").alias("n_b"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_tokens_sql(text_sql: str) -> str:
    """SQL fragment for the simhash token array (whitespace tokens of
    the lowered text) — the exact SQL twin of
    `functions.text.tokens(F.lower(text))`."""
    return f"filter(split(trim(lower({text_sql})), '\\\\s+'), t -> t <> '')"


def simhash_from_tokens_sql(toks_sql: str) -> str:
    """SQL for the single-pass 60-bit SimHash over a token-array SQL
    fragment (r12 optimization round, guide §1/§4-adjacent: the prior
    form built 60 separate `F.aggregate` folds in Python — ~4 s of
    py4j round trips PER CONSTRUCTION — and, because each fold inlined
    the md5 token-hash transform with fresh lambda ids, Catalyst's
    common-subexpression pass could not merge them, so every row paid
    60 redundant md5 passes over its tokens: 28.2 s vs 2.0 s noop at
    sf0.1, value-identical by test and oracle).

    One fold: the accumulator carries the 60 per-bit one-counts plus
    the token count; the aggregate's `finish` lambda binds the final
    accumulator once (the only let-binding SQL expressions have) and
    derives the hash: bit b is set iff the +1/-1 vote is positive,
    i.e. iff 2*count_b > n (strict, matching the legacy strict `> 0`
    vote). `coalesce(..., 0)` preserves the legacy NULL-text behavior
    (every per-bit vote was NULL, so every bit contributed its
    `otherwise(0)` branch and the sum was 0)."""
    h = (
        f"transform({toks_sql}, s -> cast(conv(substring(md5(concat('0:', s)),"
        " 1, 15), 16, 10) as bigint))"
    )
    return (
        "coalesce(aggregate("
        f"{h}, "
        "struct(array_repeat(cast(0 as bigint), 60) as c, cast(0 as bigint) as n), "
        "(acc, x) -> struct("
        # r12 optimization round: one indexed transform per token
        # (counter + bit derived in place) instead of zip_with over a
        # materialized per-token bit array — one array allocation per
        # token, not two; bit-identical (A/B: 0 mismatches at sf0.1,
        # ~15% off the fold wall)
        "transform(acc.c, (a, i) -> a + (shiftright(x, i) & 1)) as c, "
        "acc.n + cast(1 as bigint) as n), "
        "acc -> aggregate(sequence(0, 59), cast(0 as bigint), "
        "(s2, b) -> s2 + if(2 * element_at(acc.c, b + 1) > acc.n, "
        "shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
        "), cast(0 as bigint))"
    )


def simhash_expr(text_sql: str):
    """SimHash as a pure Column expression over a text column (SQL
    fragment or plain column name) — shared by the `simhash` operator,
    `simhash_banded_pairs`, and the fused one-pass document-feature
    form (`doc_features_fused`), so all stay bit-identical."""
    return F.expr(simhash_from_tokens_sql(simhash_tokens_sql(text_sql)))


def simhash(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sign of the sum
    of (+1/-1) votes from each token's md5-derived bits. Near-dups have
    small Hamming distance between simhashes.

    Implemented as 64 array-fold expressions; no UDF. At 100 TB this
    is scan-bound and embarrassingly parallel.
    """
    return docs.select(
        F.col(id_col), simhash_expr(f"`{text_col}`").alias("simhash")
    )


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize df and cut its lineage between loop rounds.

    Uses a RELIABLE checkpoint (HDFS/object store) when the session
    has a checkpoint dir configured — on a real cluster an executor
    loss mid-loop then recovers from storage instead of recomputing a
    k-round lineage that no longer exists. Falls back to
    localCheckpoint() (executor-local blocks, no dir needed) on the
    test rig, where the single JVM cannot lose an executor.
    """
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():  # noqa: SLF001
        return df.checkpoint()
    return df.localCheckpoint()


class ClusteringNotConverged(RuntimeError):
    """dup_clusters exhausted max_iter with labels still changing —
    the result would silently split clusters, so it is an error."""


def dup_clusters(pairs: DataFrame, *, max_iter: int = 20) -> DataFrame:
    """Connected components over near-dup pairs: each doc labeled with
    the min doc_id reachable through the dup graph (the cluster's
    canonical survivor).

    Iterative min-label propagation WITH POINTER DOUBLING: each round
    (1) takes the min label among the node's neighbors, then
    (2) shortcuts through the label itself — L(id) <- L(L(id)) — so
    the hop distance the min label has covered DOUBLES per round
    instead of growing by one. A chain of diameter d converges in
    O(log d) rounds (d_k = 2^(k+1) - 2: a 1000-long crawl-dup chain
    needs 9 rounds, not 1000), which is exactly the large-star/
    small-star recipe of Kiveris et al. (MapReduce CC) adapted to
    min-label tables. The shortcut is sound because label values are
    always node ids whose own row exists, and L(x) is always
    reachable from x.

    If labels are still changing after `max_iter` rounds the result
    WOULD be wrong (split clusters), so the loop raises
    ClusteringNotConverged instead of returning silently — with
    doubling, 20 rounds cover diameter ~2^21, so hitting this means
    something is structurally off (e.g. the pair list mutates
    between rounds).

    Each round is three bounded shuffles over the PAIR list (tiny
    relative to the corpus after thresholding), so at 100 TB this
    loop runs on the pruned pair graph, not the data. Set
    `spark.sparkContext.setCheckpointDir(...)` on a cluster to make
    the per-round materialization executor-loss-safe (see
    _truncate_lineage).
    """
    edges = _truncate_lineage(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        # materialized once: every round joins against it, and the loop
        # must not re-derive it from the (expensive) pair plan each time
    )
    labels = _truncate_lineage(
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
    )
    for _ in range(max_iter):
        # candidate labels: my own + the min label among my neighbors
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "b2"), edges.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("cluster").alias("nmin"))
            .withColumnRenamed("a", "id")
        )
        propagated = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(F.col("cluster"), F.coalesce("nmin", F.col("cluster"))).alias(
                "cluster"
            ),
        )
        # pointer doubling: follow my (new) label to ITS label, so the
        # reach doubles — L(id) <- min(L(id), L(L(id)))
        lut = propagated.select(
            F.col("id").alias("__lid"), F.col("cluster").alias("__lcluster")
        )
        new_labels = _truncate_lineage(
            propagated.join(lut, propagated.cluster == F.col("__lid"), "left").select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("__lcluster", F.col("cluster"))
                ).alias("cluster"),
            )
            # truncate lineage each round: without this, round k re-executes
            # the joins of rounds 1..k-1 (the `changed` count below is an
            # action per round) and the plan grows without bound
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    # one more fixpoint probe: max_iter rounds may have JUST reached the
    # fixpoint on the final round (changed != 0 detected the change that
    # made it converge); only raise if another round would still move
    final_min = (
        edges.join(labels.withColumnRenamed("id", "b2"), edges.b == F.col("b2"))
        .groupBy("a")
        .agg(F.min("cluster").alias("nmin"))
        .withColumnRenamed("a", "id")
    )
    residual = (
        labels.join(final_min, "id", "left")
        .filter(F.coalesce("nmin", F.col("cluster")) < F.col("cluster"))
        .limit(1)
        .count()
    )
    if residual:
        raise ClusteringNotConverged(
            f"label propagation still changing after {max_iter} rounds"
        )
    return labels


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= max_hamming,
    with band blocking (the Manku/Charikar web-dedup recipe).

    The 60-bit simhash splits into `bands` equal slices; candidates
    are pairs sharing >= 1 identical slice (equi-join on (band, key) —
    never a cross join), then the exact popcount(xor) filter runs on
    candidates only. Pigeonhole guarantee: with max_hamming < bands,
    every true pair differs in fewer bits than there are bands, so at
    least one band is identical — banding is LOSSLESS for the default
    (ham <= 3, 4 bands), unlike MinHash's probabilistic recall.

    Scale shape mirrors minhash_lsh_pairs: explode xbands, shuffle on
    the band key, per-bucket work bounded by occupancy.
    """
    assert 60 % bands == 0, "bands must divide the 60-bit simhash"
    width = 60 // bands
    mask = (1 << width) - 1
    # degenerate-doc guard (same reasoning as minhash_signature's):
    # every zero-token doc has simhash 0 and would collide in EVERY
    # band — m empty docs emit ~m^2/2 candidate pairs from single
    # buckets. Content-free docs have no meaningful Hamming distance;
    # exclude them from pair generation (the oracle applies the same
    # filter).
    s = docs.filter(F.size(tokens(F.lower(F.col(text_col)))) >= 1).select(
        F.col(id_col).alias("id"), simhash_expr(f"`{text_col}`").alias("sh")
    )
    banded = s.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sh", width * b).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = banded.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "key")
    b = banded.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("sh_hamming")).filter(
        F.col("sh_hamming") <= max_hamming
    )
