"""Production-shape BPE tokenizer training (Sennrich, Haddow, Birch,
ACL 2016, algorithm 1) — the EAGER driver-loop twin of the registered
`doc_bpe_train` member (plans/llm.py).

The member unrolls K=8 merge rounds into ONE lazy plan so its DuckDB
oracle can replay the identical schedule; that form duplicates plan
subtrees 2^K-fold and stops making sense at production K (10k+
merges). This operator runs the same per-round physical shape —

    count adjacent pairs (map-side-combined groupBy over the encoded
    streams)  ->  LIMIT-1 argmax (TakeOrderedAndProject)  ->  one
    leftmost-greedy literal-replace pass

— but eagerly: each round's argmax is a 1-row collect (a build-time
small-side collect, the kmeans-seed idiom — the merge RULE is what
the driver needs to construct the next round's plan), the replace is
applied with string literals so plans stay LINEAR in K, and lineage
is truncated every `checkpoint_every` rounds so round N's task
binaries don't carry N replace expressions. Per-round cost at any
corpus size: one scan of the (cached) encoded column + a shuffle
bounded by the pair vocabulary (Heaps-law bounded), never the token
stream.

Value-equivalence to the member (identical merge tables on the same
corpus for the shared prefix) is pinned in tests/test_bpe_train.py,
alongside a pure-Python iterative reference at K beyond the member's
unroll depth.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _llm():
    # plans/llm.py owns the encoding constants + shared expressions;
    # imported lazily to avoid a package import cycle (plans imports
    # operators at registration time)
    from ..plans import llm

    return llm


def _pair_counts(cur: DataFrame):
    llm = _llm()
    pairs = llm._bpe_adjacent_pairs(llm._bpe_encoded_pieces(F.col("__s")))
    return (
        cur.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    k: int,
    *,
    text_col: str = "text",
    checkpoint_every: int = 64,
    checkpoint_dir: str | None = None,
    stats_out: list | None = None,
    vocab_every: int = 0,
) -> list[tuple[int, str, str, int]]:
    """Learn `k` BPE merge rules from `docs[text_col]`; returns the
    rank-ordered merge table [(rank, left, right, count_at_learn)].
    Stops early if the corpus runs out of adjacent pairs.

    `checkpoint_every` bounds lineage depth: every that-many rounds
    the encoded column is checkpointed and the previous generation
    released — plans and task binaries stay O(1) in the number of
    rounds instead of accumulating one replace expression per learned
    rule. With `checkpoint_dir` set, generations rotate through
    parquet under it (written, re-read, previous generation deleted —
    the durable form a cluster run wants: executor loss replays from
    storage, and release is deterministic). `checkpoint_dir` must be
    EXCLUSIVE to one training run: rotation deletes every other
    bpe_gen=* dir under it, so two concurrent runs sharing the dir
    would delete each other's live generation mid-run (r9 ADVICE —
    namespace per run, e.g. a run-id subdir). Without it,
    localCheckpoint(eager) is used — dependency-free, but blocks are
    executor-resident (no executor-loss safety) and freed lazily by
    the ContextCleaner rather than on release.

    Instrumentation (tools/stress_bpe.py, r9 verdict #2 — price the
    trainer at real K): `stats_out`, when a list, receives one dict
    per learned rank {rank, sec, cnt, pair_vocab, checkpointed};
    `vocab_every=N` additionally counts the distinct-pair cardinality
    every N ranks (one EXTRA aggregation job per measurement — the
    Heaps-curve probe; 0 = never, the production default). Measurement
    hooks only; the learned merge table is byte-identical with or
    without them.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    llm = _llm()
    sep, sep2 = llm._BPE_SEP, llm._BPE_SEP * 2
    base = docs.select(
        llm.bpe_encode(llm.bpe_pretokens(F.col(text_col))).alias("__s")
    ).persist()
    cur = base
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, k + 1):
            # the Heaps probe runs BEFORE the timer starts: it is an
            # instrumentation-only extra job, and timing it would
            # inflate exactly the per-round wall the pricing harness
            # exists to measure (review finding r10)
            pair_vocab = None
            if vocab_every and rank % vocab_every == 1 % vocab_every:
                pair_vocab = _pair_counts(cur).count()
            t0 = time.time() if stats_out is not None else 0.0
            top = (
                _pair_counts(cur)
                .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
            merges.append((rank, l, r, cnt))
            cur = cur.select(
                F.replace(
                    F.col("__s"),
                    F.lit(sep + l + sep2 + r + sep),
                    F.lit(sep + l + r + sep),
                ).alias("__s")
            )
            checkpointed = rank % checkpoint_every == 0 and rank < k
            if checkpointed:
                # truncate lineage; after the first checkpoint the
                # persisted base is no longer reachable — release it
                if checkpoint_dir is not None:
                    cur = _rotate_parquet(docs.sparkSession, cur, checkpoint_dir, rank)
                else:
                    cur = cur.localCheckpoint(eager=True)
                base.unpersist()
            if stats_out is not None:
                stats_out.append(
                    {
                        "rank": rank,
                        "sec": round(time.time() - t0, 3),
                        "cnt": cnt,
                        "pair_vocab": pair_vocab,
                        "checkpointed": checkpointed,
                    }
                )
    finally:
        base.unpersist()
    return merges


def _rotate_parquet(spark, cur: DataFrame, checkpoint_dir: str, rank: int) -> DataFrame:
    """Write the current encoded generation to parquet, re-read it (a
    lineage-free scan), and delete every OLDER generation dir — the
    FS-swap idiom streaming/incremental uses for state rewrites."""
    from ..streaming.incremental import _hadoop_fs

    path = f"{checkpoint_dir}/bpe_gen={rank}"
    cur.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    fs, root = _hadoop_fs(spark, checkpoint_dir)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("bpe_gen=") and name != f"bpe_gen={rank}":
                fs.delete(st.getPath(), True)
    return out


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_pieces",
) -> DataFrame:
    """Tokenize `docs[text_col]` with a learned merge table: pre-token
    split, then every merge applied in rank order (one leftmost-greedy
    non-overlapping pass per rule — the shared literal-replace
    encoding of plans/llm.bpe_apply_merges_expr, so trainer and
    tokenizer cannot drift). Adds `out_col` (array<string> of final
    pieces). Scan-speed expressions; the merge table rides as one
    literal array."""
    llm = _llm()
    sep2 = llm._BPE_SEP * 2
    rules = [(m[-3], m[-2]) if len(m) >= 3 else (m[0], m[1]) for m in merges]
    toks = llm.bpe_pretokens(F.col(text_col))
    merges_col = F.array(
        *[
            F.struct(F.lit(l).alias("l"), F.lit(r).alias("r"))
            for l, r in rules
        ]
    )
    if not rules:
        return docs.withColumn(out_col, toks)
    encoded = llm.bpe_apply_merges_expr(toks, merges_col)
    return docs.withColumn(
        out_col, F.filter(F.split(encoded, sep2), lambda x: x != F.lit(""))
    )
