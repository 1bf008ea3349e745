"""Structured Streaming jobs (SURVEY §2.9 mapped to real streams).

The reference is batch-cron, but its incremental semantics (late
corrections, watermark fills, stateful breadth) map to Structured
Streaming: readStream → watermark → windowed agg / dedup →
writeStream. These jobs run with Trigger.availableNow over file
sources so tests exercise the full streaming path deterministically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "events_stream",
    "windowed_event_counts",
    "dedup_stream",
    "session_window_counts",
    "stateful_user_breadth",
    "stateful_overheat_stages",
    "enrich_with_master_current",
    "enrich_with_master_pit",
    "attribution_join_streams",
    "run_to_parquet",
    "run_foreach_batch_upsert",
    "score_histogram",
    "drift_gated_ingest",
    "quality_gated_ingest",
    "corpus_prep_stream",
    "corpus_prep_near_dup_stream",
]

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of event batches (parquet drops into a dir —
    the streaming analog of the reference's per-day ingest batches)."""
    raw = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def windowed_event_counts(stream: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-day windowed per-type aggregation with late-data
    watermark — the streaming form of the daily batch cadence (ST1's
    watermark + the daily market_indicators fill ST4)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def dedup_stream(stream: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark — the
    corrections-safe idempotent ingest (the reference's ON CONFLICT
    upsert semantics, batch.ts:81-141, in stream form)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_window_counts(stream: DataFrame, *, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows (the streaming twin of the batch `user_sessions`
    plan): per user, events within `gap` of each other merge into one
    session; watermark bounds state. Spark-native F.session_window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def stateful_user_breadth(stream: DataFrame) -> DataFrame:
    """ST3 stateful per-key accumulator (BreadthAccumulator, market-
    breadth.ts:121-275) as a custom stateful streaming operator via
    applyInPandasWithState: per user, carry {prev_value, running_max,
    n_seen} across micro-batches; emit one row per batch with the
    number of new highs (value > running max so far) observed.

    The batch re-derivation of the same semantics is the window form
    (event_running_high / W20); this is the streaming form with
    explicit state, as SURVEY §2.9 maps ST3.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.exists:
            prev_value, running_max, n_seen = state.get
        else:
            prev_value, running_max, n_seen = None, None, 0
        new_highs = 0
        # materialize all of the key's Arrow chunks and sort ONCE: a
        # per-chunk sort would step events out of ts order whenever a
        # batch spans multiple chunks (> maxRecordsPerBatch rows)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_us", "event_id"]
            )
            for v in pdf["value"]:
                # NULL value = no observation (events.value is
                # nullable; Arrow delivers NaN): skip it — a NaN
                # assigned into running_max would poison every later
                # comparison (x > NaN is always False), permanently
                # disabling new-high detection for the key
                if v is None or pd.isna(v):
                    continue
                if running_max is not None and v > running_max:
                    new_highs += 1
                running_max = v if running_max is None else max(running_max, v)
                prev_value = v
                n_seen += 1
        state.update((prev_value, running_max, n_seen))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_seen": n_seen,
                    "running_max": running_max,
                    "new_highs_in_batch": new_highs,
                }
            ]
        )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("running_max", T.DoubleType()),
            T.StructField("new_highs_in_batch", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("prev_value", T.DoubleType()),
            T.StructField("running_max", T.DoubleType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_overheat_stages(stream: DataFrame) -> DataFrame:
    """Streaming form of the overheat stage machine
    (operators/overheat.overheat_stages — 00120 stage/stage_since/
    stage_event semantics): per user, carry (stage, stage_since)
    across micro-batches via applyInPandasWithState and step the
    SAME `_step` transition function the batch operator uses, so the
    two forms cannot drift (the W20 batch-window / ST3-stateful
    duality, applied to W22+).

    Input: a stream of (user_id, day, heat_score). Within a batch
    ALL of a key's rows are materialized and stepped in day order
    (the per-key iterator yields Arrow chunks; sorting each chunk
    independently would step days out of order whenever one batch
    exceeds maxRecordsPerBatch, so we concat before sorting — per-key
    per-batch histories are small by construction). Across batches
    state carries. Assumes in-order ingestion per key across batches
    (the daily pipeline's shape — each micro-batch is a later trading
    day); out-of-order days would need event-time buffering upstream.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.overheat import _step

    def update(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.exists:
            prev, since = state.get
        else:
            prev, since = None, None
        rows = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("day")
            for day, heat in zip(pdf["day"], pdf["heat_score"]):
                base = prev if prev is not None else "none"
                # NULL/NaN heat = no observation: hold (same rule as
                # the batch operator, so the two forms cannot drift)
                cur = base if (heat is None or pd.isna(heat)) else _step(base, heat)
                if prev is None:
                    frm, since = None, int(day)
                elif cur != prev:
                    frm, since = prev, int(day)
                else:
                    frm = None
                rows.append(
                    {
                        "user_id": user_id,
                        "day": int(day),
                        "heat_score": float("nan")
                        if (heat is None or pd.isna(heat))
                        else float(heat),
                        "stage": cur,
                        "stage_from": frm,
                        "stage_since": since,
                    }
                )
                prev = cur
        state.update((prev, since))
        if rows:
            yield pd.DataFrame(rows)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("day", T.LongType()),
            T.StructField("heat_score", T.DoubleType()),
            T.StructField("stage", T.StringType()),
            T.StructField("stage_from", T.StringType()),
            T.StructField("stage_since", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("stage", T.StringType()),
            T.StructField("stage_since", T.LongType()),
        ]
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_parquet(
    out: DataFrame, target_dir: str, checkpoint_dir: str, *, mode: str = "append"
) -> None:
    """Drain all available input (Trigger.availableNow) into parquet and
    stop — deterministic for tests; on a cluster the same query runs
    continuously with the checkpoint providing exactly-once."""
    q = (
        out.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(mode)
        .format("parquet")
        .option("path", target_dir)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_upsert(
    out: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    partition_col: str,
    *,
    count_nulls: tuple[str, ...] = (),
) -> list[dict]:
    """Stream → idempotent partition upsert with in-flight audit
    (ST1+ST5+ST7 composed): each micro-batch lands through
    `write_with_audit`, so late or replayed batches OVERWRITE exactly
    the partitions they carry (the reference's ON CONFLICT upsert,
    batch.ts:81-141) instead of appending duplicates, and the
    job_run_items-style row/null metrics come from the same pass.
    Returns the per-batch metric dicts (batch_id included) —
    checkpoint + deterministic overwrite give exactly-once end to end.
    """
    from .incremental import write_with_audit

    audits: list[dict] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        m = write_with_audit(
            batch_df, target_dir, partition_col, count_nulls=count_nulls
        )
        audits.append({"batch_id": int(batch_id), **m})

    q = (
        out.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    return audits


def score_histogram(df: DataFrame, score_col: str) -> list[int]:
    """10-bucket histogram of a [0,1] score (bucket = floor(s*10),
    clamped to [0, 9]) — the static reference side of the drift gate.
    Distributed agg; only the 10 bucket counts reach the driver.

    NULL scores are EXCLUDED (a missing score is not evidence about
    the distribution) and out-of-range scores clamp to the edge
    buckets — without both guards a NULL-scored batch silently
    inflated bucket 9 (least() skips NULL, and Python negative
    indexing wrote bucket -1 into hist[9]), corrupting the PSI."""
    b = (
        F.least(F.greatest(F.floor(F.col(score_col) * 10), F.lit(0)), F.lit(9))
        .cast("int")
        .alias("b")
    )
    rows = (
        df.filter(F.col(score_col).isNotNull()).groupBy(b).count().collect()
    )
    hist = [0] * 10
    for r in rows:
        hist[r["b"]] = r["count"]
    return hist


def _psi(ref_hist: list[int], batch_hist: list[int]) -> float:
    """Population Stability Index with add-one smoothing — the same
    formula as the batch monitor (plans/llm.doc_quality_drift)."""
    import math

    n_a, n_b = sum(ref_hist) + 10.0, sum(batch_hist) + 10.0
    psi = 0.0
    for a, b in zip(ref_hist, batch_hist):
        p, q = (a + 1.0) / n_a, (b + 1.0) / n_b
        psi += (p - q) * math.log(p / q)
    return psi


def drift_gated_ingest(
    out: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    partition_col: str,
    score_col: str,
    ref_hist: list[int],
    *,
    threshold: float = 0.25,
    quarantine_dir: str | None = None,
) -> list[dict]:
    """Streaming INGESTION GATE (the streaming form of
    `doc_quality_drift`): each micro-batch's score distribution is
    compared to the reference histogram by PSI; batches under the
    threshold upsert into the target, batches over it are diverted
    whole to the quarantine dir (or dropped if none) for human
    review instead of silently polluting the corpus. Returns
    per-batch verdicts. The PSI needs only the batch's 10 bucket
    counts (one distributed agg per batch), so the gate adds no
    per-row Python and no extra shuffle beyond the count."""
    from .incremental import write_partition_overwrite

    verdicts: list[dict] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            psi = _psi(ref_hist, score_histogram(batch_df, score_col))
            ok = psi < threshold
            if ok:
                write_partition_overwrite(batch_df, target_dir, partition_col)
            elif quarantine_dir is not None:
                write_partition_overwrite(batch_df, quarantine_dir, partition_col)
            verdicts.append(
                {"batch_id": int(batch_id), "psi": round(psi, 6), "ingested": ok}
            )
        finally:
            batch_df.unpersist()

    q = (
        out.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    return verdicts


def quality_gated_ingest(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    partition_col: str,
    *,
    rejects_dir: str | None = None,
    min_prob: float = 0.5,
) -> list[dict]:
    """Streaming ROW-LEVEL quality gate (the streaming form of
    `doc_quality_classifier`, complementing the BATCH-level PSI gate
    `drift_gated_ingest`): the hashed-feature classifier columns ride
    the stream as pure expressions (zero extra shuffle, zero Python),
    and each micro-batch routes keep rows into the target and the
    rest — including docs with no tokens (NULL prob) — to the rejects
    dir (or drops them if none). The standard corpus-intake shape:
    score in the scan, split at the sink, keep the rejects for
    review. Returns per-batch {kept, rejected} counts.

    Routing is always self-consistent with the EMITTED columns: at
    the default min_prob=0.5 the gate is exactly the `clf_keep`
    column (so the split never contradicts what the batch member
    doc_quality_classifier writes at the rounding boundary); any
    other threshold cuts on the emitted 6dp `clf_prob`.

    Writes partition by (partition_col, ingest_batch): one logical
    partition routinely spans micro-batches here (row-level split +
    per-file batching), so a flat per-batch dynamic overwrite of
    partition_col would clobber earlier batches' accepted rows; the
    batch-scoped subpartition keeps replays idempotent (a re-run of
    batch N overwrites only its own subpartition) without losing
    cross-batch rows."""
    from ..plans.llm import CLF_STAGE_NAMES, clf_output_cols, clf_stage_cols
    from .incremental import clear_batch_partitions, write_with_audit

    scored = (
        stream.select("*", *clf_stage_cols())
        .select("*", *clf_output_cols())
        .drop(*CLF_STAGE_NAMES)
    )
    stats: dict[int, dict] = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if min_prob == 0.5:
                keep_pred = F.col("clf_keep")
            else:
                keep_pred = F.col("clf_prob") >= min_prob
            keep = batch_df.filter(keep_pred).withColumn(
                "ingest_batch", F.lit(int(batch_id))
            )
            rej = batch_df.filter(~F.coalesce(keep_pred, F.lit(False))).withColumn(
                "ingest_batch", F.lit(int(batch_id))
            )
            # clear this batch's prior subpartitions FIRST: dynamic
            # overwrite only replaces partitions present in the new
            # data, so a replay that now yields zero rows (or fewer
            # partition_col values) would otherwise leave the earlier
            # attempt's ingest_batch=N rows live (r8 ADVICE). Counts
            # then accumulate DURING each write via df.observe
            # (write_with_audit) — one scan per batch per sink, not
            # the count()-then-write double scan (r9 verdict #3); an
            # empty replay still clears, and its empty write is a
            # no-op dynamic overwrite.
            clear_batch_partitions(
                batch_df.sparkSession, target_dir, batch_id, nested=True
            )
            n_keep = write_with_audit(
                keep, target_dir, [partition_col, "ingest_batch"]
            )["rows"]
            if rejects_dir is not None:
                clear_batch_partitions(
                    batch_df.sparkSession, rejects_dir, batch_id, nested=True
                )
                n_rej = write_with_audit(
                    rej, rejects_dir, [partition_col, "ingest_batch"]
                )["rows"]
            else:
                # rejects are dropped, not written — a count over the
                # persisted batch is the only scan that side gets
                n_rej = rej.count()
            # keyed by batch_id: a micro-batch retried after a
            # transient sink failure re-enters here with the SAME
            # batch_id — the parquet writes are idempotent (batch-
            # scoped dynamic overwrite), so the stats must be too,
            # not double-count the replayed batch
            stats[int(batch_id)] = {
                "batch_id": int(batch_id),
                "kept": n_keep,
                "rejected": n_rej,
            }
        finally:
            batch_df.unpersist()

    q = (
        scored.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    return [stats[b] for b in sorted(stats)]


def corpus_prep_stream(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    *,
    rejects_dir: str | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> list[dict]:
    """The STREAMING twin of the batch flagship `corpus_prep_fused`:
    continuous corpus intake with exact dedup + quality gate + PII
    redaction in one micro-batch pipeline.

      1. exact-dup fingerprint (md5, the doc_exact_dedup signal) +
         classifier columns + PII redaction ride the stream as pure
         expressions — zero extra shuffle, zero Python;
      2. `dropDuplicatesWithinWatermark` on the fingerprint removes
         exact re-submissions within the watermark horizon (state
         bounded by the horizon — the streaming form of the batch
         keep-one-per-fp groupBy; WHICH duplicate survives follows
         arrival order, matching streaming semantics, where the batch
         form keeps min id);
      3. each micro-batch routes `clf_keep` rows to the target and
         the rest — including no-token docs (NULL keep) — to the
         rejects dir. ALL persisted rows (target AND rejects) carry
         the redacted `text` — rejects are kept for review, so PII
         must not survive there either; `fp` and the classifier
         columns are computed on the ORIGINAL text before redaction.

    Writes are batch-scoped dynamic partition overwrites
    (ingest_batch=N) preceded by a clear of that batch's prior
    subpartitions, so a replayed micro-batch replaces exactly its own
    slice even when the replay now produces zero keep (or reject)
    rows; per-batch stats are keyed by batch_id for the same reason.
    Returns the ordered per-batch {written, rejected} stats."""
    from ..plans.governance import redact_text
    from ..plans.llm import CLF_STAGE_NAMES, clf_output_cols, clf_stage_cols
    from ..functions.text import fingerprint_md5
    from .incremental import clear_batch_partitions, write_with_audit

    # the SAME chain the batch member applies (one home: governance)
    redacted = redact_text(F.col("text"))
    prepped = (
        stream.withColumn("fp", fingerprint_md5(F.col("text")))
        .select("*", *clf_stage_cols())
        .select("*", *clf_output_cols())
        .drop(*CLF_STAGE_NAMES)
        .withColumn("text", redacted)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    stats: dict[int, dict] = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            keep_pred = F.coalesce(F.col("clf_keep"), F.lit(False))
            keep = batch_df.filter(keep_pred).withColumn(
                "ingest_batch", F.lit(int(batch_id))
            )
            rej = batch_df.filter(~keep_pred).withColumn(
                "ingest_batch", F.lit(int(batch_id))
            )
            # clear-before-write keeps the replay contract exact even
            # when a replayed batch now produces zero keep (or reject)
            # rows — an empty frame has no partitions, so dynamic
            # overwrite alone would leave the prior attempt live.
            # Counts ride the writes via df.observe (write_with_audit):
            # one scan per batch per sink, not count()-then-write
            # (r9 verdict #3); the empty write is a no-op overwrite.
            clear_batch_partitions(batch_df.sparkSession, target_dir, batch_id)
            n_keep = write_with_audit(keep, target_dir, "ingest_batch")["rows"]
            if rejects_dir is not None:
                clear_batch_partitions(batch_df.sparkSession, rejects_dir, batch_id)
                n_rej = write_with_audit(rej, rejects_dir, "ingest_batch")["rows"]
            else:
                n_rej = rej.count()  # dropped, not written — count is the only scan
            stats[int(batch_id)] = {
                "batch_id": int(batch_id),
                "written": n_keep,
                "rejected": n_rej,
            }
        finally:
            batch_df.unpersist()

    q = (
        prepped.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    return [stats[b] for b in sorted(stats)]


def _horizon_micros(spec: str) -> int:
    """Parse a watermark-style interval ('90 minutes', '1 hour') to
    microseconds — the same unit the state table's ts comparisons use."""
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", spec)
    if not m:
        raise ValueError(f"unsupported horizon spec {spec!r}")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[m.group(2)]
    return int(m.group(1)) * mult * 1_000_000


def corpus_prep_near_dup_stream(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    *,
    rejects_dir: str | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    threshold: float = 0.5,
    n_hashes: int = 32,
    bands: int = 16,
    k: int = 3,
    track_dropped: bool = False,
) -> list[dict]:
    """corpus_prep_stream PLUS a streaming NEAR-dup stage (the half the
    r8 twin lacked): each micro-batch runs the SAME two-stage
    MinHash-LSH -> exact-Jaccard-verify pipeline the batch
    `lsh_verified_pairs` operator ships (identical default dials:
    32 hashes / 16 bands, r=2 — the measured-dominant point), against
    a horizon-bounded STATE TABLE of previously kept docs, so
    near-resubmissions are dropped across micro-batches.

    Per micro-batch (after the exact-dup stage has already dropped
    fingerprint-identical re-submissions in-stream):

      1. union the batch with the state table (docs kept within the
         watermark horizon), run `lsh_verified_pairs` on the union —
         band-bucket equi-join candidates, exact shingle Jaccard >=
         `threshold` verification, never corpus^2;
      2. resolve verified pairs transitively (`dup_clusters`); in each
         cluster, state docs always win (they were kept earlier); among
         batch docs the min doc_id wins — the batch keep-min-id rule,
         so a single-batch replay of the batch pipeline's input
         reproduces its kept set exactly (the parity test pins this);
      3. survivors route through the clf keep/reject split and the
         batch-scoped idempotent writes, exactly like
         corpus_prep_stream; near-dups are dropped (counted in stats
         as `near_dups`), not persisted;
      4. the state table is rewritten as (previous state + this
         batch's survivors) pruned to `watermark` before the
         PRE-batch state's max event time (the prune lags one batch
         so replays stay decision-identical; state is bounded by
         horizon + one batch span), via a recoverable
         state -> state.old / tmp -> state swap.

    Semantics notes (the documented streaming trades):
      - with the default `track_dropped=False`, state holds KEPT docs
        only, so transitive chains THROUGH a dropped doc are not
        followed across batches (batch processing of the same data in
        one pass would follow them); within one micro-batch chains
        resolve fully. tools/stress_stream_neardup.py measures the
        divergence bound on an adversarial all-chains corpus: the
        re-kept extras are exactly ceil(M/2)-1 per length-M chain
        whose members arrive in separate batches (50% of the
        should-drop set at the bound), and ZERO for the star shape
        (satellites of one kept head) that dominates real crawl dup
        structure.
      - `track_dropped=True` closes that gap: dropped docs are
        recorded in the state table too (flagged `__kept=false`), so
        a later doc matching ONLY a dropped doc still drops — chains
        extend one hop per batch, reproducing the batch kept-set on
        chain corpora (the stress tool asserts divergence 0). Cost:
        state holds every doc seen within the horizon instead of the
        kept subset — same horizon bound, larger constant; dropped
        rows never re-win (any state doc in a cluster outranks every
        batch doc, and state rows are never re-emitted). A state dir
        written in one mode is readable in the other (`__kept` is
        assumed true when absent, and dropped rows are filtered out
        when re-read with tracking off).
      - the state table stores the ORIGINAL text (shingles must be
        computed on pre-redaction text, like fp/clf): it is an
        internal, horizon-pruned working set, not a published output.
      - replay safety: the batch's own doc_ids are removed from the
        loaded state first, so a batch replayed after a mid-sink
        failure re-evaluates against the pre-batch state and makes
        the identical decisions.

    Returns ordered per-batch {written, rejected, near_dups} stats."""
    from ..operators.dedup import dup_clusters, lsh_verified_pairs
    from ..plans.governance import redact_text
    from ..plans.llm import CLF_STAGE_NAMES, clf_output_cols, clf_stage_cols
    from ..functions.text import fingerprint_md5
    from .incremental import (
        _hadoop_fs,
        clear_batch_partitions,
        write_with_audit,
    )

    horizon_us = _horizon_micros(watermark)
    redacted = redact_text(F.col("text"))
    prepped = (
        stream.withColumn("fp", fingerprint_md5(F.col("text")))
        .select("*", *clf_stage_cols())
        .select("*", *clf_output_cols())
        .drop(*CLF_STAGE_NAMES)
        .withColumn("__orig_text", F.col("text"))
        .withColumn("text", redacted)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    stats: dict[int, dict] = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        state = survivors = persisted_drop_ids = None
        try:
            batch_docs = batch_df.select(
                F.col("doc_id"),
                F.col(ts_col),
                F.col("__orig_text"),
            )
            fs, sp = _hadoop_fs(spark, state_dir)
            _, bak = _hadoop_fs(spark, state_dir.rstrip("/") + ".old")
            # crash recovery: if a previous attempt died between the
            # state->state.old rename and the tmp->state rename, the
            # state dir is missing but the backup holds the pre-swap
            # table — restore it instead of silently starting empty
            if not fs.exists(sp) and fs.exists(bak):
                if not fs.rename(bak, sp):
                    raise IOError(
                        f"near-dup state recovery failed: cannot rename "
                        f"{state_dir}.old back to {state_dir}"
                    )
            if fs.exists(sp):
                # replay safety: drop this batch's own ids from the
                # loaded state so a replayed batch re-decides against
                # the PRE-batch state instead of fighting its own
                # earlier attempt
                state = spark.read.parquet(state_dir).join(
                    batch_docs.select("doc_id"), "doc_id", "left_anti"
                )
            else:
                state = spark.createDataFrame(
                    [], schema=batch_docs.schema
                )
            # mode-normalize the state schema: tracking adds a __kept
            # flag; a kept-only state read with tracking on is all
            # kept, a tracked state read with tracking off keeps only
            # the kept rows (cross-mode state dirs stay readable)
            if track_dropped:
                if "__kept" not in state.columns:
                    state = state.withColumn("__kept", F.lit(True))
            elif "__kept" in state.columns:
                state = state.filter(F.col("__kept")).drop("__kept")
            state = state.persist()
            u = state.select(
                "doc_id", "__orig_text", F.lit(True).alias("__is_state")
            ).unionByName(
                batch_docs.select(
                    "doc_id", "__orig_text", F.lit(False).alias("__is_state")
                )
            )
            pairs = lsh_verified_pairs(
                u,
                threshold,
                n_hashes=n_hashes,
                bands=bands,
                k=k,
                id_col="doc_id",
                text_col="__orig_text",
            ).select("id_a", "id_b")
            clusters = dup_clusters(pairs)  # (id, cluster) — paired ids only
            cl = u.join(clusters, u["doc_id"] == clusters["id"], "left").select(
                u["doc_id"],
                "__is_state",
                F.coalesce("cluster", u["doc_id"]).alias("__cl"),
            )
            verdict = cl.groupBy("__cl").agg(
                F.max(F.col("__is_state")).alias("__has_state"),
                F.min(F.when(~F.col("__is_state"), F.col("doc_id"))).alias(
                    "__min_batch"
                ),
            )
            drop_ids = (
                cl.filter(~F.col("__is_state"))
                .join(verdict, "__cl")
                .filter(
                    F.col("__has_state")
                    | (F.col("doc_id") != F.col("__min_batch"))
                )
                .select("doc_id")
            )
            if track_dropped:
                # drop_ids feeds BOTH the survivor anti-join and the
                # dropped-rows state append — persist so the LSH +
                # cluster pipeline runs once per batch, not twice
                drop_ids = drop_ids.persist()
                persisted_drop_ids = drop_ids
            survivors = batch_df.join(drop_ids, "doc_id", "left_anti").persist()

            keep_pred = F.coalesce(F.col("clf_keep"), F.lit(False))
            out_cols = [c for c in survivors.columns if c != "__orig_text"]
            keep = (
                survivors.filter(keep_pred)
                .select(*out_cols)
                .withColumn("ingest_batch", F.lit(int(batch_id)))
            )
            rej = (
                survivors.filter(~keep_pred)
                .select(*out_cols)
                .withColumn("ingest_batch", F.lit(int(batch_id)))
            )
            # counts ride the writes via df.observe (write_with_audit):
            # one scan per batch per sink (r9 verdict #3); the clear
            # still runs before each write so empty replays stay exact
            clear_batch_partitions(spark, target_dir, batch_id)
            n_keep = write_with_audit(keep, target_dir, "ingest_batch")["rows"]
            if rejects_dir is not None:
                clear_batch_partitions(spark, rejects_dir, batch_id)
                n_rej = write_with_audit(rej, rejects_dir, "ingest_batch")["rows"]
            else:
                n_rej = rej.count()  # dropped, not written
            n_nd = batch_df.count() - n_keep - n_rej

            # state := (pre-batch state + this batch's survivors
            # [+ its near-dup drops, flagged, when tracking]),
            # horizon-pruned on the PRE-BATCH state's max event time:
            # pruning on the post-batch max could evict the very anchor
            # doc a drop decision used, so a replay after a successful
            # swap but failed checkpoint commit would decide
            # differently — anchoring on the pre-batch clock lags the
            # prune by exactly one batch (state bounded by horizon +
            # one batch span) and keeps replays decision-identical.
            # Distributed write to a tmp dir, then an FS-level swap —
            # overwriting state_dir directly would race the lazy read
            # of the same path, and collecting state through the
            # driver would not survive scale (state holds full text)
            survivor_rows = survivors.select("doc_id", ts_col, "__orig_text")
            if track_dropped:
                # near-dup drops enter the state flagged false so later
                # chain links through them are caught; clf rejects are
                # SURVIVORS of dedup (they stay kept anchors)
                dropped_rows = (
                    batch_docs.join(drop_ids, "doc_id", "left_semi")
                    .select("doc_id", ts_col, "__orig_text")
                )
                new_state = state.unionByName(
                    survivor_rows.withColumn("__kept", F.lit(True)).unionByName(
                        dropped_rows.withColumn("__kept", F.lit(False))
                    )
                )
            else:
                new_state = state.unionByName(survivor_rows)
            pre_max_ts = state.agg(
                F.max(F.unix_micros(F.col(ts_col)))
            ).collect()[0][0]  # ONE scalar — planner-side, not data
            if pre_max_ts is not None:
                new_state = new_state.filter(
                    F.unix_micros(F.col(ts_col)) >= pre_max_ts - horizon_us
                )
            tmp_dir = state_dir.rstrip("/") + ".tmp"
            new_state.write.mode("overwrite").parquet(tmp_dir)
            _, tp = _hadoop_fs(spark, tmp_dir)
            # recoverable swap: state -> state.old, tmp -> state, drop
            # state.old. A crash between the two renames leaves
            # state.old, which the NEXT attempt restores (above); a
            # failed rename raises instead of silently losing the table
            if fs.exists(bak):
                fs.delete(bak, True)
            if fs.exists(sp) and not fs.rename(sp, bak):
                raise IOError(f"near-dup state swap: cannot back up {state_dir}")
            if not fs.rename(tp, sp):
                raise IOError(f"near-dup state swap: cannot publish {tmp_dir}")
            if fs.exists(bak):
                fs.delete(bak, True)

            stats[int(batch_id)] = {
                "batch_id": int(batch_id),
                "written": n_keep,
                "rejected": n_rej,
                "near_dups": n_nd,
            }
        finally:
            # unpersist in ALL paths: a failing write would otherwise
            # leak two CacheManager entries (full doc text) per retry
            if persisted_drop_ids is not None:
                persisted_drop_ids.unpersist()
            if survivors is not None:
                survivors.unpersist()
            if state is not None:
                state.unpersist()
            batch_df.unpersist()

    q = (
        prepped.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    return [stats[b] for b in sorted(stats)]


def enrich_with_master_current(
    stream: DataFrame, master: DataFrame, keys: list[str], attrs: list[str]
) -> DataFrame:
    """Stream-static enrichment against the SCD2 master's CURRENT rows
    (the reference reads `is_current = true` for live lookups,
    00010:52): a left stream-static join, which Structured Streaming
    re-plans per micro-batch — so a master updated by `scd2_apply`
    between batches is picked up by the next batch without restarting
    the query. The master side is small by construction (one row per
    listed key) and broadcasts."""
    cur = master.filter(F.col("is_current")).select(*keys, *attrs)
    return stream.join(F.broadcast(cur), keys, "left")


def enrich_with_master_pit(
    stream: DataFrame,
    master: DataFrame,
    keys: list[str],
    ts_col: str,
    attrs: list[str],
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time stream enrichment: each event joins the master row
    whose validity window covers the EVENT time (P3 predicate —
    valid_from <= t AND (valid_to IS NULL OR valid_to > t)), not the
    row current at processing time. This is the streaming form of the
    as-of read: late-arriving events attribute to the master state
    that was true when they happened, so replays are deterministic.

    Stream-static left join on the key plus the validity range
    predicate; at most one master row matches per event (SCD2 windows
    are disjoint), so no fan-out. History depth only grows the static
    side, which stays broadcastable for realistic master sizes."""
    m = master.select(
        *[F.col(k).alias(f"__m_{k}") for k in keys],
        F.col(valid_from).alias("__m_from"),
        F.col(valid_to).alias("__m_to"),
        *[F.col(a) for a in attrs],
    )
    cond = None
    for k in keys:
        c = stream[k] == m[f"__m_{k}"]
        cond = c if cond is None else cond & c
    cond = cond & (m["__m_from"] <= stream[ts_col])
    cond = cond & (m["__m_to"].isNull() | (m["__m_to"] > stream[ts_col]))
    joined = stream.join(F.broadcast(m), cond, "left")
    return joined.drop(*[f"__m_{k}" for k in keys], "__m_from", "__m_to")


def attribution_join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM attribution join (the streaming twin of the batch
    as-of/span family): each purchase joins the same user's clicks
    within `horizon` before it.

    Both sides carry watermarks and the join condition bounds the two
    event times against each other, so Spark can expire join state —
    without the time bound a stream-stream join buffers both sides
    forever. Inner joins emit matches eagerly; the watermark governs
    state cleanup (and when outer-join NULLs could be emitted).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = F.expr(
        f"c_user = user_id AND click_ts >= purchase_ts - INTERVAL {horizon} "
        "AND click_ts <= purchase_ts"
    )
    return p.join(c, cond, "inner").select(
        "user_id", "purchase_id", "click_id", "purchase_ts", "click_ts", "purchase_value"
    )
