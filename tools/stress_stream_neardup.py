"""Quantify the streaming near-dup semantic gap (r9 verdict #4).

streaming/jobs.corpus_prep_near_dup_stream documents one trade:
its state table holds KEPT docs only, so a transitive chain that
passes THROUGH a dropped doc is not followed across micro-batches
(batch processing of the same corpus in one pass follows it via
dup_clusters). This tool builds the ADVERSARIAL worst case for that
trade and measures the kept-set divergence stream-vs-batch:

  - CHAIN corpus: chains d0 ~ d1 ~ ... ~ d{M-1} where ADJACENT docs
    share Jaccard ~0.54 (>= the 0.5 threshold) but skip-one Jaccard
    ~0.25 (< threshold) — sliding-window token streams, one chain
    member per micro-batch, so every cross-batch link passes through
    the previous member. Batch processing keeps ONE doc per chain
    (the head, via connected components); the stream re-keeps every
    member whose predecessor was dropped (state holds kept docs
    only), i.e. members 2, 4, ... — the theoretical stream kept-set
    is ceil(M/2) per chain, a 50% divergence of the should-drop set.
    This is the BOUND, by construction; it is reached only when the
    dup structure is all length->=3 chains whose members arrive in
    strictly separate batches.
  - STAR corpus (control): per cluster, one head + S satellites that
    are each near-dups OF THE HEAD, satellites spread across LATER
    batches than the head. The head is always in state when a
    satellite arrives, so divergence must be ZERO — the shape that
    dominates real crawl duplication (re-submissions of one origin).

Both state modes are measured: the default kept-only state (the
divergence BOUND above) and `track_dropped=True` (dropped docs enter
the state flagged, so chains extend one hop per batch — divergence
must be ZERO, asserted). One JSON line per measurement; folded into
STRESS_r{N}.json by tools/stress_report.py, and the measured bound is
documented in SCALE.md.

    python tools/stress_stream_neardup.py [n_chains] [chain_len]
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from tools.calibration import calibrate as _calibrate  # noqa: E402

from japanstockdatapipeline_spark.operators.dedup import (  # noqa: E402
    dup_clusters,
    lsh_verified_pairs,
)
from japanstockdatapipeline_spark.session import get_spark  # noqa: E402
from japanstockdatapipeline_spark.streaming.jobs import (  # noqa: E402
    corpus_prep_near_dup_stream,
)

THRESHOLD = 0.5
# sliding-window geometry: doc text = tokens [m*STEP, m*STEP + L);
# k=3 shingles -> L-2 shingles/doc, adjacent overlap L-2-STEP:
# J_adj = (L-2-STEP)/(L-2+STEP) = 14/26 ~ 0.538 >= 0.5
# J_skip = (L-2-2*STEP)/(L-2+2*STEP) = 8/32 = 0.25 < 0.5
L, STEP = 22, 6
WORK = "/tmp/stress_stream_neardup"


def chain_text(chain: int, member: int) -> str:
    return " ".join(
        f"c{chain}t{j}" for j in range(member * STEP, member * STEP + L)
    )


def star_text(cluster: int, member: int) -> str:
    # satellites drop the first 2*member tokens of the head's text:
    # J(head, sat_m) = (L-2-2m)/(L-2) >= 0.8 for m <= 2 — well above
    # threshold, and satellites also pair with each other (any order)
    base = [f"s{cluster}t{j}" for j in range(L)]
    return " ".join(base[2 * member:])


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    # r11 verdict #5: the state-size constant must be priced on chain
    # AND star corpora SEPARATELY (the mixed run stays the divergence
    # measurement for continuity with r10)
    corpus = "mixed"
    for a in sys.argv[1:]:
        if a.startswith("--corpus="):
            corpus = a.split("=", 1)[1]
    assert corpus in ("mixed", "chain", "star"), corpus
    n_chains = int(args[0]) if args else 200
    chain_len = int(args[1]) if len(args) > 1 else 6
    n_stars, star_sats = n_chains, 3
    if corpus == "chain":
        n_stars = 0
    elif corpus == "star":
        n_chains = 0
    spark = get_spark("stress-stream-neardup")
    print(json.dumps({"op": "calibration", "sec": _calibrate(spark)}))

    shutil.rmtree(WORK, ignore_errors=True)
    import os

    src = f"{WORK}/src"
    os.makedirs(src)
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    import pandas as pd

    # batch b carries: chain member b of every chain, plus star
    # satellites (b-1) of every cluster (heads in batch 0)
    docs: dict[int, str] = {}
    for b in range(chain_len):
        ids, texts = [], []
        for c in range(n_chains):
            did = c * 100 + b
            ids.append(did)
            texts.append(chain_text(c, b))
        for s in range(n_stars):
            if b == 0:
                did = 1_000_000 + s * 100
                ids.append(did)
                texts.append(star_text(s, 0))
            elif b <= star_sats:
                did = 1_000_000 + s * 100 + b
                ids.append(did)
                texts.append(star_text(s, b))
        for i, t in zip(ids, texts):
            docs[i] = t
        pd.DataFrame(
            {"doc_id": ids, "text": texts, "ts": [t0 + dt.timedelta(minutes=b)] * len(ids)}
        ).astype({"ts": "datetime64[us]"}).to_parquet(f"{src}/b{b}.parquet")

    # batch comparator: identical operators and dials, one pass
    docs_df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    t_b = time.time()
    pairs = lsh_verified_pairs(docs_df, THRESHOLD).select("id_a", "id_b")
    dropped_batch = {
        r["id"] for r in dup_clusters(pairs).collect() if r["id"] != r["cluster"]
    }
    batch_sec = round(time.time() - t_b, 2)
    kept_batch = set(docs) - dropped_batch

    failures = 0
    for tag, track in (("", False), ("_tracked", True)):
        run = f"{WORK}/run{tag}"
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t_s = time.time()
        stats = corpus_prep_near_dup_stream(
            stream,
            f"{run}/gold",
            f"{run}/cp",
            f"{run}/state",
            rejects_dir=f"{run}/rej",
            threshold=THRESHOLD,
            track_dropped=track,
        )
        stream_sec = round(time.time() - t_s, 2)

        def read_ids(path):
            # a sink dir that only saw empty batch writes holds just
            # _SUCCESS markers (no schema) — the empty set
            import glob as _glob

            if not _glob.glob(f"{path}/**/*.parquet", recursive=True):
                return set()
            return {r["doc_id"] for r in spark.read.parquet(path).collect()}

        kept_stream = read_ids(f"{run}/gold") | read_ids(f"{run}/rej")

        # r11 verdict #5: the state-size constant — final state table
        # rows/bytes at the same horizon, per mode. Kept-only state is
        # the kept subset of the horizon; tracked state is EVERY doc in
        # the horizon (ratio = 1/(1-dup_rate) on a stationary stream).
        import glob as _glob

        state_files = _glob.glob(f"{run}/state/**/*.parquet", recursive=True)
        state_bytes = sum(os.path.getsize(f) for f in state_files)
        sdf = spark.read.parquet(f"{run}/state")
        state_rows = sdf.count()
        state_kept = (
            sdf.filter("__kept").count() if "__kept" in sdf.columns else state_rows
        )

        extra = kept_stream - kept_batch
        missing = kept_batch - kept_stream  # must be empty: never over-drop
        chain_extra = {d for d in extra if d < 1_000_000}
        star_extra = {d for d in extra if d >= 1_000_000}
        divergence = len(extra) / max(len(dropped_batch), 1)
        print(
            json.dumps(
                {
                    "op": f"near_dup_stream_divergence_{corpus}{tag}",
                    "corpus": corpus,
                    "track_dropped": track,
                    "sec": stream_sec,
                    "batch_sec": batch_sec,
                    "state_rows": state_rows,
                    "state_kept_rows": state_kept,
                    "state_bytes": state_bytes,
                    "n_docs": len(docs),
                    "n_batches": len(stats),
                    "n_chains": n_chains,
                    "chain_len": chain_len,
                    "kept_batch": len(kept_batch),
                    "kept_stream": len(kept_stream),
                    "stream_overdrops": len(missing),
                    "extra_kept_chain": len(chain_extra),
                    "extra_kept_star": len(star_extra),
                    "divergence_vs_should_drop": round(divergence, 4),
                    "theoretical_chain_bound": round(
                        (n_chains * (-(-chain_len // 2)) - n_chains)
                        / max(len(dropped_batch), 1),
                        4,
                    ),
                }
            )
        )
        # bugs, not the documented trade: over-drops in either mode,
        # star-control divergence, or ANY divergence when tracking
        if missing or star_extra or (track and extra):
            failures += 1
    shutil.rmtree(WORK, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
