"""Production-BPE trainer pricing at real K (r9 verdict #2).

Runs operators/bpe.bpe_train on the sf0.1 documents corpus at
K in {64, 256} merge rounds and prints one JSON line per measurement:

  - per-run total wall + mean wall/round (the K-scaling curve; the
    SCALE.md claim is near-linear in K because each round is one scan
    of the checkpointed encoded column + a Heaps-BOUNDED pair shuffle)
  - the pair-vocabulary cardinality probed every `VOCAB_EVERY` ranks
    (validating the Heaps-bounded-shuffle claim: the shuffle is the
    DISTINCT pair vocab, which grows sublinearly and must not track
    the token stream)
  - checkpoint-rotation cost: K=64 run with parquet rotation vs
    localCheckpoint at the same cadence (the durable-vs-resident
    crossover SCALE.md's recommendation cites), plus the mean wall of
    checkpointed vs plain rounds within each run
  - the fitted K-scaling exponent between the K=64 and K=256 parquet
    runs (1.0 = linear; >1 means per-round cost grows with rank —
    e.g. lineage accumulating because checkpoint_every is too large)

    python tools/stress_bpe.py [sf_dir]

Results fold into STRESS_r{N}.json via tools/stress_report.py.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import time

sys.path.insert(0, ".")

from tools.calibration import calibrate as _calibrate  # noqa: E402

from japanstockdatapipeline_spark.operators.bpe import bpe_train  # noqa: E402
from japanstockdatapipeline_spark.session import get_spark  # noqa: E402

CK_EVERY = 16
VOCAB_EVERY = 16
CK_DIR = "/tmp/stress_bpe_ck"


def run_train(spark, docs, k: int, mode: str) -> dict | None:
    """One priced training run; mode is 'parquet' or 'local'."""
    stats: list[dict] = []
    shutil.rmtree(CK_DIR, ignore_errors=True)
    t0 = time.time()
    try:
        merges = bpe_train(
            docs,
            k,
            checkpoint_every=CK_EVERY,
            checkpoint_dir=CK_DIR if mode == "parquet" else None,
            stats_out=stats,
            vocab_every=VOCAB_EVERY,
        )
    except Exception as e:  # a stress failure is a finding
        print(json.dumps({"op": f"bpe_train_k{k}_{mode}", "error": str(e)[:200]}))
        return None
    finally:
        shutil.rmtree(CK_DIR, ignore_errors=True)
    wall = round(time.time() - t0, 2)
    ck = [s["sec"] for s in stats if s["checkpointed"]]
    plain = [s["sec"] for s in stats if not s["checkpointed"]]
    vocab_curve = [
        {"rank": s["rank"], "pair_vocab": s["pair_vocab"]}
        for s in stats
        if s["pair_vocab"] is not None
    ]
    rec = {
        "op": f"bpe_train_k{k}_{mode}",
        "sec": wall,
        "k_merges": k,
        "rounds_learned": len(merges),
        "checkpoint_every": CK_EVERY,
        "sec_per_round": round(wall / max(len(merges), 1), 3),
        "mean_plain_round_sec": round(sum(plain) / max(len(plain), 1), 3),
        "mean_checkpoint_round_sec": round(sum(ck) / max(len(ck), 1), 3) if ck else None,
        "n_checkpoints": len(ck),
        "pair_vocab_curve": vocab_curve,
    }
    print(json.dumps(rec))
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-bpe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    print(json.dumps({"op": "corpus", "rows": n, "sf_dir": sf_dir}))
    print(json.dumps({"op": "calibration", "sec": _calibrate(spark)}))

    r64p = run_train(spark, docs, 64, "parquet")
    r64l = run_train(spark, docs, 64, "local")
    r256 = run_train(spark, docs, 256, "parquet")

    if r64p and r64l:
        print(
            json.dumps(
                {
                    "op": "bpe_checkpoint_rotation_overhead",
                    "parquet_sec": r64p["sec"],
                    "local_sec": r64l["sec"],
                    "parquet_minus_local_sec": round(r64p["sec"] - r64l["sec"], 2),
                    "n_checkpoints": r64p["n_checkpoints"],
                }
            )
        )
    if r64p and r256:
        exp = math.log(r256["sec"] / r64p["sec"]) / math.log(256 / 64)
        print(
            json.dumps(
                {
                    "op": "bpe_k_scaling",
                    "k64_sec": r64p["sec"],
                    "k256_sec": r256["sec"],
                    "fitted_exponent": round(exp, 3),
                    "note": "1.0 = linear in K (the SCALE.md claim)",
                }
            )
        )


if __name__ == "__main__":
    main()
