"""Round-over-round stress regression artifact (round-5 verdict #8).

Runs the two scale-path stress harnesses at their canonical configs —
tools/stress_dedup.py at K=30 (150k docs) and tools/stress_ann.py at
K=10 (20k vectors) — and folds their per-op JSON lines into ONE
BENCH-adjacent artifact, STRESS_r{N}.json, so scale-path wall times
are compared round over round like the headline queries.

    python tools/stress_report.py 6          # writes STRESS_r06.json

Each op records {rows/result fields, sec} plus the prior round's
seconds (`baseline_sec`), so a regression is visible in the artifact
itself. Since round 7 each harness also emits a fixed-cost
`calibration` row (range(2e7).sum, median of 5 — same as bench.py):
divide op walls by the calibration ratio before calling a
round-over-round move a regression (the round-6 walls moved without
one and were unadjudicable — the verdict's measurement-debt item).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# Round-6 measured walls (STRESS_r06.json). Ops without a prior
# measurement carry no baseline. The r6 calibration baseline is the
# BENCH_r06 value (the stress artifact had none yet — that is the gap
# this round closes), so treat the calibration ratio as approximate
# for r6->r7 and exact from r7 on.
BASELINE_R06 = {
    "dedup": {
        "calibration": 0.151,
        "exact_dedup": 2.36,
        "simhash": 2.17,
        "minhash_lsh_pairs": 13.86,
        "ngram_jaccard_exact": 50.54,
        "ngram_jaccard_maxdf": 47.38,
        "dup_clusters_on_lsh": 28.44,
        "lsh_verified_pairs": 17.45,
    },
    "ann": {
        "calibration": 0.151,
        "brute_force_topk_matmul": 2.63,
        "lsh_bucketed_topk": 6.07,
        "ivf_topk": 2.16,
        "ivf_topk_kmeans_cells": 11.45,
        "lsh_near_dup_pairs_scaled": 21.21,
        "semdedup_k16": 49.22,
        "semdedup_k64": 19.1,
    },
}

DEDUP_K = 30
ANN_K = 10
ANN_FOCUS_K = 100  # 200k vectors — the 10x-the-10x IVFADC validation


def run_harness(cmd: list[str]) -> dict[str, dict]:
    print(f"# running: {' '.join(cmd)}", file=sys.stderr)
    proc = subprocess.run(cmd, capture_output=True, text=True, check=False)
    ops: dict[str, dict] = {}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        op = rec.pop("op", None)
        if op:
            ops[op] = rec
            print(f"#   {op}: {rec}", file=sys.stderr)
    if proc.returncode != 0:
        ops["_harness_error"] = {"rc": proc.returncode, "stderr": proc.stderr[-500:]}
    return ops


# the code paths the harnesses measure — round_check imports this to
# decide whether a reused artifact is stale vs HEAD
MEASURED_PATHS = (
    "japanstockdatapipeline_spark/operators/",
    "japanstockdatapipeline_spark/functions/",
    # r10: the stress suites also drive the fused doc plans and the
    # streaming near-dup sink — stale-check those paths too
    "japanstockdatapipeline_spark/plans/llm.py",
    "japanstockdatapipeline_spark/streaming/jobs.py",
    "tools/stress_",
    "tools/calibration.py",
)


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args) -> str:
    # cwd pinned to THIS repo: run from anywhere (including inside a
    # different git repo) and the stamp still records /root/repo's HEAD
    return subprocess.run(
        ["git", *args], capture_output=True, text=True, check=False, cwd=_REPO
    ).stdout.strip()


def dirty_measured_files() -> list[str]:
    """Currently-dirty files under the measured paths — ONE definition
    shared by the stamping side (git_state) and the checking side
    (round_check._stale_vs_artifact), so they cannot drift."""
    return [
        line.split()[-1]
        for line in _git("status", "--porcelain").splitlines()
        if line.strip()
        and any(line.split()[-1].startswith(p) for p in MEASURED_PATHS)
    ]


def git_state() -> dict:
    """The commit (and MEASURED-PATH dirty files) the measurement ran
    at — the round gate uses this to detect a stale artifact (r8
    verdict #6: ROUNDCHECK_r08 reused a mid-round artifact with no way
    to tell whether HEAD had since touched the measured paths). The
    dirty list is restricted to measured paths: the round gate itself
    writes ROUNDCHECK/BOUNDARY artifacts mid-run, and a whole-tree
    flag would mark every gate-produced artifact dirty."""
    return {
        "commit": _git("rev-parse", "HEAD") or None,
        "dirty_measured": dirty_measured_files(),
    }


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    out_path = f"STRESS_r{rnd:02d}.json"
    report = {
        "round": rnd,
        "configs": {
            "dedup_k": DEDUP_K,
            "ann_k": ANN_K,
            "ann_focus_k": ANN_FOCUS_K,
            "sf_dir": "/root/testdata/sf0.1",
        },
        "measured_at": git_state(),
        "suites": {},
    }
    for suite, cmd in (
        ("dedup", [sys.executable, "tools/stress_dedup.py", str(DEDUP_K)]),
        ("ann", [sys.executable, "tools/stress_ann.py", str(ANN_K)]),
        # r10 additions: BPE trainer at real K, the streaming near-dup
        # divergence bound, and IVFADC at 200k vectors
        ("bpe", [sys.executable, "tools/stress_bpe.py"]),
        ("stream", [sys.executable, "tools/stress_stream_neardup.py"]),
        ("ann200k", [sys.executable, "tools/stress_ann.py", str(ANN_FOCUS_K), "--focus-ivfadc"]),
        # r11 additions: state-size pricing per corpus shape (verdict
        # #5), the max_df crossover corpus (#6), dedup at 1.5M docs (#7)
        ("stream_chain", [sys.executable, "tools/stress_stream_neardup.py", "--corpus=chain"]),
        ("stream_star", [sys.executable, "tools/stress_stream_neardup.py", "--corpus=star"]),
        ("maxdf", [sys.executable, "tools/stress_dedup.py", "--focus-maxdf"]),
        ("dedup10x", [sys.executable, "tools/stress_dedup.py", "300", "--focus-dedup10x"]),
        # r11 verdict #2 follow-through: the probe-vs-brute CROSSOVER
        # point — at 2M vectors the brute scan is compute-bound and
        # the probe's n_probe/k_coarse fraction shows up in wall clock.
        # r12: the grid is the CODE-BUDGET sweep (k_cells x m, sampled
        # training) + the disk-clustered probe
        ("ann2m", [sys.executable, "tools/stress_ann.py", "1000", "--focus-ivfadc"]),
        # r12 verdict #6: adversarial band-bucket stress on the
        # boilerplate corpus (uncapped n^2 curve, occupancy histogram,
        # max_bucket-capped walls flat to 1.5M docs)
        ("lshadv", [sys.executable, "tools/stress_dedup.py", "--focus-lshadv"]),
    ):
        ops = run_harness(cmd)
        for op, rec in ops.items():
            base = BASELINE_R06.get(suite, {}).get(op)
            if base is not None:
                rec["baseline_sec"] = base
        report["suites"][suite] = ops
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"artifact": out_path, "suites": {s: len(o) for s, o in report["suites"].items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
