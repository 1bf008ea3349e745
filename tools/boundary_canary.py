"""Rounding-boundary canary (round-7 verdict #4).

The correctness gate hash-compares 6dp-rounded doubles, so any output
whose UNROUNDED value sits within ~1 ulp of a `.5e-6` half-way
boundary is one engine-association difference away from flipping its
last digit (the class that broke 7/149 oracle checks at sf0.1 in
round 7: classifier logit 0.0350625, turnover ratio 0.5093125,
stochastic slow_k 17.3828125). Exact-arithmetic outputs
(functions/semantics.round6_ratio) are immune by construction; this
tool quantifies the residual exposure of every output that still goes
through a float `F.round(x, 6)` — e.g. transcendental scores (sigmoid
probabilities, log-likelihoods) and order-insensitive double sums —
instead of waiting for the next flip.

How: monkeypatch `pyspark.sql.functions.round` so that every
`round(col, 6)` emits the DISTANCE of col*1e6 to its nearest half-way
boundary, encoded as `ENC - dist` with ENC = -424242.0 (dist in
[0, 0.5], so encoded values land in the sentinel band
[ENC-0.5, ENC]; ulp(424242) ~ 6e-11 keeps 1e-9 resolution, and no
genuine output value plausibly lands within 1e-9 of exactly ENC).
Every registered query + panel member is then run once and each
double column's sentinel-band values are aggregated: count, min
distance, and how many sit below the near-boundary thresholds.

Interpretation: `near_1e-9 > 0` means a 1-ulp cross-engine divergence
WOULD flip that output's hash — move it to exact arithmetic.
min_dist comfortably above 1e-9 means the column is safe at this
data scale. Columns never produced by round(_, 6) simply report no
sentinel values. Caveats: (a) a query that FEEDS a 6dp-rounded column
into later logic computes nonsense downstream of the patch — outputs
remain well-typed, and only the distances are read; (b) rounds issued
inside pandas UDFs don't pass through F.round and are not observed
(the recursive smoother family rounds Spark-side, so it is covered).

Usage: python tools/boundary_canary.py [round] [sf_dir]
Writes BOUNDARY_r{N}.json and prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENC = -424242.0
THRESHOLDS = (1e-9, 1e-12)


def install_round_probe() -> None:
    import pyspark.sql.functions as SF
    from pyspark.sql import Column

    orig = SF.round

    def probe(col, scale=0):
        s = scale.__int__() if not isinstance(scale, int) else scale
        if s != 6:
            return orig(col, scale)
        c = SF.col(col) if isinstance(col, str) else col
        if not isinstance(c, Column):
            return orig(col, scale)
        scaled = c * SF.lit(1000000.0)
        frac = scaled - SF.floor(scaled)
        return SF.lit(ENC) - SF.abs(frac - SF.lit(0.5))

    SF.round = probe


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    install_round_probe()

    from japanstockdatapipeline_spark.plans import all_members, all_queries
    from japanstockdatapipeline_spark.session import get_spark

    import pyspark.sql.functions as SF

    spark = get_spark("boundary-canary")
    # persist()-ing members leave CacheManager entries per sf_dir —
    # start clean (see tools/verify_local.py)
    spark.catalog.clearCache()
    targets = {**all_queries(), **all_members()}
    report: dict[str, dict] = {}
    worst = (0.5, None, None)  # (dist, query, column)

    for name, q in sorted(targets.items()):
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            dbl = [c for c, t in df.dtypes if t == "double"]
            if not dbl:
                report[name] = {"round6_cols": 0, "sec": round(time.time() - t0, 1)}
                continue
            aggs = []
            for c in dbl:
                v = SF.col(c)
                dist = SF.when((v <= ENC) & (v >= ENC - 0.5), SF.lit(ENC) - v)
                aggs.append(SF.count(dist).alias(f"n\x00{c}"))
                aggs.append(SF.min(dist).alias(f"min\x00{c}"))
                for th in THRESHOLDS:
                    aggs.append(
                        SF.sum((dist < th).cast("long")).alias(f"lt{th:g}\x00{c}")
                    )
            row = df.agg(*aggs).collect()[0].asDict()
            cols = {}
            for c in dbl:
                n = row[f"n\x00{c}"]
                if not n:
                    continue
                rec = {"n": n, "min_dist": row[f"min\x00{c}"]}
                for th in THRESHOLDS:
                    rec[f"near_lt_{th:g}"] = int(row[f"lt{th:g}\x00{c}"] or 0)
                cols[c] = rec
                if rec["min_dist"] is not None and rec["min_dist"] < worst[0]:
                    worst = (rec["min_dist"], name, c)
            report[name] = {
                "round6_cols": len(cols),
                "cols": cols,
                "sec": round(time.time() - t0, 1),
            }
        except Exception as e:  # diagnostic tool: record, keep going
            report[name] = {"error": str(e)[:300], "sec": round(time.time() - t0, 1)}

    n_near = sum(
        rec.get(f"near_lt_{THRESHOLDS[0]:g}", 0)
        for q in report.values()
        for rec in q.get("cols", {}).values()
    )
    n_vals = sum(
        rec.get("n", 0) for q in report.values() for rec in q.get("cols", {}).values()
    )
    errs = sorted(k for k, v in report.items() if "error" in v)
    summary = {
        "sf_dir": sf_dir,
        "queries": len(report),
        "round6_values": n_vals,
        f"near_boundary_lt_{THRESHOLDS[0]:g}": n_near,
        "worst": {"dist": worst[0], "query": worst[1], "col": worst[2]},
        "errors": errs,
    }
    out = {"summary": summary, "queries": report}
    path = os.path.join(REPO, f"BOUNDARY_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(summary))
    return 0 if not errs else 1


if __name__ == "__main__":
    raise SystemExit(main())
