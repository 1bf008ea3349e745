"""r11 verdict #4 'Done' checker: two bench runs must agree per-query
within their emitted noise bounds.

    python tools/bench_agreement.py runA.json runB.json

For each query: |normA - normB| <= normMin * (boundA + boundB) where
norm is the LOCAL-calibration-normalized min wall and bound the
emitted noise_bound_rel — the same mechanical rule a future verdict
applies to call a regression real ("X regressed beyond noise iff
norm_new > norm_old * (1 + bound_old + bound_new)"). Prints one JSON
line: per-query agreement, violations, and the worst ratio."""

from __future__ import annotations

import json
import sys


def main() -> int:
    with open(sys.argv[1]) as f:
        a = json.loads([ln for ln in f if ln.strip().startswith("{")][-1])
    with open(sys.argv[2]) as f:
        b = json.loads([ln for ln in f if ln.strip().startswith("{")][-1])
    na, nb = a["queries_normalized"], b["queries_normalized"]
    ba, bb = a["noise_bound_rel"], b["noise_bound_rel"]
    rows, violations = {}, []
    for q in na:
        if q not in nb:
            continue
        lo = min(na[q], nb[q])
        delta = abs(na[q] - nb[q])
        budget = lo * (ba.get(q, 0) + bb.get(q, 0))
        ratio = round(delta / budget, 3) if budget else None
        ok = delta <= budget
        rows[q] = {
            "norm_a": na[q],
            "norm_b": nb[q],
            "delta": round(delta, 3),
            "budget": round(budget, 3),
            "ratio_of_budget": ratio,
            "ok": ok,
        }
        if not ok:
            violations.append(q)
    print(
        json.dumps(
            {
                "op": "bench_agreement",
                "n_queries": len(rows),
                "violations": violations,
                "worst_ratio_of_budget": max(
                    (r["ratio_of_budget"] for r in rows.values() if r["ratio_of_budget"] is not None),
                    default=None,
                ),
                "queries": rows,
            }
        )
    )
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
