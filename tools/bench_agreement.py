"""r11 verdict #4 'Done' checker: two bench runs must agree per-query
within their emitted noise bounds.

    python tools/bench_agreement.py runA.json runB.json [diagA.json diagB.json]

r13 (verdict item 3): adjudication must cover the "+x" noop-execution
entries, not just the 13 historical count-action entries — a real-
execution regression can hide behind a flat count wall otherwise. The
headline line stays under the driver's 2,000-char tail capture, so the
"+x" normalized walls and noise bounds live in the bench_diag.json
side file: pass the two diag files as args 3 and 4 and all 20 entries
are adjudicated with the same mechanical rule.

For each query: |normA - normB| <= normMin * (boundA + boundB +
LOAD_SENSITIVITY * rho_gap) where norm is the LOCAL-calibration-
normalized min wall, bound the emitted noise_bound_rel, and rho_gap
the relative gap between the two runs' SUITE calibrations — the same
mechanical rule a future verdict applies to call a regression real
("X regressed beyond noise iff norm_new > norm_old * (1 + bound_old
+ bound_new [+ load term])"). Prints one JSON line: per-query
agreement, violations, and the worst ratio.

The LOAD term (r12 item 3): normalized walls are load-comparable only
to the extent a query tracks the pure-CPU calibration probe. The r12
cross-load experiment (10 nice'd busy cores vs a quiet rig, sf0.1)
measured suite calibrations 0.191 vs 0.599 while the per-block
quick_cal medians stayed ~equal (0.118 vs 0.121 — min-of-2 dodges
steady nice'd load that queries with serial/driver phases cannot
dodge), inflating short-query normalized walls by up to ~40% at
rho_gap ~ 2.1 — a cal-tracking factor of ~0.19. LOAD_SENSITIVITY =
0.25 covers it with margin; at equal load (rho_gap ~ 0) the term
vanishes, so same-rig round-over-round adjudication is unaffected."""

from __future__ import annotations

import json
import sys

LOAD_SENSITIVITY = 0.25


def _load(path: str) -> dict:
    """A bench artifact: either a one-JSON-line capture (possibly with
    leading log lines) or a whole-file JSON document (bench_diag.json
    is indent-pretty-printed)."""
    with open(path) as f:
        txt = f.read()
    try:
        return json.loads(txt)
    except ValueError:
        return json.loads(
            [ln for ln in txt.splitlines() if ln.strip().startswith("{")][-1]
        )


def main() -> int:
    a = _load(sys.argv[1])
    b = _load(sys.argv[2])
    na, nb = dict(a["queries_normalized"]), dict(b["queries_normalized"])
    ba, bb = dict(a["noise_bound_rel"]), dict(b["noise_bound_rel"])
    if len(sys.argv) > 4:
        # diag side files carry the "+x" noop-execution entries the
        # compact headline cannot (r13 item 3) — union them in
        da, db = _load(sys.argv[3]), _load(sys.argv[4])
        na.update(da["queries_normalized"])
        nb.update(db["queries_normalized"])
        ba.update(da["noise_bound_rel"])
        bb.update(db["noise_bound_rel"])
    cal_a, cal_b = a.get("calibration"), b.get("calibration")
    rho_gap = (
        abs(cal_a - cal_b) / min(cal_a, cal_b)
        if cal_a and cal_b
        else 0.0
    )
    rows, violations = {}, []
    for q in na:
        if q not in nb:
            continue
        lo = min(na[q], nb[q])
        delta = abs(na[q] - nb[q])
        budget = lo * (
            ba.get(q, 0) + bb.get(q, 0) + LOAD_SENSITIVITY * rho_gap
        )
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
                "rho_gap": round(rho_gap, 3),
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
