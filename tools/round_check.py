"""One-command round gate (round-7 verdict #6): runs every
verification surface and writes a single PASS/FAIL artifact, so a
round cannot silently skip a gate.

    python tools/round_check.py 7                 # full gate
    python tools/round_check.py 7 --skip-stress   # reuse STRESS_r07.json
    python tools/round_check.py 7 --skip-pytest   # when a full run just passed
    # --stress-artifact-wait=SECS: with --skip-stress, poll up to SECS
    # for STRESS_r{N}.json (a concurrently-running suite) before the
    # unchanged freshness checks — scheduling, not gate weakening

Gates (each recorded in ROUNDCHECK_r{N}.json):
  driver    — the driver contract on a VANILLA session (entry() rows,
              50 queries, 50 oracles; session-dependent bugs only show
              up without our tuned configs)
  oracle    — tools/verify_local.py at sf0.01 (every registered query
              AND every panel member vs its DuckDB oracle)
  oracle_sf01 — the SAME full suite at sf0.1 (the bench scale).
              Round-7 lesson: 7/149 checks passed at sf0.01 but
              failed at sf0.1 on rounding-boundary rows that only
              exist in the larger data — a gate that stops at the
              driver's scale certifies the wrong scale.
  canary    — tools/boundary_canary.py at sf0.01: every float-rounded
              6dp output's distance to its nearest .5e-6 half-way
              boundary; FAILS if any value sits within 1e-9 (a 1-ulp
              cross-engine divergence would flip its hash) or if any
              query errors under the probe
  plans     — tools/explain_audit.py (physical-plan shape assertions)
  pytest    — the unit/property suite
  stress    — runs tools/stress_report.py (ALWAYS re-executed by the
              full gate; --skip-stress instead reuses an existing
              STRESS_r{N}.json the caller vouches is current) and
              checks the artifact for harness/op errors

Exit 0 iff every gate passes.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # `python tools/round_check.py` puts tools/ first
    sys.path.insert(0, REPO)


def run(cmd: list[str], timeout: int = 3600) -> tuple[int, str]:
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO, check=False
    )
    return proc.returncode, proc.stdout + proc.stderr


def gate_driver() -> dict:
    code = (
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[4]').getOrCreate()\n"
        "import __spark_entry__ as E\n"
        "rows = E.entry(spark).count()\n"
        "qs, osql = E.queries(), E.oracle_sql()\n"
        "print('DRIVER_CONTRACT', rows, len(qs), len(osql))\n"
    )
    rc, out = run([sys.executable, "-c", code])
    m = re.search(r"DRIVER_CONTRACT (\d+) (\d+) (\d+)", out)
    ok = rc == 0 and m is not None and int(m.group(2)) == 50 == int(m.group(3))
    return {
        "ok": ok,
        "detail": m.groups() if m else out[-300:],
    }


def gate_oracle(sf_dir: str, timeout: int = 3600) -> dict:
    rc, out = run([sys.executable, "tools/verify_local.py", sf_dir], timeout=timeout)
    m = re.search(r"(\d+) failures", out)
    n_pass = len(re.findall(r"^PASS ", out, re.MULTILINE))
    # name the failing queries in the artifact — a bare count forces a
    # full re-run just to find out WHAT failed (round-8 lesson)
    failed = re.findall(r"^FAIL  (\S+):", out, re.MULTILINE)
    ok = rc == 0 and m is not None and m.group(1) == "0"
    detail = m.group(0) if m else out[-300:]
    if failed:
        detail += f" [{', '.join(sorted(set(failed))[:12])}]"
    return {"ok": ok, "passes": n_pass, "detail": detail}


def gate_canary(rnd: int, sf_dir: str) -> dict:
    rc, out = run([sys.executable, "tools/boundary_canary.py", str(rnd), sf_dir])
    m = re.search(r'"near_boundary_lt_1e-09": (\d+)', out)
    ok = rc == 0 and m is not None and m.group(1) == "0"
    return {
        "ok": ok,
        "detail": (f"near-boundary values: {m.group(1)}" if m else out[-300:]),
    }


def gate_plans() -> dict:
    rc, out = run([sys.executable, "tools/explain_audit.py"])
    m = re.search(r"(\d+) plan-audit failures", out)
    ok = rc == 0 and m is not None and m.group(1) == "0"
    return {"ok": ok, "detail": m.group(0) if m else out[-300:]}


def gate_docs() -> dict:
    """README count validation (r9 verdict hygiene item: '413 pytest
    tests' had drifted to 415). Hard-coded pytest counts are gone from
    the README; the query/member counts it still states are checked
    here against the LIVE registry, so displayed counts derive from
    code, not memory."""
    code = (
        "from japanstockdatapipeline_spark.plans import all_queries, all_members\n"
        "print('REGISTRY', len(all_queries()), len(all_members()))\n"
    )
    rc, out = run([sys.executable, "-c", code])
    m = re.search(r"REGISTRY (\d+) (\d+)", out)
    if rc != 0 or m is None:
        return {"ok": False, "detail": f"registry probe failed: {out[-200:]}"}
    n_q, n_m = int(m.group(1)), int(m.group(2))
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    stale = []
    mq = re.search(r"(\d+) registered queries", readme)
    mm = re.search(r"(\d+) member queries", readme)
    if re.search(r"\d+\s*\npytest tests|\d+ pytest tests", readme):
        stale.append("hand-maintained pytest count present")
    # a MISSING phrase is a failure too: rewording the README would
    # otherwise skip the count check silently — the drift class this
    # gate exists to catch (review finding r10)
    if mq is None:
        stale.append("README lost the 'N registered queries' phrase")
    elif int(mq.group(1)) != n_q:
        stale.append(f"README says {mq.group(1)} queries, registry has {n_q}")
    if mm is None:
        stale.append("README lost the 'N member queries' phrase")
    elif int(mm.group(1)) != n_m:
        stale.append(f"README says {mm.group(1)} members, registry has {n_m}")
    # COVERAGE.md got the same treatment in r11 (verdict hygiene #9):
    # its check-count preamble is derived-or-fail, not hand-maintained
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        coverage = f.read()
    mc = re.search(
        r"(\d+) checks total:\s*\n?(\d+) registered queries \+ (\d+) member queries",
        coverage,
    )
    if mc is None:
        stale.append("COVERAGE.md lost the 'N checks total' phrase")
    elif (int(mc.group(1)), int(mc.group(2)), int(mc.group(3))) != (
        n_q + n_m,
        n_q,
        n_m,
    ):
        stale.append(
            f"COVERAGE.md says {mc.group(1)}={mc.group(2)}+{mc.group(3)},"
            f" registry has {n_q + n_m}={n_q}+{n_m}"
        )
    return {
        "ok": not stale,
        "queries": n_q,
        "members": n_m,
        "detail": stale or f"README+COVERAGE counts match registry ({n_q} queries, {n_m} members)",
    }


def gate_pytest() -> dict:
    rc, out = run([sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"])
    m = re.search(r"(\d+) passed", out)
    failed = re.search(r"(\d+) failed", out)
    ok = rc == 0 and m is not None and failed is None
    return {
        "ok": ok,
        "detail": (m.group(0) if m else "") + (f", {failed.group(0)}" if failed else ""),
    }


# the code paths the stress harnesses measure: a reused artifact is
# STALE iff HEAD has touched any of these since the artifact's commit
# (one definition — the stamping side owns it)
from tools.stress_report import MEASURED_PATHS as STRESS_MEASURED_PATHS  # noqa: E402


def _stale_vs_artifact(rep: dict) -> list[str]:
    """Files in the measured paths changed between the artifact's commit
    and HEAD (plus any currently-dirty ones). Empty list = fresh.
    FAILS CLOSED on every unverifiable case: no commit stamp, a stamp
    git cannot diff against (foreign/GC'd commit), a failing status
    probe, or an artifact that was itself measured with dirty files in
    the measured paths (those edits exist at no commit, so no diff can
    ever clear them)."""
    from tools.stress_report import dirty_measured_files

    state = rep.get("measured_at") or {}
    commit = state.get("commit")
    if not commit:
        return ["<artifact has no measured_at.commit stamp>"]
    stale: list[str] = [
        f"<measured with dirty file: {f}>"
        for f in state.get("dirty_measured") or []
    ]
    rc, out = run(["git", "diff", "--name-only", commit, "HEAD"])
    if rc != 0:
        return stale + [f"<git diff vs {commit[:12]} failed: {out[-120:].strip()}>"]
    changed = [
        f for f in out.split()
        if any(f.startswith(p) for p in STRESS_MEASURED_PATHS)
    ]
    return sorted({*stale, *changed, *dirty_measured_files()})


def gate_stress(rnd: int, skip: bool, wait_secs: int = 0) -> dict:
    path = os.path.join(REPO, f"STRESS_r{rnd:02d}.json")
    ran = False
    if skip:
        # explicit reuse of an artifact the caller vouches is current —
        # but the gate verifies the vouch: the artifact carries the
        # commit it measured, and reuse FAILS if HEAD has since touched
        # any measured path (r8 verdict #6).
        # --stress-artifact-wait=SECS (r13): the stress suite (~2h) may
        # be running CONCURRENTLY with this gate sequence; poll for the
        # artifact instead of failing fast. Scheduling only — the
        # existence, commit-stamp freshness, and dirty-file checks
        # below are unchanged.
        deadline = time.time() + wait_secs
        while not os.path.exists(path) and time.time() < deadline:
            time.sleep(30)
        if not os.path.exists(path):
            return {"ok": False, "detail": "--skip-stress but artifact missing"}
        with open(path) as f:
            rep_probe = json.load(f)
        stale = _stale_vs_artifact(rep_probe)
        if stale:
            return {
                "ok": False,
                "ran_suite": False,
                "detail": f"reused artifact STALE — measured paths changed since "
                f"{(rep_probe.get('measured_at') or {}).get('commit', '?')[:12]}: "
                f"{', '.join(stale[:8])}",
            }
    else:
        # the full gate MUST execute the stress suite — silently
        # reusing a pre-edit artifact is exactly the skipped-gate
        # failure this tool exists to prevent. The suite outgrew the
        # default 1h subprocess cap in r12 (2M-vector ann2m + 1.5M-doc
        # dedup10x/lshadv ≈ 2h total); give it 4h so a slow rig cannot
        # turn a green suite into a timed-out FAIL.
        rc, out = run(
            [sys.executable, "tools/stress_report.py", str(rnd)],
            timeout=14400,
        )
        ran = True
        if rc != 0 or not os.path.exists(path):
            return {"ok": False, "detail": out[-300:]}
    with open(path) as f:
        rep = json.load(f)
    errs = [
        f"{suite}/{op}"
        for suite, ops in rep.get("suites", {}).items()
        for op, rec in ops.items()
        if "error" in rec or op == "_harness_error"
    ]
    n_ops = sum(len(o) for o in rep.get("suites", {}).values())
    return {
        "ok": not errs,
        "ops": n_ops,
        "ran_suite": ran,
        "commit": (rep.get("measured_at") or {}).get("commit"),
        "detail": (errs or "no op errors")
        if ran
        else (errs or "no op errors (reused artifact verified fresh vs its commit)"),
    }


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    skip_stress = "--skip-stress" in sys.argv
    skip_pytest = "--skip-pytest" in sys.argv
    stress_wait = next(
        (
            int(a.split("=", 1)[1])
            for a in sys.argv
            if a.startswith("--stress-artifact-wait=")
        ),
        0,
    )
    sf_dir = "/root/testdata/sf0.01"
    sf_dir_big = "/root/testdata/sf0.1"

    gates: dict[str, dict] = {}
    for name, fn in (
        ("driver", gate_driver),
        ("oracle", lambda: gate_oracle(sf_dir)),
        ("oracle_sf01", lambda: gate_oracle(sf_dir_big, timeout=7200)),
        ("canary", lambda: gate_canary(rnd, sf_dir)),
        ("plans", gate_plans),
        ("docs", gate_docs),
        ("pytest", (lambda: {"ok": True, "detail": "skipped (--skip-pytest)"})
         if skip_pytest else gate_pytest),
        ("stress", lambda: gate_stress(rnd, skip_stress, stress_wait)),
    ):
        t0 = time.time()
        try:
            rec = fn()
        except Exception as e:  # a crashing gate is a failing gate
            rec = {"ok": False, "detail": f"gate crashed: {e}"[:300]}
        rec["sec"] = round(time.time() - t0, 1)
        gates[name] = rec
        print(f"{'PASS' if rec['ok'] else 'FAIL'}  {name}: {rec.get('detail')} "
              f"({rec['sec']}s)", file=sys.stderr)

    overall = all(g["ok"] for g in gates.values())
    artifact = os.path.join(REPO, f"ROUNDCHECK_r{rnd:02d}.json")
    with open(artifact, "w") as f:
        json.dump(
            {"round": rnd, "overall": "PASS" if overall else "FAIL", "gates": gates},
            f, indent=1, sort_keys=True, default=str,
        )
        f.write("\n")
    print(json.dumps({"artifact": os.path.basename(artifact),
                      "overall": "PASS" if overall else "FAIL",
                      "gates": {k: v["ok"] for k, v in gates.items()}}))
    return 0 if overall else 1


if __name__ == "__main__":
    raise SystemExit(main())
