"""Hypothesis property tests for the pinned-semantics kernels — the
randomized layer the reference lacks (SURVEY §5 'no property-based
testing'), applied to the pieces where exactness claims are made."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from japanstockdatapipeline_spark.operators.smoothers import ema_np, rsi_np

series = st.lists(
    st.floats(min_value=1.0, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=0,
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(series, st.integers(min_value=2, max_value=30))
def test_ema_invariants(vals, n):
    v = np.array(vals)
    out = ema_np(v, n)
    assert len(out) == len(v)
    if len(v) < n:
        assert np.all(np.isnan(out))
        return
    assert np.all(np.isnan(out[: n - 1]))
    assert out[n - 1] == np.mean(v[:n])  # SMA seed, exact
    defined = out[n - 1 :]
    assert not np.any(np.isnan(defined))
    # EMA stays within the running [min, max] envelope of its inputs
    assert defined.min() >= v.min() - 1e-9
    assert defined.max() <= v.max() + 1e-9


@settings(max_examples=200, deadline=None)
@given(series)
def test_rsi_bounds_and_monotone_cases(vals):
    v = np.array(vals)
    out = rsi_np(v, 14)
    if len(v) <= 14:
        assert np.all(np.isnan(out))
        return
    w = out[14:]
    assert np.all((w >= 0.0) & (w <= 100.0))
    if np.all(np.diff(v) >= 0) and np.any(np.diff(v) > 0):
        assert math.isclose(w[-1], 100.0) or w[-1] > 50.0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(min_value=0.01, max_value=10.0), min_size=5, max_size=25),
    st.floats(min_value=0.15, max_value=0.5),
)
def test_waterfill_invariants_numpy(ws, cap):
    """Closed-form invariants on the pure recurrence (Spark path is
    covered in test_waterfill; here the math itself is fuzzed)."""
    from tests.test_waterfill import iterative_water_fill

    w = np.array(ws)
    if len(w) * cap <= 1.0:
        return
    f = iterative_water_fill(w.copy(), cap)
    assert math.isclose(f.sum(), 1.0, rel_tol=1e-9)
    assert np.all(f <= cap + 1e-9)
    # order preservation: bigger raw weight never gets a smaller share
    order = np.argsort(-w)
    fo = f[order]
    assert np.all(np.diff(fo) <= 1e-12)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["A", "B", "C", "D"]),
            st.sampled_from(["x", "y", "z"]),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_apply_matches_reference_simulation(spark, snapshots):
    """Applying any snapshot sequence matches the reference's
    row-at-a-time map simulation (equity-master.ts:469-530), and the
    partial-unique invariant (00010: one is_current per code) holds."""
    from japanstockdatapipeline_spark.operators.scd2 import scd2_apply

    master = spark.createDataFrame(
        [], "code string, name string, valid_from string, valid_to string, is_current boolean"
    )
    # reference simulation: history list + current map
    hist, cur = [], {}
    for i, snap in enumerate(snapshots):
        eff = f"d{i}"
        snap_df = spark.createDataFrame(
            [(k, v) for k, v in snap.items()] or [], "code string, name string"
        )
        master = scd2_apply(master, snap_df, ["code"], ["name"], eff)
        for code, rec in list(cur.items()):
            if code not in snap:  # delist
                hist.append((code, rec[0], rec[1], eff, False))
                del cur[code]
            elif snap[code] != rec[0]:  # change: close + reopen
                hist.append((code, rec[0], rec[1], eff, False))
                cur[code] = (snap[code], eff)
        for code, name in snap.items():
            if code not in cur:  # new or relisting
                cur[code] = (name, eff)
    expected = set(hist) | {
        (code, name, vfrom, None, True) for code, (name, vfrom) in cur.items()
    }
    got = {
        (r["code"], r["name"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in master.collect()
    }
    assert got == expected
    by_code = {}
    for code, _, _, _, is_cur in got:
        by_code[code] = by_code.get(code, 0) + (1 if is_cur else 0)
    assert all(v <= 1 for v in by_code.values())
