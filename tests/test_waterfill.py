"""Property test: water_fill_cap's closed form equals the reference's
iterative proportional-redistribution fixpoint (basket-valuation.ts:
279-318, incl. its unit-tested pathological cases)."""

from __future__ import annotations

import numpy as np
import pytest

from japanstockdatapipeline_spark.operators.waterfill import water_fill_cap


def iterative_water_fill(w: np.ndarray, cap: float, max_iter: int = 100) -> np.ndarray:
    """Brute-force fixpoint: cap violators, redistribute the excess
    proportionally over the uncapped, repeat."""
    f = w / w.sum()
    capped = np.zeros(len(w), dtype=bool)
    for _ in range(max_iter):
        over = (f > cap + 1e-15) & ~capped
        if not over.any():
            break
        capped |= over
        excess = 1.0 - capped.sum() * cap
        un = ~capped
        f[capped] = cap
        f[un] = w[un] / w[un].sum() * excess
    return f


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 42])
@pytest.mark.parametrize("cap", [0.2, 0.3, 0.5])
def test_closed_form_matches_iterative(spark, seed, cap):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 30))
    if n * cap <= 1.0:
        n = int(np.ceil(1.0 / cap)) + 3
    w = rng.uniform(0.1, 10.0, n)
    expected = iterative_water_fill(w.copy(), cap)

    rows = [(1, i, float(w[i])) for i in range(n)]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    out = water_fill_cap(df, ["g"], "w", cap, tiebreak="id")
    got = (
        out.orderBy("id").select("id", "capped_weight").toPandas()["capped_weight"].to_numpy()
    )
    assert got.sum() == pytest.approx(1.0, abs=1e-9)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_zero_weight_tail_rows(spark):
    """Review fix: rows after the normalized prefix sums to 1 (zero
    weights) made s_prev divide by zero — ANSI crash (Spark 4
    default) or silent over-allocation. They must come out 0 and the
    group must still sum to 1."""
    df = spark.createDataFrame(
        [(1, 1, 0.9), (1, 2, 0.1), (1, 3, 0.0), (1, 4, 0.0)], ["g", "id", "w"]
    )
    out = {
        r["id"]: r["capped_weight"]
        for r in water_fill_cap(df, ["g"], "w", 0.5, tiebreak="id").collect()
    }
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(0.5)
    assert out[3] == 0.0 and out[4] == 0.0
    assert sum(out.values()) == pytest.approx(1.0)


def test_no_cap_binding_is_identity(spark):
    df = spark.createDataFrame([(1, 1, 1.0), (1, 2, 1.0), (1, 3, 2.0), (1, 4, 1.0), (1, 5, 1.0)], ["g", "id", "w"])
    out = {r["id"]: r["capped_weight"] for r in water_fill_cap(df, ["g"], "w", 0.5, tiebreak="id").collect()}
    assert out[3] == pytest.approx(2.0 / 6.0)
    assert out[1] == pytest.approx(1.0 / 6.0)


def reference_water_fill(w: np.ndarray, cap: float) -> np.ndarray:
    """Straight port of the reference loop incl. the infeasible guard
    (basket-valuation.ts:280-318): pin violators, redistribute, and if
    everything ends up capped with sum != 1, normalize by cap ratio."""
    share = w / w.sum()
    capped: dict[int, float] = {}
    un = list(range(len(w)))
    for _ in range(len(w) + 1):
        capped_sum = sum(capped.values())
        remaining = 1.0 - capped_sum
        un_sum = sum(share[i] for i in un)
        if not un or un_sum <= 0 or remaining <= 0:
            break
        viol = [i for i in un if share[i] / un_sum * remaining > cap + 1e-12]
        if not viol:
            for i in un:
                capped[i] = share[i] / un_sum * remaining
            break
        for i in viol:
            capped[i] = cap
        un = [i for i in un if i not in viol]
    total = sum(capped.values())
    if total > 0 and abs(total - 1.0) > 1e-9:
        capped = {i: v / total for i, v in capped.items()}
    return np.array([capped[i] for i in range(len(w))])


@pytest.mark.parametrize("n,cap", [(2, 0.3), (5, 0.2), (4, 0.25), (10, 0.05)])
def test_infeasible_cap_matches_reference_guard(spark, n, cap):
    # cap * n <= 1: the reference pins everyone to cap then normalizes
    # by cap ratio -> uniform 1/n regardless of the raw shares
    rng = np.random.default_rng(n)
    w = rng.uniform(0.1, 10.0, n)
    expected = reference_water_fill(w.copy(), cap)
    np.testing.assert_allclose(expected, np.full(n, 1.0 / n), rtol=1e-9)

    rows = [(1, i, float(w[i])) for i in range(n)]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    out = water_fill_cap(df, ["g"], "w", cap, tiebreak="id")
    got = out.orderBy("id").toPandas()["capped_weight"].to_numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_mixed_feasible_infeasible_groups_single_pass(spark):
    rows = [(1, 1, 5.0), (1, 2, 1.0), (1, 3, 1.0), (1, 4, 1.0),  # feasible at 0.4
            (2, 1, 9.0), (2, 2, 1.0)]                            # infeasible: 2*0.4 < 1
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    out = {(r["g"], r["id"]): r["capped_weight"]
           for r in water_fill_cap(df, ["g"], "w", 0.4, tiebreak="id").collect()}
    assert out[(1, 1)] == pytest.approx(0.4)
    assert out[(1, 2)] == pytest.approx(0.2)
    assert out[(2, 1)] == pytest.approx(0.5)
    assert out[(2, 2)] == pytest.approx(0.5)


# ---- budget_fill (allocation dual; doc_mixture_plan kernel) ----


def iterative_budget_fill(c: np.ndarray, budget: float, max_iter: int = 1000) -> np.ndarray:
    """Brute-force fixpoint for the allocation direction: equal share
    of the remaining budget over unsaturated rows, saturate any row
    whose capacity falls below its share, repeat."""
    a = np.zeros(len(c), dtype=float)
    sat = np.zeros(len(c), dtype=bool)
    remaining = budget
    for _ in range(max_iter):
        un = ~sat
        if not un.any() or remaining <= 0:
            break
        lam = remaining / un.sum()
        newly = un & (c <= lam + 1e-15)
        if not newly.any():
            a[un] = lam
            break
        a[newly] = c[newly]
        sat |= newly
        remaining = budget - a[sat].sum()
    a[~sat] = np.maximum(a[~sat], 0.0)
    return a


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 42])
@pytest.mark.parametrize("frac", [0.1, 0.5, 0.9, 1.5])
def test_budget_fill_matches_iterative(spark, seed, frac):
    from japanstockdatapipeline_spark.operators.waterfill import budget_fill

    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 25))
    c = rng.uniform(1.0, 100.0, n)
    budget = float(frac * c.sum())
    expected = iterative_budget_fill(c.copy(), budget)

    rows = [(i, float(c[i]), budget) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "cap", "budget"])
    out = budget_fill(df, "cap", "budget", tiebreak="id")
    pdf = out.orderBy("id").select("id", "alloc", "saturated").toPandas()
    got = pdf["alloc"].to_numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)
    # conservation: allocates exactly min(budget, total capacity)
    assert got.sum() == pytest.approx(min(budget, c.sum()), rel=1e-9)
    # ceilings respected
    assert (got <= c + 1e-9).all()
    # saturated flag == allocation pinned at capacity
    np.testing.assert_array_equal(
        pdf["saturated"].to_numpy(), np.isclose(got, c, rtol=1e-12)
    )


def test_budget_fill_grouped(spark):
    """Groups solve independently in one pass."""
    from japanstockdatapipeline_spark.operators.waterfill import budget_fill

    rows = [
        ("a", 1, 10.0, 12.0),
        ("a", 2, 1.0, 12.0),   # saturates; surplus flows to id=1
        ("b", 1, 5.0, 100.0),  # budget exceeds capacity: everything saturates
        ("b", 2, 7.0, 100.0),
    ]
    df = spark.createDataFrame(rows, ["g", "id", "cap", "budget"])
    out = {
        (r["g"], r["id"]): (r["alloc"], r["saturated"])
        for r in budget_fill(df, "cap", "budget", group_cols=["g"], tiebreak="id").collect()
    }
    assert out[("a", 2)] == (1.0, True)
    assert out[("a", 1)][0] == pytest.approx(10.0)  # lam=11 capped at capacity 10
    assert out[("a", 1)][1] is True
    assert out[("b", 1)] == (5.0, True)
    assert out[("b", 2)] == (7.0, True)


def budget_fill_np(c: np.ndarray, budget: float) -> np.ndarray:
    """Numpy twin of operators/waterfill.budget_fill's closed form
    (ascending sort, running-AND saturated prefix, lambda fill) —
    hypothesis-fuzzed against the iterative fixpoint below; the Spark
    implementation is pinned to the same math by
    test_budget_fill_matches_iterative."""
    order = np.argsort(c, kind="stable")
    cs = c[order]
    n = len(cs)
    cum = np.cumsum(cs)
    cond = cs * (n - np.arange(n)) <= budget - (cum - cs)
    flag = np.logical_and.accumulate(cond)
    k = int(flag.sum())
    out_sorted = np.empty(n, dtype=float)
    out_sorted[:k] = cs[:k]
    if k < n:
        lam = max((budget - (cum[k - 1] if k else 0.0)) / (n - k), 0.0)
        out_sorted[k:] = lam
    out = np.empty(n, dtype=float)
    out[order] = out_sorted
    return out


from hypothesis import given, settings, strategies as st  # noqa: E402

_caps = st.lists(
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(_caps, st.floats(min_value=0.0, max_value=3.0))
def test_budget_fill_closed_form_fuzz(caps, frac):
    c = np.array(caps)
    budget = float(frac * c.sum())
    got = budget_fill_np(c, budget)
    expected = iterative_budget_fill(c.copy(), budget)
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)
    assert got.sum() == pytest.approx(min(budget, c.sum()), rel=1e-9, abs=1e-9)
    assert (got <= c + 1e-9).all()
    assert (got >= -1e-12).all()
