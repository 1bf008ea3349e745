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


def test_no_cap_binding_is_identity(spark):
    df = spark.createDataFrame([(1, 1, 1.0), (1, 2, 1.0), (1, 3, 2.0), (1, 4, 1.0), (1, 5, 1.0)], ["g", "id", "w"])
    out = {r["id"]: r["capped_weight"] for r in water_fill_cap(df, ["g"], "w", 0.5, tiebreak="id").collect()}
    assert out[3] == pytest.approx(2.0 / 6.0)
    assert out[1] == pytest.approx(1.0 / 6.0)
