"""Water-filling weight cap (A5, basket-valuation.ts:279-318).

The reference iteratively redistributes capped index weights
proportionally to the uncapped members until no violation (<=N
iterations). That fixpoint has a closed form: sort weights desc,
find the capped prefix k* (the fixpoint's capped set is always a
prefix of the sorted order), then

    f_i = cap                 for i <= k*
    f_i = w_i * s(k*)         otherwise,  s(k) = (1 - k*cap) / (1 - cum_k)

where cum_k is the cumulative weight of the capped prefix. Row i is
capped iff w_i * s(i-1) >= cap, and the condition is monotone down
the sorted order, so k* = length of the running-AND prefix.

Closed form == iterative fixpoint (property-tested in
tests/test_waterfill.py against a brute-force iterative solver).
Expressed entirely with windows: one shuffle per group key, no
driver loop — unlike the reference, this scales to any number of
groups at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["water_fill_cap", "budget_fill"]


def water_fill_cap(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    cap: float,
    *,
    tiebreak: str,
    out_col: str = "capped_weight",
) -> DataFrame:
    """Normalize `weight_col` within each group, then cap at `cap` with
    proportional redistribution (water-filling fixpoint).

    Infeasible groups (cap * group_size <= 1) follow the reference's
    guard (basket-valuation.ts:312-317 + its pathological test): every
    member pins to the cap, then the sum < 1 is re-normalized by cap
    ratio — with a uniform cap that is exactly 1/n per member. The
    closed form below branches on feasibility, so mixed feasible/
    infeasible groups are handled in the same single-shuffle pass.
    `tiebreak` makes the desc sort total, so results are deterministic.
    """
    wsum = Window.partitionBy(*group_cols)
    norm = df.withColumn("__w", F.col(weight_col) / F.sum(weight_col).over(wsum))
    worder = Window.partitionBy(*group_cols).orderBy(
        F.col("__w").desc(), F.col(tiebreak).asc()
    )
    run = worder.rowsBetween(Window.unboundedPreceding, 0)
    o = (
        norm.withColumn("__i", F.row_number().over(worder))
        .withColumn("__cum", F.sum("__w").over(run))
    )
    # s(i-1) = (1 - (i-1)*cap) / (1 - cum_{i-1});  cum_{i-1} = cum_i - w_i
    # Zero-weight tail guard: once the normalized prefix sums to 1,
    # every remaining row has weight 0 and can never be capped — and
    # the denominator is 0, so the raw division dies under ANSI mode
    # (Spark 4 default) and mis-caps under non-ANSI. Branch before
    # dividing (CaseWhen evaluates only the taken branch).
    denom_prev = 1 - (F.col("__cum") - F.col("__w"))
    s_prev = (1 - (F.col("__i") - 1) * F.lit(cap)) / denom_prev
    cond = (
        F.when(denom_prev > 0, F.col("__w") * s_prev >= F.lit(cap))
        .otherwise(F.lit(False))
        .cast("int")
    )
    o = o.withColumn("__flag", F.min(cond).over(run))  # running AND down the prefix
    grp = Window.partitionBy(*group_cols)
    k_star = F.max(F.when(F.col("__flag") == 1, F.col("__i"))).over(grp)
    cum_k = F.max(F.when(F.col("__flag") == 1, F.col("__cum"))).over(grp)
    # same guard for the redistribution scale: cum_k = 1 means zero
    # weight remains outside the capped prefix, so the scale is moot
    # (the only consumers are zero-weight rows) — pin it to 0
    s_k = (
        F.when(k_star.isNull(), F.lit(1.0))
        .when(F.lit(1.0) - cum_k <= 0, F.lit(0.0))
        .otherwise((1 - k_star * F.lit(cap)) / (1 - cum_k))
    )
    out = F.when(F.col("__flag") == 1, F.lit(cap)).otherwise(F.col("__w") * s_k)
    # infeasible guard: cap*n <= 1 -> all pinned to cap, normalized by
    # cap ratio (uniform cap => 1/n each), matching the reference
    n = F.count(F.lit(1)).over(grp)
    out = F.when(n * F.lit(cap) <= 1.0, 1.0 / n).otherwise(out)
    return o.withColumn(out_col, out).drop("__w", "__i", "__cum", "__flag")


def budget_fill(
    df: DataFrame,
    capacity_col: str,
    budget_col: str,
    *,
    group_cols: list[str] | None = None,
    tiebreak: str,
    out_col: str = "alloc",
    flag_col: str = "saturated",
) -> DataFrame:
    """Water-filling in the allocation direction: split a global
    budget (`budget_col`, same value on every row of a group) across
    rows with per-row capacity ceilings, equal shares with surplus
    redistribution — a_i = min(c_i, lam), lam chosen so sum(a) =
    min(budget, sum(c)).

    Dual of `water_fill_cap` (same fixpoint argument): processed in
    ASCENDING capacity order, the saturated set is always a prefix —
    row i saturates iff c_i * (n - i + 1) <= B - cum_{i-1}, and the
    condition is monotone down the sorted order, so the prefix length
    is a running AND, all expressible with windows. One shuffle per
    group, no iteration (the iterative equal-share/redistribute loop
    is the property-test reference, tests/test_waterfill.py).

    Used by the training-data mixture planner (`doc_mixture_plan`):
    capacities = per-source token counts, budget = target corpus
    tokens; the allocation is how many tokens to sample per source
    and `alloc/capacity` the per-source sampling rate.

    With empty `group_cols` the windows run unpartitioned — safe
    ONLY because every caller feeds a bounded constituent axis
    (sources/nations after aggregation, never fact grain); the
    explain-audit global window sweep (tools/explain_audit.py
    BOUNDED_AXIS_GLOBAL_WINDOWS) pins that claim per registered
    query, so an unbounded caller fails the gate.
    """
    grp_cols = list(group_cols or [])
    worder = (
        Window.partitionBy(*grp_cols).orderBy(
            F.col(capacity_col).asc(), F.col(tiebreak).asc()
        )
        if grp_cols
        else Window.orderBy(F.col(capacity_col).asc(), F.col(tiebreak).asc())
    )
    run = worder.rowsBetween(Window.unboundedPreceding, 0)
    grp = Window.partitionBy(*grp_cols) if grp_cols else Window.partitionBy()
    b = F.col(budget_col).cast("double")
    c = F.col(capacity_col).cast("double")
    o = (
        df.withColumn("__i", F.row_number().over(worder))
        .withColumn("__cum", F.sum(c).over(run))
        .withColumn("__n", F.count(F.lit(1)).over(grp))
    )
    # row i saturates iff c_i * (remaining rows) <= remaining budget
    cond = (c * (F.col("__n") - F.col("__i") + 1) <= b - (F.col("__cum") - c)).cast("int")
    o = o.withColumn("__flag", F.min(cond).over(run))  # running AND prefix
    k_star = F.max(F.when(F.col("__flag") == 1, F.col("__i"))).over(grp)
    cum_k = F.max(F.when(F.col("__flag") == 1, F.col("__cum"))).over(grp)
    # lam = remaining budget / unsaturated count (prefix proof => lam < c_i there)
    lam = (b - F.coalesce(cum_k, F.lit(0.0))) / (
        F.col("__n") - F.coalesce(k_star, F.lit(0))
    )
    alloc = F.when(F.col("__flag") == 1, c).otherwise(F.greatest(lam, F.lit(0.0)))
    return (
        o.withColumn(out_col, alloc)
        .withColumn(flag_col, F.col("__flag") == 1)
        .drop("__i", "__cum", "__n", "__flag")
    )
