"""As-of (point-in-time) join and validity-span range join.

Reference semantics: basket-valuation.ts:239-267 (pitFy/pitForwardEps
"latest disclosure with disclosed_date <= t") and
00116_create_bottomup_per_bands_rpc.sql:146-195 (eff_from/eff_to
spans via lead(), prices range-joined into spans).

Scale design: the naive formulation is a non-equi join (left.ts >=
right.ts) which Spark executes as a broadcast-nested-loop — O(n*m),
dead at 100 TB. Both operators here use the *union-merge* form
instead: tag both sides, union, sort within key, propagate with
last(ignorenulls) — exactly ONE shuffle on the join key, no
non-equi join, and the sort is per-key local. This is the same
trick a sort-merge as-of join (pandas.merge_asof, QuestDB ASOF
JOIN) uses, expressed declaratively so Catalyst/AQE keep
optimizing around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "build_validity_spans", "span_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    value_cols: list[str],
    *,
    tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest `value_cols` from `right`
    with right.ts <= left.ts (or < when strict), per `on` key.

    Single-shuffle union-merge implementation (see module docstring).
    `tiebreak` orders simultaneous rows deterministically.
    """
    lcols = left.columns
    tag = "__is_left"
    rsel = on + [ts] + ([tiebreak] if tiebreak and tiebreak not in on + [ts] else [])
    r = right.select(*rsel, *[F.col(c).alias(f"__v_{c}") for c in value_cols]).withColumn(
        tag, F.lit(0)
    )
    l = left.withColumn(tag, F.lit(1))
    for c in value_cols:
        l = l.withColumn(f"__v_{c}", F.lit(None).cast(r.schema[f"__v_{c}"].dataType))
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before simultaneous left rows unless strict:
    # strict => left first at equal ts so it cannot see same-ts right values
    order = [F.col(ts).asc(), F.col(tag).asc() if not strict else F.col(tag).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(f"__last_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col(tag) == 1).select(
        *lcols, *[F.col(f"__last_{c}").alias(c) for c in value_cols]
    )
    return out


def build_validity_spans(
    df: DataFrame, key_cols: list[str], ts: str, *, tiebreak: str | None = None
) -> DataFrame:
    """[eff_from, eff_to) spans per key via lead() — reference 00116:146-153.
    eff_to is NULL for the open (latest) span."""
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return df.withColumn("eff_from", F.col(ts)).withColumn("eff_to", F.lead(ts).over(w))


def span_join(
    facts: DataFrame, spans: DataFrame, on: list[str], fact_ts: str
) -> DataFrame:
    """Join facts into half-open validity spans:
    fact_ts >= eff_from AND (eff_to IS NULL OR fact_ts < eff_to).

    Equi-keys keep this a hash/sort-merge join; the range predicate
    is applied post-join. With AQE + a range-join-ready layout
    (spans are small per key) this stays shuffle-bounded.
    """
    sp = spans
    for k in on:
        sp = sp.withColumnRenamed(k, f"__s_{k}")
    cond = None
    for k in on:
        c = facts[k] == sp[f"__s_{k}"]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (facts[fact_ts] >= sp["eff_from"])
        & (sp["eff_to"].isNull() | (facts[fact_ts] < sp["eff_to"]))
    )
    return facts.join(sp, cond).drop(*[f"__s_{k}" for k in on])
