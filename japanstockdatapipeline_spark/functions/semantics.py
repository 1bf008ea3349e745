"""Pinned numeric semantics (SURVEY.md §4 "Decimal-vs-double discipline").

The reference computes in IEEE-754 double with JS-style half-up
rounding (reference: supabase/migrations/00116:32-35, 221-225) and
rejects exp(sum(ln)) for products on precision grounds (00093:24-37).
This module pins those choices as reusable column expressions so
every operator shares one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "round_half_up",
    "round6_ratio",
    "round6_ratio_sql",
    "round6_q",
    "round6_q_sql",
    "round6_pow100_ratio",
    "round6_pow100_ratio_sql",
    "product_of_list",
    "product_agg",
    "zscore",
    "safe_div",
    "clamp",
]


def round_half_up(col: Column, scale: int = 2) -> Column:
    """JS Math.round-style half-up rounding.

    Spark's ``round`` is HALF_UP (away from zero for the .5 case),
    matching the reference's floor(x*100+0.5)/100 emulation for
    positive values; we use the builtin, which stays JVM-side.
    """
    return F.round(col, scale)


def round6_ratio(num_sql: str, den_sql: str, wide: bool = False) -> Column:
    """EXACT half-up 6dp rounding of the rational num/den (SCALE.md
    rule 5, extended: any value feeding an equality-hashed output is
    rounded in integer arithmetic, never through a float round).

    Why: when the true value lands exactly on a .5e-6 boundary (easy
    for ratios of fixed-precision inputs — a hashed-classifier logit
    is (wsum-50n)/(1000n); a turnover ratio is a quotient of 2dp-price
    sums), the float is 1 ulp off the boundary and the ENGINES' round
    primitives then disagree even on bit-identical doubles: Spark
    rounds the shortest decimal repr (BigDecimal.valueOf), DuckDB
    scales by 1e6 in float and rounds that. Measured: the double just
    below 0.0350625 rounds to 0.035062 in Spark and 0.035063 in
    DuckDB. Integer arithmetic sidesteps both primitives:

        q = sign * ((2*|num|*1e6 + den) div (2*den)),  den > 0
        result = q / 1e6   (one exact int->double cast + one
                            correctly-rounded IEEE division -- bit-
                            identical in both engines)

    Takes SQL fragments (not Columns) because integral division is
    only reachable through the `div` operator; operands must be
    BIGINT-safe: |num| * 2e6 must fit int64 (fine for token counts /
    scaled yen values; overflow would need |num| > 4.6e12). For wider
    operands (products of 2dp factors, doc-stat cross terms at 100 TB
    doc sizes) pass wide=True: operands run in DECIMAL(38,0) on the
    Spark side and HUGEINT in the oracle — the final quotient always
    fits int64 (it is the 6dp-scaled output value), which is all
    Spark's decimal `div` requires.
    """
    return F.expr(round6_ratio_sql(num_sql, den_sql, div="div", wide=wide))


def round6_ratio_sql(
    num_sql: str, den_sql: str, div: str = "//", wide: bool = False
) -> str:
    """The DuckDB-oracle (and, with div='div', Spark) SQL form of
    round6_ratio. Positive operands only reach the integral division
    (sign handled by CASE), so truncating vs flooring `div` semantics
    never diverge. wide=True casts operands to DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) before scaling; note the cast wraps the fragment
    AS GIVEN, so a fragment that already overflows int64 internally
    must lead with its own widening cast."""
    return f"(CAST({round6_q_sql(num_sql, den_sql, div=div, wide=wide)} AS DOUBLE) / 1000000.0)"


def round6_q(num_sql: str, den_sql: str, wide: bool = False) -> Column:
    """The 6dp-scaled integer q = half-up(num*1e6/den) itself (BIGINT)
    — for chains that keep computing on the rounded value (e.g. the
    stochastic SMA3-of-rounded-%K), where the next stage's exact
    arithmetic needs the integer, not the q/1e6 double."""
    return F.expr(round6_q_sql(num_sql, den_sql, div="div", wide=wide))


def round6_q_sql(
    num_sql: str, den_sql: str, div: str = "//", wide: bool = False
) -> str:
    if wide:
        t = "DECIMAL(38,0)" if div == "div" else "HUGEINT"
        num_sql = f"CAST({num_sql} AS {t})"
        den_sql = f"CAST({den_sql} AS {t})"
    s = f"(({num_sql}) * 1000000)"
    d = f"({den_sql})"
    q_pos = f"((2 * {s} + {d}) {div} (2 * {d}))"
    q_neg = f"((2 * (-{s}) + {d}) {div} (2 * {d}))"
    return f"(CASE WHEN {s} >= 0 THEN {q_pos} ELSE -{q_neg} END)"


def round6_pow100_ratio(num_sql: str, n_sql: str) -> Column:
    """Spark form of round6_pow100_ratio_sql (div='div')."""
    return F.expr(round6_pow100_ratio_sql(num_sql, n_sql, div="div"))


def round6_pow100_ratio_sql(num_sql: str, n_sql: str, div: str = "//") -> str:
    """EXACT half-up 6dp of num / 100^n (num a NON-NEGATIVE integer
    fragment, n a small non-negative count) — the product-aggregate
    form of round6_ratio, used where num is a fold of hundred-scaled
    factors (products of 2dp (1-discount) terms).

    Why not round6_ratio(num, 100^n, wide=True): that form computes
    num*1e6 first, and both engines cap exact integers near 1e38
    (DECIMAL(38,0) / HUGEINT), so the *1e6 burns 6 digits of headroom
    and a 17-factor product already overflows (found at sf0.1: the
    fold hits 4.5e33, *1e6 = 4.5e39 > 1e38). Since 1e6 = 100^3,
    reduce the exponent instead of widening the numerator:

        n <= 3: q = num * 100^(3-n)          (exact -- a <=6dp
                                              rational needs no rounding)
        n >  3: q = (2*num + m) div (2*m),    m = 100^(n-3), half-up

    Width bound: 2*num must stay under ~1e38, i.e. num < 5e37 --
    18 full-value factors (the bound the product members document).
    Past it both engines fail LOUDLY (decimal/hugeint overflow),
    never silently wrong. 100^k is built as '1' || repeat('00', k)
    because double pow() is inexact past 1e15; repeat with a
    negative count is '' in both engines, so the unused CASE branch
    stays well-typed."""
    t = "DECIMAL(38,0)" if div == "div" else "HUGEINT"
    num = f"CAST(({num_sql}) AS {t})"
    n = f"({n_sql})"
    m_small = f"CAST('1' || repeat('00', 3 - {n}) AS {t})"
    m_big = f"CAST('1' || repeat('00', {n} - 3) AS {t})"
    q = (
        f"(CASE WHEN {n} <= 3 THEN {num} * {m_small} "
        f"ELSE (2 * {num} + {m_big}) {div} (2 * {m_big}) END)"
    )
    return f"(CAST({q} AS DOUBLE) / 1000000.0)"


def ordered_fold_sum(col: Column) -> Column:
    """Order-DETERMINISTIC double sum for use inside groupBy().agg():
    collect the group's values, sort ascending, left-fold add.

    Why (SCALE.md rule 5, extended to transcendental inputs): a plain
    sum()/avg() of doubles merges partial aggregates in partition
    order, so the float association — and hence the low bits of the
    result — depend on the shuffle layout AND differ from the DuckDB
    oracle's own order. For rational inputs the exact integer rails
    apply; for transcendental inputs (ln-scores: unigram NLL, DSIR
    log-ratios, tf-idf lex sums, PSI terms) exactness is impossible
    but DETERMINISM is not: sorting fixes one addition sequence that
    both engines reproduce bit-identically, so the only residual
    cross-engine exposure is the round(x, 6) primitive itself on a
    bit-identical double — the measure-zero zone the boundary canary
    bounds at 1e-9.

    Cost: collect_list per group (memory bounded by the group axis —
    tokens per document, buckets per histogram), sort O(g log g).
    Use for outputs that feed an equality-hashed 6dp round; plain
    sum() remains right for throughput-only paths."""
    return F.aggregate(
        F.sort_array(F.collect_list(col)), F.lit(0.0), lambda a, b: a + b
    )


def ordered_fold_sum_sql(expr: str) -> str:
    """The DuckDB-oracle twin of ordered_fold_sum: the identical
    ascending left-fold (list_reduce folds left with the first element
    as the seed, so prepend the 0.0 seed). NULL semantics pinned to
    Spark's collect_list: NULL inputs are SKIPPED (DuckDB list() keeps
    them — filter them out) and an empty/all-NULL group folds to 0.0
    (coalesce the NULL aggregate-over-nothing to [])."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_sort(coalesce(list({expr}) FILTER (WHERE ({expr}) IS NOT NULL), "
        f"[]))), (a, b) -> a + b)"
    )


def product_of_list(lst: Column) -> Column:
    """Exact sequential product of an array<double>.

    The reference defines a custom Postgres aggregate
    ``numeric_product`` instead of exp(sum(ln)) (00093:24-37);
    the Spark-native exact equivalent is a left fold over the
    collected values. Empty list => 1.0 (multiplicative identity).
    """
    return F.aggregate(lst, F.lit(1.0), lambda acc, x: acc * x)


def product_agg(col: Column) -> Column:
    """Product aggregate for use inside groupBy().agg(...).

    collect_list + fold: exact to double semantics. Fine for
    bounded group sizes (split factors per code: a handful of
    events). For huge groups prefer a two-phase tree product.
    """
    return product_of_list(F.collect_list(col))


def zscore(col: Column, mean: Column, stddev_pop: Column) -> Column:
    """Population z-score with the reference's sigma=0 -> 0 convention
    (factor-vectors.ts:191-260)."""
    return F.when(stddev_pop == 0, F.lit(0.0)).otherwise((col - mean) / stddev_pop)


def safe_div(num: Column, den: Column) -> Column:
    """NULL (not error / inf) when the denominator is NULL or <= 0 —
    the reference's harmonic-ratio guard (basket-valuation.ts:517-556)."""
    return F.when(den > 0, num / den)


def clamp(col: Column, lo: float, hi: float) -> Column:
    return F.greatest(F.least(col, F.lit(hi)), F.lit(lo))
