"""Exact 6dp rounding rails (SCALE.md rule 5 extended, round 8).

Pins the integer-arithmetic rounding helpers against Fraction ground
truth, and the stochastic %K boundary case the sf0.01 canary caught
(a raw %K rational landing EXACTLY on a round(x, 6) half-way
boundary, where engine float-round primitives disagree).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from japanstockdatapipeline_spark.functions.semantics import (
    round6_q_sql,
    round6_ratio_sql,
)


def _half_up6(fr: Fraction) -> float:
    scaled = fr * 10**6
    num, den = scaled.numerator, scaled.denominator
    q = (2 * abs(num) + den) // (2 * den) * (1 if num >= 0 else -1)
    return q / 1e6


def test_round6_ratio_matches_fraction_ground_truth(spark):
    """Random-ish rationals (fixed seed), including exact .5e-6
    boundary hits, negatives, and wide operands: the SQL form equals
    exact HALF-UP rounding of the rational, in BOTH engines."""
    import random

    import duckdb

    rng = random.Random(20260815)
    cases = [(rng.randint(-10**6, 10**6), rng.randint(1, 10**4)) for _ in range(60)]
    # engineered exact-boundary hits: num/den * 1e6 ends in .5
    cases += [(1, 512), (3, 512), (1122, 32000), (-1, 512), (5, 2_000_000)]
    for num, den in cases:
        want = _half_up6(Fraction(num, den))
        # BIGINT casts mirror the call sites (staged integer columns);
        # a bare int literal is INT32 in Spark and *1e6 would overflow
        ns, ds = f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)"
        got_spark = spark.sql(
            f"SELECT {round6_ratio_sql(ns, ds, div='div')} AS v"
        ).first()["v"]
        got_duck = duckdb.sql(
            f"SELECT {round6_ratio_sql(ns, ds)} AS v"
        ).fetchone()[0]
        assert got_spark == want, (num, den, got_spark, want)
        assert got_duck == want, (num, den, got_duck, want)
    # wide path (DECIMAL(38,0)/HUGEINT): a product-scale numerator
    num, den = 95**13, 100**13
    want = _half_up6(Fraction(num, den))
    got_spark = spark.sql(
        f"SELECT {round6_ratio_sql(str(num), str(den), div='div', wide=True)} AS v"
    ).first()["v"]
    got_duck = duckdb.sql(
        f"SELECT {round6_ratio_sql(str(num), str(den), wide=True)} AS v"
    ).fetchone()[0]
    assert got_spark == want and got_duck == want


def test_stochastic_raw_k_exact_at_half_boundary(spark):
    """raw %K = 100*(v-ll)/(hh-ll) over exact cents: with hh-ll = 512
    cents and v-ll = 1 cent, the exact value 100/512 = 0.1953125
    lands exactly on the 6dp half-way boundary -> must emit the exact
    half-up 0.195313 (a float round of the nearest double is engine-
    dependent here). Also locks the SMA3-of-rounded chain: slow_k of
    three equal raw %K values equals that raw value."""
    from japanstockdatapipeline_spark.plans.technical import event_stochastic

    # one user, 16 events: the 105.12 high sits at row 2 so it stays
    # inside the trailing 14-row window for rows 13..15; the last
    # three rows sit at 100.01 -> raw_k exactly 100/512 on each
    rows = []
    for i in range(13):
        v = 105.12 if i == 2 else 100.00
        rows.append((i, 1, i * 1_000_000, "click", v))
    for i in range(13, 16):
        rows.append((i, 1, i * 1_000_000, "click", 100.01))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us").write.parquet(
            f"{d}/events.parquet"
        )
        out = {r["event_id"]: r for r in event_stochastic(spark, d).collect()}
    expected = _half_up6(Fraction(100, 512))
    assert out[13]["raw_k"] == expected
    assert out[14]["raw_k"] == expected
    assert out[15]["raw_k"] == expected
    # hh stays 105.12 through row 13 (14-row window incl. row 0)
    assert out[15]["slow_k"] == expected  # SMA3 of three equal rounded values


def test_round6_pow100_ratio_matches_fraction_ground_truth(spark):
    """The product-aggregate rounding form (num / 100^n): exact
    half-up at every factor count up to the documented 18-factor
    bound — INCLUDING n=17, where the old num*1e6 widening overflowed
    the engines' ~1e38 integer ceiling (found at sf0.1: a 17-line
    order crashed order_discount_product with Decimal(38,0)
    overflow) — plus exact .5e-6 boundary hits and the n<=3 exact
    branch."""
    import duckdb

    from japanstockdatapipeline_spark.functions.semantics import (
        round6_pow100_ratio_sql,
    )

    cases = []
    # full-value and near-full-value products at every n up to the bound
    for n in range(0, 19):
        for base in (100, 97, 95):
            cases.append((base**n, n))
    # engineered boundary hits: prod/100^n * 1e6 ends in exactly .5
    # (e.g. 125/100^4 = 1.25e-6 -> q boundary 1.5 -> half-up 2)
    cases += [(125, 4), (375, 4), (5 * 100**5 // 10, 5)]
    for num, n in cases:
        want = _half_up6(Fraction(num, 100**n))
        sql_s = round6_pow100_ratio_sql(str(num), str(n), div="div")
        sql_d = round6_pow100_ratio_sql(str(num), str(n))
        got_spark = spark.sql(f"SELECT {sql_s} AS v").first()["v"]
        got_duck = duckdb.sql(f"SELECT {sql_d} AS v").fetchone()[0]
        assert got_spark == want, (num, n, got_spark, want)
        assert got_duck == want, (num, n, got_duck, want)


def test_ordered_fold_sum_is_partition_layout_invariant(spark):
    """The ordered fold yields bit-identical sums under different
    partition layouts (a plain sum() does not guarantee this), and
    matches DuckDB's identical list_sort + seeded list_reduce."""
    import duckdb

    from japanstockdatapipeline_spark.functions.semantics import (
        ordered_fold_sum,
        ordered_fold_sum_sql,
    )

    import random

    rng = random.Random(7)
    vals = [rng.uniform(-1, 1) * 10 ** rng.randint(-6, 6) for _ in range(2000)]
    rows = [(i % 7, v) for i, v in enumerate(vals)]

    sums = {}
    for nparts in (1, 4, 32):
        df = spark.createDataFrame(rows, "k int, x double").repartition(nparts)
        got = {
            r["k"]: r["s"]
            for r in df.groupBy("k").agg(ordered_fold_sum(F.col("x")).alias("s")).collect()
        }
        sums[nparts] = got
    assert sums[1] == sums[4] == sums[32]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = {
        k: s
        for k, s in con.execute(
            f"SELECT k, {ordered_fold_sum_sql('x')} AS s FROM t GROUP BY k"
        ).fetchall()
    }
    assert oracle == sums[1]
