"""Core relational query plans over the TPC-H-ish testdata.

Each query maps operators from SURVEY.md §2 (citations inline) onto
the driver tables and carries a DuckDB oracle. Conventions shared
with the oracles:
  - every computed double is round(x, N) on BOTH sides (sums of
    2-dp money at N=2; ratios at N=6)
  - counts cast to bigint on both sides (DuckDB sum(int) is HUGEINT)
  - timestamps exported as epoch micros (unix_micros / epoch_us)
  - dates exported as 'yyyy-MM-dd' strings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import semantics as _SEM
from ..functions.semantics import zscore
from ..operators.windows import top_n_per_key
from ..sources import load_table
from .registry import member, query


@query(
    "pricing_summary",
    doc="A1 grouped conditional aggregates (00108:41-52); flagship scan+agg. "
    "TPC-H Q1 shape: one scan, map-side partial agg, 6-group final agg.",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@member(
    "revenue_by_nation",
    doc="J1 equi joins to broadcast dimensions (00049:82-84): "
    "lineitem ⋈ supplier ⋈ nation ⋈ region, revenue per nation. "
    "All three dims broadcast; single shuffle for the final agg.",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
    bench=True,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "top_orders_per_customer",
    doc="J9/T3 lateral top-N-per-key as a rank window (00042:17-25).",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    top = top_n_per_key(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
        rank_col="rk",
    )
    return top.withColumn("rk", F.col("rk").cast("int"))


@member(
    "customers_without_orders",
    doc="J10/J11 anti-join (catch-up missing days / delisting detection, "
    "catch-up.ts:86-117, equity-master.ts:523-530). Demoted from the "
    "driver registry to a customer_feature_panel member in round 8 to "
    "free a slot for corpus_prep_fused (the flagship): the anti-join "
    "coverage stays driver-hashed via the panel full-outer join.",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no recent (2001+) orders — non-empty at every sf."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@member(
    "acctbal_nation_scores",
    doc="W2/W3/W8 sector-relative scoring (00049:87-105): percent_rank, "
    "population z-score with sigma=0→0, population count — one window "
    "partition (nation) serves all three.",
    oracle="""
    SELECT c_custkey, c_nationkey,
           round(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal), 6) AS bal_pct,
           round(CASE WHEN stddev_pop(c_acctbal) OVER (PARTITION BY c_nationkey) = 0 THEN 0.0
                 ELSE (c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                      / stddev_pop(c_acctbal) OVER (PARTITION BY c_nationkey) END, 6) AS bal_z,
           count(*) OVER (PARTITION BY c_nationkey) AS nation_n
    FROM customer
    """,
)
def acctbal_nation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    wp = Window.partitionBy("c_nationkey")
    wo = wp.orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(wo), 6).alias("bal_pct"),
        F.round(
            zscore(
                F.col("c_acctbal"),
                F.avg("c_acctbal").over(wp),
                F.stddev_pop("c_acctbal").over(wp),
            ),
            6,
        ).alias("bal_z"),
        F.count(F.lit(1)).over(wp).alias("nation_n"),
    )


@member(
    "order_discount_product",
    doc="A2 exact product aggregate (numeric_product, 00093:24-37): "
    "per-order product of (1 - discount), exact fold — not exp(sum(ln)).",
    oracle="""
    SELECT l_orderkey, {RATIO} AS disc_factor, n_lines
    FROM (
      SELECT l_orderkey,
             list_reduce(list(CAST(round((1 - l_discount) * 100) AS HUGEINT)),
                         (a, b) -> a * b) AS iprod,
             count(*) AS n_lines
      FROM lineitem
      GROUP BY l_orderkey
    )
    """.replace(
        "{RATIO}", _SEM.round6_pow100_ratio_sql("iprod", "n_lines")
    ),
)
def order_discount_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # discounts are 2-dp: scale (1-d) to an exact integer in [0,100] so
    # the per-order product is EXACT and multiply-order-insensitive —
    # folded in DECIMAL(38,0) (a double product loses bits past 7
    # lines AND associates differently across engines). This is the
    # reference's "numeric_product, not exp(sum(ln))" rule (00093:24-37)
    # taken to its integer conclusion. The 6dp output rounds via
    # round6_pow100_ratio (exponent-reduced exact integer arithmetic —
    # the rational prod/100^n lands exactly on .5e-6 boundaries where
    # engine float rounds disagree, and the naive num*1e6 widening
    # overflowed the 1e38 ceiling at 17 lines, found at sf0.1).
    # Bound: n_lines <= 18 per order (testdata max 17 at sf0.1);
    # past it both engines fail loudly, never silently wrong.
    scaled = F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    agged = li.groupBy("l_orderkey").agg(
        F.aggregate(
            F.collect_list(scaled),
            F.lit(1).cast("decimal(38,0)"),
            lambda a, x: a * x,
        ).alias("__prod"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agged.select(
        "l_orderkey",
        _SEM.round6_pow100_ratio("__prod", "n_lines").alias("disc_factor"),
        "n_lines",
    )


@query(
    "brand_price_stats",
    doc="A3 exact median (sorted-array median, 00116:197-219) — "
    "percentile_approx is rejected; Spark `percentile` is exact.",
    oracle="""
    SELECT p_brand,
           round(quantile_cont(p_retailprice, 0.5), 6) AS median_price,
           round(min(p_retailprice), 2) AS min_price,
           round(max(p_retailprice), 2) AS max_price,
           count(*) AS n_parts
    FROM part
    GROUP BY p_brand
    HAVING count(*) >= 5
    """,
)
def brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.round(F.expr("percentile(p_retailprice, 0.5)"), 6).alias("median_price"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .filter(F.col("n_parts") >= 5)
    )


@query(
    "segment_weighted_price",
    doc="A4 harmonic weighted valuation (basket-valuation.ts:517-556): "
    "Σ(w·x)/Σ(w) over rows where both defined; denominator ≤ 0 → NULL.",
    oracle="""
    SELECT c_mktsegment AS segment,
           round(CASE WHEN sum(c_acctbal) > 0
                 THEN sum(c_acctbal * o_totalprice) / sum(c_acctbal) END, 6) AS weighted_price,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def segment_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.semantics import safe_div

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).filter(F.col("c_acctbal") > 0)
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(
                safe_div(
                    F.sum(F.col("c_acctbal") * F.col("o_totalprice")), F.sum("c_acctbal")
                ),
                6,
            ).alias("weighted_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@member(
    "status_pivot_per_customer",
    doc="J3 conditional-agg pivot (00108:41-52) — the reference's "
    ">120 s → 23.4 s rewrite: one scan, max(when) per bucket.",
    oracle="""
    SELECT o_custkey,
           round(max(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS max_f,
           round(max(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS max_o,
           round(max(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS max_p,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def status_pivot_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    def mx(st):
        return F.round(F.max(F.when(F.col("o_orderstatus") == st, F.col("o_totalprice"))), 2)

    return o.groupBy("o_custkey").agg(
        mx("F").alias("max_f"),
        mx("O").alias("max_o"),
        mx("P").alias("max_p"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@member(
    "order_price_delta",
    doc="J2→J4 rank-offset self-join re-expressed as lag() windows "
    "(00049:21-37 momentum; Spark-native form per SURVEY §2.3 J2).",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(o_totalprice - lag(o_totalprice) OVER w, 2) AS price_delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_price_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(prev, 2).alias("prev_price"),
        F.round(F.col("o_totalprice") - prev, 2).alias("price_delta"),
    )


@member(
    "order_date_dense_rank",
    doc="W4 dense_rank → numeric ordinal (fiscal-year-end rank, 00116:128-134).",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS date_rank
    FROM orders
    """,
)
def order_date_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return o.select(
        "o_orderkey", "o_custkey", F.dense_rank().over(w).cast("bigint").alias("date_rank")
    )


@member(
    "lineitem_suffix_product",
    doc="W6 window product with frame excluding current row — the split "
    "suffix-product (00093:50-71), exact fold not exp(sum(log)).",
    oracle="""
    SELECT l_orderkey, l_linenumber, {RATIO} AS suffix_factor
    FROM (
      SELECT l_orderkey, l_linenumber,
             coalesce(list_reduce(list(CAST(round((1 - l_discount) * 100) AS HUGEINT))
                                    OVER w, (a, b) -> a * b), 1) AS sprod,
             count(*) OVER w AS scnt
      FROM lineitem
      WINDOW w AS (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber DESC, l_discount DESC, l_partkey DESC,
                 l_suppkey DESC, l_quantity DESC, l_extendedprice DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      )
    )
    """.replace(
        "{RATIO}", _SEM.round6_pow100_ratio_sql("sprod", "scnt")
    ),
)
def lineitem_suffix_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the testdata — order
    # on a full tiebreak so the frame is deterministic, and compute the
    # product over exact scaled integers in DECIMAL(38,0) so it is
    # order-insensitive and exact at any frame length up to 18 factors
    # (a double product loses bits past 7); the 6dp output rounds via
    # round6_pow100_ratio (exponent-reduced exact integer arithmetic;
    # the naive num*1e6 widening overflows 1e38 one factor past the
    # sf0.1 maximum — see order_discount_product).
    w_desc = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").desc(),
        F.col("l_discount").desc(),
        F.col("l_partkey").desc(),
        F.col("l_suppkey").desc(),
        F.col("l_quantity").desc(),
        F.col("l_extendedprice").desc(),
    )
    scaled = F.round((1 - F.col("l_discount")) * 100, 0)
    frame = w_desc.rowsBetween(Window.unboundedPreceding, -1)
    lst = F.collect_list(scaled.cast("long")).over(frame)
    staged = li.select(
        "l_orderkey",
        "l_linenumber",
        F.aggregate(
            lst, F.lit(1).cast("decimal(38,0)"), lambda a, x: a * x
        ).alias("__sprod"),
        F.size(lst).alias("__scnt"),
    )
    return staged.select(
        "l_orderkey",
        "l_linenumber",
        _SEM.round6_pow100_ratio("__sprod", "__scnt").alias("suffix_factor"),
    )


@query(
    "table_freshness",
    doc="S13/U1 freshness union view (00012:7-51, 00010:140-182): "
    "per-table max timestamp + row count, UNION ALL.",
    oracle="""
    SELECT 'orders' AS table_name, epoch_us(max(o_orderdate)) AS max_ts_us, count(*) AS n_rows FROM orders
    UNION ALL
    SELECT 'lineitem', epoch_us(max(l_shipdate)), count(*) FROM lineitem
    UNION ALL
    SELECT 'events', epoch_us(max(ts)), count(*) FROM events
    """,
)
def table_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def fresh(df, name, ts_col):
        # timestampdiff is timezone-independent on TIMESTAMP_NTZ inputs,
        # matching DuckDB's naive epoch_us
        return df.agg(F.max(ts_col).alias("__mx"), F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("table_name"),
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', __mx)"
            ).cast("bigint").alias("max_ts_us"),
            "n_rows",
        )

    ev_fresh = ev.agg(
        F.lit("events").alias("table_name"),
        F.max("ts_us").alias("max_ts_us"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        fresh(o, "orders", "o_orderdate")
        .unionByName(fresh(li, "lineitem", "l_shipdate"))
        .unionByName(ev_fresh)
    )


@member(
    "distinct_order_dates",
    doc="U3 DISTINCT dates RPC (00012:56-86).",
    oracle="""
    SELECT DISTINCT strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM orders
    """,
)
def distinct_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")).distinct()


@query(
    "lineitem_cube_totals",
    doc="CUBE grouping sets (SURVEY §2.4 note: 'the Spark engine "
    "exposes them for free'): per (returnflag, linestatus) with all "
    "subtotal combinations; NULL marks the rolled-up dimension.",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def lineitem_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@member(
    "orders_status_native_pivot",
    doc="Native pivot (groupBy().pivot(), §2.10 UDTF family inverse): "
    "order counts per customer pivoted by status into columns.",
    oracle="""
    SELECT o_custkey,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS st_f,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS st_o,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS st_p
    FROM orders GROUP BY o_custkey
    """,
)
def orders_status_native_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_custkey")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_custkey",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("st_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("st_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("st_p"),
    )


@query(
    "shipping_priority_topk",
    doc="Multi-way join + grouped top-k (TPC-H Q3 shape; exercises the "
    "screener read path of 00051 at fact scale): segment-filtered "
    "customers ⋈ open orders ⋈ late-shipped lineitems, revenue per "
    "order, deterministic top 10. Customer dim broadcast; one shuffle "
    "(orderkey agg); filters pushed to both fact scans.",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        o.join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@member(
    "local_supplier_volume",
    doc="Five-way join with a cross-table equality constraint (TPC-H Q5 "
    "shape): revenue where customer and supplier share a nation, one "
    "region, one order year. orders⋈customer co-shuffle on custkey, "
    "then fact join on orderkey; supplier/nation/region broadcast. "
    "The c_nationkey = s_nationkey predicate rides the broadcast join.",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(su),
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "returned_items_by_customer",
    doc="Returned-revenue customer ranking (TPC-H Q10 shape; the "
    "reference's screener-style ranked read, 00051/00120, at fact "
    "scale): returnflag-filtered lineitems ⋈ quarter of orders ⋈ "
    "customer ⋈ nation, lost revenue per customer, deterministic "
    "top 20. Fact join shuffles on orderkey; customer/nation "
    "broadcast; both date and flag predicates pushed to the scans. "
    "Revenue accumulates in DECIMAL(18,4) — exact and summation-"
    "order-insensitive, so the top-k cutoff is stable across "
    "engines AND across executor merge order at cluster scale "
    "(a float sum here is nondeterministic at 2dp boundaries).",
    oracle="""
    SELECT c.c_custkey AS custkey,
           c.c_name AS cust_name,
           n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS lost_revenue,
           round(max(c.c_acctbal), 2) AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, custkey
    LIMIT 20
    """,
)
def returned_items_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("lost_revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy(F.desc("lost_revenue"), "custkey")
        .limit(20)
    )


@member(
    "small_quantity_part_revenue",
    doc="Correlated scalar subquery → window rewrite (TPC-H Q17 shape; "
    "the reference's per-group-threshold screens, 00120:82): revenue "
    "of lineitems whose quantity is under half their part's average "
    "quantity. The naive form re-scans lineitem per part (correlated "
    "subquery / self-join); here the per-part average is a window "
    "over one shuffle on partkey and the threshold filter follows — "
    "one pass over the fact, no second scan, no join. Brand filter "
    "pushed to the (broadcast) part dim.",
    oracle="""
    WITH flagged AS (
      SELECT l.l_extendedprice,
             l.l_quantity,
             avg(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#1'
    )
    SELECT count(*) AS n_small,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) AS DOUBLE)
             AS avg_yearly_revenue
    FROM flagged
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    w = Window.partitionBy("l_partkey")
    flagged = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / 7.0, 2
        )
        .cast("double")
        .alias("avg_yearly_revenue"),
    )


@query(
    "promo_revenue_share",
    doc="Conditional-ratio aggregate (TPC-H Q14 shape; the reference's "
    "coverage-% pattern, A9 / 00105:96-98): monthly share of revenue "
    "from PROMO-type parts. One fact pass — the CASE rides the same "
    "aggregation as the denominator; part dim broadcast; decimal "
    "accumulation pins the ratio across summation orders.",
    oracle="""
    SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
           CAST(round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END)
             / sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))),
             6) AS DOUBLE) AS promo_share_pct,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pa = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                ))
                / F.sum(rev),
                6,
            )
            .cast("double")
            .alias("promo_share_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


@member(
    "priority_orders_with_late_items",
    doc="Semi-join existence query (TPC-H Q4 shape; the reference's "
    "implicit semi-joins via IN/=ANY filters, 00116:104,164): count "
    "orders per priority having at least one lineitem shipped more "
    "than 60 days after the order date. left_semi keeps one pass over "
    "orders and never duplicates rows for multi-match orders; the "
    "existence predicate (non-equi on dates) rides the join condition.",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def priority_orders_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


@query(
    "dormant_rich_customers",
    doc="Global scalar subquery + anti-join (TPC-H Q22 shape; the "
    "reference's scalar-subquery published-date lookup, 00051:18-53): "
    "customers whose balance exceeds the global average of positive "
    "balances and who placed no orders since 2000, counted per "
    "nation. The scalar average is a 1-row aggregate crossJoin-"
    "broadcast back onto the scan — fully declarative, no driver "
    "collect, so the plan reoptimizes at any scale; the existence "
    "check is a left_anti that shuffles only custkeys.",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    global_avg = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(global_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )


@query(
    "nation_pair_trade_volume",
    doc="Disjunctive cross-table join predicate + year grouping (TPC-H "
    "Q7 shape): revenue shipped between two nations in either "
    "direction, by direction and ship year. Supplier and customer "
    "nations resolve through broadcast dims; the OR'd pair predicate "
    "lands as a post-join filter on broadcast outputs, so the fact "
    "table still moves through exactly one orderkey shuffle.",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = na.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = na.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), cu.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("volume")
        )
    )


@query(
    "regional_rollup_totals",
    doc="Hierarchical ROLLUP with grouping() level labels (SURVEY "
    "§2.4 note: grouping sets are Spark freebies beyond reference "
    "parity; companion to lineitem_cube_totals): supplier revenue at "
    "region → nation → grand-total levels in one pass. grouping() "
    "disambiguates rollup NULLs from data NULLs — the same "
    "expand-then-aggregate plan at every scale, no per-level rescans.",
    oracle="""
    SELECT coalesce(r.r_name, '(all)') AS region,
           coalesce(n.n_name, '(all)') AS nation,
           CAST(grouping(r.r_name) AS BIGINT) AS region_rolled,
           CAST(grouping(n.n_name) AS BIGINT) AS nation_rolled,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def regional_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    joined = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("bigint").alias("region_rolled"),
            F.grouping("n_name").cast("bigint").alias("nation_rolled"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation"),
            "region_rolled",
            "nation_rolled",
            "revenue",
            "n_items",
        )
    )
