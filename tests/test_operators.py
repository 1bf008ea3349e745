"""Unit tests for the operator library (reference test strategy:
exhaustive unit specs per analytics module, SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from japanstockdatapipeline_spark.functions.semantics import product_agg, round_half_up
from japanstockdatapipeline_spark.functions.vectors import as_double_array, cosine_similarity
from japanstockdatapipeline_spark.operators.asof import (
    asof_join,
    build_validity_spans,
    span_join,
)
from japanstockdatapipeline_spark.operators.dedup import exact_dedup, minhash_signature
from japanstockdatapipeline_spark.operators.windows import (
    latest_per_key,
    running_max_excluding_current,
    sma,
)


def test_round_half_up(spark):
    df = spark.range(1).select(
        round_half_up(F.lit(2.5), 0).alias("a"),
        round_half_up(F.lit(0.125), 2).alias("b"),
        round_half_up(F.lit(2.675), 2).alias("c"),
    )
    row = df.first()
    assert row["a"] == 3.0  # half-up, not banker's
    assert row["b"] == 0.13
    # Spark rounds the shortest decimal representation ("2.675"), not
    # the exact binary value (2.67499999...), so half-up gives 2.68
    assert row["c"] == 2.68


def test_product_agg_exact(spark):
    df = spark.createDataFrame([(1, 0.9), (1, 0.8), (1, 0.5)], ["k", "x"])
    out = df.groupBy("k").agg(product_agg(F.col("x")).alias("p")).first()
    assert abs(out["p"] - 0.36) < 1e-12


def test_product_agg_empty_group_identity(spark):
    df = spark.createDataFrame([(1,)], ["k"]).select("k", F.expr("array()").cast("array<double>").alias("xs"))
    from japanstockdatapipeline_spark.functions.semantics import product_of_list

    assert df.select(product_of_list(F.col("xs")).alias("p")).first()["p"] == 1.0


def test_asof_join_basic(spark):
    left = spark.createDataFrame([(1, 10), (1, 20), (2, 15)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 99, 900.0)], ["k", "t", "v"]
    )
    out = asof_join(left, right, on=["k"], ts="t", value_cols=["v"])
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    assert got == {(1, 10): 100.0, (1, 20): 200.0, (2, 15): None}


def test_asof_join_same_ts_inclusive_vs_strict(spark):
    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame([(1, 10, 7.0)], ["k", "t", "v"])
    inc = asof_join(left, right, on=["k"], ts="t", value_cols=["v"]).first()["v"]
    strict = asof_join(left, right, on=["k"], ts="t", value_cols=["v"], strict=True).first()["v"]
    assert inc == 7.0
    assert strict is None


def test_validity_spans_and_span_join(spark):
    dim = spark.createDataFrame([(1, 10, "a"), (1, 20, "b")], ["k", "t", "val"])
    spans = build_validity_spans(dim, ["k"], "t")
    facts = spark.createDataFrame([(1, 5), (1, 10), (1, 19), (1, 20), (1, 99)], ["k", "ft"])
    joined = span_join(facts, spans, ["k"], "ft")
    got = sorted((r["ft"], r["val"]) for r in joined.collect())
    # ft=5 falls before any span -> dropped (inner); [10,20) -> a; [20,inf) -> b
    assert got == [(10, "a"), (19, "a"), (20, "b"), (99, "b")]


def test_latest_per_key_and_running_max(spark):
    df = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, 3.0), (1, 3, 9.0), (2, 1, 1.0)], ["k", "t", "v"]
    )
    latest = latest_per_key(df, ["k"], [F.col("t").desc()])
    assert {(r["k"], r["t"]) for r in latest.collect()} == {(1, 3), (2, 1)}
    w = Window.partitionBy("k").orderBy("t")
    rm = df.select("k", "t", running_max_excluding_current(F.col("v"), w).alias("m"))
    got = {(r["k"], r["t"]): r["m"] for r in rm.collect()}
    assert got == {(1, 1): None, (1, 2): 5.0, (1, 3): 5.0, (2, 1): None}


def test_sma_full_window_guard(spark):
    df = spark.createDataFrame([(1, i, float(i)) for i in range(1, 5)], ["k", "t", "v"])
    w = Window.partitionBy("k").orderBy("t")
    out = df.select("t", sma(F.col("v"), w, 3).alias("s")).collect()
    got = {r["t"]: r["s"] for r in out}
    assert got[1] is None and got[2] is None
    assert abs(got[3] - 2.0) < 1e-12 and abs(got[4] - 3.0) < 1e-12


def test_cosine_similarity(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"])
    out = df.select(
        cosine_similarity(as_double_array(F.col("a")), as_double_array(F.col("b"))).alias("c")
    ).collect()
    assert abs(out[0]["c"] - 0.0) < 1e-12
    assert abs(out[1]["c"] - 1.0) < 1e-12


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    out = exact_dedup(df).collect()
    by_keep = {r["keep_id"]: r["n_docs"] for r in out}
    assert by_keep == {1: 2, 3: 1}  # canonicalization collapses 1 and 2


def test_minhash_signature_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q r")], ["doc_id", "text"]
    )
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signature(df, 8).collect()}
    assert len(sigs[1]) == 8
    assert sigs[1] == sigs[2]  # identical docs -> identical signatures
    assert sigs[1] != sigs[3]


def test_minhash_short_docs_excluded(spark):
    from japanstockdatapipeline_spark.operators.dedup import minhash_lsh_pairs

    # docs shorter than k tokens have no shingles; without the filter
    # they would all collide in one degenerate empty bucket per band
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c d"), (4, "x y z w"), (5, "x y z w")],
        ["doc_id", "text"],
    )
    pairs = minhash_lsh_pairs(df, n_hashes=8, bands=2, k=3).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ids == {(4, 5)}  # only the real near-dup pair, no short-doc noise


def test_ngram_jaccard_max_df_cap(spark):
    from japanstockdatapipeline_spark.operators.dedup import ngram_jaccard_pairs

    # hot-shingle corpus: every doc shares the stop-shingle "the of and"
    # plus a unique tail. With max_df below the corpus size the hot
    # posting list is dropped, so no pair reaches the 0.5 threshold;
    # a genuine near-dup pair sharing *rare* shingles still surfaces.
    rows = [(i, f"the of and u{i} v{i} w{i}") for i in range(20)]
    rows += [(100, "p q r s t u"), (101, "p q r s t u")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(df, threshold=0.5, k=3, max_df=10).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ids == {(100, 101)}
    # uncapped control: the hot shingle alone still can't push disjoint
    # docs over the threshold, but it does generate the df^2 candidates
    uncapped = ngram_jaccard_pairs(df, threshold=0.01, k=3, max_df=10_000).collect()
    assert len(uncapped) > len(pairs)
    # the default (max_df=None) is EXACT Jaccard: identical to any cap
    # large enough to keep every posting list
    default = ngram_jaccard_pairs(df, threshold=0.01, k=3).collect()
    assert {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in default} == {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in uncapped
    }


def test_scd2_apply_delist_relist_roundtrip(spark):
    from japanstockdatapipeline_spark.operators.scd2 import scd2_apply

    def snap(rows):
        return spark.createDataFrame(rows, ["code", "name"])

    empty_master = spark.createDataFrame(
        [], "code string, name string, valid_from string, valid_to string, is_current boolean"
    )
    # day 1: A and B list
    m1 = scd2_apply(empty_master, snap([("A", "x"), ("B", "y")]), ["code"], ["name"], "d1")
    rows1 = {(r["code"], r["name"], r["valid_from"], r["valid_to"], r["is_current"])
             for r in m1.collect()}
    assert rows1 == {("A", "x", "d1", None, True), ("B", "y", "d1", None, True)}

    # day 2: A changes attrs, B delists, C lists
    m2 = scd2_apply(m1, snap([("A", "x2"), ("C", "z")]), ["code"], ["name"], "d2")
    rows2 = {(r["code"], r["name"], r["valid_from"], r["valid_to"], r["is_current"])
             for r in m2.collect()}
    assert rows2 == {
        ("A", "x", "d1", "d2", False),
        ("A", "x2", "d2", None, True),
        ("B", "y", "d1", "d2", False),
        ("C", "z", "d2", None, True),
    }

    # day 3: B relists with new attrs, A unchanged, C delists
    m3 = scd2_apply(m2, snap([("A", "x2"), ("B", "y2")]), ["code"], ["name"], "d3")
    rows3 = {(r["code"], r["name"], r["valid_from"], r["valid_to"], r["is_current"])
             for r in m3.collect()}
    assert rows3 == {
        ("A", "x", "d1", "d2", False),
        ("A", "x2", "d2", None, True),      # unchanged row untouched
        ("B", "y", "d1", "d2", False),
        ("B", "y2", "d3", None, True),      # relisting = fresh insert
        ("C", "z", "d2", "d3", False),
    }
    # invariant from 00010's partial unique index: <=1 current row per code
    cur_counts = (
        m3.filter(F.col("is_current")).groupBy("code").count().collect()
    )
    assert all(r["count"] == 1 for r in cur_counts)
    # round-trip with the P3 as-of predicate: state at "d2 <= t < d3"
    asof = m3.filter(
        (F.col("valid_from") <= "d2")
        & (F.col("valid_to").isNull() | (F.col("valid_to") > "d2"))
    )
    assert {(r["code"], r["name"]) for r in asof.collect()} == {("A", "x2"), ("C", "z")}


def test_dup_clusters_reliable_checkpoint_branch(spark, tmp_path):
    """With a checkpoint dir configured, the label-propagation loop
    uses reliable checkpoints (executor-loss-safe on a cluster) and
    produces identical clusters."""
    from japanstockdatapipeline_spark.operators.dedup import dup_clusters

    sc = spark.sparkContext
    had = sc._jsc.sc().getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
        got = {(r["id"], r["cluster"]) for r in dup_clusters(pairs).collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    finally:
        if had.isDefined():
            sc.setCheckpointDir(had.get())
        else:
            # clear it so later tests keep the localCheckpoint fast path
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_dup_clusters_path_graph_pointer_doubling(spark):
    """A 100-edge path graph (diameter 100 — the crawl-dup chain
    shape) must converge well inside the default round budget thanks
    to pointer doubling (reach doubles per round: 2^(k+1)-2 >= 100 at
    k=6), and every node must label to the chain head — matching the
    RECURSIVE-CTE transitive-closure oracle semantics."""
    import duckdb

    from japanstockdatapipeline_spark.operators.dedup import dup_clusters

    edges = [(i, i + 1) for i in range(100)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["id"], r["cluster"]) for r in dup_clusters(pairs, max_iter=8).collect()}
    assert got == {(i, 0) for i in range(101)}

    # same answer as the RECURSIVE CTE the registered member oracles use
    want = {
        (a, b)
        for a, b in duckdb.sql(
            """
            WITH RECURSIVE pairs AS (
              SELECT * FROM (VALUES """
            + ", ".join(f"({a}, {b})" for a, b in edges)
            + """) t(id_a, id_b)
            ), nodes AS (
              SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs
            ), sym AS (
              SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
            ), reach(id, r) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT s.b, r.r FROM reach r JOIN sym s ON s.a = r.id
            )
            SELECT id, min(r) FROM reach GROUP BY id
            """
        ).fetchall()
    }
    assert got == want


def test_dup_clusters_raises_when_not_converged(spark):
    """Exhausting max_iter with labels still moving must raise, never
    silently return split clusters (round-5 verdict: a >max_iter-hop
    chain returned wrong labels with no error)."""
    import pytest

    from japanstockdatapipeline_spark.operators.dedup import (
        ClusteringNotConverged,
        dup_clusters,
    )

    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], ["id_a", "id_b"])
    with pytest.raises(ClusteringNotConverged):
        dup_clusters(pairs, max_iter=2)
    # ...but a max_iter that lands EXACTLY on the fixpoint round is fine
    assert dup_clusters(pairs, max_iter=5).count() == 41


def test_multi_basket_all_equals_single_basket(spark):
    """The 'all' basket of the group-parallel N-basket job must equal
    the single-basket pit_basket_valuation member exactly."""
    from japanstockdatapipeline_spark.plans import all_members

    sf = "/root/testdata/sf0.001"
    single = {
        r["day"]: (
            r["n_constituents"],
            r["weighted_per"],
            r["weighted_per_fwd"],
            r["index_level"],
        )
        for r in all_members()["pit_basket_valuation"].fn(spark, sf).collect()
    }
    multi = {
        r["day"]: (r["n_const_all"], r["per_all"], r["per_fwd_all"], r["idx_all"])
        for r in all_members()["multi_basket_valuation"].fn(spark, sf).collect()
    }
    assert single == multi


def test_salted_aggregate_rejects_non_reaggregable(spark):
    """Review fix: avg of per-salt avgs is unweighted and silently
    wrong — non-re-aggregable functions are now a loud ValueError."""
    import pytest

    from japanstockdatapipeline_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame([(1, 1.0)], ["k", "x"])
    with pytest.raises(ValueError, match="avg"):
        salted_aggregate(df, ["k"], {"x": "avg"})


def test_matmul_topk_honors_q_id_col(spark):
    """Review fix: the BLAS path hardcoded q_id in its Arrow schema,
    crashing for any caller-supplied q_id_col; non-integral ids are
    now rejected loudly instead of silently coerced."""
    import pytest

    from japanstockdatapipeline_spark.operators.topk import brute_force_topk_matmul

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], ["vec_id", "embedding"]
    )
    queries = spark.createDataFrame([(100, [1.0, 1.0])], ["query_id", "q_vec"])
    rows = brute_force_topk_matmul(corpus, queries, 2, q_id_col="query_id").collect()
    assert {r["query_id"] for r in rows} == {100}
    assert len(rows) == 2

    s_corpus = spark.createDataFrame([("a", [1.0, 0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="integral id"):
        brute_force_topk_matmul(s_corpus, queries, 1)
