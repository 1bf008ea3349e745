"""Fused event-indicator panel: the one-pass production form must be
value-identical to the join-of-members panel, with ONE Exchange in its
plan vs the panel's 11 member shuffles (round-4 verdict item 3)."""

from __future__ import annotations

import math
import re

from japanstockdatapipeline_spark.plans import all_members, all_queries

SF_SMOKE = "/root/testdata/sf0.001"


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                out.append("NaN" if math.isnan(v) else f"{v:.9g}")
            else:
                out.append("NULL" if v is None else str(v))
        return "\x01".join(out)

    return sorted(key(r) for r in rows)


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fused_equals_panel(spark):
    fused = all_members()["event_indicator_fused"].fn(spark, SF_SMOKE)
    panel = all_queries()["event_indicator_panel"].fn(spark, SF_SMOKE)
    assert sorted(fused.columns) == sorted(panel.columns)
    frows = [tuple(r) for r in fused.collect()]
    prows = [tuple(r) for r in panel.collect()]
    assert len(frows) == len(prows)
    assert _normalize(frows, fused.columns) == _normalize(prows, panel.columns)


def test_fused_jvm_equals_panel(spark):
    fused = all_members()["event_indicator_fused_jvm"].fn(spark, SF_SMOKE)
    panel = all_queries()["event_indicator_panel"].fn(spark, SF_SMOKE)
    assert sorted(fused.columns) == sorted(panel.columns)
    frows = [tuple(r) for r in fused.collect()]
    prows = [tuple(r) for r in panel.collect()]
    assert len(frows) == len(prows)
    assert _normalize(frows, fused.columns) == _normalize(prows, panel.columns)


def test_fused_jvm_plan_has_one_exchange(spark):
    fused = all_members()["event_indicator_fused_jvm"].fn(spark, SF_SMOKE)
    n = len(re.findall(r"\(\d+\) Exchange\b", _plan_of(fused)))
    assert n == 1, f"JVM fused form must shuffle exactly once, saw {n}"


def test_fused_plan_has_one_exchange(spark):
    fused = all_members()["event_indicator_fused"].fn(spark, SF_SMOKE)
    panel = all_queries()["event_indicator_panel"].fn(spark, SF_SMOKE)
    # count node-detail headers "(N) Exchange" — the formatted explain
    # prints every node twice (tree + detail), headers appear once
    n_fused = len(re.findall(r"\(\d+\) Exchange\b", _plan_of(fused)))
    n_panel = len(re.findall(r"\(\d+\) Exchange\b", _plan_of(panel)))
    assert n_fused == 1, f"fused form must shuffle exactly once, saw {n_fused}"
    assert n_panel >= 11, f"join-of-members panel shuffles per member, saw {n_panel}"


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id bigint, event_id bigint, ts_us bigint, "
        "event_type string, value double",
    )


def test_fused_half_cent_boundary_matches_jvm(spark):
    """Regression: values landing EXACTLY on .5 cents (eighth-dollar
    prices: 10.125 * 100 = 1012.5, exact in binary) must round
    half-away-from-zero in the pandas cent conversion, matching the
    JVM form's F.round(value*100) (HALF_UP) and the DuckDB oracle.
    np.rint (half-even) rounded 1012.5 -> 1012 while the other two
    rails produced 1013 — a silent cross-rail divergence on any feed
    with eighth-priced rows."""
    from japanstockdatapipeline_spark.operators.fused_panel import (
        fused_event_indicators,
        fused_event_indicators_jvm,
    )

    # eighths with an odd integer part below the half cent: k + 0.125
    # and k + 0.625 give cents of the form ...2.5 / ...7.5 where
    # half-even and half-up genuinely disagree
    rows = [
        (1, i, 1_000 + i, "view", 10.0 + (i % 8) * 0.125 + i * 0.625)
        for i in range(24)
    ]
    ev = _mk_events(spark, rows)
    fused = fused_event_indicators(ev)
    jvm = fused_event_indicators_jvm(ev)
    assert sorted(fused.columns) == sorted(jvm.columns)
    frows = [tuple(r) for r in fused.collect()]
    jrows = [tuple(r) for r in jvm.collect()]
    assert len(frows) == len(jrows) == len(rows)
    assert _normalize(frows, fused.columns) == _normalize(jrows, jvm.columns)


def test_fused_null_value_stays_null_not_garbage(spark):
    """Regression: a NULL value lane must stay an UNDEFINED stochastic
    lane. The old int64 cast turned NaN into INT64_MIN, which then
    became ll for the next 13 windows and emitted arbitrary non-NULL
    raw_k/slow_k/slow_d values. Contract now: every 14-row window
    touching the NULL is NULL (conservative), windows past it recover,
    and any defined value is a genuine percentage in [0, 100]."""
    from japanstockdatapipeline_spark.operators.fused_panel import (
        fused_event_indicators,
    )

    rows = [
        (1, i, 1_000 + i, "view", None if i == 5 else 50.0 + 3.0 * i)
        for i in range(26)
    ]
    ev = _mk_events(spark, rows)
    got = {
        r["event_id"]: r
        for r in fused_event_indicators(ev).collect()
    }
    assert len(got) == 26
    for i in range(26):
        r = got[i]
        for c in ("raw_k", "slow_k", "slow_d"):
            v = r[c]
            assert v is None or 0.0 <= v <= 100.0, f"garbage {c}={v} at row {i}"
        # rows 0-12: window not yet full; rows 5..18: window touches the
        # NULL lane -> undefined
        if i < 19:
            assert r["raw_k"] is None, f"row {i} should be undefined"
    # the series is strictly increasing, so every clean full window is
    # defined: rows 19+ (windows 6..19 onward) must have recovered
    for i in range(19, 26):
        assert got[i]["raw_k"] is not None, f"row {i} should have recovered"
        assert got[i]["raw_k"] == 100.0  # current row is the window max


def test_fused_doc_features_equals_join_of_members(spark):
    """The one-pass document-feature form equals the full-outer join
    of its expression-only members (same columns, same values)."""
    from functools import reduce

    from japanstockdatapipeline_spark.plans.panels import (
        _DOC_FUSED_MEMBERS,
        _DOC_FUSED_RENAMES,
        _renamed_member_df,
    )

    fused = all_queries()["doc_features_fused"].fn(spark, SF_SMOKE)
    dfs = [
        _renamed_member_df(spark, SF_SMOKE, m, _DOC_FUSED_RENAMES)
        for m in _DOC_FUSED_MEMBERS
    ]
    joined = reduce(lambda a, b: a.join(b, ["doc_id"], "full_outer"), dfs)
    assert sorted(fused.columns) == sorted(joined.columns)
    frows = [tuple(r) for r in fused.collect()]
    jrows = [tuple(r) for r in joined.collect()]
    assert len(frows) == len(jrows)
    assert _normalize(frows, fused.columns) == _normalize(jrows, joined.columns)


def test_corpus_prep_fused_equals_join_of_members(spark):
    """The corpus-prep flagship pass equals the full-outer join of the
    fused members + doc_decontamination + the doc-grain exact-dup
    signal derived from doc_exact_dedup (fingerprint window)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from japanstockdatapipeline_spark.plans.panels import (
        _DOC_FUSED_MEMBERS,
        _DOC_FUSED_RENAMES,
        _renamed_member_df,
    )
    from japanstockdatapipeline_spark.functions.text import fingerprint_md5
    from japanstockdatapipeline_spark.sources import load_table

    fused = all_queries()["corpus_prep_fused"].fn(spark, SF_SMOKE)
    dfs = [
        _renamed_member_df(spark, SF_SMOKE, m, _DOC_FUSED_RENAMES)
        for m in (*_DOC_FUSED_MEMBERS, "doc_decontamination")
    ]
    joined = reduce(lambda a, b: a.join(b, ["doc_id"], "full_outer"), dfs)
    # the exact-dup signal re-derived independently: fp per doc joined
    # to the doc_exact_dedup (fp-grain) member output
    groups = all_queries()["doc_exact_dedup"].fn(spark, SF_SMOKE)
    per_doc = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))
        .join(groups, "fp")
        .select(
            "doc_id",
            "fp",
            F.col("keep_id").alias("fp_keep_id"),
            F.col("n_docs").alias("fp_n_docs"),
            (F.col("doc_id") != F.col("keep_id")).alias("is_exact_dup"),
        )
    )
    joined = joined.join(per_doc, ["doc_id"])
    assert sorted(fused.columns) == sorted(joined.columns)
    frows = [tuple(r) for r in fused.collect()]
    jrows = [tuple(r) for r in joined.collect()]
    assert len(frows) == len(jrows)
    assert _normalize(frows, fused.columns) == _normalize(jrows, joined.columns)


def test_corpus_prep_fused_plan_shape(spark):
    """2 corpus scans (main + eval carve-out), 2 corpus-sized
    Exchanges (packing window on lang + fingerprint window) plus the
    1-row eval-set collapse (SinglePartition over <=n_partitions
    partial-agg rows, never corpus data), zero equi-joins — the decon
    probe is a broadcast array intersect, not a join."""
    fused = all_queries()["corpus_prep_fused"].fn(spark, SF_SMOKE)
    plan = _plan_of(fused)
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_ex == 3, f"2 shuffles + 1-row eval collapse expected, saw {n_ex}"
    assert re.search(r"hashpartitioning\(lang", plan)
    assert re.search(r"hashpartitioning\(fp", plan)
    assert "SinglePartition" in plan  # the 1-row eval-gram-set collapse
    n_scan = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scan == 2, f"expected main + eval scans, saw {n_scan}"
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                "CartesianProduct"):
        assert bad not in plan, f"unexpected {bad} in corpus-prep fused plan"


def test_fused_doc_features_plan_has_one_exchange(spark):
    """One scan, one shuffle (the packing window on lang) — vs the 9
    member subtrees the join form pays."""
    fused = all_queries()["doc_features_fused"].fn(spark, SF_SMOKE)
    plan = _plan_of(fused)
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_ex == 1, f"fused doc features must shuffle exactly once, saw {n_ex}"
    n_scan = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scan == 1, f"fused doc features must scan documents once, saw {n_scan}"
