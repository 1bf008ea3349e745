"""The eager production BPE trainer (operators/bpe.py): equivalence to
the registered lazy-unrolled member, a Python iterative reference at K
beyond the member's unroll depth, lineage checkpointing, and the
apply-side tokenizer."""

from __future__ import annotations

import re

import pytest
from helpers_bpe import py_bpe_train as _py_bpe_train

from japanstockdatapipeline_spark.operators.bpe import bpe_apply, bpe_train


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "on and on and on",
    "rat cat mat rat cat",
    "the the the cat cat",
    "sat on a mat, sat on a rat!",
    "",
    None,
    "x y x y x y",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def test_eager_trainer_matches_python_reference_beyond_unroll_depth(spark):
    """K=20 (past the member's compile-time 8): full merge-table
    equality with the iterative reference, with a checkpoint interval
    small enough that several truncations happen mid-run."""
    want, _ = _py_bpe_train(TEXTS, 20)
    got = bpe_train(_docs(spark), 20, checkpoint_every=4)
    assert got == want


def test_eager_trainer_matches_registered_member_prefix(spark, tmp_path):
    """Same corpus -> the eager trainer's first 8 merges must equal the
    lazy-unrolled doc_bpe_train member's table exactly (one algorithm,
    two execution strategies)."""
    from japanstockdatapipeline_spark.plans.llm import (
        BPE_TRAIN_ROUNDS,
        doc_bpe_train,
    )

    sf_dir = str(tmp_path)
    _docs(spark).write.parquet(f"{sf_dir}/documents.parquet")
    member = [tuple(r) for r in doc_bpe_train(spark, sf_dir).collect()]
    eager = bpe_train(_docs(spark), BPE_TRAIN_ROUNDS)
    assert eager == member


def test_stats_instrumentation_is_observation_only(spark):
    """stats_out/vocab_every (the stress_bpe pricing hooks) must not
    change the learned merge table, and the per-rank records must
    cover every learned rank with the Heaps probe firing on schedule."""
    want = bpe_train(_docs(spark), 12, checkpoint_every=4)
    stats: list[dict] = []
    got = bpe_train(
        _docs(spark), 12, checkpoint_every=4, stats_out=stats, vocab_every=4
    )
    assert got == want
    assert [s["rank"] for s in stats] == list(range(1, len(want) + 1))
    probed = [s["rank"] for s in stats if s["pair_vocab"] is not None]
    assert probed == [r for r in range(1, len(want) + 1) if r % 4 == 1]
    assert all(s["pair_vocab"] >= 1 for s in stats if s["pair_vocab"] is not None)
    assert [s["cnt"] for s in stats] == [m[3] for m in want]


def test_eager_trainer_stops_when_pairs_run_dry(spark):
    """A corpus whose pieces fully merge stops early: 'a b' x3 learns
    (a,b) then has single-piece docs only."""
    docs = spark.createDataFrame([(i, "a b") for i in range(3)], ["doc_id", "text"])
    got = bpe_train(docs, 10)
    assert got == [(1, "a", "b", 3)]


def test_eager_trainer_releases_cache_and_rotates_checkpoints(spark, tmp_path):
    """With a checkpoint_dir, generations rotate through parquet: the
    persisted base and every older generation are released
    deterministically — persistent-RDD count returns to its starting
    value and at most ONE generation dir remains; the learned table is
    unchanged by where the checkpoints land."""
    import os

    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    base = n_cached()
    want, _ = _py_bpe_train(TEXTS, 10)
    ck = str(tmp_path / "ck")
    got = bpe_train(_docs(spark), 10, checkpoint_every=2, checkpoint_dir=ck)
    assert got == want
    assert bpe_train(_docs(spark), 3) == want[:3]  # no-checkpoint path
    # <= not ==: the async ContextCleaner may reap an earlier test's
    # localCheckpoint RDDs mid-test (the test_llm_ops sweep-test flake
    # mode); the single-generation-dir assertion below is the exact
    # release check for THIS run's checkpoints
    assert n_cached() <= base
    gens = [d for d in os.listdir(ck) if d.startswith("bpe_gen=")]
    assert len(gens) == 1


def test_apply_tokenizes_with_learned_rules(spark):
    """bpe_apply reproduces the reference's final piece streams when
    given the learned table; an empty table is the plain pre-split."""
    merges, want_enc = _py_bpe_train(TEXTS, 12)
    got = (
        bpe_apply(_docs(spark), merges)
        .orderBy("doc_id")
        .select("bpe_pieces")
        .collect()
    )
    assert [r["bpe_pieces"] for r in got] == want_enc

    plain = bpe_apply(_docs(spark), []).orderBy("doc_id").collect()
    assert plain[0]["bpe_pieces"] == re.findall(
        r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", TEXTS[0]
    )


def test_trainer_rejects_bad_args(spark):
    d = _docs(spark)
    with pytest.raises(ValueError, match="k must"):
        bpe_train(d, 0)
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe_train(d, 5, checkpoint_every=0)
