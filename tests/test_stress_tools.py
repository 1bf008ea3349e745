"""Smoke tests for the stress harnesses (tools/stress_dedup.py,
tools/stress_ann.py): the corpus builders and every measured operator
path must run at toy scale, so the tools recorded in SCALE.md don't
rot as operators evolve."""

from __future__ import annotations

import importlib.util
import sys

from pyspark.sql import functions as F


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_stress_dedup_build_and_ops(spark, sf_dir, tmp_path, monkeypatch):
    sd = _load("tools/stress_dedup.py", "stress_dedup_smoke")
    monkeypatch.setattr(sd, "OUT", str(tmp_path / "docs.parquet"))
    sd.build(spark, sf_dir, 2)
    d = spark.read.parquet(sd.OUT)
    n_orig = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert d.count() == 2 * n_orig
    # replica 1 drops the first 2 tokens
    orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pair = (
        orig.select("doc_id", F.col("text").alias("t0"))
        .join(
            d.where(F.col("doc_id") >= 1_000_000).select(
                (F.col("doc_id") - 1_000_000).alias("doc_id"), F.col("text").alias("t1")
            ),
            "doc_id",
        )
        .limit(5)
        .collect()
    )
    for r in pair:
        toks0 = r["t0"].strip().split()
        assert r["t1"].split() == toks0[2:]
    from japanstockdatapipeline_spark.operators.dedup import exact_dedup

    fp = exact_dedup(d)
    assert fp.count() == n_orig * 2 - fp.where(F.col("n_docs") > 1).count()


def test_hot_span_corpus_holds_requested_fraction(spark):
    """The hot-chunk selector must honor hot_frac across the dial —
    `id % round(1/frac)` (the r10 review finding) silently degenerated
    to 100% hot for any frac > 2/3."""
    sd = _load("tools/stress_dedup.py", "stress_dedup_frac")
    from japanstockdatapipeline_spark.plans.llm import DUP_SPAN_CHUNK

    hot_tok = "boiler0"
    for frac in (0.5, 0.9):
        d = sd.build_hot_span_corpus(spark, n_docs=1000, hot_frac=frac)
        n_hot = d.where(F.col("text").startswith(hot_tok)).count()
        assert n_hot == int(1000 * frac), (frac, n_hot)
        # hot docs carry the chunk chunk-ALIGNED (first DUP_SPAN_CHUNK
        # tokens), so every occurrence fingerprints identically
        one = d.where(F.col("text").startswith(hot_tok)).first()["text"].split()
        assert one[:DUP_SPAN_CHUNK] == [f"boiler{j}" for j in range(DUP_SPAN_CHUNK)]


def test_stress_ann_build_and_recall_helpers(spark, sf_dir, tmp_path, monkeypatch):
    sa = _load("tools/stress_ann.py", "stress_ann_smoke")
    monkeypatch.setattr(sa, "OUT", str(tmp_path / "emb.parquet"))
    sa.build(spark, sf_dir, 2)
    e = spark.read.parquet(sa.OUT)
    n_orig = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert e.count() == 2 * n_orig
    # replica perturbs only coordinate 0 by +0.02
    r0 = {r["vec_id"]: r["embedding"] for r in e.where(F.col("vec_id").isin([0, 1_000_000])).collect()}
    assert abs(r0[1_000_000][0] - r0[0][0] - 0.02) < 1e-6
    assert r0[1_000_000][1:] == r0[0][1:]


def test_stress_gate_staleness_check():
    """The reuse path of the stress gate must reject artifacts that
    (a) predate the commit stamp, or (b) carry a stamp older than a
    HEAD that touched measured paths; clean stamps at HEAD with no
    dirty measured files pass."""
    import subprocess
    import sys

    sys.path.insert(0, ".")
    from tools.round_check import _stale_vs_artifact

    # (a) unstamped artifact -> one synthetic stale entry
    assert _stale_vs_artifact({}) == ["<artifact has no measured_at.commit stamp>"]

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    stale = _stale_vs_artifact({"measured_at": {"commit": head}})
    # at HEAD, staleness can only come from dirty measured files — and
    # every entry must be inside the measured paths
    from tools.round_check import STRESS_MEASURED_PATHS

    assert all(any(f.startswith(p) for p in STRESS_MEASURED_PATHS) for f in stale)


def test_stress_gate_fails_closed_on_unverifiable_stamps():
    """The reuse path must fail CLOSED when the stamp cannot be
    verified: a commit git cannot diff against, or an artifact that
    was itself measured with dirty files under the measured paths."""
    import sys

    sys.path.insert(0, ".")
    from tools.round_check import _stale_vs_artifact

    bad = _stale_vs_artifact({"measured_at": {"commit": "f" * 40}})
    assert bad and "git diff" in bad[0]

    dirty = _stale_vs_artifact(
        {
            "measured_at": {
                "commit": "HEAD",
                "dirty_measured": ["japanstockdatapipeline_spark/operators/x.py"],
            }
        }
    )
    assert any("dirty file" in f for f in dirty)
