"""K-means coarse quantizer: determinism, partition sanity, and the
IVF-recall motivation — geometric cells recover what label cells lose
(SCALE.md 'IVF recall is bounded by quantizer quality')."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from japanstockdatapipeline_spark.operators.kmeans import kmeans_cells
from japanstockdatapipeline_spark.operators.topk import brute_force_topk, ivf_topk


def _clustered_vectors(rng, n_clusters=3, per_cluster=30, dim=8):
    """Tight clusters around random unit directions; labels are
    assigned RANDOMLY (geometrically meaningless, like the testdata)."""
    rows = []
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vid = 0
    for ci in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[ci] + 0.05 * rng.normal(size=dim)
            rows.append(
                (vid, [float(x) for x in v], int(rng.integers(0, n_clusters)), ci)
            )
            vid += 1
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    rows = _clustered_vectors(rng)
    return spark.createDataFrame(
        rows, ["vec_id", "embedding", "label", "true_cluster"]
    )


def test_kmeans_deterministic_and_partitions(spark, clustered):
    a = {r["vec_id"]: r["cell"] for r in kmeans_cells(clustered, k=3, iters=2).collect()}
    b = {r["vec_id"]: r["cell"] for r in kmeans_cells(clustered, k=3, iters=2).collect()}
    assert a == b  # deterministic run-to-run
    assert set(a) == set(range(90))  # every vector assigned exactly once


def test_kmeans_recovers_geometric_clusters(spark, clustered):
    """With k = #true clusters and tight clusters, the cell assignment
    must be a relabeling of the true clusters."""
    out = kmeans_cells(clustered, k=3, iters=3).join(
        clustered.select("vec_id", "true_cluster"), "vec_id"
    )
    rows = out.collect()
    mapping: dict[int, set[int]] = {}
    for r in rows:
        mapping.setdefault(r["true_cluster"], set()).add(r["cell"])
    # each true cluster maps to exactly one cell, and cells are distinct
    assert all(len(cells) == 1 for cells in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3


def test_ivf_recall_kmeans_vs_random_labels(spark, clustered):
    """IVF probing k-means cells beats IVF probing the random label
    column — the quantizer, not the plan shape, bounds recall."""
    queries = clustered.where(F.col("vec_id") % 30 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r["q_id"], r["neighbor_id"])
        for r in brute_force_topk(clustered, queries, 5).collect()
    }
    cells = kmeans_cells(clustered, k=3, iters=2).select("vec_id", "cell")
    geo = {
        (r["q_id"], r["neighbor_id"])
        for r in ivf_topk(
            clustered.join(cells, "vec_id"), queries, 5, n_probe=1, coarse_col="cell"
        ).collect()
    }
    rnd = {
        (r["q_id"], r["neighbor_id"])
        for r in ivf_topk(clustered, queries, 5, n_probe=1, coarse_col="label").collect()
    }
    recall_geo = len(geo & exact) / len(exact)
    recall_rnd = len(rnd & exact) / len(exact)
    assert recall_geo == 1.0  # tight clusters + geometric cells: perfect
    assert recall_geo > recall_rnd
