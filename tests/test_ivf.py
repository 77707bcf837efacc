"""IVF (inverted-file) ANN: deterministic spherical-k-means training,
distributed assignment, probe search.  The driver row (ann_ivf_topk) gates
the seed-pinned-quantizer path against a full DuckDB recomputation; these
tests gate the TRAINED path: training determinism (partitioning-invariant),
assignment/oracle agreement, and recall@10 on clustered data."""

from __future__ import annotations

import numpy as np
import pytest

from whoosh_novo_spark.operators.similarity import (
    cosine_topk,
    ivf_ann_topk,
    ivf_assign,
    random_centroids,
    train_ivf_centroids,
)


def _clustered(spark, n_clusters=8, per_cluster=60, dim=32, seed=7, parts=4):
    """Planted clusters: unit center + small noise, so IVF lists align with
    real structure and recall is meaningful."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + 0.15 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts), rows


@pytest.fixture(scope="module")
def clustered(spark):
    return _clustered(spark)


def test_training_deterministic_across_partitionings(spark, clustered):
    emb, rows = clustered
    c1 = train_ivf_centroids(emb, n_centroids=8, iters=5, sample=400)
    c2 = train_ivf_centroids(emb.repartition(13), n_centroids=8, iters=5, sample=400)
    assert np.array_equal(c1, c2)
    # unit rows
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_assignment_matches_numpy(spark, clustered):
    emb, rows = clustered
    C = train_ivf_centroids(emb, n_centroids=8, iters=5, sample=400)
    got = {r["vec_id"]: r["cid"] for r in ivf_assign(emb, C).collect()}
    X = np.asarray([v for _, v in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)  # assign() normalizes
    expect = np.argmax(np.round(X @ C.T, 9), axis=1)
    for (vid, _), e in zip(rows, expect):
        assert got[vid] == e


def test_trained_recall_at_10(spark, clustered):
    """Trained quantizer, nprobe=2 of 8 lists: recall@10 >= 0.9 against
    brute force on clustered data (the LSH test's bar, test_dedup_similarity)."""
    emb, rows = clustered
    C = train_ivf_centroids(emb, n_centroids=8, iters=5, sample=400)
    assigned = ivf_assign(emb, C)
    hits = 0
    for qid in (0, 61, 205, 430):
        qv = rows[qid][1]
        exact = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
        approx = {
            r["vec_id"]
            for r in ivf_ann_topk(emb, qv, C, k=10, nprobe=2, assigned=assigned).collect()
        }
        hits += len(exact & approx)
    assert hits / 40 >= 0.9


def test_probe_scan_is_pruned(spark, clustered):
    """nprobe lists only: every candidate the query path scans belongs to
    the probed cids (the partition-pruning property at scale)."""
    emb, rows = clustered
    C = random_centroids(32, 8, seed=42)
    assigned = ivf_assign(emb, C).cache()
    qv = rows[0][1]
    out = ivf_ann_topk(emb, qv, C, k=10, nprobe=2, assigned=assigned).collect()
    q = np.asarray(qv) / np.linalg.norm(qv)
    sims = np.round(q @ C.T, 9)
    probe = set(sorted(range(8), key=lambda j: (-sims[j], j))[:2])
    cid_of = {r["vec_id"]: r["cid"] for r in assigned.collect()}
    assert out and all(cid_of[r["vec_id"]] in probe for r in out)
    assigned.unpersist()
