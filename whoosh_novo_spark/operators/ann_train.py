"""Distributed FULL-DATA training for the ANN quantizers.

``train_ivf_centroids`` / ``train_pq_codebooks[_residual]``
(operators/similarity.py) train on a bounded driver-side sample —
deliberately metadata-scale, but a sample: on a corpus whose cluster
structure the first-ids prefix does not cover, the quantizers never see
whole regions of the space and recall pays for it.  This module trains
the SAME k-means (same init rule, same 9-decimal-rounded assignments,
same member-mean updates) over the ENTIRE DataFrame, cluster-shaped:

- Each iteration is ONE Arrow pass (``mapInPandas``): every partition
  assigns its vectors against the broadcast centroids and folds them
  into per-cluster partial sums — the classic map-side-combined
  k-means E-step.  A partition emits at most k rows (k x dim doubles),
  so the shuffle/driver traffic is O(partitions x k), independent of
  row count: the same bounded-reduce shape as the build's stats stages.
- The driver M-step sums partials in a deterministic (cluster,
  partition) order and re-normalizes.  Results are partitioning-
  invariant up to float64 summation order (gated at 1e-12 in
  tests/test_ann_train_full.py); assignments are stable because dots
  are rounded to 9 decimals before argmax, exactly like the sampled
  trainers and the ivf_assign / pq_encode kernels.
- Init comes from the same bounded prefix-by-id sample the sampled
  trainers use, so ``iters=0`` reproduces their starting point and the
  two trainers differ only in how much data refines it.

At 100 TB you run this over a (still huge) ``.sample()`` or a cached
projection of (id, vector); each iteration is one scan — ``.cache()``
the projection when memory allows.  Reference: the whoosh side has no
vector machinery; the design here is the standard distributed Lloyd's
iteration (e.g. Spark MLlib KMeans) specialized to the engine's
deterministic spherical/PQ variants so trained indexes stay
reproducible and oracle-checkable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame

from whoosh_novo_spark.operators.similarity import _unit_rows

_PARTIAL_SCHEMA = "pid int, sub int, code int, n long, sums array<double>"


def _collect_partials(
    embeddings: DataFrame, vec_col: str, fold
) -> list[tuple[int, int, int, int, np.ndarray]]:
    """Run ``fold(V) -> dict[(sub, code)] = (n, sum_vec)`` over every
    partition's unit-normalized vectors in one job; returns partial rows
    sorted by (sub, code, pid) so the driver reduction order is
    deterministic for a given partitioning."""
    import pandas as pd
    from pyspark import TaskContext

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple[int, int], tuple[int, np.ndarray]] = {}
        for pdf in batches:
            col = pdf[vec_col]
            if not len(col):
                continue
            V = _unit_rows(np.array(col.tolist(), dtype=np.float64))
            for key, (n, s) in fold(V).items():
                if key in acc:
                    n0, s0 = acc[key]
                    acc[key] = (n0 + n, s0 + s)
                else:
                    acc[key] = (n, s)
        pid = TaskContext.get().partitionId()
        if acc:
            keys = sorted(acc)
            yield pd.DataFrame(
                {
                    "pid": [pid] * len(keys),
                    "sub": [k[0] for k in keys],
                    "code": [k[1] for k in keys],
                    "n": [int(acc[k][0]) for k in keys],
                    "sums": [acc[k][1].tolist() for k in keys],
                }
            )

    rows = embeddings.select(vec_col).mapInPandas(run, _PARTIAL_SCHEMA).collect()
    out = [
        (r["pid"], r["sub"], r["code"], r["n"], np.asarray(r["sums"], dtype=np.float64))
        for r in rows
    ]
    out.sort(key=lambda t: (t[1], t[2], t[0]))
    return out


def _init_sample(
    embeddings: DataFrame, id_col: str, vec_col: str, init_sample: int
) -> np.ndarray:
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(int(init_sample))
        .collect()
    )
    return _unit_rows(np.asarray([list(r[1]) for r in rows], dtype=np.float64))


def train_ivf_centroids_full(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_sample: int = 8192,
) -> np.ndarray:
    """Spherical k-means over the FULL DataFrame (one Arrow pass per
    iteration, O(partitions x k) reduce).  Same init / assignment /
    update rules as ``train_ivf_centroids`` — only the data each
    iteration sees differs.  Returns unit-row (n_centroids x dim)."""
    X0 = _init_sample(embeddings, id_col, vec_col, init_sample)
    k = min(n_centroids, len(X0))
    C = X0[np.linspace(0, len(X0) - 1, k).astype(int)].copy()
    for _ in range(int(iters)):
        Cb = C.copy()

        def fold(V: np.ndarray, Cb=Cb) -> dict:
            a = np.argmax(np.round(V @ Cb.T, 9), axis=1)
            out: dict[tuple[int, int], tuple[int, np.ndarray]] = {}
            for j in np.unique(a):
                members = V[a == j]
                out[(0, int(j))] = (len(members), members.sum(axis=0))
            return out

        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for _pid, _sub, code, n, s in _collect_partials(embeddings, vec_col, fold):
            sums[code] += s
            counts[code] += n
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz, None]
        C = _unit_rows(C)
    return C


def train_pq_codebooks_full(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    iters: int = 10,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_sample: int = 8192,
) -> np.ndarray:
    """Per-subspace k-means over the FULL DataFrame; all m subspaces
    train in the SAME pass per iteration (one scan, partials keyed
    (subspace, code)).  Pass ``centroids`` to train on IVF RESIDUALS
    (x_unit - centroid[cid]) — the full-data twin of
    ``train_pq_codebooks_residual`` and the codebooks ``ivf_pq_index``
    (residual=True) serves.  Returns (m, n_codes, dim // m)."""
    X0 = _init_sample(embeddings, id_col, vec_col, init_sample)
    C = None
    if centroids is not None:
        C = _unit_rows(np.asarray(centroids, dtype=np.float64))
        a0 = np.argmax(np.round(X0 @ C.T, 9), axis=1)
        X0 = X0 - C[a0]
    dim = X0.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(n_codes, len(X0))
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        Xs = X0[:, s * dsub : (s + 1) * dsub]
        books[s] = Xs[np.linspace(0, len(Xs) - 1, k).astype(int)]

    for _ in range(int(iters)):
        Bb = books.copy()

        def fold(V: np.ndarray, Bb=Bb, C=C) -> dict:
            R = V
            if C is not None:
                a = np.argmax(np.round(R @ C.T, 9), axis=1)
                R = R - C[a]
            out: dict[tuple[int, int], tuple[int, np.ndarray]] = {}
            for s in range(m):
                Xs = R[:, s * dsub : (s + 1) * dsub]
                Cb = Bb[s]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2, rounded like
                # the sampled trainer so assignments agree bit-for-bit
                d2 = (
                    (Xs**2).sum(axis=1)[:, None]
                    - 2.0 * (Xs @ Cb.T)
                    + (Cb**2).sum(axis=1)[None, :]
                )
                aa = np.argmin(np.round(d2, 9), axis=1)
                for j in np.unique(aa):
                    members = Xs[aa == j]
                    out[(s, int(j))] = (len(members), members.sum(axis=0))
            return out

        sums = np.zeros_like(books)
        counts = np.zeros((m, k), dtype=np.int64)
        for _pid, sub, code, n, sv in _collect_partials(embeddings, vec_col, fold):
            sums[sub, code] += sv
            counts[sub, code] += n
        for s in range(m):
            nz = counts[s] > 0
            books[s][nz] = sums[s][nz] / counts[s][nz, None]

    if k < n_codes:
        books = np.concatenate(
            [books, np.zeros((m, n_codes - k, dsub), dtype=np.float64)], axis=1
        )
    return books
