"""Product-Quantization ANN: recall vs exact cosine on clustered data,
determinism, and compression sanity."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((12, 64)) * 3
    vecs = np.concatenate(
        [c + 0.2 * rng.standard_normal((40, 64)) for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    return df, vecs


def test_pq_recall_on_clustered_data(spark, clustered):
    from whoosh_novo_spark.operators.similarity import (
        cosine_topk,
        pq_ann_topk,
        pq_encode,
        train_pq_codebooks,
    )

    df, vecs = clustered
    books = train_pq_codebooks(df, m=8, n_codes=64)
    enc = pq_encode(df, books)
    recalls, short_recalls = [], []
    for qid in (0, 55, 130, 275, 401):
        qv = [float(x) for x in vecs[qid]]
        exact = {r["vec_id"] for r in cosine_topk(df, qv, 10).collect()}
        # ADC + exact re-rank of the shortlist: the production pipeline
        approx = {
            r["vec_id"]
            for r in pq_ann_topk(enc, qv, books, k=10, rerank=df).collect()
        }
        recalls.append(len(exact & approx) / 10)
        # shortlist recall: ADC's job is to put the true neighbors in
        # the top-100, not to fine-rank them
        sl = {
            r["vec_id"]
            for r in pq_ann_topk(enc, qv, books, k=100).collect()
        }
        short_recalls.append(len(exact & sl) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    assert sum(short_recalls) / len(short_recalls) >= 0.9, short_recalls


def test_pq_encode_deterministic_and_compact(spark, clustered):
    from whoosh_novo_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    df, _ = clustered
    books = train_pq_codebooks(df, m=8, n_codes=64)
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df.repartition(7), books).collect()
    }
    assert a == b  # partitioning-invariant
    assert all(len(c) == 8 and max(c) < 64 for c in a.values())
    # training itself is partitioning-invariant (bounded ordered sample)
    books2 = train_pq_codebooks(df.repartition(5), m=8, n_codes=64)
    assert np.allclose(books, books2)


def test_pq_dim_guard(spark, clustered):
    from whoosh_novo_spark.operators.similarity import train_pq_codebooks

    df, _ = clustered
    with pytest.raises(ValueError):
        train_pq_codebooks(df, m=7)
