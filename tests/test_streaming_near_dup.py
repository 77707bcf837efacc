"""Streaming banded near-dup: pairs across micro-batches match the
batch operator's pairs on the same data (replay parity), on NOISY
planted near-dups."""

from __future__ import annotations

import numpy as np
import pytest


def _planted(dim=32, n_pairs=25, n_background=80, seed=7):
    rng = np.random.default_rng(seed)
    rows, planted = [], []
    for i in range(n_pairs):
        x = rng.standard_normal(dim)
        x /= np.linalg.norm(x)
        target = rng.uniform(0.88, 0.97)
        u = rng.standard_normal(dim)
        u -= (u @ x) * x
        u /= np.linalg.norm(u)
        t = np.sqrt(1.0 / target**2 - 1.0)
        y = x + t * u
        rows.append((2 * i, [float(v) for v in x]))
        rows.append((2 * i + 1, [float(v) for v in y]))
        planted.append((str(2 * i), str(2 * i + 1)))
    for j in range(n_background):
        rows.append((1000 + j, [float(v) for v in rng.standard_normal(dim)]))
    return rows, planted


def test_stream_near_dup_matches_batch(spark, tmp_path):
    from whoosh_novo_spark.operators.similarity import embedding_near_dup_pairs
    from whoosh_novo_spark.streaming.near_dup import near_dup_stream

    dim = 32
    rows, planted = _planted(dim=dim)
    # split into two micro-batches: partners land in DIFFERENT batches
    # for half the pairs, exercising cross-batch state
    b1 = [r for r in rows if r[0] % 4 in (0, 3) or r[0] >= 1000]
    b2 = [r for r in rows if r not in b1]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "vec_src")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        near_dup_stream(stream, dim=dim, tau=0.85)
        .writeStream.format("memory")
        .queryName("near_dups")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (min(r["a"], r["b"], key=int), max(r["a"], r["b"], key=int))
        for r in spark.sql("SELECT * FROM near_dups").collect()
    }
    batch = {
        (str(r["a"]), str(r["b"]))
        for r in embedding_near_dup_pairs(
            spark.createDataFrame(rows, schema), tau=0.85
        ).collect()
    }
    # stream and batch use the same planes/banding: identical candidate
    # structure, identical exact-cosine verify -> identical pair sets
    assert got == batch
    recall = sum(p in got for p in planted) / len(planted)
    assert recall >= 0.9, recall


def test_stream_near_dup_bucket_cap(spark, tmp_path):
    """A pathological bucket (identical vectors) stays bounded by
    max_per_bucket and still reports pairs against the retained tail."""
    from whoosh_novo_spark.streaming.near_dup import near_dup_stream

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    rows = [(i, base) for i in range(40)]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "cap_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        near_dup_stream(stream, dim=dim, tau=0.99, max_per_bucket=5)
        .writeStream.format("memory")
        .queryName("near_dups_cap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = {
        (r["a"], r["b"])
        for r in spark.sql("SELECT * FROM near_dups_cap").collect()
    }
    # every later arrival pairs with at least one retained earlier vector
    bs = {b for _, b in pairs}
    assert {str(i) for i in range(1, 40)} <= bs
