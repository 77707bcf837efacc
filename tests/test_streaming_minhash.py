"""Streaming MinHash near-dup: replaying micro-batches reproduces the
batch operator's pair set; row-wise signatures match the batch
aggregation exactly."""

from __future__ import annotations

import pytest


ROWS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "alpha beta gamma delta epsilon zeta eta theta"),      # exact dup of 0
    (2, "alpha beta gamma delta epsilon zeta eta iota"),        # near dup
    (3, "completely different text about database engines here"),
    (4, "another unrelated document mentioning query planners"),
    (5, "alpha beta gamma delta epsilon zeta eta theta"),      # dup, later batch
    (6, "fresh content appearing only in the second batch now"),
]


def test_rowwise_signatures_match_batch(spark):
    from whoosh_novo_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_rowwise,
    )

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    for fn in ("xxhash64", "md5"):
        a = {r["id"]: list(r["sig"]) for r in minhash_signatures(docs, hash_fn=fn).collect()}
        b = {
            r["id"]: list(r["sig"])
            for r in minhash_signatures_rowwise(docs, hash_fn=fn).collect()
        }
        assert a == b and a


def test_stream_matches_batch(spark, tmp_path):
    from whoosh_novo_spark.operators.dedup import minhash_dedup_pairs
    from whoosh_novo_spark.streaming.minhash_dedup import minhash_dedup_stream

    schema = "doc_id long, text string"
    b1 = [r for r in ROWS if r[0] < 5]
    b2 = [r for r in ROWS if r[0] >= 5]
    src = str(tmp_path / "mh_src")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        minhash_dedup_stream(stream, tau=0.5)
        .writeStream.format("memory")
        .queryName("mh_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (min(r["a"], r["b"], key=int), max(r["a"], r["b"], key=int))
        for r in spark.sql("SELECT * FROM mh_pairs").collect()
    }
    batch = {
        (str(r["a"]), str(r["b"]))
        for r in minhash_dedup_pairs(
            spark.createDataFrame(ROWS, schema), tau=0.5, hash_fn="xxhash64"
        ).collect()
    }
    assert got == batch
    assert ("0", "1") in got and ("0", "5") in got  # cross-batch dup found
