"""Streaming stateful exact-dedup: first-seen docs pass, duplicate
content in the same or later micro-batches is suppressed; agreement with
the batch fingerprint (operators/dedup.exact_duplicates)."""

from __future__ import annotations

import pytest


ROWS_B1 = [
    ("d1", "alpha beta gamma"),
    ("d2", "delta epsilon"),
    ("d3", "alpha beta gamma"),   # dup of d1 within the batch
    ("d4", "unique one here"),
]
ROWS_B2 = [
    ("d5", "delta epsilon"),      # dup of d2, later batch
    ("d6", "Alpha  BETA gamma"),  # dup of d1 after normalization
    ("d7", "fresh content"),
]


def test_stream_dedup_first_seen(spark, tmp_path):
    from whoosh_novo_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "docs_src")
    schema = "doc_id string, text string"
    spark.createDataFrame(ROWS_B1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(ROWS_B2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("deduped_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.sql("SELECT * FROM deduped_docs").collect()}
    # d1 beats d3 (lowest id in batch 1); d5/d6 suppressed as later dups
    assert got == {"d1", "d2", "d4", "d7"}


def test_stream_fingerprint_matches_batch(spark, tmp_path):
    """The stream suppresses exactly the groups the batch operator
    reports as duplicates (same fingerprint expression)."""
    from whoosh_novo_spark.operators.dedup import exact_duplicates
    from whoosh_novo_spark.streaming.dedup import dedup_stream

    schema = "doc_id string, text string"
    all_rows = ROWS_B1 + ROWS_B2
    batch = spark.createDataFrame(all_rows, schema)
    groups = exact_duplicates(batch).collect()
    dup_ids = {i for g in groups for i in g["ids"][1:]}  # keep-first per group

    src = str(tmp_path / "docs_src2")
    spark.createDataFrame(all_rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("deduped_docs2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.sql("SELECT * FROM deduped_docs2").collect()}
    assert kept == {i for i, _ in all_rows} - dup_ids
