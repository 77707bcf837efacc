"""Continuous crawl CLEANING: the map-side clean_corpus stages (C4,
repetition, PII, url_normalize) compose directly with Structured
Streaming — each micro-batch's output is value-identical to running
the batch pipeline on the same rows (map-side stages have no
cross-document state, so streaming==batch holds exactly).  line_dedup
is corpus-stateful and correctly REJECTED on a streaming frame by
Spark itself (distinct-count aggregation unsupported in append mode) —
the test pins that it fails loudly rather than silently mis-cleaning."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.pipeline import clean_corpus

STAGES = ("url_normalize", "c4", "repetition", "pii")

ROWS_B1 = [
    (
        "HTTPS://A.com:443/p?utm_source=x&a=1",
        "A first ordinary sentence sits right here.\n"
        "A second sentence mentions mail to a@b.com now.\n"
        "A third sentence closes the page politely.",
    ),
    ("https://spam.com/x", "buy cheap pills now " * 30 + "."),
]
ROWS_B2 = [
    (
        "http://B.org/q/",
        "Opening thoughts arrive in a complete sentence.\n"
        "Middle thoughts continue the argument carefully.\n"
        "Closing thoughts end at address 10.0.0.1 tonight.",
    ),
]


def test_streaming_clean_matches_batch(spark, tmp_path):
    schema = "url string, text string"
    src = str(tmp_path / "crawl_src")
    spark.createDataFrame(ROWS_B1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(ROWS_B2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        clean_corpus(stream, id_col="url", stages=STAGES)
        .writeStream.format("memory")
        .queryName("cleaned_crawl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["url"], r["text"])
        for r in spark.sql("SELECT url, text FROM cleaned_crawl").collect()
    )

    batch = clean_corpus(
        spark.createDataFrame(ROWS_B1 + ROWS_B2, schema), id_col="url", stages=STAGES
    )
    exp = sorted((r["url"], r["text"]) for r in batch.collect())
    assert got == exp and len(got) == 2  # spam dropped, both prose pages kept
    urls = [u for u, _ in got]
    assert "https://a.com/p?a=1" in urls  # normalized in-stream
    texts = " | ".join(t for _, t in got)
    assert "<EMAIL>" in texts and "<IP>" in texts


def test_line_dedup_rejected_on_streams(spark, tmp_path):
    """Corpus-stateful line dedup must fail loudly on a stream, not
    silently produce wrong counts."""
    schema = "url string, text string"
    src = str(tmp_path / "crawl_src2")
    spark.createDataFrame(ROWS_B1, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        (
            clean_corpus(stream, id_col="url")  # default stages include line_dedup
            .writeStream.format("memory")
            .queryName("should_fail")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
