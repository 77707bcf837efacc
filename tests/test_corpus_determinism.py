"""Corpus per-row invariant (BASELINE.json input_hint): byte-identical
extracted text (and html payload) per url, regardless of parallelism —
the property the two-cluster-size scaling comparison depends on."""

from __future__ import annotations


def test_corpus_byte_identical_across_parallelism(spark):
    from whoosh_novo_spark.sources.corpus import synthesize_corpus

    a = {
        r["url"]: (r["text"], bytes(r["html"]))
        for r in synthesize_corpus(spark, 600, n_partitions=3, seed=99).collect()
    }
    b = {
        r["url"]: (r["text"], bytes(r["html"]))
        for r in synthesize_corpus(spark, 600, n_partitions=12, seed=99).collect()
    }
    assert len(a) == 600 and a == b


def test_corpus_schema_matches_input_hint(spark):
    """(url string, warc_ts timestamp, html binary, text string,
    lang string) — the exact input shape the north rule names."""
    from whoosh_novo_spark.sources.corpus import synthesize_corpus

    df = synthesize_corpus(spark, 10, n_partitions=1, seed=1)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
