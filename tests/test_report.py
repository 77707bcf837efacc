"""Corpus data card: exact hand-verifiable counts, dup-rate, optional
sections only when columns named, approx-dup mode, empty corpus,
real-corpus smoke."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.report import corpus_report

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def small(spark):
    rows = [
        (0, "one two three", "en", "https://a.com/1"),
        (1, "one two three", "en", "https://a.com/2"),   # exact dup of 0
        (2, "vier fuenf sechs sieben", "de", "https://b.com/1"),
        (3, "sept huit", "fr", "https://a.com/3"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, url string")


def test_exact_counts(small):
    r = corpus_report(small, lang_col="lang", url_col="url")
    assert r["n_docs"] == 4
    assert r["n_tokens"] == 3 + 3 + 4 + 2
    assert r["n_chars"] == sum(len(t) for t in
                               ["one two three", "one two three",
                                "vier fuenf sechs sieben", "sept huit"])
    assert r["dup_rate"] == 0.25  # 3 distinct fingerprints of 4 docs
    assert r["languages"] == {"en": 0.5, "de": 0.25, "fr": 0.25}
    assert r["top_domains"] == {"a.com": 3, "b.com": 1}
    assert r["token_quantiles"]["p50"] == 3


def test_optional_sections(small):
    r = corpus_report(small)
    assert "languages" not in r and "top_domains" not in r
    ra = corpus_report(small, exact_dups=False)
    assert 0.0 <= ra["dup_rate"] <= 0.5  # sketch, loose bound


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    r = corpus_report(empty)
    assert r == {"n_docs": 0, "n_chars": 0, "n_tokens": 0,
                 "mean_quality": 0.0, "dup_rate": 0.0}


def test_real_corpus_smoke(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    r = corpus_report(docs, lang_col="lang")
    assert r["n_docs"] == 500 and r["n_tokens"] > 0
    assert abs(sum(r["languages"].values()) - 1.0) < 0.01
    assert 0.0 <= r["dup_rate"] < 1.0
    import json
    json.dumps(r)  # the card is JSON-able
