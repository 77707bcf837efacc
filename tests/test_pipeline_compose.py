"""clean_corpus composition: equivalence to the manual chain, stage
selection and ordering, option forwarding, loud failures on unknown
stages/options."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.c4 import c4_filter
from whoosh_novo_spark.functions.pii import scrub_pii_docs
from whoosh_novo_spark.functions.repetition import gopher_repetition_filter
from whoosh_novo_spark.functions.urls import url_normalize
from whoosh_novo_spark.operators.linededup import remove_duplicate_lines
from whoosh_novo_spark.operators.pipeline import clean_corpus


@pytest.fixture(scope="module")
def crawl(spark):
    rows = []
    for i in range(12):
        prose = (
            f"A perfectly ordinary sentence number {i} sits here.\n"
            "This cookie banner repeats on every single page verbatim.\n"
            f"Some completely different words occupy row {i} instead.\n"
            f"The third thought mentions mail to a@b.com on day {i}."
        )
        rows.append((i, f"HTTPS://Site{i}.com:443/p?utm_source=x&a=1", prose))
    rows.append((100, "https://spam.com/x", "buy cheap pills now " * 30 + "."))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_matches_manual_chain(crawl):
    got = clean_corpus(crawl, options={"line_dedup": {"max_df": 50}})
    manual = crawl.withColumn("url", url_normalize(F.col("url")))
    manual = c4_filter(manual)
    manual = gopher_repetition_filter(manual, keep_signals=False)
    manual = remove_duplicate_lines(manual, max_df=50)
    manual = scrub_pii_docs(manual, audit=False)
    a = sorted(map(tuple, got.select("doc_id", "url", "text").collect()))
    b = sorted(map(tuple, manual.select("doc_id", "url", "text").collect()))
    assert a == b and len(a) > 0


def test_stages_do_their_jobs(crawl):
    out = {r["doc_id"]: r for r in clean_corpus(crawl).collect()}
    assert 100 not in out  # repetition spam dropped
    some = out[0]
    assert some["url"] == "https://site0.com/p?a=1"  # normalized
    assert "<EMAIL>" in some["text"] and "a@b.com" not in some["text"]
    assert "cookie banner" not in some["text"]  # boilerplate line removed
    assert "sentence number 0 sits here" in some["text"]  # unique lines kept


def test_stage_subset_and_order(crawl):
    only_pii = clean_corpus(crawl, stages=("pii",))
    assert only_pii.count() == crawl.count()  # no filtering stages ran
    assert "<EMAIL>" in only_pii.where(F.col("doc_id") == 0).collect()[0]["text"]
    # url untouched without the stage
    assert only_pii.where(F.col("doc_id") == 0).collect()[0]["url"].startswith("HTTPS://")


def test_optional_substring_stage(crawl, spark):
    import random

    rng = random.Random(1)
    span = " ".join(f"Sw{rng.randrange(10**6)}" for _ in range(25))
    rows = [(200, "https://x.com/1", span + " ."), (201, "https://x.com/2", span + " !")]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {
        r["doc_id"]: r
        for r in clean_corpus(
            df,
            stages=("substring_dedup",),
            options={"substring_dedup": {"min_tokens": 25}},
        ).collect()
    }
    assert span in out[200]["text"]          # first copy kept
    assert span not in out[201]["text"]      # later copy stripped
    assert out[201]["n_tokens_removed"] == 25


def test_loud_failures(crawl):
    with pytest.raises(ValueError):
        clean_corpus(crawl, stages=("nope",))
    with pytest.raises(ValueError):
        clean_corpus(crawl, options={"nope": {}})
    with pytest.raises(TypeError):
        clean_corpus(crawl, options={"c4": {"bogus_kw": 1}}).collect()
