"""Exact-substring dedup (keep-first ExactSubstr semantics): later
copies of a planted long span removed while the first stays
byte-identical, within-doc repetition, min_tokens boundary, rows never
disappear, partition invariance, audit counts, Arrow-only plan."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.substring_dedup import remove_duplicate_spans


def _words(rng, n, tag=""):
    return " ".join(f"{tag}w{rng.randrange(10**6)}" for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(42)
    span = _words(rng, 60, "S")  # the duplicated passage
    rows = [
        (0, _words(rng, 30, "a") + " " + span + " " + _words(rng, 30, "b")),  # FIRST
        (1, _words(rng, 20, "c") + " " + span),                               # later copy
        (2, span + " " + _words(rng, 25, "d")),                               # later copy
        (3, _words(rng, 80, "e")),                                            # clean
        (4, span),                                                            # copy, whole doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), span


def test_keep_first_remove_rest(corpus):
    df, span = corpus
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, min_tokens=50).collect()}
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    assert out[0]["text"] == orig[0]            # first occurrence untouched
    assert out[0]["n_tokens_removed"] == 0
    for i in (1, 2):
        assert span not in out[i]["text"]       # later copies stripped
        assert out[i]["n_tokens_removed"] == 60
    # surrounding unique text survives byte-identically
    assert out[1]["text"] == orig[1].split(" " + span)[0]
    assert out[2]["text"] == orig[2].split(span + " ")[1]
    assert out[3]["text"] == orig[3] and out[3]["n_tokens_removed"] == 0
    assert out[4]["text"] == "" and out[4]["n_tokens_removed"] == 60  # row survives empty
    assert len(out) == 5


def test_within_doc_repetition(spark):
    rng = random.Random(7)
    span = _words(rng, 55, "R")
    text = span + " " + _words(rng, 10, "m") + " " + span
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = remove_duplicate_spans(df, min_tokens=50).collect()[0]
    assert got["text"].count(span) == 1          # second in-doc copy removed
    assert got["text"].startswith(span)          # the FIRST one kept


def test_min_tokens_boundary(spark):
    rng = random.Random(9)
    short = _words(rng, 49, "T")  # one token below the threshold
    df = spark.createDataFrame(
        [(0, short + " " + _words(rng, 20, "x")), (1, short + " " + _words(rng, 20, "y"))],
        "doc_id long, text string",
    )
    out = remove_duplicate_spans(df, min_tokens=50)
    assert out.agg(F.sum("n_tokens_removed")).collect()[0][0] == 0
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, min_tokens=1)


def test_partition_invariance(corpus):
    df, _ = corpus
    a = sorted((r["doc_id"], r["text"]) for r in remove_duplicate_spans(df, min_tokens=50).collect())
    b = sorted(
        (r["doc_id"], r["text"])
        for r in remove_duplicate_spans(df.repartition(7, "doc_id"), min_tokens=50).collect()
    )
    assert a == b


def test_arrow_only_plan(corpus):
    df, _ = corpus
    plan = (
        remove_duplicate_spans(df, min_tokens=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
