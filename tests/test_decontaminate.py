"""Benchmark decontamination (13-gram collision rule): planted eval
overlap removed, clean docs kept, n / min_overlaps semantics, different
eval text column name, broadcast-shaped plan."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.dedup import decontaminate


def _words(rng, n):
    return " ".join(
        rng.choice("alpha beta gamma delta epsilon zeta eta theta".split())
        + str(rng.randrange(100))
        for _ in range(n)
    )


@pytest.fixture(scope="module")
def setup(spark):
    rng = random.Random(7)
    eval_q = _words(rng, 20)  # one eval "question"
    corpus = [
        (0, _words(rng, 50)),                                   # clean
        (1, _words(rng, 30) + " " + eval_q + " " + _words(rng, 10)),  # contains it
        (2, eval_q),                                             # IS the eval text
        (3, _words(rng, 50)),                                    # clean
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    evals = spark.createDataFrame([(eval_q,), (_words(rng, 15),)], "question string")
    return docs, evals


def test_overlapping_docs_removed(setup):
    docs, evals = setup
    out = sorted(
        r["doc_id"]
        for r in decontaminate(docs, evals, eval_text_col="question").collect()
    )
    assert out == [0, 3]


def test_large_n_means_no_chance_hits(setup):
    docs, evals = setup
    # n longer than the eval text's token count -> no shingles -> nothing removed
    out = decontaminate(docs, evals, eval_text_col="question", n=25)
    assert out.count() == docs.count()
    with pytest.raises(ValueError):
        decontaminate(docs, evals, eval_text_col="question", n=0)


def test_min_overlaps_relaxation(spark):
    rng = random.Random(3)
    shared = _words(rng, 5)  # one short shared run
    docs = spark.createDataFrame(
        [(0, _words(rng, 30) + " " + shared)], "doc_id long, text string"
    )
    evals = spark.createDataFrame([(shared + " " + _words(rng, 30),)], "text string")
    # at n=5 the single shared 5-gram is 1 overlap: removed at threshold 1,
    # kept at threshold 3
    assert decontaminate(docs, evals, n=5, min_overlaps=1).count() == 0
    assert decontaminate(docs, evals, n=5, min_overlaps=3).count() == 1


def test_rows_returned_unchanged(setup):
    docs, evals = setup
    out = decontaminate(docs, evals, eval_text_col="question")
    assert out.columns == docs.columns
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert all(kept[i] == orig[i] for i in kept)
