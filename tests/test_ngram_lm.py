"""Stupid-Backoff LM quality scoring: hand-computed score goldens
(bigram hit, unigram backoff, OOV), kernel==single-doc parity, training
partition invariance + truncation reporting, the CCNet separation
property (gibberish scores worse than in-distribution text), tertile
buckets, Arrow plan gate."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.ngram_lm import (
    _lm_tokens,
    perplexity_buckets,
    pseudo_perplexity_udf,
    score_tokens,
    train_stupid_backoff,
)


def test_score_goldens():
    lm = {
        "uni": {"the": 10, "cat": 5, "sat": 5},
        "bi": {("the", "cat"): 4, ("cat", "sat"): 1},
        "total": 20,
    }
    a = 0.4
    # first token: unigram; then bigram hits
    exp = -(math.log(10 / 20) + math.log(4 / 10) + math.log(1 / 5)) / 3
    assert score_tokens(["the", "cat", "sat"], lm, a) == pytest.approx(exp)
    # unseen bigram backs off to alpha * unigram
    exp2 = -(math.log(5 / 20) + math.log(a * 10 / 20)) / 2
    assert score_tokens(["sat", "the"], lm, a) == pytest.approx(exp2)
    # OOV word: alpha / total at both positions
    exp3 = -(math.log(10 / 20) + math.log(a * a / 20)) / 2
    assert score_tokens(["the", "zzz"], lm, a) == pytest.approx(exp3)
    assert score_tokens([], lm, a) == 0.0


@pytest.fixture(scope="module")
def nat_corpus(spark):
    rng = random.Random(3)
    # zipf-ish natural-looking corpus: few frequent words, stable bigrams
    base = "the cat sat on the mat and the dog ran to the cat".split()
    rows = []
    for i in range(200):
        words = []
        for _ in range(30):
            words.extend(base[rng.randrange(0, len(base) - 2) :][:2])
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_partition_invariant_and_counts(nat_corpus):
    a = train_stupid_backoff(nat_corpus)
    b = train_stupid_backoff(nat_corpus.repartition(11, "doc_id"))
    assert a == b
    assert a["total"] == sum(a["uni"].values())
    assert not a["truncated_uni"] and not a["truncated_bi"]
    # truncation honestly reported
    c = train_stupid_backoff(nat_corpus, max_vocab=3, max_bigrams=5)
    assert c["truncated_uni"] and c["truncated_bi"]
    assert len(c["uni"]) == 3 and len(c["bi"]) == 5
    assert c["total"] == a["total"]  # total is NOT truncated


def test_kernel_matches_single_doc(nat_corpus):
    lm = train_stupid_backoff(nat_corpus)
    scored = nat_corpus.withColumn("ppl", pseudo_perplexity_udf(lm)(F.col("text")))
    for r in scored.limit(20).collect():
        exp = math.exp(score_tokens(_lm_tokens(r["text"]), lm))
        assert r["ppl"] == pytest.approx(exp)


def test_gibberish_scores_worse(spark, nat_corpus):
    """The CCNet property: documents unlike the training distribution
    get higher pseudo-perplexity than in-distribution documents."""
    lm = train_stupid_backoff(nat_corpus)
    rng = random.Random(9)
    gib = " ".join(
        "".join(rng.choice("qxzjvwk") for _ in range(6)) for _ in range(40)
    )
    nat = "the cat sat on the mat and the dog ran to the cat"
    df = spark.createDataFrame([(0, nat), (1, gib)], "doc_id long, text string")
    got = {
        r["doc_id"]: r["ppl"]
        for r in df.withColumn("ppl", pseudo_perplexity_udf(lm)(F.col("text"))).collect()
    }
    assert got[1] > 10 * got[0]


def test_perplexity_buckets(nat_corpus, spark):
    lm = train_stupid_backoff(nat_corpus)
    rng = random.Random(5)
    extra = [
        (1000 + i, " ".join("".join(rng.choice("qxzj") for _ in range(5)) for _ in range(20)))
        for i in range(20)
    ]
    mixed = nat_corpus.unionByName(
        spark.createDataFrame(extra, "doc_id long, text string")
    )
    out = perplexity_buckets(mixed, lm)
    labels = {r["doc_id"]: r["ppl_bucket"] for r in out.collect()}
    assert set(labels.values()) == {"head", "middle", "tail"}
    # every gibberish doc lands in the tail
    assert all(labels[1000 + i] == "tail" for i in range(20))


def test_plan_is_arrow_batched(spark):
    lm = {"uni": {"a": 1}, "bi": {}, "total": 1}
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = (
        df.withColumn("p", pseudo_perplexity_udf(lm)(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
