"""BPE tokenizer: hand-traced merge-order golden (the Sennrich paper
example shape), indexed-trainer == naive-recount parity, per-word byte
round-trip, training partition invariance, histogram caps honored,
monotone compression with vocab size, count==encode-length agreement,
pretoken lower bound, Arrow plan gate."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.bpe import (
    _encode_word,
    _train_merges_from_counts,
    bpe_encode_udf,
    bpe_token_count_udf,
    pretokenize,
    train_bpe,
    word_histogram,
)
from whoosh_novo_spark.functions.textstats import bpe_pretoken_count


def test_hand_traced_merges():
    # histogram: low x5, lower x2  ->  first merges build "low" greedily.
    counts = [(b"low", 5), (b"lower", 2)]
    merges = _train_merges_from_counts(counts, 3)
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,e)=2, (e,r)=2
    # tie 7/7 -> lexicographically smallest pair (l,o) wins
    assert merges[0] == (b"l", b"o")
    # round 2: (lo,w)=7 dominates
    assert merges[1] == (b"lo", b"w")
    # round 3: (low,e)=2 ties (e,r)=2 -> (e,r) < (low,e) lexicographically
    assert merges[2] == (b"e", b"r")
    # encoding under those merges
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word(b"low", ranks) == [b"low"]
    assert _encode_word(b"lower", ranks) == [b"low", b"er"]
    assert _encode_word(b"slow", ranks) == [b"s", b"low"]
    assert _encode_word(b"new", ranks) == [b"n", b"e", b"w"]


def _naive_train(word_counts, n_merges):
    """Reference trainer: full recount every round (O(histogram) per
    merge) — must produce the identical merge sequence."""
    words = [[bytes([b]) for b in w] for w, _ in word_counts]
    freqs = [c for _, c in word_counts]
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, f in zip(words, freqs):
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for wi, syms in enumerate(words):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
    return merges


def test_indexed_trainer_matches_naive_recount():
    rng = random.Random(5)
    alphabet = "abcdef"
    counts = [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 9))).encode(),
            rng.randrange(1, 50),
        )
        for _ in range(120)
    ]
    counts = list({w: c for w, c in counts}.items())  # unique words
    assert _train_merges_from_counts(list(counts), 60) == _naive_train(list(counts), 60)


def test_pretokenize_pieces():
    assert pretokenize("We've 42 cats!") == ["We", "'ve", " 42", " cats", "!"]
    # underscores and punctuation keep their leading space; whitespace-
    # only pieces are dropped
    assert pretokenize("a _b c.") == ["a", " _", "b", " c", "."]
    assert pretokenize("") == []


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    vocab = ["spark", "index", "token", "merge", "corpus", "byte", "pair", "the", "and"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(40)) + f" doc{i}")
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_partition_invariant(corpus):
    a = train_bpe(corpus, vocab_size=300, min_freq=1)
    b = train_bpe(corpus.repartition(13, "doc_id"), vocab_size=300, min_freq=1)
    assert a["merges"] == b["merges"] and len(a["merges"]) == 44
    assert a["truncated"] is False and a["n_words"] == a["n_words_used"]


def test_histogram_caps(corpus):
    full = train_bpe(corpus, vocab_size=300, min_freq=1)
    capped = train_bpe(corpus, vocab_size=300, min_freq=1, max_words=5)
    assert capped["n_words_used"] == 5 and capped["truncated"] is True
    assert full["n_words_used"] > 5
    rare_cut = train_bpe(corpus, vocab_size=300, min_freq=50)
    assert rare_cut["n_words"] < full["n_words"]  # doc{i} singletons dropped
    with pytest.raises(ValueError):
        train_bpe(corpus, vocab_size=256)


def test_encode_round_trip_and_count(corpus):
    model = train_bpe(corpus, vocab_size=400, min_freq=1)
    enc = corpus.withColumn("toks", bpe_encode_udf(model["merges"])(F.col("text")))
    cnt = corpus.withColumn("n", bpe_token_count_udf(model["merges"])(F.col("text")))
    rows = {r["doc_id"]: r for r in enc.collect()}
    counts = {r["doc_id"]: r["n"] for r in cnt.collect()}
    for r in corpus.collect():
        toks = rows[r["doc_id"]]["toks"]
        # concatenated token bytes == concatenated pre-token bytes
        assert b"".join(bytes(t) for t in toks) == "".join(
            pretokenize(r["text"])
        ).encode("utf-8")
        assert counts[r["doc_id"]] == len(toks)
        # learned tokens: at least one pre-token piece each, at most bytes
        n_pre = len(pretokenize(r["text"]))
        assert n_pre <= len(toks) <= len(r["text"].encode())


def test_bigger_vocab_compresses_more(corpus):
    small = train_bpe(corpus, vocab_size=280, min_freq=1)
    big = train_bpe(corpus, vocab_size=500, min_freq=1)
    tot = lambda m: (
        corpus.select(
            F.sum(bpe_token_count_udf(m["merges"])(F.col("text"))).alias("s")
        ).collect()[0]["s"]
    )
    n_small, n_big = tot(small), tot(big)
    assert n_big < n_small  # more merges, fewer tokens on the training corpus
    # frequent whole words became single tokens
    ranks = {p: i for i, p in enumerate(big["merges"])}
    assert _encode_word(b" spark", ranks) == [b" spark"]


def test_pretoken_estimator_is_a_lower_bound(corpus):
    """textstats.bpe_pretoken_count (the Java-regex estimator) counts
    pieces; the learned tokenizer can only split pieces further."""
    model = train_bpe(corpus, vocab_size=300, min_freq=1)
    both = corpus.select(
        bpe_pretoken_count("text").alias("est"),
        bpe_token_count_udf(model["merges"])(F.col("text")).alias("real"),
    ).collect()
    assert all(r["est"] <= r["real"] for r in both)


def test_word_histogram_and_plan(corpus):
    hist = word_histogram(corpus)
    top = hist.orderBy(F.desc("freq")).limit(1).collect()[0]
    assert top["freq"] > 500  # the 9-word vocab dominates
    plan = (
        corpus.select(bpe_token_count_udf([])(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
