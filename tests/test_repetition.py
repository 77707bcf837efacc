"""Gopher repetition signals: hand-computed goldens, kernel==single-doc
parity, filter semantics (drop repetitious / keep clean, threshold
override, unknown-key rejection), Arrow-batched plan gate, and a
real-corpus smoke check."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.repetition import (
    GOPHER_THRESHOLDS,
    gopher_repetition_filter,
    repetition_signals,
    with_repetition_signals,
)

SF = "/root/testdata/sf0.001"


def test_dup_line_golden():
    sig = repetition_signals("alpha beta\ngamma\nalpha beta\ndelta")
    # lines: [alpha beta, gamma, alpha beta, delta] -> 1 of 4 repeats
    assert sig["dup_line_frac"] == pytest.approx(0.25)
    # chars: repeated "alpha beta" (10) / total (10+5+10+5)
    assert sig["dup_line_char_frac"] == pytest.approx(10 / 30)


def test_dup_para_golden():
    text = "para one here\n\npara two\n\npara one here"
    sig = repetition_signals(text)
    assert sig["dup_para_frac"] == pytest.approx(1 / 3)
    assert sig["dup_para_char_frac"] == pytest.approx(13 / (13 + 8 + 13))


def test_top_2gram_golden():
    # tokens: foo bar foo bar baz -> (foo,bar) x2 covers 2*6 chars of 15
    sig = repetition_signals("foo bar foo bar baz")
    assert sig["top_2gram_char_frac"] == pytest.approx(12 / 15)
    # a once-occurring top n-gram is not repetition -> 0
    assert repetition_signals("one two three four")["top_2gram_char_frac"] == 0.0


def test_dup_5gram_overlap_counted_once():
    # "a b c d e" repeated: every token position is covered by some
    # duplicated 5-gram -> fraction 1.0 (overlaps must not double-count)
    sig = repetition_signals("a b c d e a b c d e a b c d e")
    assert sig["dup_5gram_char_frac"] == pytest.approx(1.0)
    # clean text: no duplicated 5-gram
    clean = "one two three four five six seven eight nine ten"
    assert repetition_signals(clean)["dup_5gram_char_frac"] == 0.0


def test_empty_and_short_edges():
    for text in ("", "   \n \n", "word"):
        sig = repetition_signals(text)
        assert all(v == 0.0 for v in sig.values()), text


def test_vectorized_matches_exact_dict_form():
    """The numpy n-gram path must equal the exact dict-of-tuples
    formulation signal-for-signal on random and adversarial docs."""
    from whoosh_novo_spark.functions.repetition import (
        _TOKEN_RX,
        _dup_ngram_char_frac,
        _top_ngram_char_frac,
    )

    rng = random.Random(31)
    vocab = "aa bbb c dddd ee fff gg hhhhh".split()
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 200))) for _ in range(40)]
    texts += ["", "one", "spam ham " * 50, "x " * 9]  # edges: empty, <n, heavy dup
    for text in texts:
        toks = [t.lower() for t in _TOKEN_RX.findall(text)]
        lens = [len(t) for t in toks]
        total = sum(lens)
        got = repetition_signals(text)
        for n in (2, 3, 4):
            exp = _top_ngram_char_frac(toks, lens, n, total)
            assert got[f"top_{n}gram_char_frac"] == pytest.approx(exp), (n, text[:40])
        for n in (5, 6, 7, 8, 9, 10):
            exp = _dup_ngram_char_frac(toks, lens, n, total)
            assert got[f"dup_{n}gram_char_frac"] == pytest.approx(exp), (n, text[:40])


def test_kernel_matches_single_doc(spark):
    rng = random.Random(13)
    vocab = "red green blue cyan teal gold gray pink".split()
    texts = []
    for _ in range(25):
        lines = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 9)))
            for _ in range(rng.randrange(0, 8))
        ]
        texts.append("\n".join(lines))
    texts += ["spam spam spam spam spam spam", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["rep"].asDict() for r in with_repetition_signals(df).collect()}
    for i, t in enumerate(texts):
        exp = repetition_signals(t)
        for k, v in exp.items():
            assert got[i][k] == pytest.approx(v), (i, k)


def test_filter_drops_repetitious_keeps_clean(spark):
    clean = (
        "the quick brown fox jumps over the lazy dog while a careful "
        "reader notes every single different word in this plain sentence"
    )
    spammy = "buy cheap pills now " * 30
    dup_lines = "\n".join(["identical line of text"] * 10 + ["one other line"])
    df = spark.createDataFrame(
        [(0, clean), (1, spammy), (2, dup_lines)], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in gopher_repetition_filter(df).collect())
    assert kept == [0]
    # audit column present with keep_signals (default), absent without
    out = gopher_repetition_filter(df)
    assert "rep" in out.columns
    assert "rep" not in gopher_repetition_filter(df, keep_signals=False).columns


def test_threshold_override_and_unknown_key(spark):
    # a repeated SINGLE-token line: dup_line_frac = 0.25 with every n-gram
    # signal untouched (its neighbours differ at both occurrences)
    text = "sep\nalpha beta gamma delta epsilon\nsep\nzeta eta theta iota kappa"
    sig = repetition_signals(text)
    assert sig["dup_line_frac"] == pytest.approx(0.25)
    assert all(v == 0.0 for k, v in sig.items() if k != "dup_line_frac" and "line" not in k)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    # 0.25 passes the published 0.30 cutoff, fails a 0.2 override
    assert gopher_repetition_filter(df).count() == 1
    assert gopher_repetition_filter(df, thresholds={"dup_line_frac": 0.2}).count() == 0
    with pytest.raises(ValueError):
        gopher_repetition_filter(df, thresholds={"nope": 0.1})


def test_plan_is_arrow_batched(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = with_repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_real_corpus_smoke(spark):
    """The synthetic corpus is mostly non-repetitious: the filter keeps a
    clear majority and every signal lands in [0, 1]."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    out = with_repetition_signals(docs)
    mins_maxs = out.select(
        *[F.min(F.col("rep")[f]).alias(f"lo_{f}") for f in GOPHER_THRESHOLDS],
        *[F.max(F.col("rep")[f]).alias(f"hi_{f}") for f in GOPHER_THRESHOLDS],
    ).collect()[0]
    for k, v in mins_maxs.asDict().items():
        assert 0.0 <= v <= 1.0, (k, v)
    kept = gopher_repetition_filter(docs).count()
    assert kept > 0.5 * n
