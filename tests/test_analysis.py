"""Analyzer parity: our vectorized chain must be token- and
position-identical to the reference StandardAnalyzer."""

from __future__ import annotations

import pandas as pd
import pytest

from whoosh_novo_spark.functions.analysis import (
    STOP_WORDS,
    analyze_query_terms,
    simple_analyze_batch,
    standard_analyze_batch,
)
from whoosh_novo_spark.functions.quantize import (
    byte_to_length,
    length_to_byte,
    quantized_length_np,
)

GOLDEN_TEXTS = [
    "Testing is testing and testing",
    "hi there 3.141 big-time under_score",
    "The ides of March",
    "Straße CAFÉ Ça naïve",
    "",
    "a an the of",  # all stopwords
    "x y z",  # all under minsize
    "dotted.token trailing. .leading a*glob",
    "ALLCAPS MiXeD 42 2x4   multiple   spaces",
    "tab\tseparated\nnewlines too",
]


def _ref_tokens(whoosh_ref, text, positions=False):
    from whoosh.analysis import StandardAnalyzer

    sa = StandardAnalyzer()
    if positions:
        return [(t.text, t.pos) for t in sa(text, positions=True)]
    return [t.text for t in sa(text)]


def test_tokens_match_reference(whoosh_ref):
    batch = standard_analyze_batch(pd.Series(GOLDEN_TEXTS))
    ours: list[list[str]] = [[] for _ in GOLDEN_TEXTS]
    for r, t in zip(batch.row, batch.term):
        ours[r].append(t)
    for text, got in zip(GOLDEN_TEXTS, ours):
        assert got == _ref_tokens(whoosh_ref, text), text


def test_positions_match_reference(whoosh_ref):
    batch = standard_analyze_batch(pd.Series(GOLDEN_TEXTS))
    ours: list[list[tuple]] = [[] for _ in GOLDEN_TEXTS]
    for r, t, p in zip(batch.row, batch.term, batch.pos):
        ours[r].append((t, int(p)))
    for text, got in zip(GOLDEN_TEXTS, ours):
        assert got == _ref_tokens(whoosh_ref, text, positions=True), text


def test_corpus_tokens_match_reference(whoosh_ref):
    from whoosh_novo_spark.sources.corpus import corpus_pandas

    pdf = corpus_pandas(50, seed=7)
    batch = standard_analyze_batch(pdf["text"])
    ours: list[list[str]] = [[] for _ in range(len(pdf))]
    for r, t in zip(batch.row, batch.term):
        ours[r].append(t)
    for text, got in zip(pdf["text"], ours):
        assert got == _ref_tokens(whoosh_ref, text)


def test_stopwords_match_reference(whoosh_ref):
    from whoosh.analysis.filters import STOP_WORDS as REF_STOPS

    assert STOP_WORDS == REF_STOPS


def test_simple_analyzer_keeps_stopwords():
    batch = simple_analyze_batch(pd.Series(["The a of thing"]))
    assert list(batch.term) == ["the", "a", "of", "thing"]


def test_query_analysis():
    assert analyze_query_terms("The Render AND Shade") == ["render", "shade"]


def test_quantization_matches_reference(whoosh_ref):
    from whoosh.util.numeric import byte_to_length as rb2l
    from whoosh.util.numeric import length_to_byte as rl2b

    for L in list(range(0, 3000)) + [50_000, 106_373, 106_374, 10**7]:
        assert length_to_byte(L) == rl2b(L)
        assert byte_to_length(length_to_byte(L)) == rb2l(rl2b(L))


def test_quantization_vectorized():
    import numpy as np

    xs = np.array([1, 2, 3, 17, 100, 1000, 106374, 2_000_000])
    assert list(quantized_length_np(xs)) == [
        byte_to_length(length_to_byte(int(x))) for x in xs
    ]
