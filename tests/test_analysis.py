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


def test_vectorized_positions_fold_equals_pandas_groupby():
    """The build's lexsort+split positions fold must equal the per-group
    pandas aggregation it replaced (operators/build.py analyze path)."""
    import numpy as np
    import pandas as pd

    from whoosh_novo_spark.functions.analysis import ANALYZERS

    texts = pd.Series(
        [
            "the quick brown fox jumps over the lazy dog the fox",
            "spark spark spark index merge index",
            "",
            "one",
            "alpha beta alpha gamma beta alpha",
        ]
    )
    tb = ANALYZERS["standard"](texts)
    # old path: pandas groupby with list lambda
    tdf = pd.DataFrame({"row": tb.row, "term": tb.term, "pos": tb.pos})
    agg = (
        tdf.groupby(["row", "term"], sort=False)
        .agg(tf=("pos", "size"), positions=("pos", lambda s: list(s)))
        .reset_index()
    )
    want = {
        (int(r.row), r.term): (int(r.tf), [int(p) for p in r.positions])
        for r in agg.itertuples()
    }
    # new path: lexsort + run-length split (mirrors build.py)
    row_a = np.asarray(tb.row, dtype=np.int64)
    pos_a = np.asarray(tb.pos, dtype=np.int32)
    codes, uniq_terms = pd.factorize(pd.Series(tb.term))
    order = np.lexsort((pos_a, codes, row_a))
    r2, c2, p2 = row_a[order], codes[order], pos_a[order]
    new_g = np.empty(len(r2), dtype=bool)
    new_g[0] = True
    new_g[1:] = (r2[1:] != r2[:-1]) | (c2[1:] != c2[:-1])
    starts = np.flatnonzero(new_g)
    tf_a = np.diff(np.append(starts, len(r2)))
    terms = np.asarray(uniq_terms, dtype=object)[c2[starts]]
    plists = np.split(p2, starts[1:])
    got = {
        (int(r2[s]), t): (int(n), [int(p) for p in pl])
        for s, t, n, pl in zip(starts, terms, tf_a, plists)
    }
    assert got == want
