"""IntraWordFilter parity with the reference over all merge-flag combos."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.functions.intraword import IntraWord

STRINGS = [
    "PowerShot",
    "Wi-Fi",
    "SD500",
    "Super-Duper-XL500-42-AutoCoder!",
    "A's+B's&C's",
    "O'Neil's",
    "simple",
    "ALLCAPS",
    "12345",
    "camelCaseAnd123Numbers",
    "--leading-and-trailing--",
    "a1b2c3",
    "don't",
    "rock'n'roll",
    "MiXeD-bag_of/things.here",
    "''",
    "x",
]

COMBOS = [
    {"mergewords": False, "mergenums": False},
    {"mergewords": True, "mergenums": False},
    {"mergewords": False, "mergenums": True},
    {"mergewords": True, "mergenums": True},
    {"splitwords": False, "mergenums": True},
    {"splitnums": False, "mergewords": True},
]


def _ref_tokens(whoosh_ref, text, **kw):
    from whoosh.analysis import RegexTokenizer
    from whoosh.analysis.intraword import IntraWordFilter

    chain = RegexTokenizer(r"\S+") | IntraWordFilter(**kw)
    return [(t.text, t.pos) for t in chain(text, positions=True)]


@pytest.mark.parametrize("kw", COMBOS, ids=lambda k: ",".join(f"{a}={int(v)}" for a, v in k.items()))
def test_intraword_matches_reference(whoosh_ref, kw):
    iw = IntraWord(**kw)
    for s in STRINGS:
        # one source token per \S+ run, positions from the tokenizer
        src = [(w, i) for i, w in enumerate(s.split())]
        ours = iw.apply(src)
        theirs = _ref_tokens(whoosh_ref, s, **kw)
        assert ours == theirs, (s, kw, ours, theirs)


def test_fancy_analyzer_matches_reference(whoosh_ref):
    import pandas as pd
    from whoosh.analysis import FancyAnalyzer

    from whoosh_novo_spark.functions.analysis import fancy_analyze_batch

    texts = [
        "Should I call getInt or get_real?",
        "the PowerShot SD500 is Wi-Fi enabled",
        "O'Neil's camelCase 123abc plain words",
        "",
    ]
    fa = FancyAnalyzer()
    tb = fancy_analyze_batch(pd.Series(texts))
    ours: list[list] = [[] for _ in texts]
    for r, t, p in zip(tb.row, tb.term, tb.pos):
        ours[r].append((t, int(p)))
    for text, got in zip(texts, ours):
        want = [(t.text, t.pos) for t in fa(text, positions=True)]
        assert got == want, (text, got, want)


def test_intraword_multi_token_stream(whoosh_ref):
    iw = IntraWord(mergewords=True, mergenums=True)
    text = "the PowerShot SD500 is Wi-Fi enabled don't you know XL-42"
    src = [(w, i) for i, w in enumerate(text.split())]
    ours = iw.apply(src)
    theirs = _ref_tokens(whoosh_ref, text, mergewords=True, mergenums=True)
    assert ours == theirs
