"""Lovins stemmer parity vs the reference (both halves: ending removal
with condition letters, and the recoding pass), including the port's
IndexError behavior on degenerate 2-letter inputs."""

from __future__ import annotations

import random

from whoosh_novo_spark.functions.lovins import fix_ending, remove_ending, stem


def test_golden_vs_reference(whoosh_ref):
    from whoosh.lang.lovins import stem as ref_stem

    rng = random.Random(19)
    vocab = set(
        """nationally sensibilities believable conductivity magnesia
        transformations italicizations administrable matricidal
        bimetallism instability""".split()
    )
    for _ in range(10000):
        vocab.add(
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randint(2, 14))
            )
        )
    mismatches = []
    for w in sorted(vocab):
        try:
            r = ref_stem(w)
        except Exception as e:
            r = ("ERR", type(e).__name__)
        try:
            mm = stem(w)
        except Exception as e:
            mm = ("ERR", type(e).__name__)
        if r != mm:
            mismatches.append((w, r, mm))
    assert mismatches == [], mismatches[:10]


def test_examples():
    assert stem("nationally") == "nat"
    assert stem("sensibilities") == "sensibil"
    assert remove_ending("believable") == "believ"
    assert fix_ending("believ") == "belief"  # iev -> ief recoding


def test_alt_stemmer_analyzers(whoosh_ref):
    """stemming_lovins / stemming_paicehusk == reference
    StandardAnalyzer | StemFilter(stemfn=...) token-for-token (on
    inputs where the reference paicehusk is sound)."""
    import pandas as pd
    from whoosh.analysis import StandardAnalyzer, StemFilter

    from whoosh_novo_spark.functions.analysis import ANALYZERS

    texts = ["nationally believable transformations", "running kindness"]
    import whoosh.lang.lovins as rl

    for key, fn in (("stemming_lovins", rl.stem),):
        ana = StandardAnalyzer() | StemFilter(stemfn=fn)
        tb = ANALYZERS[key](pd.Series(texts))
        ours: list[list[str]] = [[] for _ in texts]
        for r, t in zip(tb.row, tb.term):
            ours[r].append(t)
        for text, got in zip(texts, ours):
            assert got == [t.text for t in ana(text)], (key, text)
    tb = ANALYZERS["stemming_paicehusk"](pd.Series(["kindness running"]))
    assert list(tb.term) == ["kind", "run"]
