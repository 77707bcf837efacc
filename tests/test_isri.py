"""ISRI Arabic stemmer parity vs the reference + LanguageAnalyzer('ar')."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from whoosh_novo_spark.functions.isri import stem

_ALPHA = "ابتثجحخدذرزسشصضطظعغفقكلمنهويآأإؤئةىًٌٍَُِّْ"


def test_golden_vs_reference(whoosh_ref):
    from whoosh.lang.isri import ISRIStemmer

    ref = ISRIStemmer()
    rng = random.Random(44)
    vocab = set(ref.stop_words)
    for _ in range(10000):
        vocab.add(
            "".join(rng.choice(_ALPHA) for _ in range(rng.randint(1, 10)))
        )
    mismatches = [
        (w, ref.stem(w), stem(w)) for w in sorted(vocab) if ref.stem(w) != stem(w)
    ]
    assert mismatches == [], mismatches[:10]


def test_language_analyzer_ar_parity(whoosh_ref):
    from whoosh.analysis import LanguageAnalyzer

    from whoosh_novo_spark.functions.analysis import ANALYZERS

    texts = [
        "كتب الطالب الدرس في المدرسة",
        "المستخدمون يقرؤون الوثائق المهمة",
        "",
    ]
    ana = LanguageAnalyzer("ar")
    batch = ANALYZERS["lang_ar"](pd.Series(texts))
    ours: list[list[tuple]] = [[] for _ in texts]
    for r, t, p in zip(batch.row, batch.term, batch.pos):
        ours[r].append((t, int(p)))
    for text, got in zip(texts, ours):
        want = [(t.text, t.pos) for t in ana(text, positions=True)]
        assert got == want, (text, got, want)
