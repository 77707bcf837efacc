"""Porter stemmer parity with the reference (including its port quirks)."""

from __future__ import annotations

import numpy as np

from whoosh_novo_spark.functions.porter import stem, stem_array

CLASSIC = """caresses ponies ties caress cats feed agreed plastered bled motoring sing
conflated troubled sized hopping tanned falling hissing fizzed failing filing happy sky
relational conditional rational valenci hesitanci digitizer conformabli radicalli
differentli vileli analogousli vietnamization predication operator feudalism
decisiveness hopefulness callousness formaliti sensitiviti sensibiliti triplicate
formative formalize electriciti electrical hopeful goodness revival allowance inference
airliner gyroscopic adjustable defensible irritant replacement adjustment dependent
adoption homologou communism activate angulariti homologous effective bowdlerize
probate rate cease controll roll generalization generalizations oscillators yellow
yearly sky say crying trying flying dying lying tying news proceed exceed succeed
agreement argument monument element
""".split()


def test_classic_vocab_matches_reference(whoosh_ref):
    from whoosh.lang.porter import stem as refstem

    bad = [(w, stem(w), refstem(w)) for w in CLASSIC if stem(w) != refstem(w)]
    assert not bad, bad


def test_corpus_words_match_reference(whoosh_ref):
    from whoosh.lang.porter import stem as refstem

    from whoosh_novo_spark.functions.analysis import standard_analyze_batch
    from whoosh_novo_spark.sources.corpus import corpus_pandas

    import pandas as pd

    pdf = corpus_pandas(100, seed=13, vocab_size=400)
    tb = standard_analyze_batch(pdf["text"])
    words = sorted(set(tb.term))
    bad = [(w, stem(w), refstem(w)) for w in words if stem(w) != refstem(w)]
    assert not bad, bad[:10]


def test_random_strings_match_reference(whoosh_ref):
    from whoosh.lang.porter import stem as refstem

    rng = np.random.default_rng(0)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = [
        "".join(rng.choice(letters, size=rng.integers(1, 14)))
        for _ in range(3000)
    ]
    # bias toward stemmable endings
    for suf in ["ing", "ed", "s", "es", "ies", "ational", "ation", "ness",
                "ful", "ive", "ion", "tion", "e", "y", "ly", "alli", "eed",
                "ement", "ible", "ll"]:
        words += ["".join(rng.choice(letters, size=rng.integers(1, 8))) + suf
                  for _ in range(60)]
    bad = [(w, stem(w), refstem(w)) for w in words if stem(w) != refstem(w)]
    assert not bad, bad[:10]


def test_stem_array_matches_scalar():
    ws = np.array(["running", "jumps", "jumped", "running"], dtype=object)
    assert list(stem_array(ws)) == [stem(w) for w in ws]


def test_stemming_analyzer(whoosh_ref):
    import pandas as pd

    from whoosh_novo_spark.functions.analysis import stemming_analyze_batch

    from whoosh.analysis import StemmingAnalyzer

    texts = [
        "The Runners were running and jumped over obstacles quickly",
        "nationalization of rational generalizations",
    ]
    ours: list[list[str]] = [[] for _ in texts]
    tb = stemming_analyze_batch(pd.Series(texts))
    for r, t in zip(tb.row, tb.term):
        ours[r].append(t)
    sa = StemmingAnalyzer()
    for text, got in zip(texts, ours):
        assert got == [t.text for t in sa(text)], text
