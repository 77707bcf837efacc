"""DoubleMetaphone / soundex parity vs the reference + an indexed
phonetic-field query."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from whoosh_novo_spark.functions.phonetic import (
    dmetaphone_filter,
    double_metaphone,
    soundex_en,
)

NAMES = """michael caesar chianti mcclellan bacchus accident accede succeed
bertucci gregor edge schmidt snider school schooner schermerhorn schenker
resnais artois thomas thames schneider filipowicz wasserman vasserman arnow
arnoff island isle carlisle carlysle sugar hochmeier rogier breaux cabrillo
gallegos dumb thumb jose hugh laugh mclaughlin cough gough rough tough cagney
tagliaro biaggi ghislane ghiradelli danger ranger manger yankelovich
jankelowicz zhao czerny focaccia chore orchestra architect orchid smith
knight gnome pneumonia wright psalm xavier alexander nation motion""".split()


def _vocab(n_random: int = 8000) -> list[str]:
    rng = random.Random(0xD3)
    vocab = set(NAMES)
    for _ in range(n_random):
        n = rng.randint(1, 10)
        vocab.add("".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n)))
    return sorted(vocab)


def test_double_metaphone_golden_vs_reference(whoosh_ref):
    from whoosh.lang.dmetaphone import double_metaphone as ref_dm

    mismatches = [
        (w, ref_dm(w), double_metaphone(w))
        for w in _vocab()
        if ref_dm(w) != double_metaphone(w)
    ]
    assert mismatches == [], mismatches[:10]


def test_soundex_golden_vs_reference(whoosh_ref):
    from whoosh.lang.phonetic import soundex_en as ref_sx

    mismatches = [
        (w, ref_sx(w), soundex_en(w))
        for w in _vocab(2000)
        if ref_sx(w) != soundex_en(w)
    ]
    assert mismatches == [], mismatches[:10]


@pytest.mark.parametrize("combine", [False, True])
def test_dmetaphone_filter_parity(whoosh_ref, combine):
    """StandardAnalyzer | DoubleMetaphoneFilter == our batch filter:
    (text, pos, boost) stream parity including secondary codes."""
    from whoosh.analysis import StandardAnalyzer
    from whoosh.analysis.morph import DoubleMetaphoneFilter

    from whoosh_novo_spark.functions.analysis import standard_analyze_batch

    texts = [
        "Michael Schmidt met Katherine at the orchestra",
        "wright gnome knight pneumonia psalm xavier",
        "Jose laughed at the rough tough cough",
        "",
    ]
    ana = StandardAnalyzer() | DoubleMetaphoneFilter(combine=combine)
    tb = dmetaphone_filter(
        standard_analyze_batch(pd.Series(texts)), combine=combine
    )
    ours: list[list[tuple]] = [[] for _ in texts]
    boosts = tb.boost
    for i in range(len(tb.term)):
        ours[tb.row[i]].append((tb.term[i], int(tb.pos[i]), float(boosts[i])))
    for text, got in zip(texts, ours):
        want = [
            (t.text, t.pos, float(t.boost))
            for t in ana(text, positions=True, boosts=True)
        ]
        assert got == want, (text, got, want)


def test_indexed_phonetic_query(spark, tmp_path):
    """A field indexed with the dmetaphone analyzer matches
    similar-sounding names: querying Smith's primary code hits both
    smith and schmidt docs."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    rows = [
        (0, "john smith wrote code"),
        (1, "johann schmidt wrote essays"),
        (2, "maria garcia sang songs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string")
    cfg = IndexConfig(
        id_col="doc_id", fields=(FieldConfig("name", analyzer="dmetaphone"),)
    )
    store = SegmentStore(str(tmp_path / "ph_ix"))
    build_segment(spark, df, cfg, store, partitions=1)
    s = Searcher(Index(spark, store, cfg))
    prim, _sec = double_metaphone("smith")
    hits = sorted(
        r["docid"] for r in s.search(ast.Term("name", prim), limit=None).collect()
    )
    # smith -> (SM0, XMT); schmidt -> (XMT, SMT)... they share codes via
    # primary/secondary cross-indexing
    assert 0 in hits
    prim2, sec2 = double_metaphone("schmidt")
    hits2 = {
        r["docid"]
        for q in ([prim] + [c for c in (prim2, sec2) if c])
        for r in s.search(ast.Term("name", q), limit=None).collect()
    }
    assert {0, 1} <= hits2 and 2 not in hits2


def test_driver_dm_map_pinned():
    """The phonetic_topk oracle's literal code map must match the live
    double_metaphone over the corpus's closed vocabulary."""
    import __spark_entry__ as entry

    for tok, codes in entry._DM_MAP_PINNED.items():
        assert double_metaphone(tok) == codes, tok


def test_soundex_esp_ar_golden_vs_reference(whoosh_ref):
    """Spanish and Arabic soundex parity (lang/phonetic.py), including
    the Arabic port's unmapped-char code-reuse quirk."""
    import random

    from whoosh.lang.phonetic import soundex_ar as ref_ar
    from whoosh.lang.phonetic import soundex_esp as ref_esp

    from whoosh_novo_spark.functions.phonetic import soundex_ar, soundex_esp

    rng = random.Random(17)
    esp_alpha = "abcdefghijklmnopqrstuvwxyzáéíóúüñ"
    ar_alpha = "ابتثجحخدذرزسشصضطظعغفقكلمنهويأإآ"
    for _ in range(4000):
        w = "".join(rng.choice(esp_alpha) for _ in range(rng.randint(1, 12)))
        assert soundex_esp(w) == ref_esp(w), w
    for _ in range(4000):
        w = "".join(rng.choice(ar_alpha) for _ in range(rng.randint(1, 12)))
        assert soundex_ar(w) == ref_ar(w), w
