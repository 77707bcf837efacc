"""PositionBoosts/CharacterBoosts payloads (formats.py:345-470) and the
delimited-boost analyzer (DelimitedAttributeFilter, filters.py:504-578).

Goldens compare our vectorized analyzer + per-(doc,term) aggregation
against the REFERENCE format classes' word_values()/decode_*() output on
the same texts (field_boost=1.0 — the reference CharacterBoosts yields
the raw summed boost but packs summedboost*fb, an inconsistency vs
PositionBoosts at fb != 1, so goldens pin fb=1 where both agree)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from whoosh_novo_spark.functions.analysis import (
    delimited_boost_analyze_batch,
    delimited_boost_analyze_batch_chars,
)

TEXTS = [
    "image render^2 file^0.5",
    "plain words only",
    "big^10 big^0.25 big",
    "Mixed^2.5 CASE^3 case",
    "one^1",
    "",
    "trail^2 lead mid^0.75 end^4",
]


def _ref_analyzer():
    from whoosh.analysis import DelimitedAttributeFilter, LowercaseFilter, RegexTokenizer

    return RegexTokenizer(r"\S+") | DelimitedAttributeFilter() | LowercaseFilter()


def _ours_grouped(texts, chars=False):
    """(term -> (tf, weight, payload)) per text, mirroring word_values."""
    fn = delimited_boost_analyze_batch_chars if chars else delimited_boost_analyze_batch
    tb = fn(pd.Series(texts))
    out = [dict() for _ in texts]
    for i in range(len(tb.term)):
        r, w = int(tb.row[i]), tb.term[i]
        entry = out[r].setdefault(w, [0, 0.0, []])
        entry[0] += 1
        entry[1] += float(tb.boost[i])
        if chars:
            entry[2].append(
                (int(tb.pos[i]), int(tb.start[i]), int(tb.end[i]), float(tb.boost[i]))
            )
        else:
            entry[2].append((int(tb.pos[i]), float(tb.boost[i])))
    return out


def test_position_boosts_golden(whoosh_ref):
    from whoosh.formats import PositionBoosts

    fmt = PositionBoosts()
    ana = _ref_analyzer()
    ours = _ours_grouped(TEXTS)
    for i, text in enumerate(TEXTS):
        ref = {
            w: (tf, weight, fmt.decode_position_boosts(value))
            for w, tf, weight, value in fmt.word_values(text, ana)
        }
        assert set(ref) == set(ours[i]), text
        for w, (tf, weight, pb) in ref.items():
            otf, oweight, opb = ours[i][w]
            assert otf == tf, (text, w)
            assert oweight == pytest.approx(weight), (text, w)
            assert [(p, pytest.approx(b)) for p, b in pb] == [
                (p, pytest.approx(b)) for p, b in opb
            ], (text, w)


def test_character_boosts_golden(whoosh_ref):
    from whoosh.formats import CharacterBoosts

    fmt = CharacterBoosts()
    ana = _ref_analyzer()
    ours = _ours_grouped(TEXTS, chars=True)
    for i, text in enumerate(TEXTS):
        ref = {
            w: (tf, weight, fmt.decode_character_boosts(value))
            for w, tf, weight, value in fmt.word_values(text, ana)
        }
        assert set(ref) == set(ours[i]), text
        for w, (tf, weight, pcb) in ref.items():
            otf, oweight, opcb = ours[i][w]
            assert otf == tf, (text, w)
            assert oweight == pytest.approx(weight), (text, w)
            for (p, s, e, b), (op, os_, oe, ob) in zip(pcb, opcb):
                assert (p, s, e) == (op, os_, oe), (text, w)
                assert b == pytest.approx(ob), (text, w)


def test_unparseable_boost_deviation():
    """Documented deviation: the reference raises ValueError on 'a^x'
    (float('x')); we keep the full token with the default boost so one
    malformed token can't kill a distributed ingest."""
    tb = delimited_boost_analyze_batch(pd.Series(["a^x b^ c^3"]))
    got = {tb.term[i]: float(tb.boost[i]) for i in range(len(tb.term))}
    assert got == {"a^x": 1.0, "b^": 1.0, "c": 3.0}


def test_boosted_index_build_and_ranking(spark, tmp_path):
    """End-to-end: boosts=True stores weight=sum(boost)*fb and a boosts
    array aligned with positions; BM25 ranking reflects the markup."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    rows = [
        ("d0", "render^3 page"),     # weight(render) = 3
        ("d1", "render render page"),  # weight(render) = 2
        ("d2", "render page"),       # weight(render) = 1
        ("d3", "other words here"),
    ]
    docs = spark.createDataFrame(rows, "uid string, text string")
    cfg = IndexConfig(
        id_col="uid",
        fields=(
            FieldConfig("text", analyzer="delimited_boost", boosts=True, positions=True),
        ),
    )
    store = SegmentStore(str(tmp_path / "ix"))
    build_segment(spark, docs, cfg, store, partitions=4)
    s = Searcher(Index(spark, store, cfg))

    post = {
        r["docid"]: r
        for r in s.index.postings().where("term = 'render'").collect()
    }
    uid = {
        r["docid"]: r["uid"]
        for r in s.index.docmap().select("docid", "uid").collect()
    }
    by_uid = {uid[d]: r for d, r in post.items()}
    assert by_uid["d0"]["weight"] == pytest.approx(3.0)
    assert by_uid["d1"]["weight"] == pytest.approx(2.0)
    assert len(by_uid["d1"]["positions"]) == 2  # tf unchanged by boosts
    assert len(by_uid["d0"]["positions"]) == 1
    assert list(by_uid["d0"]["boosts"]) == [3.0]
    assert list(by_uid["d1"]["boosts"]) == [1.0, 1.0]
    assert list(by_uid["d1"]["positions"]) == [0, 1]

    # same doc length (2 tokens each) -> ranking is by summed boost
    hits = s.search(ast.Term("text", "render"), limit=3).collect()
    assert [uid[h["docid"]] for h in hits] == ["d0", "d1", "d2"]


def test_boosts_all_one_matches_tf(spark, tmp_path):
    """boosts=True with a non-boost analyzer degenerates to weight == tf
    (every token boost 1.0), so scoring matches the plain config."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    rows = [("a", "spark data spark"), ("b", "spark only here")]
    docs = spark.createDataFrame(rows, "uid string, text string")
    cfg = IndexConfig(
        id_col="uid", fields=(FieldConfig("text", analyzer="standard", boosts=True),)
    )
    store = SegmentStore(str(tmp_path / "ix1"))
    build_segment(spark, docs, cfg, store, partitions=2)
    post = Index(spark, store, cfg).postings().where("term = 'spark'").collect()
    expected = {"a": 2.0, "b": 1.0}  # == tf with all-1.0 boosts
    uid = {
        r["docid"]: r["uid"]
        for r in Index(spark, store, cfg).docmap().select("docid", "uid").collect()
    }
    for r in post:
        assert r["weight"] == pytest.approx(expected[uid[r["docid"]]])
