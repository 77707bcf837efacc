"""Wordnet Thesaurus parity vs the reference + query expansion."""

from __future__ import annotations

import io

import pytest

from whoosh_novo_spark.functions.wordnet import (
    Thesaurus,
    expand_synonyms,
    parse_wn_prolog,
)
from whoosh_novo_spark.plans import ast

FIXTURE = """s(100001740,1,'entity',n,1,11).
s(100002137,1,'abstraction',n,6,0).
s(100002137,2,'abstract entity',n,1,0).
s(102858304,1,'boat',n,1,1).
s(102858304,2,'vessel',n,2,0).
s(104530566,1,'vessel',n,1,0).
s(104530566,2,'watercraft',n,1,0).
s(301234567,1,'Fast',a,1,0).
s(301234567,2,'quick',a,1,0).
s(999999999,1,'x1digit',n,1,0).
x(42).
sk(1,2,'ignored').
"""


def test_parse_and_synonyms_match_reference(whoosh_ref):
    from whoosh.lang import wordnet as ref_wn

    ours = Thesaurus.from_file(io.StringIO(FIXTURE))
    theirs = ref_wn.Thesaurus.from_file(io.StringIO(FIXTURE))
    w2n, _ = parse_wn_prolog(io.StringIO(FIXTURE))
    for word in list(w2n) + ["missing"]:
        assert ours.synonyms(word) == theirs.synonyms(word), word
    # the isalpha filter drops collocations and digit-bearing entries on
    # both sides
    assert "abstract entity" not in w2n and "x1digit" not in w2n
    # case-folding: 'Fast' is stored lowercased and lookup lowercases
    assert ours.synonyms("FAST") == ["quick"]


def test_reference_from_filename_is_broken_but_ours_works(whoosh_ref, tmp_path):
    """COVERAGE.md reference bug #9: the reference opens wn_s.pl in
    binary mode then parses with str literals -> TypeError on py3."""
    from whoosh.lang import wordnet as ref_wn

    p = tmp_path / "wn_s.pl"
    p.write_text(FIXTURE)
    with pytest.raises(TypeError):
        ref_wn.Thesaurus.from_filename(str(p))
    assert Thesaurus.from_filename(str(p)).synonyms("boat") == ["vessel"]


def test_storage_roundtrip(spark, tmp_path):
    t = Thesaurus.from_file(io.StringIO(FIXTURE))
    path = str(tmp_path / "thes_parquet")
    t.to_storage(spark, path)
    t2 = Thesaurus.from_storage(spark, path)
    assert t2.synonyms("vessel") == t.synonyms("vessel") == ["boat", "watercraft"]
    assert t2.synonyms("nothere") == []


def test_expand_synonyms_rewrite():
    t = Thesaurus.from_file(io.StringIO(FIXTURE))
    q = ast.And((ast.Term("text", "boat", boost=2.0), ast.Not(ast.Term("text", "entity"))))
    out = expand_synonyms(q, t, syn_boost=0.5)
    a, b = out.children
    assert isinstance(a, ast.Or)
    assert [(c.text, c.boost) for c in a.children] == [("boat", 2.0), ("vessel", 1.0)]
    # 'entity' has no synonyms in the fixture -> unchanged inside Not
    assert isinstance(b, ast.Not) and b.child.text == "entity"


def test_expanded_query_end_to_end(spark, tmp_path):
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    t = Thesaurus.from_file(io.StringIO(FIXTURE))
    rows = [
        (0, "the boat sailed away"),
        (1, "a fine vessel indeed"),
        (2, "watercraft racing event"),
        (3, "nothing nautical here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = IndexConfig(id_col="doc_id", fields=(FieldConfig("text"),))
    store = SegmentStore(str(tmp_path / "wn_ix"))
    build_segment(spark, df, cfg, store, partitions=1)
    s = Searcher(Index(spark, store, cfg))
    plain = {r["docid"] for r in s.search(ast.Term("text", "boat"), limit=None).collect()}
    assert plain == {0}
    expanded = expand_synonyms(ast.Term("text", "boat"), t)
    got = {r["docid"] for r in s.search(expanded, limit=None).collect()}
    assert got == {0, 1}  # boat OR vessel (watercraft is not a boat synset)
