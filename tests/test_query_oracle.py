"""End-to-end oracle tests: build a segment over a deterministic corpus,
run boolean BM25 queries, and assert rank-identical docids + approx-equal
scores vs the reference whoosh-novo engine on the same rows.

Mirrors the reference's own test style (tests/test_searching.py) but with
the reference itself as the expectation generator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus_rows():
    pdf = corpus_pandas(N_DOCS, seed=11, vocab_size=500)
    # docids are assigned by sorting on url — precompute the same order for
    # the oracle so docid <-> url mapping matches
    pdf = pdf.sort_values("url").reset_index(drop=True)
    return list(zip(pdf["url"], pdf["text"]))


@pytest.fixture(scope="module")
def built(spark, corpus_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ix"))
    store = SegmentStore(path)
    config = IndexConfig(id_col="url", fields=(FieldConfig("text", positions=True),))
    df = spark.createDataFrame(
        [(u, t) for u, t in corpus_rows], "url string, text string"
    )
    build_segment(spark, df, config, store, partitions=4)
    ix = Index(spark, store, config)
    return ix, Searcher(ix)


@pytest.fixture(scope="module")
def oracle(oracle_cls, corpus_rows):
    # id == docid ordinal in url-sorted order (zero-padded for stable sort)
    return oracle_cls([(f"{i:06d}", t) for i, (u, t) in enumerate(corpus_rows)])


QUERY_SPECS = [
    {"type": "term", "terms": ["render"]},
    {"type": "term", "terms": ["w00042"]},
    {"type": "and", "terms": ["render", "shade"]},
    {"type": "and", "terms": ["render", "shade", "texture"]},
    {"type": "or", "terms": ["render", "shade", "texture"]},
    {"type": "or", "terms": ["spark", "index", "w00007"]},
    {"type": "andnot", "terms": ["render", "shade"]},
    {"type": "andmaybe", "terms": ["render", "shade"]},
    {"type": "dismax", "terms": ["render", "shade", "texture"]},
    {"type": "term", "terms": ["nonexistentterm"]},
    {"type": "and", "terms": ["render", "nonexistentterm"]},
    {"type": "or", "terms": ["render", "nonexistentterm"]},
]


def _to_ast(spec) -> ast.Query:
    terms = [ast.Term("text", w) for w in spec.get("terms", [])]
    t = spec["type"]
    if t == "term":
        return terms[0]
    if t == "and":
        return ast.And(tuple(terms))
    if t == "or":
        return ast.Or(tuple(terms))
    if t == "andnot":
        return ast.AndNot(terms[0], terms[1])
    if t == "andmaybe":
        return ast.AndMaybe(terms[0], terms[1])
    if t == "dismax":
        return ast.DisjunctionMax(tuple(terms))
    if t == "require":
        return ast.Require(terms[0], terms[1])
    raise ValueError(t)


def _run_ours(searcher, spec, limit=10):
    rows = searcher.search(_to_ast(spec), limit=limit).collect()
    return [(int(r["docid"]), float(r["score"])) for r in rows]


@pytest.mark.parametrize("spec", QUERY_SPECS, ids=lambda s: s["type"] + ":" + "+".join(s.get("terms", [])))
def test_rank_identity(built, oracle, spec):
    _, searcher = built
    ours = _run_ours(searcher, spec, limit=10)
    theirs = [(int(rid), s) for rid, s in oracle.query(oracle.make_query(spec), limit=10)]
    assert [d for d, _ in ours] == [d for d, _ in theirs], (
        f"rank mismatch for {spec}: ours={ours} theirs={theirs}"
    )
    for (d1, s1), (d2, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), (spec, d1, s1, s2)


def test_stats_match_reference(built, oracle):
    ix, _ = built
    with oracle.ix.searcher() as s:
        assert ix.doc_count_all == s.doc_count_all()
        assert ix.avg_field_length("text") == pytest.approx(
            s.avg_field_length("text")
        )
        # spot-check term stats
        stats = ix.term_stats([("text", "render"), ("text", "shade")])
        for w in ["render", "shade"]:
            st = stats[("text", w)]
            assert st.df == s.doc_frequency("text", w)
            assert st.cf == pytest.approx(s.frequency("text", w))


def test_constantscore_multiterm_matches_reference(built, oracle):
    """Reference-default TermRange/FuzzyTerm: >1 expansion -> every
    matching doc scores the constant boost (terms.py:230-239); a single
    expansion falls through to a scored Term."""
    _, searcher = built
    specs = [
        ({"type": "range", "start": "render", "end": "texture"},
         ast.TermRange("text", "render", "texture")),
        ({"type": "fuzzy", "text": "w00042", "maxdist": 2, "prefixlength": 1},
         ast.FuzzyTerm("text", "w00042", maxdist=2, prefixlength=1)),
    ]
    for spec, q in specs:
        ours = [
            (int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, limit=10).collect()
        ]
        theirs = [(int(d), s) for d, s in oracle.query(oracle.make_query(spec), limit=10)]
        assert [d for d, _ in ours] == [d for d, _ in theirs], spec
        for (_, s1), (_, s2) in zip(ours, theirs):
            assert s1 == pytest.approx(s2, rel=1e-9), spec


def test_require_semantics(built):
    """Require(a, b): docs of a∩b scored only by a (wrappers.py:420-483).

    Not compared to the reference directly: whoosh-novo's own Require
    matcher crashes with `assert a_id != b_id` inside
    IntersectionMatcher._find_next (binary.py:468) on this corpus — a
    reference bug — so we assert the documented semantics instead."""
    _, searcher = built
    req = searcher.search(
        ast.Require(ast.Term("text", "render"), ast.Term("text", "shade")), limit=None
    ).collect()
    both = searcher.search(
        ast.And((ast.Term("text", "render"), ast.Term("text", "shade"))), limit=None
    ).collect()
    a_only = {
        r["docid"]: r["score"]
        for r in searcher.search(ast.Term("text", "render"), limit=None).collect()
    }
    assert {r["docid"] for r in req} == {r["docid"] for r in both}
    for r in req:
        assert r["score"] == pytest.approx(a_only[r["docid"]])


def test_unlimited_matches_all(built, oracle):
    _, searcher = built
    ours = searcher.search(ast.Term("text", "render"), limit=None).collect()
    theirs = oracle.query(oracle.make_query({"type": "term", "terms": ["render"]}), limit=None)
    assert len(ours) == len(theirs)
