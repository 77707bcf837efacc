"""Query-language parser: search-result parity with whoosh QueryParser."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans.parser import QueryParser
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text", positions=True),))

QUERY_STRINGS = [
    "render",
    "render shade",
    "render AND shade",
    "render OR shade OR texture",
    "render AND shade OR texture",
    "render shade OR texture",
    "render NOT shade",
    "NOT shade render",
    "render ANDNOT shade",
    "render ANDMAYBE shade",
    "(render OR shade) AND texture",
    '"render shade"',
    '"render shade"~4',
    "rend*",
    "re?der",
    "[render TO texture]",
    "{render TO texture}",
    "render^3 shade",
    "Big-Time render",
    "the render",  # stopword dropped
    "render AND (shade OR texture) ANDNOT spark",
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(200, seed=161, vocab_size=150).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path_factory.mktemp("qp_ix")))
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, CFG, store, partitions=2)
    return Index(spark, store, CFG), pdf


@pytest.fixture(scope="module")
def p_oracle(oracle_cls, built):
    _, pdf = built
    return oracle_cls([(f"{i:06d}", t) for i, t in enumerate(pdf["text"])])


@pytest.mark.parametrize("qs", QUERY_STRINGS, ids=lambda s: s[:28])
def test_parsed_query_results_match_reference(built, p_oracle, whoosh_ref, qs):
    from whoosh.qparser import QueryParser as WQP

    ix, _ = built
    s = Searcher(ix)
    qp = QueryParser("text")
    ours = [
        (int(r["docid"]), float(r["score"]))
        for r in s.search(qp.parse(qs), limit=10).collect()
    ]
    with p_oracle.ix.searcher() as ws:
        wq = WQP("text", p_oracle.ix.schema).parse(qs)
        res = ws.search(wq, limit=10)
        theirs = [(int(h["id"]), h.score) for h in res]
    assert [d for d, _ in ours] == [d for d, _ in theirs], (qs, ours[:4], theirs[:4])
    for (_, s1), (_, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), qs


# --- plugin syntax: FuzzyTermPlugin + GtLtPlugin (qparser/plugins.py) ---

PLUGIN_QUERY_STRINGS = [
    "render~",
    "render~1",
    "rendre~2",
    "render~2/2",
    "text:>render",
    "text:>=render",
    "text:<shade",
    "text:<=shade",
    "text:>render text:<texture",
    "render~1 AND shade",
    "render OR shade~1",
    # overlapping-range merge happens at normalize time, AFTER the NOT
    # structure exists (ADVICE r2) — these must match whoosh's And([Not,
    # range]) / Or-union-merge behavior
    "NOT text:>render text:<shade",
    "render NOT text:>shade",
    "text:>render OR text:<shade",
    "text:<render text:>shade",
]


@pytest.mark.parametrize("qs", PLUGIN_QUERY_STRINGS, ids=lambda s: s[:28])
def test_plugin_syntax_results_match_reference(built, p_oracle, whoosh_ref, qs):
    from whoosh.qparser import FuzzyTermPlugin, GtLtPlugin
    from whoosh.qparser import QueryParser as WQP

    ix, _ = built
    s = Searcher(ix)
    qp = QueryParser("text")
    ours = [
        (int(r["docid"]), float(r["score"]))
        for r in s.search(qp.parse(qs), limit=10).collect()
    ]
    with p_oracle.ix.searcher() as ws:
        wqp = WQP("text", p_oracle.ix.schema)
        wqp.add_plugin(FuzzyTermPlugin())
        wqp.add_plugin(GtLtPlugin())
        wq = wqp.parse(qs)
        res = ws.search(wq, limit=10)
        theirs = [(int(h["id"]), h.score) for h in res]
    assert [d for d, _ in ours] == [d for d, _ in theirs], (qs, ours[:4], theirs[:4])
    for (_, s1), (_, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), qs


# --- SimpleParser / PlusMinusPlugin (plugins.py:1016-1079) -----------------

SIMPLE_QUERY_STRINGS = [
    "render shade",
    "render +shade",
    "render +shade -wire",
    "+render +shade",
    "render -shade",
    '"render shade" -texture',
    "+render texture shade",
]


@pytest.mark.parametrize("qs", SIMPLE_QUERY_STRINGS, ids=lambda s: s[:28])
def test_simple_parser_results_match_reference(built, p_oracle, whoosh_ref, qs):
    from whoosh.qparser import SimpleParser as WSP

    ix, _ = built
    s = Searcher(ix)
    qp = QueryParser.simple("text")
    ours = [
        (int(r["docid"]), float(r["score"]))
        for r in s.search(qp.parse(qs), limit=10).collect()
    ]
    with p_oracle.ix.searcher() as ws:
        wq = WSP("text", p_oracle.ix.schema).parse(qs)
        theirs = [(int(h["id"]), h.score) for h in ws.search(wq, limit=10)]
    assert [d for d, _ in ours] == [d for d, _ in theirs], (qs, ours[:4], theirs[:4])
    for (_, s1), (_, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), qs


# --- RegexPlugin (plugins.py:197-215) --------------------------------------

@pytest.mark.parametrize("qs", ['r"rend.*"', 'text:r"sh[ae]de"', 'r"qu.+y" shade'])
def test_regex_plugin_results_match_reference(built, p_oracle, whoosh_ref, qs):
    from whoosh.qparser import QueryParser as WQP, RegexPlugin

    ix, _ = built
    s = Searcher(ix)
    qp = QueryParser("text")
    ours = [
        (int(r["docid"]), float(r["score"]))
        for r in s.search(qp.parse(qs), limit=10).collect()
    ]
    with p_oracle.ix.searcher() as ws:
        wp = WQP("text", p_oracle.ix.schema)
        wp.add_plugin(RegexPlugin())
        theirs = [(int(h["id"]), h.score) for h in ws.search(wp.parse(qs), limit=10)]
    assert [d for d, _ in ours] == [d for d, _ in theirs], (qs, ours[:4], theirs[:4])
    for (_, s1), (_, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), qs


def test_pseudo_field_plugin_parity(built, p_oracle, whoosh_ref):
    """PseudoFieldPlugin (plugins.py:1309-1380): 'regex:br.vo' runs a
    user function on the following text — parity with the reference
    example (text -> Regex query in the content field)."""
    from whoosh.qparser import PseudoFieldPlugin, QueryParser as WQP, RegexPlugin

    from whoosh_novo_spark.plans import ast

    ix, _ = built
    s = Searcher(ix)
    qp = QueryParser(
        "text", pseudo_fields={"regex": lambda t: ast.Regex("text", t)}
    )
    with p_oracle.ix.searcher() as ws:
        wp = WQP("text", p_oracle.ix.schema)

        def regex_maker(node):
            if node.has_text:
                node = RegexPlugin.RegexNode(node.text)
                node.set_fieldname("text")
                return node

        wp.add_plugin(PseudoFieldPlugin({"regex": regex_maker}))
        for qs in ("regex:rend.*", "shade regex:qu.+y"):
            ours = [
                (int(r["docid"]), float(r["score"]))
                for r in s.search(qp.parse(qs), limit=10).collect()
            ]
            theirs = [
                (int(h["id"]), h.score) for h in ws.search(wp.parse(qs), limit=10)
            ]
            assert [d for d, _ in ours] == [d for d, _ in theirs], qs
            for (_, s1), (_, s2) in zip(ours, theirs):
                assert s1 == pytest.approx(s2, rel=1e-9), qs


def test_require_operator_parses(whoosh_ref):
    """OperatorsPlugin's default set includes REQUIRE (plugins.py:941+).
    Execution parity can't be checked — the reference's Require matcher
    crashes (COVERAGE.md bug #1) — so this compares parse STRUCTURE."""
    from whoosh import fields
    from whoosh.qparser import QueryParser as WQP

    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.plans.parser import QueryParser

    q = QueryParser("text").parse("alpha REQUIRE beta")
    assert isinstance(q, ast.Require)
    assert (q.a.text, q.b.text) == ("alpha", "beta")

    schema = fields.Schema(text=fields.TEXT)
    wq = WQP("text", schema).parse("alpha REQUIRE beta")
    assert type(wq).__name__ == "Require"
