"""Whole-query spelling correction parity with the reference
(searching.py:861-975 correct_query + spelling.Correction formatting)."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.correct import correct_query, query_terms
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans.parser import QueryParser
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

DOCS = [
    "alfa bravo charlie delta",
    "delta echo foxtrot golf",
    "golf hotel india juliet",
    "juliet kilo lima mike",
]

CFG = IndexConfig(id_col="rid", fields=(FieldConfig("a"), FieldConfig("b")))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("cq_ix")))
    rows = [(f"{i:03d}", t, None) for i, t in enumerate(DOCS)]
    df = spark.createDataFrame(rows, "rid string, a string, b string")
    build_segment(spark, df, CFG, store, partitions=1)
    ix = Index(spark, store, CFG)
    return Searcher(ix)


@pytest.fixture(scope="module")
def c_oracle(whoosh_ref):
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    schema = fields.Schema(a=fields.TEXT(), b=fields.TEXT())
    ix = RamStorage().create_index(schema)
    w = ix.writer()
    for t in DOCS:
        w.add_document(a=t)
    w.commit()
    return ix


QTEXTS = [
    'alpha ("brovo november" OR b:dolta) detail',
    "alpha delta",
    "cherlie AND hotell",
    'golv OR "kilo limo"',
    "alfa bravo",  # nothing to correct
]


@pytest.mark.parametrize("qtext", QTEXTS, ids=lambda s: s[:30])
def test_correct_query_matches_reference(built, c_oracle, whoosh_ref, qtext):
    from whoosh import highlight as whl
    from whoosh.qparser import QueryParser as WQP

    s = built
    p = QueryParser("a", field_types={})
    q = p.parse(qtext)
    c = correct_query(s, q, qtext, parser=p)

    with c_oracle.searcher() as ws:
        wq = WQP("a", c_oracle.schema).parse(qtext)
        wc = ws.correct_query(wq, qtext)
        ref_tokens = sorted(
            (t.fieldname, t.text) for t in wc.query.all_tokens()
        )
        ref_string = wc.string
        ref_html = wc.format_string(whl.HtmlFormatter(classname="c"))

    assert sorted(query_terms(c.query)) == ref_tokens, qtext
    assert c.string == ref_string, qtext

    from whoosh_novo_spark.functions.highlight import HtmlFormatter

    assert c.format_string(HtmlFormatter(classname="c")) == ref_html, qtext


def test_correct_query_rewrites_tree_only_where_needed(built):
    s = built
    p = QueryParser("a")
    q = p.parse("alpha delta")
    c = correct_query(s, q, "alpha delta", parser=p)
    # alpha -> alfa corrected, delta present -> untouched
    assert sorted(query_terms(c.query)) == [("a", "alfa"), ("a", "delta")]
    assert c.string == "alfa delta"
    # original query object is untouched
    assert sorted(query_terms(c.original_query)) == [("a", "alpha"), ("a", "delta")]


def test_correction_string_resolves_field_aliases(built):
    """An aliased field prefix must still get its typo spliced in
    Correction.string (tokens are keyed by the RESOLVED field, matching
    the correction map)."""
    from whoosh_novo_spark.operators.correct import correct_query

    p = QueryParser("a", field_aliases={"a": ["aa"]})
    qs = "aa:brvo delta"
    c = correct_query(built, p.parse(qs), qs, parser=p)
    assert "brvo" not in c.string and "bravo" in c.string
