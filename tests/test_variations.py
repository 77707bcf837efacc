"""Variations query (terms.py:522-570): machinery parity with the reference
using the REFERENCE's own morph_en variant set (passed as explicit
variants), plus sanity of the from-scratch default inflector.
"""

from __future__ import annotations

import pytest

from whoosh_novo_spark.functions.variations import variations
from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

ROWS = [
    ("0000", "render renders rendered rendering blur"),
    ("0001", "rendering the scene quickly"),
    ("0002", "renders of the final shade"),
    ("0003", "unrelated words entirely"),
    ("0004", "render render render"),
    ("0005", "plan planned planning plans"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    cfg = IndexConfig(id_col="rid", fields=(FieldConfig("text"),))
    store = SegmentStore(str(tmp_path_factory.mktemp("var_ix")))
    df = spark.createDataFrame(ROWS, "rid string, text string")
    build_segment(spark, df, cfg, store, partitions=1)
    ix = Index(spark, store, cfg)
    return ix, Searcher(ix)


@pytest.fixture(scope="module")
def v_oracle(oracle_cls):
    return oracle_cls([(rid, t) for rid, t in ROWS])


@pytest.mark.parametrize("word", ["render", "rendering", "plan", "planned"])
def test_variations_rank_parity_with_reference(built, v_oracle, whoosh_ref, word):
    """Same variant set (the reference's morph_en output) -> identical
    ranks and scores through both engines' Variations machinery."""
    from whoosh import query as wq
    from whoosh.lang.morph_en import variations as ref_vars

    ix, s = built
    with v_oracle.ix.searcher() as ws:
        ref = [(h["id"], h.score) for h in ws.search(wq.Variations("text", word), limit=10)]
    ours_rows = s.search(
        ast.Variations("text", word, variants=tuple(sorted(ref_vars(word)))), limit=10
    ).collect()
    m = {
        r["docid"]: r["rid"]
        for r in s.index.docmap(columns=["docid", "rid"]).collect()
    }
    ours = [(m[r["docid"]], r["score"]) for r in ours_rows]
    assert [d for d, _ in ours] == [d for d, _ in ref]
    for (_, a), (_, b) in zip(ours, ref):
        assert a == pytest.approx(b, rel=1e-9)


def test_default_inflector_covers_common_forms():
    v = variations("render")
    assert {"render", "renders", "rendered", "rendering"} <= v
    v = variations("plan")
    assert {"plan", "plans", "planned", "planning"} <= v
    v = variations("carry")
    assert {"carry", "carries", "carried"} <= v
    # inflected input finds its stem's family
    assert "render" in variations("rendering")
    assert "plan" in variations("planned")


def test_variations_default_set_searches_lexicon(built):
    ix, s = built
    got = s.search(ast.Variations("text", "rendering"), limit=10).collect()
    assert len(got) >= 4  # every doc containing any render* form

def test_driver_variant_set_pinned():
    """The driver oracle pins Variations('queries')'s expansion as a SQL
    literal (generator-independent oracle, VERDICT r2 item 8); this gate
    fails if the built-in inflector drifts from the pinned set."""
    import __spark_entry__ as entry

    assert sorted(variations("queries")) == entry._VARIATIONS_QUERIES_PINNED
