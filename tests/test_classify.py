"""Key-term expansion (Bo1/Bo2/KL) parity with the reference Expander."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.classify import expanded_terms
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory, whoosh_ref):
    pdf = corpus_pandas(150, seed=91, vocab_size=150).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path_factory.mktemp("cls_ix")))
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, cfg, store, partitions=2)
    ix = Index(spark, store, cfg)

    from whoosh import fields
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    schema = fields.Schema(
        id=fields.ID(stored=True),
        text=fields.TEXT(analyzer=StandardAnalyzer(), stored=True),
    )
    wix = RamStorage().create_index(schema)
    w = wix.writer()
    for i, t in enumerate(pdf["text"]):
        w.add_document(id=f"{i:06d}", text=t)
    w.commit()
    return ix, Searcher(ix), wix


@pytest.mark.parametrize("model", ["bo1", "bo2", "kl"])
def test_expanded_terms_match_reference(setup, model):
    from whoosh.classify import Bo1Model, Bo2Model, KLModel

    ix, searcher, wix = setup
    ref_model = {"bo1": Bo1Model, "bo2": Bo2Model, "kl": KLModel}[model]

    top = searcher.search(ast.Term("text", "render"), limit=5)
    docids = [r["docid"] for r in top.collect()]

    ours = expanded_terms(searcher, top, "text", number=8, model=model)

    from whoosh.classify import Expander

    with wix.searcher() as s:
        exp = Expander(s.reader(), "text", model=ref_model)
        for d in docids:
            exp.add_document(d)  # docids == ordinals (url-sorted build)
        theirs = exp.expanded_terms(8)

    assert [t for t, _ in ours] == [t for t, _ in theirs], (ours, theirs)
    for (_, s1), (_, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9)
