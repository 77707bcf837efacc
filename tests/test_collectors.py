"""Filter/mask, pagination, and facet-key sorting vs the reference."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text"),))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(200, seed=121, vocab_size=150).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path_factory.mktemp("col_ix")))
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, CFG, store, partitions=2)
    return Index(spark, store, CFG), pdf


@pytest.fixture(scope="module")
def c_oracle(oracle_cls, built):
    _, pdf = built
    return oracle_cls([(f"{i:06d}", t) for i, t in enumerate(pdf["text"])])


def test_filter_and_mask_match_reference(built, c_oracle, whoosh_ref):
    from whoosh.query import Term as WT

    ix, _ = built
    s = Searcher(ix)
    q = ast.Or((ast.Term("text", "render"), ast.Term("text", "texture")))
    allow = ast.Term("text", "shade")
    mask = ast.Term("text", "spark")
    ours = [
        (r["docid"], r["score"])
        for r in s.search_filtered(q, limit=10, allow=allow, restrict=mask).collect()
    ]
    from whoosh.query import Or as WOr

    wq = WOr([WT("text", "render"), WT("text", "texture")])
    with c_oracle.ix.searcher() as ws:
        res = ws.search(
            wq, limit=10, filter=WT("text", "shade"), mask=WT("text", "spark")
        )
        theirs = [(int(h["id"]), h.score) for h in res]
    assert [d for d, _ in ours] == [d for d, _ in theirs]
    for (_, s1), (_, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9)
    assert len(ours) > 0


def test_search_page(built):
    ix, _ = built
    s = Searcher(ix)
    q = ast.Term("text", "render")
    full = [r["docid"] for r in s.search(q, limit=15).collect()]
    p1 = [r["docid"] for r in s.search_page(q, 1, 5).collect()]
    p2 = [r["docid"] for r in s.search_page(q, 2, 5).collect()]
    p3 = [r["docid"] for r in s.search_page(q, 3, 5).collect()]
    assert p1 == full[:5] and p2 == full[5:10] and p3 == full[10:15]
    with pytest.raises(ValueError):
        s.search_page(q, 0, 5)


def test_search_sorted_by_key(built):
    ix, _ = built
    s = Searcher(ix)
    q = ast.Term("text", "render")
    docs_key = ix.docmap(columns=["docid", "url"])
    rows = s.search_sorted_by(q, docs_key, "url", limit=None).collect()
    urls = [r["url"] for r in rows]
    assert urls == sorted(urls)
    rev = s.search_sorted_by(q, docs_key, "url", limit=None, reverse=True).collect()
    assert [r["url"] for r in rev] == sorted(urls, reverse=True)
    assert {r["docid"] for r in rows} == {
        r["docid"] for r in s.search(q, limit=None).collect()
    }
