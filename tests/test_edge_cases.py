"""Edge cases: empty/degenerate inputs through the whole pipeline."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text"),))


def test_empty_corpus_builds_and_queries(spark, tmp_path):
    df = spark.createDataFrame([], "url string, text string")
    store = SegmentStore(str(tmp_path))
    m = build_segment(spark, df, CFG, store, partitions=2)
    assert m.doc_count_all == 0
    s = Searcher(Index(spark, store, CFG))
    assert s.search(ast.Term("text", "anything"), limit=5).collect() == []
    assert s.search(ast.Or((ast.Term("text", "a1"), ast.Term("text", "b2"))), limit=5).collect() == []


def test_docs_with_empty_and_stopword_text(spark, tmp_path, oracle_cls):
    rows = [
        ("u0", ""),
        ("u1", "the a of and"),  # all stopwords -> zero-length doc
        ("u2", "real content render shade"),
        ("u3", "x y z"),  # all under minsize
        ("u4", "render"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    store = SegmentStore(str(tmp_path))
    m = build_segment(spark, df, CFG, store, partitions=2)
    assert m.doc_count_all == 5  # empty docs still count in dc
    s = Searcher(Index(spark, store, CFG))
    got = s.search(ast.Term("text", "render"), limit=5).collect()
    oracle = oracle_cls([(f"{i:06d}", t) for i, (_, t) in enumerate(rows)])
    theirs = oracle.query(oracle.make_query({"type": "term", "terms": ["render"]}), limit=5)
    assert [r["docid"] for r in got] == [int(d) for d, _ in theirs]
    for r, (_, sc) in zip(got, theirs):
        assert float(r["score"]) == pytest.approx(sc, rel=1e-9)


def test_single_doc_corpus(spark, tmp_path):
    df = spark.createDataFrame([("u0", "lonely document text")], "url string, text string")
    store = SegmentStore(str(tmp_path))
    build_segment(spark, df, CFG, store, partitions=4)
    s = Searcher(Index(spark, store, CFG))
    got = s.search(ast.Term("text", "lonely"), limit=5).collect()
    assert [r["docid"] for r in got] == [0]


def test_entry_smoke_from_scratch(spark):
    """The driver's entry() smoke check: fresh build + flagship query."""
    import shutil

    import __spark_entry__ as e

    shutil.rmtree("/tmp/wns_entry_ix_root_testdata_sf0.001", ignore_errors=True)
    e._INDEXES.clear()
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert set(df.columns) == {"doc_id", "score"}
