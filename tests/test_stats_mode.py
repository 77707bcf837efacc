"""stats_mode="cached" (literal idf from the searcher's bounded stats
lookup, whoosh's idf-cache design searching.py:332-348) vs
stats_mode="joined" (idf from a broadcast terms-table join inside the one
query job) must be rank- AND score-identical; the choice is a physical
plan decision measured in BENCH/ab_r1_vs_r3_fixed.json."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore


@pytest.fixture(scope="module")
def both_searchers(spark, tmp_path_factory):
    rows = [
        ("a", "spark data query engine"),
        ("b", "spark spark data"),
        ("c", "query engine lore"),
        ("d", "data data data spark"),
        ("e", "engine room"),
    ]
    docs = spark.createDataFrame(rows, "uid string, text string")
    cfg = IndexConfig(id_col="uid", fields=(FieldConfig("text"),))
    store = SegmentStore(str(tmp_path_factory.mktemp("ixsm") / "ix"))
    build_segment(spark, docs, cfg, store, partitions=2)
    ix = Index(spark, store, cfg)
    return Searcher(ix, stats_mode="cached"), Searcher(ix, stats_mode="joined")


QUERIES = [
    ast.Term("text", "spark"),
    ast.And((ast.Term("text", "spark"), ast.Term("text", "data"))),
    ast.Or((ast.Term("text", "spark"), ast.Term("text", "data"), ast.Term("text", "lore"))),
    ast.DisjunctionMax((ast.Term("text", "query"), ast.Term("text", "engine"))),
    ast.AndNot(ast.Term("text", "data"), ast.Term("text", "query")),
    ast.Or((ast.Term("text", "spark", boost=2.0), ast.Term("text", "engine"))),
]


def test_modes_identical(both_searchers):
    cached, joined = both_searchers
    for q in QUERIES:
        a = [(r["docid"], round(r["score"], 9)) for r in cached.search(q, limit=None).collect()]
        b = [(r["docid"], round(r["score"], 9)) for r in joined.search(q, limit=None).collect()]
        assert a == b, q


def test_cached_mode_is_default_and_validated(both_searchers):
    cached, _ = both_searchers
    assert cached.stats_mode == "cached"
    with pytest.raises(ValueError):
        Searcher(cached.index, stats_mode="nope")
