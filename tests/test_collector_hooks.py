"""Composable collector hooks (collectors.py wrapper stack): chains of
Filter/Collapse/Terms/custom hooks reproduce the standalone operators and
the reference's TermsCollector semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.collectors import (
    CollapseCollector,
    FilterCollector,
    TermsCollector,
    collect,
)
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

ROWS = [
    ("0000", "a", "render shade alpha"),
    ("0001", "b", "render beta"),
    ("0002", "a", "shade render gamma render"),
    ("0003", "b", "render delta"),
    ("0004", "a", "shade epsilon"),
    ("0005", "b", "render zeta shade"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    cfg = IndexConfig(
        id_col="rid",
        fields=(FieldConfig("text"), FieldConfig("grp", analyzer="id", scorable=False)),
    )
    store = SegmentStore(str(tmp_path_factory.mktemp("coll_ix")))
    df = spark.createDataFrame(ROWS, "rid string, grp string, text string")
    build_segment(spark, df, cfg, store, partitions=1)
    ix = Index(spark, store, cfg)
    return ix, Searcher(ix)


def test_filter_then_collapse_chain(built, spark):
    ix, s = built
    docs = ix.docmap(columns=["docid", "grp"])
    q = ast.Or((ast.Term("text", "render"), ast.Term("text", "shade")))
    out = collect(
        s,
        q,
        collectors=[
            FilterCollector(restrict=ast.Term("text", "beta")),
            CollapseCollector(docs, "grp", limit_per_key=1),
        ],
        limit=None,
    ).collect()
    # docid 1 (beta) is restricted away; one best doc per grp remains
    ids = [r["docid"] for r in out]
    assert 1 not in ids and len(ids) == 2
    # chain result == standalone operators composed by hand
    from whoosh_novo_spark.operators.facets import collapse

    byhand = collapse(
        s.search_filtered(q, limit=None, restrict=ast.Term("text", "beta")),
        docs,
        "grp",
    )
    assert sorted(ids) == sorted(r["docid"] for r in byhand.collect())


def test_terms_collector(built):
    ix, s = built
    q = ast.Or((ast.Term("text", "render"), ast.Term("text", "shade")))
    out = {
        r["docid"]: list(r["matched_terms"])
        for r in collect(s, q, collectors=[TermsCollector()], limit=None).collect()
    }
    assert out[0] == ["render", "shade"]
    assert out[1] == ["render"]
    assert out[4] == ["shade"]


def test_custom_function_hook(built):
    ix, s = built
    q = ast.Term("text", "render")
    double = lambda searcher, qn, df: df.withColumn("score", F.col("score") * 2)
    base = {r["docid"]: r["score"] for r in collect(s, q, limit=None).collect()}
    got = {
        r["docid"]: r["score"]
        for r in collect(s, q, collectors=[double], limit=None).collect()
    }
    assert got == {d: pytest.approx(v * 2) for d, v in base.items()}


def test_sortedby_terminal(built):
    from whoosh_novo_spark.operators.facets import FieldFacet

    ix, s = built
    docs = ix.docmap(columns=["docid", "grp"])
    q = ast.Term("text", "render")
    out = collect(s, q, sortedby=FieldFacet("grp"), docs=docs, limit=None).collect()
    grps = []
    m = {r["docid"]: r["grp"] for r in docs.collect()}
    grps = [m[r["docid"]] for r in out]
    assert grps == sorted(grps)
