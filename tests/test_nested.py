"""Nested parent/child queries vs the reference's group()-built index."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.nested import nested_children, nested_parent
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

# chapter/paragraph fixture in the reference's NestedParent docstring
# (nested.py:42-70); ids zero-padded so whoosh docnums == our docids
ROWS = [
    ("chap", "Chapter one morning"),
    ("p", "Able baker delta"),
    ("p", "Bright morning sunshine"),
    ("chap", "Chapter two evening"),
    ("p", "Car trip morning fun"),
    ("p", "Dog eared pages"),
    ("p", "Every day morning"),
    ("chap", "Chapter three night"),
    ("p", "Fine day indeed"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    cfg = IndexConfig(
        id_col="rid",
        fields=(FieldConfig("type", analyzer="id", scorable=False), FieldConfig("text")),
    )
    store = SegmentStore(str(tmp_path_factory.mktemp("nest_ix")))
    df = spark.createDataFrame(
        [(f"{i:04d}", t, x) for i, (t, x) in enumerate(ROWS)],
        "rid string, type string, text string",
    )
    build_segment(spark, df, cfg, store, partitions=1)
    ix = Index(spark, store, cfg)
    return ix, Searcher(ix)


@pytest.fixture(scope="module")
def n_oracle(whoosh_ref):
    from whoosh import fields
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    schema = fields.Schema(
        rid=fields.ID(stored=True),
        type=fields.ID(),
        text=fields.TEXT(analyzer=StandardAnalyzer()),
    )
    ix = RamStorage().create_index(schema)
    groups = []
    cur = []
    for i, (t, x) in enumerate(ROWS):
        if t == "chap" and cur:
            groups.append(cur)
            cur = []
        cur.append((i, t, x))
    groups.append(cur)
    with ix.writer() as w:
        for g in groups:
            with w.group():
                for i, t, x in g:
                    w.add_document(rid=f"{i:04d}", type=t, text=x)
    return ix


def test_nested_parent_matches_reference(built, n_oracle):
    from whoosh.query import NestedParent, Term as WT

    ix, searcher = built
    ours = nested_parent(
        searcher, ast.Term("type", "chap"), ast.Term("text", "morning"), limit=10
    ).collect()
    with n_oracle.searcher() as s:
        res = s.search(
            NestedParent(WT("type", "chap"), WT("text", "morning")), limit=10
        )
        theirs = [(int(h["rid"]), h.score) for h in res]
    assert [int(r["docid"]) for r in ours] == [d for d, _ in theirs]
    for r, (_, s2) in zip(ours, theirs):
        assert float(r["score"]) == pytest.approx(s2, rel=1e-9)
    assert len(ours) == 2  # chapters 1 and 2 have 'morning' paragraphs... and ch1 title


def test_nested_parent_score_fn_and_limit(built):
    ix, searcher = built
    sums = {
        r["docid"]: r["score"]
        for r in nested_parent(
            searcher, ast.Term("type", "chap"), ast.Term("text", "morning"), limit=None
        ).collect()
    }
    maxs = {
        r["docid"]: r["score"]
        for r in nested_parent(
            searcher, ast.Term("type", "chap"), ast.Term("text", "morning"),
            score_fn="max", limit=None,
        ).collect()
    }
    for d in sums:
        assert maxs[d] <= sums[d]
    limited = {
        r["docid"]: r["score"]
        for r in nested_parent(
            searcher, ast.Term("type", "chap"), ast.Term("text", "morning"),
            per_parent_limit=1, limit=None,
        ).collect()
    }
    for d in limited:
        assert limited[d] <= sums[d]


def test_nested_children(built):
    ix, searcher = built
    kids = nested_children(
        searcher, ast.Term("type", "chap"), ast.Term("text", "two")
    ).collect()
    # chapter two occupies docids 3..6; children are 4,5,6
    assert [int(r["docid"]) for r in kids] == [4, 5, 6]
    assert all(r["score"] == 1.0 for r in kids)
