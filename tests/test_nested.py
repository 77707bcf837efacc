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


def test_distributed_parent_assignment_matches_kernel(built, monkeypatch):
    """Forcing the bucketed running-max path (as if the parent set were too
    big to broadcast) yields exactly the kernel path's results."""
    import whoosh_novo_spark.operators.nested as nested_mod

    ix, s = built
    parents = ast.Term("type", "chap")
    subq = ast.Term("text", "morning")
    want = [
        (r["docid"], round(r["score"], 6))
        for r in nested_parent(s, parents, subq, limit=None).collect()
    ]
    monkeypatch.setattr(nested_mod, "BROADCAST_PARENT_LIMIT", 0)
    got = [
        (r["docid"], round(r["score"], 6))
        for r in nested_parent(s, parents, subq, limit=None).collect()
    ]
    assert got == want
    want_c = [
        r["docid"]
        for r in nested_children(s, parents, ast.Term("text", "two")).collect()
    ]
    got_c = [
        r["docid"]
        for r in nested_children(s, parents, ast.Term("text", "two")).collect()
    ]
    assert got_c == want_c and len(got_c) > 0


def test_distributed_attach_parent_random(spark):
    """Property check of the bucketed running-max against numpy searchsorted
    on a synthetic docid universe (parents NOT aligned to bucket edges)."""
    import numpy as np

    from whoosh_novo_spark.operators.nested import _attach_parent_distributed

    rng = np.random.default_rng(7)
    parents = np.unique(rng.integers(0, 5000, 120))
    docs = np.unique(rng.integers(0, 5200, 800))
    pdf = spark.createDataFrame([(int(p),) for p in parents], "docid long")
    ddf = spark.createDataFrame([(int(d),) for d in docs], "docid long")
    out = {
        r["docid"]: r["parent"]
        for r in _attach_parent_distributed(spark, ddf, pdf, n_buckets=7).collect()
    }
    pos = np.searchsorted(parents, docs, side="right") - 1
    want = {
        int(d): (int(parents[p]) if p >= 0 else -1) for d, p in zip(docs, pos)
    }
    assert out == want
