"""Span algebra (SpanOr/Not/Contains/Before/First/Condition) vs reference."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.operators.spans import (
    SBefore,
    SCondition,
    SContains,
    SFirst,
    SNear,
    SNot,
    SOr,
    STerm,
    span_search,
)
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text", positions=True),))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(200, seed=111, vocab_size=120).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path_factory.mktemp("sp_ix")))
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, CFG, store, partitions=2)
    return Index(spark, store, CFG), pdf


@pytest.fixture(scope="module")
def sp_oracle(oracle_cls, built):
    _, pdf = built
    return oracle_cls([(f"{i:06d}", t) for i, t in enumerate(pdf["text"])])


def _ref(sp_oracle, q, limit=None):
    return [(int(i), s) for i, s in sp_oracle.query(q, limit=limit, optimize=False)]


def _ours(built, expr, limit=None):
    ix, _ = built
    s = Searcher(ix)
    return [
        (int(r["docid"]), float(r["score"]))
        for r in span_search(s, "text", expr, limit=limit).collect()
    ]


def _cases(wq):
    T = lambda w: wq.Term("text", w)  # noqa: E731
    near = lambda *ws, **kw: wq.SpanNear2([T(w) for w in ws], **kw)  # noqa: E731
    return [
        (
            "or",
            wq.SpanOr([near("render", "shade"), near("spark", "index")]),
            SOr((SNear((STerm("render"), STerm("shade"))), SNear((STerm("spark"), STerm("index"))))),
        ),
        (
            "not",
            wq.SpanNot(near("render", "shade", slop=8), T("texture")),
            SNot(SNear((STerm("render"), STerm("shade")), slop=8), STerm("texture")),
        ),
        (
            "contains",
            wq.SpanContains(near("render", "shade", slop=10), T("query")),
            SContains(SNear((STerm("render"), STerm("shade")), slop=10), STerm("query")),
        ),
        (
            "before",
            wq.SpanBefore(T("render"), T("shade")),
            SBefore(STerm("render"), STerm("shade")),
        ),
        (
            "first",
            wq.SpanFirst(T("render"), limit=20),
            SFirst(STerm("render"), limit=20),
        ),
        (
            "condition",
            wq.SpanCondition(T("render"), T("shade")),
            SCondition(STerm("render"), STerm("shade")),
        ),
    ]


@pytest.mark.parametrize("idx", range(6), ids=["or", "not", "contains", "before", "first", "condition"])
def test_span_algebra_matches_reference(built, sp_oracle, whoosh_ref, idx):
    import whoosh.query as wq

    name, ref_q, ours_e = _cases(wq)[idx]
    theirs = _ref(sp_oracle, ref_q)
    got = _ours(built, ours_e)
    assert [d for d, _ in got] == [d for d, _ in theirs], (name, got[:5], theirs[:5])
    for (_, s1), (_, s2) in zip(got, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), name
    # make sure the fixtures actually exercise matches somewhere
    if name in ("or", "before", "condition"):
        assert len(got) > 0
