"""Pluggable weighting models: rank+score identity vs the reference
(mirrors tests/test_weightings.py in the reference, which smoke-runs every
WeightingModel subclass)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.plans.weighting import (
    BM25F,
    TF_IDF,
    DFree,
    Frequency,
    FunctionWeighting,
    MultiWeighting,
    PL2,
    ReverseWeighting,
)
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text"),))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(250, seed=101, vocab_size=200).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path_factory.mktemp("wm_ix")))
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, CFG, store, partitions=2)
    return Index(spark, store, CFG), pdf


@pytest.fixture(scope="module")
def w_oracle(oracle_cls, built):
    _, pdf = built
    return oracle_cls([(f"{i:06d}", t) for i, t in enumerate(pdf["text"])])


def _ref_search(w_oracle, model, spec, limit=10):
    """limit=None: whenever a limit is set, the reference's quality-bound
    machinery (block skipping AND matcher replace()) assumes score grows
    with weight/shrinks with length; PL2 violates that, so limited
    searches drop formula-best docs (e.g. max_quality computed from
    (max_weight, min_length) is not an upper bound).  The unlimited
    search scores every match and is the semantic reference; we take its
    head client-side."""
    full = w_oracle.query(
        w_oracle.make_query(spec), limit=None, optimize=False, weighting=model
    )
    return [(int(i), s) for i, s in full[:limit]]


QUERIES = [
    {"type": "term", "terms": ["render"]},
    {"type": "or", "terms": ["render", "shade", "texture"]},
    {"type": "and", "terms": ["render", "shade"]},
]

MODELS = [
    ("bm25_custom", lambda w: w.scoring.BM25F(B=0.6, K1=1.8), BM25F(B=0.6, K1=1.8)),
    ("tfidf", lambda w: w.scoring.TF_IDF(), TF_IDF()),
    ("frequency", lambda w: w.scoring.Frequency(), Frequency()),
    ("pl2", lambda w: w.scoring.PL2(), PL2()),
]
# NB: the reference's DFree is not oracle-testable — DFreeScorer calls
# `parent.weight(fieldname, text)` (scoring.py:377) but Searcher has no
# such method (it's `frequency`), so the reference crashes.  DFree is
# verified against the published dfree() formula below instead.


@pytest.mark.parametrize("name,ref_fn,ours", MODELS, ids=[m[0] for m in MODELS])
@pytest.mark.parametrize("spec", QUERIES, ids=lambda s: s["type"])
def test_model_rank_identity(built, w_oracle, whoosh_ref, name, ref_fn, ours, spec):
    import whoosh
    import whoosh.scoring  # noqa: F401 — submodule not auto-imported

    ix, _ = built
    searcher = Searcher(ix, weighting=ours)
    got = searcher.search(_to_ast(spec), limit=10).collect()
    want = _ref_search(w_oracle, ref_fn(whoosh), spec)
    assert [int(r["docid"]) for r in got] == [d for d, _ in want], (name, spec)
    for r, (_, s2) in zip(got, want):
        assert float(r["score"]) == pytest.approx(s2, rel=1e-9), (name, spec)


def _to_ast(spec):
    terms = [ast.Term("text", w) for w in spec["terms"]]
    if spec["type"] == "term":
        return terms[0]
    if spec["type"] == "and":
        return ast.And(tuple(terms))
    return ast.Or(tuple(terms))


def test_dfree_matches_published_formula(built, whoosh_ref):
    """Our DFree vs the reference's pure dfree() function (scoring.py:333),
    fed the same statistics (bypassing the broken DFreeScorer init)."""
    from whoosh.scoring import dfree as ref_dfree

    ix, _ = built
    s = Searcher(ix, weighting=DFree())
    rows = s.search(ast.Term("text", "render"), limit=10).collect()
    st = ix.term_stats([("text", "render")])[("text", "render")]
    fl = ix.manifest.field_length("text")
    dl = {r["docid"]: r["len_q"] for r in ix.doclens().where(
        F.col("field") == "text").collect()}
    w = {
        r["docid"]: r["weight"]
        for r in ix.postings().where(
            (F.col("field") == "text") & (F.col("term") == "render")
        ).collect()
    }
    assert rows
    for r in rows:
        want = ref_dfree(w[r["docid"]], st.cf, 1.0, dl[r["docid"]], fl)
        assert float(r["score"]) == pytest.approx(want, rel=1e-9)


def test_reverse_weighting(built):
    ix, _ = built
    fwd = Searcher(ix, weighting=BM25F())
    rev = Searcher(ix, weighting=ReverseWeighting(BM25F()))
    q = ast.Term("text", "render")
    f_rows = fwd.search(q, limit=None).collect()
    r_rows = {r["docid"]: r["score"] for r in rev.search(q, limit=None).collect()}
    for r in f_rows:
        assert r_rows[r["docid"]] == pytest.approx(-r["score"])


def test_multi_and_function_weighting(built):
    ix, _ = built
    m = MultiWeighting(BM25F(), (("text", TF_IDF()),))
    s = Searcher(ix, weighting=m)
    tfidf_rows = Searcher(ix, weighting=TF_IDF()).search(
        ast.Term("text", "render"), limit=5
    ).collect()
    multi_rows = s.search(ast.Term("text", "render"), limit=5).collect()
    assert [(r["docid"], r["score"]) for r in multi_rows] == [
        (r["docid"], r["score"]) for r in tfidf_rows
    ]

    # FunctionWeighting: score = weight / (len+1) (the reference docstring
    # example, scoring.py:180-192)
    fn = FunctionWeighting(
        lambda searcher, fieldname, stats, w, flq: w / (flq.cast("double") + 1.0)
    )
    rows = Searcher(ix, weighting=fn).search(ast.Term("text", "render"), limit=5).collect()
    assert len(rows) == 5 and all(0 < r["score"] <= 1.0 for r in rows)


def test_batch_with_custom_model(built):
    from whoosh_novo_spark.operators.batch import search_batch

    ix, _ = built
    s = Searcher(ix, weighting=TF_IDF())
    qs = {"a": ast.Or((ast.Term("text", "render"), ast.Term("text", "shade")))}
    batch = search_batch(s, qs, limit=5).collect()
    solo = s.search(qs["a"], limit=5).collect()
    got = sorted((r["rank"], r["docid"], r["score"]) for r in batch)
    assert [d for _, d, _ in got] == [r["docid"] for r in solo]

    # non-separable model routes through the fallback but still matches
    s2 = Searcher(ix, weighting=PL2())
    batch2 = search_batch(s2, qs, limit=5).collect()
    solo2 = s2.search(qs["a"], limit=5).collect()
    got2 = sorted((r["rank"], r["docid"]) for r in batch2)
    assert [d for _, d in got2] == [r["docid"] for r in solo2]
