"""Distributed multi-term expansion (VERDICT r1 item 1).

Asserts the multiterm plan joins the postings scan to the predicate-filtered
terms table (no driver-side collect of expansions), and that the joined
column-stat scoring is value-identical to the explicit Or-of-expanded-Terms
compilation under every weighting model with column support.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.plans.weighting import BM25F, DFree, Frequency, PL2, TF_IDF
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(250, seed=23, vocab_size=400)
    path = str(tmp_path_factory.mktemp("ix_mt"))
    store = SegmentStore(path)
    config = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    df = spark.createDataFrame(pdf[["url", "text"]])
    build_segment(spark, df, config, store, partitions=4)
    ix = Index(spark, store, config)
    return ix, Searcher(ix)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return [(r["docid"], round(r["score"], 6)) for r in df.collect()]


def test_fat_prefix_plan_is_a_join_not_a_collect(built):
    ix, s = built
    # ~390 "w0*" vocabulary terms expand past the local-expansion cap
    # (128): the plan must join the postings scan to the
    # predicate-filtered terms table — no driver round-trip of a fat
    # expansion, the r1 scale property
    assert ix.expand_terms_local(ast.Prefix("text", "w0")) is None
    plan = _physical_plan(s.search(ast.Prefix("text", "w0"), limit=10))
    assert "/terms" in plan and "/postings" in plan
    assert plan.count("Join") >= 1


def test_small_prefix_plan_is_a_single_scan(built):
    ix, s = built
    # a small expansion (r6) resolves driver-side via the pyarrow lexicon
    # seek and compiles to ONE postings scan with an IN-list — no terms
    # scan, no broadcast stage in the per-query plan
    local = ix.expand_terms_local(ast.Prefix("text", "s"))
    assert local is not None and 1 < len(local) <= 128
    plan = _physical_plan(s.search(ast.Prefix("text", "s"), limit=10))
    assert "/terms" not in plan and "/postings" in plan
    assert "Join" not in plan


def test_prefix_pushdown_reaches_postings_scan(built):
    ix, s = built
    # fat expansion (distributed join): the cheap prefix bound is pushed
    # into the postings parquet scan
    plan = _physical_plan(s.search(ast.Prefix("text", "w0"), limit=10))
    assert "StartsWith(term,w0)" in plan.replace(" ", "").replace("'", "") or (
        "PushedFilters" in plan and "StartsWith" in plan
    )
    # small expansion (local IN-list plan): the exact term list is pushed
    # (a 1-term expansion simplifies to EqualTo)
    plan2 = _physical_plan(s.search(ast.Prefix("text", "s"), limit=10)).replace(
        " ", ""
    )
    assert "In(term" in plan2 or "EqualTo(term" in plan2


@pytest.mark.parametrize(
    "model", [BM25F(), TF_IDF(), Frequency(), PL2(), DFree()], ids=lambda m: type(m).__name__
)
@pytest.mark.parametrize(
    "q",
    [
        ast.Prefix("text", "re"),
        ast.Wildcard("text", "s*e"),
        ast.FuzzyTerm("text", "render", maxdist=1, prefixlength=1, constantscore=False),
        ast.TermRange("text", "ra", "rf", constantscore=False),
    ],
    ids=["prefix", "wildcard", "fuzzy", "range"],
)
def test_joined_stats_match_explicit_or(built, model, q):
    """Distributed column-stat scoring == Or of the expanded Terms."""
    ix, _ = built
    s = Searcher(ix, weighting=model)
    got = _rows(s.search(q, limit=20))
    expansions = ix.expand_terms(q)
    assert expansions, "test query must expand to something"
    or_q = ast.Or(tuple(ast.Term(q.fieldname, t) for t, _ in expansions))
    want = _rows(s.search(or_q, limit=20))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_constantscore_single_expansion_scores_like_term(built):
    """terms.py:225-227: exactly one expansion -> plain Term matcher."""
    ix, s = built
    expansions = ix.expand_terms(ast.Prefix("text", "render"))
    only = [t for t, _ in expansions]
    assert len(only) == 1
    # TermRange is constantscore by default; a 1-term range still scores BM25
    got = _rows(s.search(ast.TermRange("text", only[0], only[0]), limit=10))
    want = _rows(s.search(ast.Term("text", only[0]), limit=10))
    assert got == want


def test_constantscore_multi_expansion_scores_boost(built):
    ix, s = built
    q = ast.TermRange("text", "s", "t", boost=2.5)  # constantscore default
    assert len(ix.expand_terms(q)) > 1
    out = s.search(q, limit=50).collect()
    assert len(out) > 0
    assert all(r["score"] == 2.5 for r in out)


def test_driver_expansion_cap(built):
    ix, _ = built
    with pytest.raises(ValueError, match="more than 2 terms"):
        ix.expand_terms(ast.Prefix("text", "s"), max_clauses=2)


def test_function_weighting_falls_back_to_capped_expansion(built):
    from whoosh_novo_spark.plans.weighting import FunctionWeighting

    ix, _ = built
    fw = FunctionWeighting(lambda sr, fn, st, w, flq: w * 2.0)
    s = Searcher(ix, weighting=fw)
    got = s.search(ast.Prefix("text", "re"), limit=10).collect()
    assert len(got) > 0
