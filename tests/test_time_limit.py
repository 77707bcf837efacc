"""TimeLimitCollector analogue (collectors.py:1012-1072) and
TranslateFacet (sorting.py:626-683)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.collectors import (
    TimeLimit,
    collect_with_time_limit,
    search_with_time_limit,
)
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore


@pytest.fixture(scope="module")
def small_searcher(spark, tmp_path_factory):
    rows = [(f"d{i}", f"spark data w{i:03d}") for i in range(30)]
    docs = spark.createDataFrame(rows, "uid string, text string")
    cfg = IndexConfig(id_col="uid", fields=(FieldConfig("text"),))
    store = SegmentStore(str(tmp_path_factory.mktemp("ixtl") / "ix"))
    build_segment(spark, docs, cfg, store, partitions=2)
    return Searcher(Index(spark, store, cfg))


def test_fast_search_completes_within_limit(small_searcher):
    rows = search_with_time_limit(
        small_searcher, ast.Term("text", "spark"), timelimit=120.0, limit=5
    )
    assert len(rows) == 5
    # identical to the unlimited-path result
    direct = small_searcher.search(ast.Term("text", "spark"), limit=5).collect()
    assert [(r["docid"], r["score"]) for r in rows] == [
        (r["docid"], r["score"]) for r in direct
    ]


def test_slow_job_raises_timelimit_with_partials(spark):
    """A deliberately slow plan (per-partition sleep UDF) must be cancelled
    at the budget and raise TimeLimit carrying whatever rows arrived."""

    @F.udf("long")
    def slow_ident(x):
        time.sleep(4.0)
        return x

    df = spark.range(0, 8, 1, 8).select(slow_ident(F.col("id")).alias("id"))
    t0 = time.time()
    with pytest.raises(TimeLimit) as ei:
        collect_with_time_limit(spark, df, timelimit=1.0)
    wall = time.time() - t0
    assert wall < 8.0  # cancelled, not run to completion (8 tasks x 4 s / 8 cores)
    assert isinstance(ei.value.partial, list)


def test_translate_facet_orders_by_translated_key(spark, small_searcher):
    from whoosh_novo_spark.operators.facets import FieldFacet, TranslateFacet

    s = small_searcher
    docs = s.index.docmap(columns=["docid", "uid"])
    # translate uid -> its numeric suffix DESC via reverse, so d9.. > d10 ordering
    fac = TranslateFacet(
        lambda c: F.substring(c, 2, 10).cast("int"), FieldFacet("uid"), reverse=True
    )
    from whoosh_novo_spark.operators.collectors import collect

    out = collect(
        s, ast.Term("text", "spark"), limit=5, sortedby=fac, docs=docs
    ).collect()
    uids = {r["docid"]: r["uid"] for r in docs.collect()}
    got = [int(uids[r["docid"]][1:]) for r in out]
    assert got == sorted(got, reverse=True)[: len(got)] == [29, 28, 27, 26, 25]
