"""Hybrid retrieval fusion (operators/fusion.py): RRF and weighted-score
fusion against hand-computed goldens, plus the hybrid_rrf_topk contract
row verified against its DuckDB oracle (the row sits past the driver's
50-row recording cap, so this test IS its signed gate)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.fusion import (
    rrf_fuse,
    rrf_fuse_batch,
    weighted_score_fuse,
    with_rank,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def two_lists(spark):
    a = spark.createDataFrame(
        [(1, 9.0), (2, 7.0), (3, 5.0)], "id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.99), (4, 0.98), (1, 0.50)], "id long, cos double"
    )
    return a, b


def test_with_rank_tie_break(spark):
    df = spark.createDataFrame(
        [(5, 1.0), (2, 1.0), (9, 2.0)], "id long, score double"
    )
    got = {r["id"]: r["rank"] for r in with_rank(df).collect()}
    # score desc, id asc: 9 first, then the 1.0 tie broken by id
    assert got == {9: 1, 2: 2, 5: 3}


def test_rrf_hand_golden(two_lists):
    a, b = two_lists
    out = {r["id"]: r["rrf"] for r in rrf_fuse([a, b], k=60).collect()}
    # ranks: a -> 1:1, 2:2, 3:3 ; b -> 3:1, 4:2, 1:3
    exp = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 62,
    }
    assert set(out) == set(exp)
    for i, v in exp.items():
        assert out[i] == pytest.approx(v, rel=1e-12)
    # ids 1 and 3 tie exactly; order must be rrf desc then id asc
    ordered = [r["id"] for r in rrf_fuse([a, b], k=60).collect()]
    assert ordered == [1, 3, 2, 4]


def test_rrf_single_source_preserves_order(two_lists):
    a, _ = two_lists
    ordered = [r["id"] for r in rrf_fuse([a], k=60).collect()]
    assert ordered == [1, 2, 3]


def test_rrf_weights_and_limit(two_lists):
    a, b = two_lists
    out = {r["id"]: r["rrf"] for r in rrf_fuse([a, b], k=60, weights=[2.0, 0.0]).collect()}
    assert out[1] == pytest.approx(2 / 61, rel=1e-12)
    assert out[3] == pytest.approx(2 / 63, rel=1e-12)
    assert out[4] == 0.0  # present only in the zero-weight source
    top2 = [r["id"] for r in rrf_fuse([a, b], k=60, limit=2).collect()]
    assert top2 == [1, 3]
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])


def test_weighted_score_fuse_minmax(two_lists):
    a, b = two_lists
    out = {r["id"]: r["fused"] for r in weighted_score_fuse([a, b]).collect()}
    # a min-max: 1->1.0, 2->0.5, 3->0.0 ; b: 3->1.0, 4->(0.98-0.5)/0.49, 1->0.0
    assert out[1] == pytest.approx(1.0, rel=1e-12)
    assert out[2] == pytest.approx(0.5, rel=1e-12)
    assert out[3] == pytest.approx(1.0, rel=1e-12)
    assert out[4] == pytest.approx((0.98 - 0.50) / 0.49, rel=1e-12)
    # zero-weighting the vector side reduces to source-a's normalized scores
    only_a = {r["id"]: r["fused"]
              for r in weighted_score_fuse([a, b], weights=[1.0, 0.0]).collect()}
    assert only_a[1] == pytest.approx(1.0) and only_a[3] == pytest.approx(0.0)


def test_weighted_fuse_constant_source(spark):
    const = spark.createDataFrame([(1, 3.0), (2, 3.0)], "id long, s double")
    out = {r["id"]: r["fused"] for r in weighted_score_fuse([const]).collect()}
    assert out == {1: 1.0, 2: 1.0}


def test_hybrid_contract_row_vs_duckdb(spark):
    """The row-51 signed gate: Spark hybrid_rrf_topk == DuckDB oracle."""
    import duckdb

    import __spark_entry__ as entry
    import whoosh_novo_spark.oracle_sql as osql

    got = [tuple(r) for r in entry.q_hybrid_rrf(spark, SF_DIR).collect()]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    exp = con.execute(osql.hybrid_rrf_topk_sql(("spark", "data"), 0, 60, 10)).fetchall()
    assert len(got) == 10
    assert got == exp  # ordered, value-exact (rounded 8dp both sides)


def test_rrf_fuse_batch_matches_single(spark):
    """Per-qid results of the batched fuser are value-identical to
    rrf_fuse run on that query's slices."""
    from pyspark.sql import functions as F  # noqa: F811

    lex = spark.createDataFrame(
        [("q0", 1, 9.0), ("q0", 2, 7.0), ("q1", 2, 4.0), ("q1", 5, 3.0), ("q2", 7, 1.0)],
        "qid string, id long, score double",
    )
    vec = spark.createDataFrame(
        [("q0", 2, 0.9), ("q0", 4, 0.8), ("q1", 5, 0.99), ("q3", 8, 0.5)],
        "qid string, id long, cos double",
    )
    batch = rrf_fuse_batch([lex, vec], k=60)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], {})[r["id"]] = r["rrf"]
    for qid in ("q0", "q1", "q2", "q3"):
        single = rrf_fuse(
            [lex.where(F.col("qid") == qid).drop("qid"),
             vec.where(F.col("qid") == qid).drop("qid")],
            k=60,
        )
        exp = {r["id"]: r["rrf"] for r in single.collect()}
        assert got.get(qid, {}) == exp, f"qid {qid}: {got.get(qid)} != {exp}"

    # per-qid limit cuts independently
    top1 = rrf_fuse_batch([lex, vec], k=60, limit=1).collect()
    assert len(top1) == 4 and {r["qid"] for r in top1} == {"q0", "q1", "q2", "q3"}


def test_hybrid_search_batch_matches_single(spark, tmp_path):
    """hybrid_search_batch (3 jobs for the whole batch) returns per-qid
    exactly what per-query hybrid_search returns."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.fusion import hybrid_search, hybrid_search_batch
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    rows = [
        (0, "spark engine fast"),
        (1, "spark pipeline"),
        (2, "index merge spark"),
        (3, "unrelated filler text"),
        (4, "pipeline merge"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    store = SegmentStore(str(tmp_path / "ix"))
    cfg = IndexConfig(id_col="doc_id", fields=(FieldConfig("text"),))
    build_segment(spark, df, cfg, store, partitions=2)
    s = Searcher(Index(spark, store, cfg))
    emb = spark.createDataFrame(
        [(0, [0.9, 0.1]), (1, [0.5, 0.5]), (3, [1.0, 0.0]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    queries = {
        "qa": ast.Term("text", "spark"),
        "qb": ast.Or((ast.Term("text", "pipeline"), ast.Term("text", "merge"))),
    }
    qvecs = {"qa": [1.0, 0.0], "qb": [0.0, 1.0]}
    batch = hybrid_search_batch(s, queries, emb, qvecs, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["id"], r["rrf"]))
    for qid in queries:
        single = hybrid_search(s, queries[qid], emb, qvecs[qid], k=5, shortlist=100)
        exp = [(r["id"], r["rrf"]) for r in single.collect()]
        assert sorted(got[qid]) == sorted(exp), f"{qid}: {got[qid]} != {exp}"


def test_hybrid_search_end_to_end(spark, tmp_path):
    """hybrid_search: a doc that is mid-rank lexically AND mid-rank by
    vector beats docs that appear in only one list (the RRF property that
    makes hybrid first-stage retrieval work)."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.fusion import hybrid_search
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    rows = [
        # docid 0: strong lexical, absent vector side
        (0, "spark spark spark engine"),
        # docid 1: decent lexical AND near the query vector
        (1, "spark engine pipeline"),
        # docid 2: no query terms, closest vector
        (2, "unrelated text entirely"),
        (3, "filler words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    store = SegmentStore(str(tmp_path / "ix"))
    cfg = IndexConfig(id_col="doc_id", fields=(FieldConfig("text"),))
    build_segment(spark, df, cfg, store, partitions=2)
    s = Searcher(Index(spark, store, cfg))

    emb = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),
            (2, [1.0, 0.0]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_search(s, ast.Term("text", "spark"), emb, [1.0, 0.0], k=4)
    ranked = [r["id"] for r in out.collect()]
    # doc 1 is rank<=2 in both lists -> must fuse to the top
    assert ranked[0] == 1
    # docs present in only one list still appear
    assert set(ranked) >= {0, 1, 2}
