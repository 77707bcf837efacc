"""Streaming BM25 query serving: each micro-batch of query strings is
answered exactly like the batch path, and path-mode serving reads a
fresh manifest snapshot per batch (segments committed and tombstones
written between batches are served)."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans.parser import QueryParser
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

ROWS = [
    ("0001", "alpha beta gamma render"),
    ("0002", "shade render gamma render beta"),
    ("0003", "render delta shade"),
    ("0004", "shade epsilon alpha"),
    ("0005", "render zeta shade beta"),
    ("0006", "gamma gamma alpha"),
]

CFG = IndexConfig(id_col="rid", fields=(FieldConfig("text"),))
QSCHEMA = "qid string, query string"


def _built(spark, path: str) -> SegmentStore:
    store = SegmentStore(path)
    df = spark.createDataFrame(ROWS, "rid string, text string")
    build_segment(spark, df, CFG, store, partitions=2)
    return store


def _served(spark, out: str) -> dict:
    got: dict = {}
    for r in spark.read.parquet(out).collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["docid"], r["score"]))
    return got


def test_stream_serving_matches_searcher(spark, tmp_path):
    """Query strings arriving in two micro-batches produce, per qid,
    exactly Searcher.search's (docid, score) top-k — flat shapes go
    through the one-job batch path, the NOT query through the per-query
    fallback, all inside the serving loop."""
    from whoosh_novo_spark.streaming.query_serve import start_query_serving

    ix_path = str(tmp_path / "ix")
    store = _built(spark, ix_path)

    queries = [
        ("q_term", "render"),
        ("q_and", "render shade"),
        ("q_or", "alpha OR gamma"),
        ("q_not", "render NOT shade"),
    ]
    src = str(tmp_path / "q_src")
    spark.createDataFrame(queries[:2], QSCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(queries[2:], QSCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = str(tmp_path / "answers")
    stream = (
        spark.readStream.schema(QSCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_query_serving(
        stream,
        ix_path,
        out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        default_field="text",
        config=CFG,
        limit=5,
    )
    q.awaitTermination(180)

    served = _served(spark, out)
    batch_ids = {r["batch_id"] for r in spark.read.parquet(out).collect()}
    assert len(batch_ids) == 2  # two micro-batches, each answered

    s = Searcher(Index(spark, store, CFG))
    qp = QueryParser("text")
    assert set(served) == {qid for qid, _ in queries}
    for qid, text in queries:
        expect = [
            (i + 1, r["docid"], pytest.approx(r["score"], rel=1e-9))
            for i, r in enumerate(s.search(qp.parse(text), limit=5).collect())
        ]
        assert sorted(served[qid]) == expect, qid


def test_path_mode_serves_fresh_snapshot(spark, tmp_path):
    """Between two serving runs over the SAME checkpoint: commit a new
    segment and tombstone an old doc — the second micro-batch sees both
    (the maintain-then-serve cycle; a pinned Searcher would not)."""
    from whoosh_novo_spark.operators.merge import delete_by_term
    from whoosh_novo_spark.streaming.query_serve import start_query_serving

    ix_path = str(tmp_path / "ix2")
    store = _built(spark, ix_path)

    src = str(tmp_path / "q_src2")
    out = str(tmp_path / "answers2")
    ckpt = str(tmp_path / "ckpt2")

    def serve_available(tag: str, text: str) -> None:
        spark.createDataFrame([(tag, text)], QSCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema(QSCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        start_query_serving(
            stream, ix_path, out, checkpoint_dir=ckpt,
            default_field="text", config=CFG, limit=10,
        ).awaitTermination(180)

    serve_available("before", "omicron OR epsilon")

    # maintenance between batches: new docs + a tombstone
    build_segment(
        spark,
        spark.createDataFrame([("0007", "omicron render")], "rid string, text string"),
        CFG,
        store,
        partitions=1,
    )
    delete_by_term(spark, store, "text", "epsilon")

    serve_available("after", "omicron OR epsilon")

    served = _served(spark, out)
    ix = Index(spark, store, CFG)
    docmap = {
        r["rid"]: r["docid"]
        for r in ix.docmap(columns=["docid", "rid"]).collect()
    }
    before = {d for _, d, _ in served["before"]}
    after = {d for _, d, _ in served["after"]}
    # batch 1 predates both the new segment and the tombstone
    assert before == {docmap["0004"]}
    # batch 2 serves the appended doc and drops the tombstoned one
    assert after == {docmap["0007"]}
