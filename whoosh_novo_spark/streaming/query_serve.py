"""Streaming BM25 query serving over a committed index.

The batch twin is ``operators/batch.search_batch``.  Queries arrive as
a stream of (qid, query-string); ``foreachBatch`` parses each string
with the QueryParser and answers the whole micro-batch in ONE Spark job
through the batched path (shared postings scan + per-qid top-k; nested
query shapes fall back per query inside search_batch), appending
(qid, docid, score, rank, batch_id) result rows to a parquet sink.
Per-query results are identical to ``Searcher.search`` (parity-gated in
tests/test_query_serving.py).

The index may be given as a PATH to a SegmentStore directory — the
manifest is re-read at every micro-batch, so segments committed and
tombstones written between batches (by ``build_segment`` /
``delete_by_term`` / the streaming ingest loop) are served from the
next batch on, each batch seeing one consistent manifest generation —
or as a pinned ``Searcher`` (one snapshot + warm stats cache, for
lowest latency).  This is the text-side twin of
``streaming/ann_serve.py``'s path-vs-DataFrame index modes.

Scale shape: the per-batch driver cost is O(batch queries) parse +
stats lookups (stats are a bounded term-dictionary seek, file-pruned);
the cluster cost is one postings scan covering the union of the batch's
terms — each needed posting list is read once even when many queries
share terms.  A micro-batch is bounded by arrival rate (serving loop,
not data scan), so the ``collect()`` of query rows is request-scale.
Reference: whoosh serves queries one at a time on one core
(searching.py:772-859); the streaming loop is the cluster-shaped
equivalent of a searcher polling a query queue over a refreshing index
(whoosh's ``Index.refresh()`` reader-reopen pattern, index.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_query_serving(
    query_stream: DataFrame,
    index,
    out_path: str,
    checkpoint_dir: str,
    default_field: str,
    config=None,
    limit: int = 10,
    parser=None,
    searcher_kwargs: dict | None = None,
    qid_col: str = "qid",
    query_col: str = "query",
    available_now: bool = True,
):
    """Start a streaming query answering each micro-batch of search
    requests; returns the StreamingQuery (call ``awaitTermination()``).

    ``query_stream`` must carry ``qid_col`` (string-able) and
    ``query_col`` (a query-language string, parsed with QueryParser).
    ``index`` is a SegmentStore path (fresh manifest snapshot per batch
    — live segments/tombstones) or a pinned ``Searcher``.  ``config``
    (IndexConfig) is required in path mode.  ``parser`` overrides the
    default ``QueryParser(default_field)`` to bring field aliases,
    multifield fan-out, typed fields etc. into the serving loop."""
    from whoosh_novo_spark.operators.batch import search_batch
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans.parser import QueryParser
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    if isinstance(index, str) and config is None:
        raise ValueError("path-mode serving needs the IndexConfig")
    qp = parser if parser is not None else QueryParser(default_field)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(qid_col, query_col).collect()
        if not rows:
            return
        spark = batch_df.sparkSession
        if isinstance(index, str):
            s = Searcher(
                Index(spark, SegmentStore(index), config),
                **(searcher_kwargs or {}),
            )
        else:
            s = index
        queries = {str(r[0]): qp.parse(r[1]) for r in rows}
        res = search_batch(s, queries, limit=limit)
        res.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    writer = query_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
