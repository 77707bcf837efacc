"""Streaming ANN query serving over an IVF x PQ index.

The batch twin is ``operators/similarity.ivf_pq_topk_batch``.  Queries
arrive as a stream of (qid, qvec); ``foreachBatch`` answers each
micro-batch in ONE job through the batched path (broadcast probe
fan-out + stacked per-query LUT ADC kernel + exact re-rank) and appends
(qid, vec_id, cos, rank, batch_id) result rows to a parquet sink.
Per-query results are identical to calling the batch operator directly
(parity-gated in tests/test_ann_serving.py).

The index may be given as a PATH to a ``partitionBy(cid)`` parquet dir
(re-read at every micro-batch, so rows added between batches by
``ivf_pq_index_append`` are served as soon as they land — each batch
sees a consistent parquet snapshot) or as a static DataFrame (pin one
snapshot, e.g. a ``.cache()``d index, for lowest latency).

Scale shape: the per-batch driver cost is O(batch queries) metadata
math (probe lists + LUT tensor); the cluster cost is the probed
fraction of the compressed index per query — the same envelope the
batch path measures (BENCH/ann_scale.json: 0.34 s/query at 1M vectors,
recall@10 0.988 with residual codes).  A micro-batch of requests is
bounded by arrival rate (this is a serving loop, not a data scan), so
the ``collect()`` of the query rows is request-scale, not data-scale.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_ann_serving(
    query_stream: DataFrame,
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    out_path: str,
    checkpoint_dir: str,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int | None = None,
    index: DataFrame | str | None = None,
    residual: bool = False,
    deletes: DataFrame | str | None = None,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    available_now: bool = True,
):
    """Start a streaming query answering each micro-batch of ANN
    requests; returns the StreamingQuery (call ``awaitTermination()``).

    ``query_stream`` must carry ``qid_col`` (string-able) and
    ``qvec_col`` (array<float/double>).  ``deletes`` (a vec_id
    DataFrame, or a parquet path re-read per batch — LIVE tombstones)
    drops deleted vectors before ADC scoring, so a delete takes effect
    from the next micro-batch without rewriting the index."""
    from whoosh_novo_spark.operators.similarity import ivf_pq_topk_batch

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(qid_col, qvec_col).collect()
        if not rows:
            return
        queries = [(str(r[0]), [float(x) for x in r[1]]) for r in rows]
        spark = batch_df.sparkSession
        idx = (
            spark.read.parquet(index) if isinstance(index, str) else index
        )
        if isinstance(deletes, str):
            # LIVE tombstones mode: the path may not exist until the
            # first delete is written — treat absent/empty as no deletes
            # instead of killing the stream with PATH_NOT_FOUND
            import glob as _glob

            dels = (
                spark.read.parquet(deletes)
                if _glob.glob(os.path.join(deletes, "*.parquet"))
                else None
            )
        else:
            dels = deletes
        res = ivf_pq_topk_batch(
            embeddings,
            queries,
            centroids,
            codebooks,
            k=k,
            nprobe=nprobe,
            shortlist=shortlist,
            index=idx,
            residual=residual,
            deletes=dels,
        )
        res.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    writer = query_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
