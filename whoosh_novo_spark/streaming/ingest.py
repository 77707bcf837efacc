"""Structured Streaming incremental indexing.

The whoosh analogue is ``BufferedWriter`` (writing.py:1149-1330): docs
accumulate and are committed as new segments periodically, readers see a
fresh generation after each commit.  In Spark the natural shape is
``foreachBatch``: every micro-batch builds one segment through the normal
(resumable, checkpointed) build pipeline and commits a manifest
generation; a size-tiered compaction (merge policy, writing.py:68-130)
runs opportunistically after commits.

Exactly-once-ish: Structured Streaming checkpointing replays a failed
micro-batch; build_segment's stage markers make the replay resume instead
of duplicating work, and the manifest commit is atomic — a batch is either
fully visible or not at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from whoosh_novo_spark.schema import IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore


def start_stream_index(
    stream_df: DataFrame,
    config: IndexConfig,
    store: SegmentStore,
    checkpoint_dir: str,
    partitions: int | None = None,
    auto_merge: bool = True,
    available_now: bool = True,
):
    """Start a streaming query that indexes each micro-batch as a segment.

    Returns the StreamingQuery (call ``awaitTermination()``)."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.merge import merge_policy_small, merge_segments

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        build_segment(spark, batch_df, config, store, partitions=partitions)
        if auto_merge:
            manifest = store.read_manifest()
            chosen = merge_policy_small(manifest)
            # merge only when it folds several small segments (avoid
            # re-compacting after every tiny batch)
            if len(chosen) >= 3:
                merge_segments(spark, store, config, segment_ids=chosen)

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
