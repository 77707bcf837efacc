"""Continuous crawl indexing: poll an Iceberg table, index new snapshots.

The crawl pipeline's steady state: writers append page batches to the
Iceberg table (new snapshot per commit), and this loop keeps a
SegmentStore index in step — each tick runs the crash-safe snapshot-diff
sync (``sources/iceberg.py sync_index_from_iceberg``: only files
appended since the last-indexed snapshot are read, one new segment per
sync, no-op when the snapshot is unchanged), then lets the size-tiered
merge policy fold small segments, exactly like ``streaming/ingest.py``'s
BufferedWriter analogue but with the TABLE as the source of truth
instead of a row stream.

A rate source provides the tick clock; the actual data volume per tick
is whatever the snapshot diff says, read straight from the table's
parquet files (never through the stream)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from whoosh_novo_spark.schema import IndexConfig
from whoosh_novo_spark.sources.iceberg import sync_index_from_iceberg
from whoosh_novo_spark.sources.segment_store import SegmentStore


def start_iceberg_sync(
    spark: SparkSession,
    location: str,
    store: SegmentStore,
    config: IndexConfig,
    checkpoint_dir: str,
    columns: list[str] | None = None,
    partitions: int | None = None,
    poll_seconds: int = 30,
    auto_merge: bool = True,
    available_now: bool = False,
):
    """Start the polling sync loop; returns the StreamingQuery.

    ``available_now=True`` runs one tick and stops (tests, cron-style
    one-shots); otherwise the loop re-checks the table every
    ``poll_seconds``."""
    from whoosh_novo_spark.operators.merge import merge_policy_small, merge_segments

    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def process_batch(batch_df, batch_id: int) -> None:
        sp = batch_df.sparkSession
        manifest, snap, n_new = sync_index_from_iceberg(
            sp, location, store, config, columns=columns, partitions=partitions
        )
        if n_new and auto_merge:
            chosen = merge_policy_small(store.read_manifest())
            if len(chosen) >= 3:
                merge_segments(sp, store, config, segment_ids=chosen)

    writer = ticks.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{poll_seconds} seconds")
    return writer.start()
