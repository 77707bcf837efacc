"""Deletes + LSM-style segment compaction.

Reference semantics mirrored:
- deletes are recorded per-index and applied at read time without touching
  segment data (whoosh per-segment deleted sets, whoosh3.py:1340-1351;
  our tombstones table is anti-joined by Index.postings/doclens).
  Statistics (doc_count_all, field_length, df) deliberately KEEP counting
  deleted docs until a merge purges them — that is whoosh's behavior
  (scoring.py:50-56 uses doc_count_all *including* deleted; terms dict is
  immutable until merge).
- merge = whoosh ``add_reader`` (writing.py:730-740) + merge policies
  (writing.py:68-130): postings from source segments are unioned already
  tokenized (no re-analysis), deleted docs squeezed out, re-sorted by
  (field, term, docid) and written as one new segment; terms/doclens/
  blocks recomputed; a commit atomically swaps the segment list.
  Unlike whoosh we never renumber docids (they are globally stable), so
  merge rewrites no posting payloads — survivor relative order, and hence
  score/docid tie-break ranking, is preserved.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_novo_spark.schema import IndexConfig
from whoosh_novo_spark.sources.segment_store import Manifest, SegmentInfo, SegmentStore


def delete_docs(spark: SparkSession, store: SegmentStore, docids: DataFrame) -> Manifest:
    """Add docids (column ``docid``) to the tombstone table and commit.

    Tombstones are VERSIONED like segments (tombstones-<gen>): the new
    table is fully written before the manifest referencing it is
    published, so a crash mid-delete leaves the previous generation
    intact and concurrent readers never see a missing/partial dir."""
    import os

    store.acquire_writer_lock()
    try:
        return _delete_docs_locked(spark, store, docids, os)
    finally:
        store.release_writer_lock()


# target rows per tombstone parquet file: ~80 MB of long docids — small
# enough for one writer task, large enough that a 10^9-row delete set is
# ~100 files, never a single-writer bottleneck
TOMBSTONE_ROWS_PER_FILE = 10_000_000


def _delete_docs_locked(spark, store, docids, os):
    manifest = store.read_manifest()
    new = docids.select(F.col("docid").cast("long")).distinct()
    old_dir = store.tombstones_dir(manifest)
    if old_dir is not None:
        old = spark.read.parquet(old_dir).select("docid")
        merged = old.unionByName(new).distinct()
    else:
        merged = new
    rel = store.new_tombstones_rel()
    path = os.path.join(store.path, rel)
    # partitioned, range-sorted write: each file holds a docid range (file
    # min/max footers prune reader-side anti-joins); file count scales with
    # the delete set instead of funneling through one task
    merged = merged.persist()
    try:
        count = merged.count()
        n_files = max(1, -(-count // TOMBSTONE_ROWS_PER_FILE))
        (
            merged.repartitionByRange(n_files, "docid")
            .sortWithinPartitions("docid")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        merged.unpersist()
    manifest.has_tombstones = True
    manifest.tombstones_rel = rel
    manifest.deleted_count = int(count)
    return store.commit(manifest)


def delete_by_term(
    spark: SparkSession, store: SegmentStore, fieldname: str, text: str
) -> Manifest:
    """whoosh ``delete_by_term`` (writing.py:643-659): tombstone every doc
    whose field contains the term."""
    manifest = store.read_manifest()
    paths = store.table_paths(manifest, "postings")
    postings = spark.read.parquet(*paths)
    ids = postings.where(
        (F.col("field") == fieldname) & (F.col("term") == text)
    ).select("docid")
    return delete_docs(spark, store, ids)


def update_documents(
    spark: SparkSession,
    store: SegmentStore,
    config,
    docs: DataFrame,
    unique_col: str | None = None,
) -> Manifest:
    """whoosh ``update_document`` semantics (writing.py: delete any doc
    whose unique field matches, then add the new version): tombstone the
    old versions by joining the unique column against the existing docmap,
    then build the new batch as a fresh segment."""
    from whoosh_novo_spark.operators.build import build_segment, read_docmap

    unique_col = unique_col or config.id_col
    manifest = store.read_manifest()
    if manifest.segments:
        dms = [
            read_docmap(spark, store, s, columns=["docid", unique_col])
            for s in manifest.segments
        ]
        dm = dms[0]
        for d in dms[1:]:
            dm = dm.unionByName(d)
        old = dm.join(
            docs.select(unique_col).distinct(), unique_col, "left_semi"
        ).select("docid")
        if old.limit(1).count() > 0:
            delete_docs(spark, store, old)
    return build_segment(spark, docs, config, store)


def merge_policy_small(manifest: Manifest) -> list[str]:
    """Size-tiered selection approximating whoosh MERGE_SMALL's fibonacci
    heuristic (writing.py:74-109): sort segments by doc_count ascending and
    merge every segment whose size is < the cumulative size of the smaller
    ones (always >= 2 segments or none)."""
    segs = sorted(manifest.segments, key=lambda s: s.doc_count)
    chosen: list[str] = []
    acc = 0
    for s in segs:
        if not chosen or s.doc_count < max(acc, 1) * 2:
            chosen.append(s.segment_id)
            acc += s.doc_count
        else:
            break
    return chosen if len(chosen) >= 2 else []


def merge_segments(
    spark: SparkSession,
    store: SegmentStore,
    config: IndexConfig,
    segment_ids: list[str] | None = None,
    partitions: int | None = None,
) -> Manifest:
    """Compact the given segments (default: all == whoosh OPTIMIZE) into
    one, purging tombstoned docs.  Commits and returns the new manifest."""
    import os

    t0 = time.time()
    store.acquire_writer_lock()
    try:
        return _merge_segments_locked(spark, store, config, segment_ids, partitions, os, t0)
    finally:
        store.release_writer_lock()


def _merge_segments_locked(spark, store, config, segment_ids, partitions, os, t0):
    manifest = store.read_manifest()
    if segment_ids is None:
        segment_ids = [s.segment_id for s in manifest.segments]
    victims = [s for s in manifest.segments if s.segment_id in segment_ids]
    if len(victims) < 1:
        return manifest
    keep = [s for s in manifest.segments if s.segment_id not in segment_ids]
    from whoosh_novo_spark.session import shuffle_partitions_of

    sp = partitions or shuffle_partitions_of(spark)

    new_id = store.new_segment_id()
    tomb = None
    tomb_dir = store.tombstones_dir(manifest)
    if tomb_dir is not None:
        tomb = spark.read.parquet(tomb_dir).select("docid")

    # --- postings: union, purge, re-sort, write (no re-analysis) ---
    postings = spark.read.parquet(
        *[store.table_path(s.segment_id, "postings") for s in victims]
    )
    if tomb is not None:
        postings = postings.join(tomb, "docid", "left_anti")
    merged = postings.repartitionByRange(sp, "field", "term", "docid").sortWithinPartitions(
        "field", "term", "docid"
    )
    merged.write.mode("overwrite").parquet(store.table_path(new_id, "postings"))
    from whoosh_novo_spark.operators.build import _term_spans

    store.write_stage_marker(
        new_id,
        "postings",
        {
            "merged_from": segment_ids,
            "term_spans": _term_spans(store.table_path(new_id, "postings")),
        },
    )
    postings_new = spark.read.parquet(store.table_path(new_id, "postings"))

    # --- docmap: materialized union of source docmaps (minus tombstones) ---
    from whoosh_novo_spark.operators.build import read_docmap

    dms = [read_docmap(spark, store, s) for s in victims]
    dm = dms[0]
    for d in dms[1:]:
        dm = dm.unionByName(d)
    if tomb is not None:
        dm = dm.join(tomb, "docid", "left_anti")
    dm.write.mode("overwrite").parquet(store.table_path(new_id, "docmap"))
    doc_count = spark.read.parquet(store.table_path(new_id, "docmap")).count()
    store.write_stage_marker(
        new_id, "docmap", {"materialized": True, "doc_count": int(doc_count)}
    )

    # --- terms / doclens / blocks recomputed from merged postings ---
    terms = postings_new.groupBy("field", "term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("weight").alias("cf"),
        F.max("weight").alias("max_weight"),
        F.min("len_q").alias("min_len_q"),
        F.max("len_q").alias("max_len_q"),
        F.min("docid").alias("min_docid"),
        F.max("docid").alias("max_docid"),
    )
    # data-sized file count (AQE coalesce), matching the build-side write
    terms.repartitionByRange("field", "term").sortWithinPartitions(
        "field", "term"
    ).write.mode("overwrite").parquet(store.table_path(new_id, "terms"))
    store.write_stage_marker(
        new_id,
        "terms",
        {"term_spans": _term_spans(store.table_path(new_id, "terms"))},
    )

    # doclens: union the SOURCE doclens tables (minus tombstones) so the
    # true post-filter `len` survives compaction for doclens/text-stats
    # consumers.  The manifest field_length TOTALS still sum the quantized
    # len_q — whoosh add_reader copies the quantized length
    # (writing.py:713-714) and its merged totals are quantized sums; score
    # parity depends on the totals, not the per-doc len column.
    doclens = spark.read.parquet(
        *[store.table_path(s.segment_id, "doclens") for s in victims]
    )
    if tomb is not None:
        doclens = doclens.join(tomb, "docid", "left_anti")
    doclens.write.mode("overwrite").parquet(store.table_path(new_id, "doclens"))
    doclens_new = spark.read.parquet(store.table_path(new_id, "doclens"))
    totals = {
        r["field"]: int(r["total"])
        for r in doclens_new.groupBy("field").agg(F.sum("len_q").alias("total")).collect()
    }
    store.write_stage_marker(new_id, "doclens", {"field_length": totals})

    from whoosh_novo_spark.operators.blocks import build_blocks_from_path

    build_blocks_from_path(
        spark, store.table_path(new_id, "postings"), config.block_limit
    ).write.mode("overwrite").parquet(store.table_path(new_id, "blocks"))
    store.write_stage_marker(
        new_id,
        "blocks",
        {
            "block_limit": config.block_limit,
            "term_spans": _term_spans(store.table_path(new_id, "blocks")),
        },
    )

    # vectors: rebuild the forward index from the merged postings for the
    # union of the victims' vectored fields (whoosh add_reader copies
    # vectors per doc, writing.py:716-722)
    vec_fields = sorted(
        {f for s in victims for f in s.meta.get("vector_fields", [])}
    )
    if vec_fields:
        postings_new.where(F.col("field").isin(vec_fields)).select(
            "docid", "field", "term", "weight"
        ).repartitionByRange(max(1, sp // 8), "docid").sortWithinPartitions(
            "docid", "field", "term"
        ).write.mode("overwrite").parquet(store.table_path(new_id, "vectors"))
        store.write_stage_marker(new_id, "vectors", {"fields": vec_fields})

    ids_minmax = postings_new.agg(
        F.min("docid").alias("mn"), F.max("docid").alias("mx")
    ).collect()[0]
    seg = SegmentInfo(
        new_id,
        int(doc_count),
        totals,
        int(ids_minmax["mn"] or 0),
        int(ids_minmax["mx"] or 0),
        has_blocks=True,
        has_positions=any(s.has_positions for s in victims),
        meta={
            "base": min(s.meta.get("base", s.min_docid) for s in victims),
            "merged_from": segment_ids,
            "merge_seconds": round(time.time() - t0, 3),
            **({"vector_fields": vec_fields} if vec_fields else {}),
        },
    )

    # lang-routed victims: recompute per-virtual-field doc counts from
    # the merged (tombstone-purged) docmap, matching the merged
    # doc_count's post-purge basis — otherwise Manifest.doc_count_for
    # would fall back to doc_count_all and inflate per-language idf
    # after compaction (one narrow scan of the lang column, as at build)
    routed_bases = sorted(
        {k.split("@", 1)[0] for s in victims for k in s.meta.get("field_doc_count", {})}
    )
    if routed_bases:
        from whoosh_novo_spark.operators.build import _lang_code

        dm_new = spark.read.parquet(store.table_path(new_id, "docmap"))
        if config.lang_col in dm_new.columns:
            by_code: dict[str, int] = {}
            for r in dm_new.groupBy(config.lang_col).count().collect():
                code = _lang_code(r[config.lang_col])
                by_code[code] = by_code.get(code, 0) + int(r["count"])
            seg.meta["field_doc_count"] = {
                f"{b}@{c}": n for b in routed_bases for c, n in by_code.items()
            }

    manifest.segments = keep + [seg]
    if not keep:
        # full optimize: all deletes purged -> the new manifest simply
        # stops referencing the tombstone table (old generations keep
        # working; superseded tombstone dirs are garbage, not hazards)
        manifest.has_tombstones = False
        manifest.deleted_count = 0
        manifest.tombstones_rel = None
    return store.commit(manifest)
