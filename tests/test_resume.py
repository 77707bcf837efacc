"""Resume-from-checkpoint: a build killed between stages must finish from
where it left off (SURVEY §7.4: idempotent stages, each committing a
checkpoint + manifest marker), and lineage metrics must be recorded."""

from __future__ import annotations

import json
import os

import pytest

from whoosh_novo_spark.operators.build import _stage_docmap, build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text"),))


def _df(spark, pdf):
    return spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")


def test_resume_after_docmap_stage(spark, tmp_path):
    """Simulate a death right after stage 1: only the docmap checkpoint +
    marker exist; a fresh build_segment call must reuse them and finish."""
    pdf = corpus_pandas(120, seed=51, vocab_size=100)
    store = SegmentStore(str(tmp_path))
    # stage 1 only (what a killed driver would leave behind)
    marker1 = _stage_docmap(spark, _df(spark, pdf), CFG, store, "seg-00000", 2)
    assert store.read_manifest().generation == 0  # nothing committed
    assert store.read_stage_marker("seg-00000", "docmap") is not None

    # restart: full build picks up the same segment dir and its marker
    m = build_segment(spark, _df(spark, pdf), CFG, store, partitions=2)
    assert m.generation == 1
    assert [s.segment_id for s in m.segments] == ["seg-00000"]
    assert m.doc_count_all == len(pdf)
    # docmap stage was NOT redone: marker object identical
    assert store.read_stage_marker("seg-00000", "docmap")["offsets"] == marker1["offsets"]

    s = Searcher(Index(spark, store, CFG))
    assert s.search(ast.Term("text", "render"), limit=5).count() > 0


def test_rebuild_is_idempotent(spark, tmp_path):
    pdf = corpus_pandas(80, seed=52, vocab_size=100)
    store = SegmentStore(str(tmp_path))
    m1 = build_segment(spark, _df(spark, pdf), CFG, store, partitions=2)
    gen1 = m1.generation
    # second call with same input = second segment (new batch), not resume
    m2 = build_segment(spark, _df(spark, pdf), CFG, store, partitions=2)
    assert m2.generation == gen1 + 1
    assert len(m2.segments) == 2
    assert m2.doc_count_all == 2 * len(pdf)


def test_lineage_metrics_recorded(spark, tmp_path):
    pdf = corpus_pandas(100, seed=53, vocab_size=100)
    store = SegmentStore(str(tmp_path))
    build_segment(spark, _df(spark, pdf), CFG, store, partitions=3)
    dm = store.read_stage_marker("seg-00000", "docmap")
    po = store.read_stage_marker("seg-00000", "postings")
    assert sum(dm["file_rows"].values()) == len(pdf)
    assert dm["offsets"] and dm["doc_count"] == len(pdf)
    assert po["seconds"] >= 0 and sum(po["file_rows"].values()) > 0
    # manifest records build duration
    m = store.read_manifest()
    assert m.segments[0].meta["build_seconds"] > 0
    # markers are valid JSON on disk (external tooling readable)
    p = os.path.join(store.segment_dir("seg-00000"), "_stage_docmap.json")
    with open(p) as f:
        json.load(f)


def test_writer_lock_excludes_second_writer(spark, tmp_path):
    """whoosh index.LockError parity: a second writer raises while the
    first holds the index; release lets it in; stale dead-pid locks are
    broken automatically."""
    import json
    import os

    import pytest as _pytest

    from whoosh_novo_spark.sources.segment_store import LockError, SegmentStore

    store = SegmentStore(str(tmp_path / "lock_ix"))
    store.acquire_writer_lock()
    other = SegmentStore(str(tmp_path / "lock_ix"))
    with _pytest.raises(LockError):
        other.acquire_writer_lock()
    # reentrant within the owning instance (update = delete + build)
    store.acquire_writer_lock()
    store.release_writer_lock()
    other2 = SegmentStore(str(tmp_path / "lock_ix"))
    with _pytest.raises(LockError):
        other2.acquire_writer_lock()
    store.release_writer_lock()
    other2.acquire_writer_lock()
    other2.release_writer_lock()
    # stale lock from a dead pid is broken
    with open(os.path.join(str(tmp_path / "lock_ix"), "WRITE_LOCK"), "w") as f:
        json.dump({"pid": 99999999, "ts": 0}, f)
    store2 = SegmentStore(str(tmp_path / "lock_ix"))
    store2.acquire_writer_lock()
    store2.release_writer_lock()


def test_stored_cols_projection(spark, tmp_path):
    """stored_cols=() keeps only id + indexed fields in the docmap;
    named extras survive for fetch."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    rows = [(f"{i:03d}", f"alpha w{i}", "keepme", bytearray(b"\x00" * 64)) for i in range(20)]
    df = spark.createDataFrame(rows, "rid string, text string, tag string, blob binary")
    st1 = SegmentStore(str(tmp_path / "ix_lean"))
    cfg1 = IndexConfig(id_col="rid", fields=(FieldConfig("text"),), stored_cols=())
    build_segment(spark, df, cfg1, st1, partitions=1)
    cols1 = set(Index(spark, st1, cfg1).docmap().columns)
    assert cols1 == {"rid", "text", "docid"}
    st2 = SegmentStore(str(tmp_path / "ix_tag"))
    cfg2 = IndexConfig(id_col="rid", fields=(FieldConfig("text"),), stored_cols=("tag",))
    build_segment(spark, df, cfg2, st2, partitions=1)
    cols2 = set(Index(spark, st2, cfg2).docmap().columns)
    assert cols2 == {"rid", "text", "tag", "docid"}


def test_crashed_merge_dir_not_adopted(spark, tmp_path):
    """ADVICE r2: an uncommitted dir with a postings marker but NO docmap
    marker (a merge that died between stages) must never be adopted by the
    next build — adopting it would skip the analysis stage and then fail
    reading raw postings that don't exist, forever."""
    store = SegmentStore(str(tmp_path))
    # simulate the crashed merge: stage markers exist, docmap marker doesn't
    crashed = store.new_segment_id()
    store.write_stage_marker(crashed, "postings", {"merged_from": ["x"]})
    assert store.read_stage_marker(crashed, "docmap") is None

    pdf = corpus_pandas(60, seed=54, vocab_size=80)
    m = build_segment(spark, _df(spark, pdf), CFG, store, partitions=2)
    assert m.generation == 1
    built_ids = [s.segment_id for s in m.segments]
    assert crashed not in built_ids  # minted a fresh dir instead
    s = Searcher(Index(spark, store, CFG))
    assert s.search(ast.Term("text", "render"), limit=5).count() > 0
