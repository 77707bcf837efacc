"""Head-term skew gate (north rule: "skew from head terms is handled
with salted repartitioning and explicit shuffle-partition sizing").

The engine's posting sink is SKEW-PROOF BY CONSTRUCTION rather than
salted: ``repartitionByRange(sp, field, term, docid)`` includes docid in
the range key, so a Zipf-head term's postings split across partitions at
docid boundaries — the same load balance salting buys, without the
query-side de-salt pass (build.py stage 3c).  Whoosh itself never faces
this: its single-process PostingPool (writing.py:244-318) external-sorts
one stream, so partition skew cannot exist there; this gate is Spark-new.

These tests PLANT the pathology — one term in every document, ~50% of
all postings — and assert from the recorded per-file lineage metrics
(stage marker ``file_rows``) that (a) no partition became a hot-spot and
(b) the head term really does span multiple files (i.e. balance came
from splitting the term, not luck)."""

from __future__ import annotations

import os

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text"),), stored_cols=())

N_DOCS = 8000
SP = 8
HOT = "zzhot"


@pytest.fixture(scope="module")
def skewed_store(spark, tmp_path_factory):
    """Corpus where HOT appears in EVERY doc and each doc adds one rare
    term -> HOT holds ~50% of all postings (a Zipf head far beyond any
    real stopword-filtered corpus)."""
    rows = [
        (f"u{i:05d}", f"{HOT} w{i % 997:03d}")
        for i in range(N_DOCS)
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    store = SegmentStore(str(tmp_path_factory.mktemp("skew_ix")))
    build_segment(spark, docs, CFG, store, partitions=SP)
    return store


def _posting_files(store):
    marker = store.read_stage_marker("seg-00000", "postings")
    assert marker is not None
    return marker["file_rows"]  # {file_name: row_count} lineage metric


def test_posting_partitions_balanced_under_head_term(spark, skewed_store):
    """Max posting file stays within 2x the mean even with one term
    owning half of all postings (an unsplit hot term would put ~50% of
    rows in one partition: ratio ~4x here)."""
    file_rows = _posting_files(skewed_store)
    counts = list(file_rows.values())
    assert len(counts) == SP
    mean = sum(counts) / len(counts)
    assert max(counts) <= 2.0 * mean, (sorted(counts), mean)
    # the unsplit-hot-term failure mode would be one file with >= 45%
    # of all rows; no file may come near that
    assert max(counts) < 0.45 * sum(counts), sorted(counts)


def test_head_term_spans_multiple_files(spark, skewed_store):
    """The balance must come from SPLITTING the hot term at docid
    boundaries, not from lucky hashing: with ~50% of rows, HOT must
    occupy >= 3 of the 8 range partitions.  Verified from parquet
    footer min/max stats of the sorted term column (no data read)."""
    import pyarrow.parquet as pq

    path = skewed_store.table_path("seg-00000", "postings")
    holding = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["term"]
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo <= HOT <= hi:
            holding.append(fn)
    assert len(holding) >= 3, holding


def test_head_term_queries_correct_after_split(spark, skewed_store):
    """Splitting a term across partitions must not change results: df of
    the head term == N_DOCS, and an And(head, rare) query finds exactly
    the one doc holding that rare term."""
    ix = Index(spark, skewed_store, CFG)
    s = Searcher(ix)
    assert ix.term_stats([("text", HOT)])[("text", HOT)].df == N_DOCS
    hits = s.search(ast.And([ast.Term("text", HOT), ast.Term("text", "w007")]), limit=100)
    docids = {r["docid"] for r in hits.collect()}
    # docs u00007, u01004, u02001, ... (i % 997 == 7): ceil(8000/997)
    expect = {i for i in range(N_DOCS) if i % 997 == 7}
    assert len(docids) == len(expect)
