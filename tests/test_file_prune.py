"""File-level (field, term) min/max pruning (sources/file_prune.py).

The postings/blocks/terms tables are (field, term, docid)-range-sorted, so
each parquet file covers a contiguous term span; a term lookup needs the
one or two files whose span contains it.  These tests assert (a) pruning
is pure IO reduction — every query result is identical with pruning
disabled (WNS_NO_FILE_PRUNE=1), (b) a point lookup really does scan fewer
files, and (c) the bound math is conservative (missing/truncated stats
keep the file).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher, _prefix_hi
from whoosh_novo_spark.operators.wand import search_wand
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.file_prune import FileRange, prune_files
from whoosh_novo_spark.sources.segment_store import SegmentStore


# ---------------------------------------------------------------- unit


def _fr(path, lo, hi):
    return FileRange(path, lo, hi)


RANGES = [
    _fr("a", ("text", "apple"), ("text", "fig")),
    _fr("b", ("text", "fig"), ("text", "pear")),
    _fr("c", ("text", "pear"), ("title", "cherry")),
    _fr("d", ("title", "cherry"), ("title", "zebra")),
]


def test_point_lookup_selects_spanning_files():
    assert prune_files(RANGES, "text", terms=["fig"]) == ["a", "b"]
    assert prune_files(RANGES, "text", terms=["grape"]) == ["b"]
    assert prune_files(RANGES, "title", terms=["dog"]) == ["d"]
    # absent key inside a span still keeps only that span's file
    assert prune_files(RANGES, "text", terms=["zzzz"]) == ["c"]


def test_range_overlap():
    assert prune_files(RANGES, "text", lo="banana", hi="grape") == ["a", "b"]
    assert prune_files(RANGES, "text", lo="queen", hi=None) == ["c"]
    assert prune_files(RANGES, "text", lo=None, hi="cherry") == ["a"]
    # whole-field scan keeps every file overlapping the field
    assert prune_files(RANGES, "text") == ["a", "b", "c"]
    assert prune_files(RANGES, "title") == ["c", "d"]


def test_missing_stats_always_kept():
    ranges = RANGES + [_fr("x", None, None)]
    assert "x" in prune_files(ranges, "text", terms=["fig"])
    assert "x" in prune_files(ranges, "absent_field", terms=["q"])


def test_pairs_across_fields():
    got = prune_files(RANGES, pairs=[("text", "apple"), ("title", "dog")])
    assert got == ["a", "d"]


def test_prefix_hi_successor():
    assert _prefix_hi("abc") == "abd"
    assert "abc" <= "abczzz" <= _prefix_hi("abc")
    assert _prefix_hi("") is None
    assert _prefix_hi("a" + chr(0x10FFFF)) == "b"
    assert _prefix_hi(chr(0x10FFFF)) is None  # no successor: unbounded


# ------------------------------------------------------------ end-to-end


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(800, seed=71, vocab_size=500)
    path = str(tmp_path_factory.mktemp("ix_prune"))
    store = SegmentStore(path)
    config = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    df = spark.createDataFrame(pdf[["url", "text"]])
    build_segment(spark, df, config, store, partitions=8)
    return store, config


def _searcher(spark, store, config):
    ix = Index(spark, store, config)
    return ix, Searcher(ix)


def _rows(df):
    return [(r["docid"], round(r["score"], 9)) for r in df.collect()]


def test_point_scan_reads_fewer_files(spark, built):
    store, config = built
    ix, s = _searcher(spark, store, config)
    full = ix.postings()
    n_full = len(full.inputFiles())
    assert n_full >= 6  # the build produced a multi-file postings table
    w = full.select("term").orderBy("term").limit(1).collect()[0]["term"]
    pruned = ix.postings_span("text", terms=[w])
    assert 0 < len(pruned.inputFiles()) < n_full
    # identical rows for the key the pruning promised
    a = pruned.where(F.col("term") == w).orderBy("docid").collect()
    b = full.where(F.col("term") == w).orderBy("docid").collect()
    assert a == b


def test_marker_spans_cover_footer_scan(spark, built, monkeypatch):
    """The build persists per-file (field, term) spans into the stage
    markers; the Index must use them without touching parquet footers."""
    store, config = built
    marker = store.read_stage_marker("seg-00000", "postings")
    assert marker and marker.get("term_spans"), "build wrote no span manifest"
    import whoosh_novo_spark.sources.file_prune as fp

    def _boom(dirs):
        raise AssertionError(f"footer scan ran for {dirs}")

    monkeypatch.setattr(fp, "scan_file_ranges", _boom)
    ix, s = _searcher(spark, store, config)
    w = ix.terms().orderBy("term").limit(1).collect()[0]["term"]
    pruned = ix.postings_span("text", terms=[w])
    assert 0 < len(pruned.inputFiles()) < len(ix.postings().inputFiles())


def test_query_parity_with_pruning_disabled(spark, built, monkeypatch):
    store, config = built
    ix, s = _searcher(spark, store, config)
    # sample real terms spread across the lexicon
    terms = [
        r["term"]
        for r in ix.terms().orderBy("term").collect()[::37]
    ][:8]
    queries = [
        ast.Term("text", terms[0]),
        ast.Term("text", "absent_term_xyz"),
        ast.And(tuple(ast.Term("text", t) for t in terms[:3])),
        ast.Or(tuple(ast.Term("text", t) for t in terms[3:7])),
        ast.Prefix("text", terms[1][:2]),
        ast.TermRange("text", terms[2], terms[5]),
        ast.FuzzyTerm("text", terms[4], maxdist=1, prefixlength=1),
        ast.Phrase("text", (terms[0], terms[1])),
    ]
    with_prune = [_rows(s.search(q, limit=20)) for q in queries]
    monkeypatch.setenv("WNS_NO_FILE_PRUNE", "1")
    ix2, s2 = _searcher(spark, store, config)
    without = [_rows(s2.search(q, limit=20)) for q in queries]
    assert with_prune == without


def test_merged_segment_writes_span_manifest(spark, tmp_path_factory, monkeypatch):
    """Compaction re-sorts postings into a fresh segment — its markers
    must carry the span manifest too, and pruned queries must match."""
    from whoosh_novo_spark.operators.merge import merge_segments

    pdf = corpus_pandas(240, seed=5, vocab_size=200)
    path = str(tmp_path_factory.mktemp("ix_prune_merge"))
    store = SegmentStore(path)
    config = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    half = len(pdf) // 2
    for part in (pdf.iloc[:half], pdf.iloc[half:]):
        df = spark.createDataFrame(part[["url", "text"]])
        build_segment(spark, df, config, store, partitions=4)
    merge_segments(spark, store, config, partitions=4)
    ix, s = _searcher(spark, store, config)
    seg_id = ix.manifest.segments[0].segment_id
    marker = store.read_stage_marker(seg_id, "postings")
    assert marker and marker.get("term_spans")
    w = ix.terms().orderBy(F.desc("df")).limit(1).collect()[0]["term"]
    a = _rows(s.search(ast.Term("text", w), limit=10))
    monkeypatch.setenv("WNS_NO_FILE_PRUNE", "1")
    ix2, s2 = _searcher(spark, store, config)
    assert a == _rows(s2.search(ast.Term("text", w), limit=10))


def test_wand_parity_with_pruning(spark, built, monkeypatch):
    store, config = built
    ix, s = _searcher(spark, store, config)
    terms = [r["term"] for r in ix.terms().orderBy(F.desc("df")).limit(3).collect()]
    q = ast.Or(tuple(ast.Term("text", t) for t in terms))
    a = _rows(search_wand(s, q, limit=10, n_buckets=4, force_kernel=True))
    monkeypatch.setenv("WNS_NO_FILE_PRUNE", "1")
    ix2, s2 = _searcher(spark, store, config)
    b = _rows(search_wand(s2, q, limit=10, n_buckets=4, force_kernel=True))
    assert a == b
