"""Federated multi-store index: N independent builds served as one.

Gates ``operators/federate.py``: opening K separately-built SegmentStores
as a FederatedIndex must be rank- AND score-identical to ONE global build
over the same corpus — read-time docid offsets (whoosh MultiReader's
doc-offset arithmetic, reference reading.py:1047-1077) plus cross-store
statistic sums (reading.py:1097-1133) make federation invisible to
scoring.  This is the zero-coordination cluster build pattern: each
executor/job builds its own store, queries federate them with no
physical merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.federate import FederatedIndex
from whoosh_novo_spark.operators.merge import delete_by_term
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.operators.wand import search_wand
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text", positions=True),))

QUERIES = [
    ast.Term("text", "render"),
    ast.Or((ast.Term("text", "render"), ast.Term("text", "shade"), ast.Term("text", "mesh"))),
    ast.And((ast.Term("text", "render"), ast.Term("text", "shade"))),
    ast.Phrase("text", ("render", "shade")),
]


def _build(spark, path: str, pdf) -> SegmentStore:
    store = SegmentStore(path)
    df = spark.createDataFrame(
        list(zip(pdf["url"], pdf["text"])), "url string, text string"
    )
    build_segment(spark, df, CFG, store, partitions=2)
    return store


@pytest.fixture(scope="module")
def fed(spark, tmp_path_factory):
    """Global single-store build vs the same corpus split into 2 stores
    (the second holding TWO segments) along sorted-url boundaries, so
    federated docids coincide with the global build's and result frames
    can be compared verbatim."""
    pdf = corpus_pandas(240, seed=47, vocab_size=300).sort_values("url").reset_index(drop=True)
    base = tmp_path_factory.mktemp("fed")
    g = _build(spark, str(base / "global"), pdf)
    a = _build(spark, str(base / "a"), pdf.iloc[:100])
    b = SegmentStore(str(base / "b"))
    for sl in (pdf.iloc[100:170], pdf.iloc[170:]):
        df = spark.createDataFrame(
            list(zip(sl["url"], sl["text"])), "url string, text string"
        )
        build_segment(spark, df, CFG, b, partitions=2)
    return g, [a, b], pdf


def _rows(df, limit=None):
    return [(int(r["docid"]), round(float(r["score"]), 9)) for r in df.collect()]


def test_statistics_match_global_build(spark, fed):
    g, parts, pdf = fed
    gi = Index(spark, g, CFG)
    fi = FederatedIndex(spark, parts, CFG)
    assert fi.doc_count_all == gi.doc_count_all == len(pdf)
    assert fi.avg_field_length("text") == pytest.approx(
        gi.avg_field_length("text"), rel=1e-12
    )
    pairs = [("text", "render"), ("text", "shade"), ("text", "mesh")]
    gs, fs = gi.term_stats(pairs), fi.term_stats(pairs)
    assert set(gs) == set(fs)
    for k in gs:
        assert fs[k].df == gs[k].df
        assert fs[k].cf == pytest.approx(gs[k].cf, rel=1e-12)
        assert fs[k].max_weight == pytest.approx(gs[k].max_weight, rel=1e-12)
        assert fs[k].min_len_q == gs[k].min_len_q


def test_docmap_matches_global_build(spark, fed):
    g, parts, pdf = fed
    gi = Index(spark, g, CFG)
    fi = FederatedIndex(spark, parts, CFG)
    gm = {r["docid"]: r["url"] for r in gi.docmap(columns=["docid", "url"]).collect()}
    fm = {r["docid"]: r["url"] for r in fi.docmap(columns=["docid", "url"]).collect()}
    assert fm == gm  # aligned split => identical docid assignment


def test_search_rank_and_score_identical(spark, fed):
    g, parts, _ = fed
    sg = Searcher(Index(spark, g, CFG))
    sf = Searcher(FederatedIndex(spark, parts, CFG))
    for q in QUERIES:
        ours = _rows(sf.search(q, limit=None))
        theirs = _rows(sg.search(q, limit=None))
        assert ours == theirs, f"{q}"


def test_wand_pruned_path_matches(spark, fed):
    g, parts, _ = fed
    sg = Searcher(Index(spark, g, CFG))
    sf = Searcher(FederatedIndex(spark, parts, CFG))
    for q in QUERIES[:3]:  # flat shapes only (wand falls back on Phrase)
        fed_wand = _rows(search_wand(sf, q, limit=10, n_buckets=4, force_kernel=True))
        assert fed_wand == _rows(sg.search(q, limit=10))
        assert fed_wand == _rows(sf.search(q, limit=10))


def test_interleaved_split_scores_by_url(spark, fed, tmp_path_factory):
    """Odd/even url split: docids differ from the global build, but the
    (url, score) result set must still match exactly — statistics are
    global, scoring is docid-independent."""
    g, _, pdf = fed
    base = tmp_path_factory.mktemp("fed_il")
    a = _build(spark, str(base / "a"), pdf.iloc[::2])
    b = _build(spark, str(base / "b"), pdf.iloc[1::2])
    fi = FederatedIndex(spark, [a, b], CFG)
    sg = Searcher(Index(spark, g, CFG))
    sf = Searcher(fi)
    um = fi.docmap(columns=["docid", "url"])
    gm = Index(spark, g, CFG).docmap(columns=["docid", "url"])
    for q in QUERIES:
        ours = {
            (r["url"], round(float(r["score"]), 9))
            for r in sf.search(q, limit=None).join(um, "docid").collect()
        }
        theirs = {
            (r["url"], round(float(r["score"]), 9))
            for r in sg.search(q, limit=None).join(gm, "docid").collect()
        }
        assert ours == theirs, f"{q}"


def test_tombstones_federate(spark, fed, tmp_path_factory):
    """Deletes live in their owning store; the federation applies them at
    read with whoosh's stale-statistics semantics, matching a global
    build with the same deletes."""
    g, _, pdf = fed
    base = tmp_path_factory.mktemp("fed_del")
    g2 = _build(spark, str(base / "global"), pdf)
    a = _build(spark, str(base / "a"), pdf.iloc[:120])
    b = _build(spark, str(base / "b"), pdf.iloc[120:])
    delete_by_term(spark, g2, "text", "shade")
    delete_by_term(spark, a, "text", "shade")
    delete_by_term(spark, b, "text", "shade")
    sg = Searcher(Index(spark, g2, CFG))
    sf = Searcher(FederatedIndex(spark, [a, b], CFG))
    assert sf.index.manifest.has_tombstones
    for q in QUERIES[:3]:
        assert _rows(sf.search(q, limit=None)) == _rows(sg.search(q, limit=None))
    # deleted docs are gone from results but still counted in dc (whoosh
    # scoring.py:50-56 doc_count_all)
    assert sf.index.doc_count_all == len(pdf)
    hits = sf.search(ast.Term("text", "shade"), limit=None).count()
    assert hits == 0
    # and the pruned path agrees on the tombstoned federation
    q = QUERIES[1]
    assert _rows(search_wand(sf, q, limit=10, n_buckets=4, force_kernel=True)) == _rows(
        sg.search(q, limit=10)
    )


def test_file_prune_parity(spark, fed, monkeypatch):
    g, parts, _ = fed
    q = QUERIES[1]
    with_prune = _rows(Searcher(FederatedIndex(spark, parts, CFG)).search(q, limit=None))
    monkeypatch.setenv("WNS_NO_FILE_PRUNE", "1")
    without = _rows(Searcher(FederatedIndex(spark, parts, CFG)).search(q, limit=None))
    assert with_prune == without


def test_id_col_mismatch_raises(spark, fed, tmp_path_factory):
    _, parts, pdf = fed
    other = SegmentStore(str(tmp_path_factory.mktemp("fed_bad") / "x"))
    cfg2 = IndexConfig(id_col="u2", fields=(FieldConfig("text"),))
    df = spark.createDataFrame(
        [(u + "#2", t) for u, t in zip(pdf["url"][:10], pdf["text"][:10])],
        "u2 string, text string",
    )
    build_segment(spark, df, cfg2, other, partitions=1)
    with pytest.raises(ValueError, match="id_col"):
        FederatedIndex(spark, [parts[0], other], CFG)


def test_batch_and_facets_and_more_like(spark, fed):
    """Federation is a drop-in Index for the wider surface too: batch
    evaluation, facet counting over fetched stored fields, and Bo1
    more_like all match the global single-store build."""
    from whoosh_novo_spark.operators.batch import search_batch
    from whoosh_novo_spark.operators.facets import field_facet

    g, parts, _ = fed
    sg = Searcher(Index(spark, g, CFG))
    sf = Searcher(FederatedIndex(spark, parts, CFG))

    queries = {f"q{i}": q for i, q in enumerate(QUERIES[:3])}
    rows = lambda df: sorted(  # noqa: E731
        (r["qid"], int(r["docid"]), round(float(r["score"]), 9), int(r["rank"]))
        for r in df.collect()
    )
    assert rows(search_batch(sf, queries, limit=10)) == rows(
        search_batch(sg, queries, limit=10)
    )

    # facet counts over the hit set (docmap join happens inside)
    res_f = sf.search(QUERIES[1], limit=None)
    res_g = sg.search(QUERIES[1], limit=None)
    fc = lambda s, res: sorted(  # noqa: E731
        (r[0], int(r[1]))
        for r in field_facet(res, s.index.docmap(), "url").collect()
    )
    assert fc(sf, res_f) == fc(sg, res_g)

    # more_like from the same document (aligned split: same docid)
    doc = sg.search(QUERIES[0], limit=1).collect()[0]["docid"]
    ml = lambda s: [  # noqa: E731
        (int(r["docid"]), round(float(r["score"]), 9))
        for r in s.more_like(int(doc), "text", top=10).collect()
    ]
    assert ml(sf) == ml(sg)
