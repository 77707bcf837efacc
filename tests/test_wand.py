"""WAND pruned path == exact path (the reference's pruned-vs-exact
equivalence, SURVEY §4.3), plus varbyte/delta codec round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from whoosh_novo_spark.operators.blocks import decode_ids, encode_ids, vb_decode, vb_encode
from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.operators.wand import search_wand
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore


def test_varbyte_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        vals = rng.integers(0, 2**40, size=rng.integers(0, 300)).astype(np.uint64)
        assert list(vb_decode(vb_encode(vals))) == list(vals)
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    # boundary values
    edge = np.array([0, 1, 127, 128, 16383, 16384, 2**35], dtype=np.uint64)
    assert list(vb_decode(vb_encode(edge))) == list(edge)


def test_delta_ids_roundtrip():
    rng = np.random.default_rng(1)
    ids = np.unique(rng.integers(0, 10**9, size=500))
    assert list(decode_ids(encode_ids(ids))) == list(ids)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(800, seed=21, vocab_size=300)
    path = str(tmp_path_factory.mktemp("wand_ix"))
    store = SegmentStore(path)
    config = IndexConfig(id_col="url", fields=(FieldConfig("text"),), block_limit=32)
    df = spark.createDataFrame(
        list(zip(pdf["url"], pdf["text"])), "url string, text string"
    )
    build_segment(spark, df, config, store, partitions=4)
    ix = Index(spark, store, config)
    return ix, Searcher(ix)


WAND_QUERIES = [
    (ast.Term("text", "render"), 10),
    (ast.Term("text", "w00001"), 10),  # head term
    (ast.Or((ast.Term("text", "render"), ast.Term("text", "shade"))), 10),
    (ast.Or((ast.Term("text", "w00000"), ast.Term("text", "w00001"), ast.Term("text", "render"))), 5),
    (ast.Or(tuple(ast.Term("text", w) for w in ["render", "shade", "texture", "spark", "index"])), 20),
    (ast.And((ast.Term("text", "render"), ast.Term("text", "shade"))), 10),
    (ast.And((ast.Term("text", "w00000"), ast.Term("text", "w00001"))), 10),
    (ast.And((ast.Term("text", "render"), ast.Term("text", "zzzmissing"))), 10),
    (ast.Term("text", "zzzmissing"), 10),
]


@pytest.mark.parametrize("q,k", WAND_QUERIES, ids=lambda x: str(x)[:40])
def test_wand_equals_exact(built, q, k):
    ix, searcher = built
    exact = searcher.search(q, limit=k).collect()
    pruned = search_wand(searcher, q, limit=k, n_buckets=6, force_kernel=True).collect()
    assert [r["docid"] for r in pruned] == [r["docid"] for r in exact]
    for p, e in zip(pruned, exact):
        assert p["score"] == pytest.approx(e["score"], rel=1e-12)


def test_wand_many_buckets(built):
    """bucket granularity must not change results (straddling blocks)."""
    ix, searcher = built
    q = ast.Or((ast.Term("text", "w00000"), ast.Term("text", "render")))
    exact = [r["docid"] for r in searcher.search(q, limit=10).collect()]
    for nb in (1, 2, 17, 64):
        got = [r["docid"] for r in search_wand(searcher, q, limit=10, n_buckets=nb, force_kernel=True).collect()]
        assert got == exact, nb


def test_blocks_path_route_matches_dataframe_route(built, spark):
    """r6: build_blocks_from_path (pyarrow per-file fast path, the build's
    stage-4c default) must produce exactly the block rows of the original
    DataFrame route — same stats, same encoded blobs."""
    from whoosh_novo_spark.operators.blocks import (
        build_blocks,
        build_blocks_from_path,
    )

    ix, _ = built
    seg = ix.manifest.segments[0]
    ppath = ix.store.table_path(seg.segment_id, "postings")
    via_df = build_blocks(spark, spark.read.parquet(ppath), 32).collect()
    via_path = build_blocks_from_path(spark, ppath, 32).collect()
    key = lambda r: (r["field"], r["term"], r["min_docid"])  # noqa: E731
    a = sorted(([*r] for r in via_df), key=lambda r: (r[0], r[1], r[4]))
    b = sorted(([*r] for r in via_path), key=lambda r: (r[0], r[1], r[4]))
    assert a == b and len(a) > 0


def test_blocks_metadata(built):
    """Block invariants: sorted disjoint runs, skip pointers consistent."""
    ix, _ = built
    import pandas as pd

    blocks = ix._union_table("blocks").toPandas()
    assert (blocks["n"] <= 32).all()
    for (_, t), g in blocks.groupby(["field", "term"]):
        g = g.sort_values("min_docid")
        assert (g["min_docid"].to_numpy() <= g["max_docid"].to_numpy()).all()
        # disjoint, ascending runs
        assert (g["max_docid"].to_numpy()[:-1] < g["min_docid"].to_numpy()[1:]).all()
    # spot-decode one block and check metadata
    row = blocks.iloc[0]
    ids = decode_ids(row["ids"])
    w = np.frombuffer(row["weights"], dtype=np.float32)
    assert ids[0] == row["min_docid"] and ids[-1] == row["max_docid"]
    assert len(ids) == row["n"] and w.max() == pytest.approx(row["max_weight"])


def test_wand_equals_exact_with_deletes(spark, built, tmp_path):
    """Tombstoned indexes run the PRUNED path (cogrouped per-bucket
    tombstone filtering), rank/score-identical to the exact path's
    anti-join — including the top docs being the deleted ones."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.merge import delete_docs
    from whoosh_novo_spark.sources.corpus import corpus_pandas

    pdf = corpus_pandas(400, seed=33, vocab_size=300).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path / "wand_del_ix"))
    config = IndexConfig(id_col="url", fields=(FieldConfig("text"),), block_limit=32)
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, config, store, partitions=4)

    # delete the exact current top-3 of the test query, plus a spread
    ix0 = Index(spark, store, config)
    q = ast.Or((ast.Term("text", "render"), ast.Term("text", "shade")))
    top = [r["docid"] for r in Searcher(ix0).search(q, limit=3).collect()]
    victims = top + [7, 77, 177, 277, 377]
    delete_docs(spark, store, spark.createDataFrame([(int(d),) for d in victims], "docid long"))

    ix = Index(spark, store, config)
    searcher = Searcher(ix)
    assert ix.manifest.has_tombstones
    for qq, k in [(q, 10), (ast.And((ast.Term("text", "render"), ast.Term("text", "shade"))), 10),
                  (ast.Term("text", "render"), 15)]:
        exact = searcher.search(qq, limit=k).collect()
        pruned = search_wand(searcher, qq, limit=k, n_buckets=6, force_kernel=True).collect()
        assert [r["docid"] for r in pruned] == [r["docid"] for r in exact]
        assert not (set(r["docid"] for r in pruned) & set(victims))
        for p, e in zip(pruned, exact):
            assert p["score"] == pytest.approx(e["score"], rel=1e-12)


MULTITERM_WAND_QUERIES = [
    (ast.Prefix("text", "w0000"), 10),   # expands to head terms
    (ast.Prefix("text", "ren"), 10),
    (ast.Wildcard("text", "sh*de"), 10),
    (ast.Wildcard("text", "w0000?"), 5),
    (ast.Regex("text", "rend.*"), 10),
    (ast.Prefix("text", "zzznope"), 10),  # empty expansion
]


@pytest.mark.parametrize("q,k", MULTITERM_WAND_QUERIES, ids=lambda x: str(x)[:40])
def test_wand_multiterm_equals_exact(built, q, k):
    """Scored multiterm (Prefix/Wildcard/Regex) can run the pruned path
    via bounded lexicon expansion (opt-in multiterm=True; the default
    routes to exact — measured net loss, BENCH/prefix_wand_ab.json),
    rank/score-identical to the exact joined-stats path."""
    ix, searcher = built
    exact = searcher.search(q, limit=k).collect()
    pruned = search_wand(searcher, q, limit=k, n_buckets=6, multiterm=True, force_kernel=True).collect()
    assert [r["docid"] for r in pruned] == [r["docid"] for r in exact]
    for p, e in zip(pruned, exact):
        assert p["score"] == pytest.approx(e["score"], rel=1e-12)


def test_wand_multiterm_cap_falls_back_to_exact(built, monkeypatch):
    """An expansion past TOO_MANY_CLAUSES must not collect to the driver:
    search_wand falls back to the distributed exact path (same results)."""
    ix, searcher = built
    q = ast.Prefix("text", "w")  # broad expansion

    def tiny_cap(qq, max_clauses=1024):
        return Index.expand_terms(ix, qq, max_clauses=3)

    monkeypatch.setattr(ix, "expand_terms", tiny_cap)
    exact = searcher.search(q, limit=10).collect()
    got = search_wand(searcher, q, limit=10, n_buckets=6, multiterm=True, force_kernel=True).collect()
    assert [r["docid"] for r in got] == [r["docid"] for r in exact]


def test_wand_multiterm_with_deletes(spark, tmp_path):
    """Prefix WAND over a tombstoned index == exact, deleted docs absent."""
    from whoosh_novo_spark.operators.merge import delete_docs

    pdf = corpus_pandas(400, seed=34, vocab_size=300).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path / "wand_mt_del_ix"))
    config = IndexConfig(id_col="url", fields=(FieldConfig("text"),), block_limit=32)
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, config, store, partitions=4)

    q = ast.Prefix("text", "w0000")
    top = [r["docid"] for r in Searcher(Index(spark, store, config)).search(q, limit=3).collect()]
    victims = top + [5, 55, 155]
    delete_docs(spark, store, spark.createDataFrame([(int(d),) for d in victims], "docid long"))

    ix = Index(spark, store, config)
    searcher = Searcher(ix)
    assert ix.manifest.has_tombstones
    exact = searcher.search(q, limit=10).collect()
    pruned = search_wand(searcher, q, limit=10, n_buckets=6, multiterm=True, force_kernel=True).collect()
    assert [r["docid"] for r in pruned] == [r["docid"] for r in exact]
    assert not (set(r["docid"] for r in pruned) & set(victims))
    for p, e in zip(pruned, exact):
        assert p["score"] == pytest.approx(e["score"], rel=1e-12)


def test_wand_multiterm_default_routes_exact(built):
    """Without the opt-in, multiterm queries take the exact path (the
    measured-faster default)."""
    ix, searcher = built
    q = ast.Prefix("text", "w0000")
    exact = searcher.search(q, limit=10).collect()
    got = search_wand(searcher, q, limit=10, n_buckets=6, force_kernel=True).collect()
    assert [(r["docid"], r["score"]) for r in got] == [(r["docid"], r["score"]) for r in exact]
