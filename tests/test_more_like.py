"""Term vectors + key_terms + more_like parity with the reference
(searching.py:455-613, classify.py Expander over stored vectors)."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.merge import merge_segments
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.sources.corpus import corpus_pandas
from whoosh_novo_spark.sources.segment_store import SegmentStore

CFG = IndexConfig(id_col="url", fields=(FieldConfig("text", vector=True),))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = corpus_pandas(180, seed=71, vocab_size=180).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path_factory.mktemp("mlt_ix")))
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, CFG, store, partitions=2)
    return Index(spark, store, CFG), pdf


@pytest.fixture(scope="module")
def v_oracle(whoosh_ref, built):
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    _, pdf = built
    schema = fields.Schema(
        id=fields.ID(stored=True, unique=True),
        text=fields.TEXT(stored=True, vector=True),
    )
    ix = RamStorage().create_index(schema)
    w = ix.writer()
    for i, t in enumerate(pdf["text"]):
        w.add_document(id=f"{i:06d}", text=t)
    w.commit()
    return ix


def test_vectors_table_written(spark, built):
    ix, pdf = built
    vt = ix.vector_table("text")
    assert vt is not None
    # the forward index agrees with a docid-filtered postings scan
    import pyspark.sql.functions as F

    a = sorted(
        (r["term"], float(r["weight"]))
        for r in vt.where(F.col("docid") == 7).collect()
    )
    b = sorted(
        (r["term"], float(r["weight"]))
        for r in ix.postings().where(
            (F.col("docid") == 7) & (F.col("field") == "text")
        ).collect()
    )
    assert a == b and len(a) > 0


def test_key_terms_parity(spark, built, v_oracle):
    ix, _ = built
    s = Searcher(ix)
    with v_oracle.searcher() as ws:
        for docnum in (0, 17, 93):
            theirs = ws.key_terms([docnum], "text", numterms=5)
            ours = s.key_terms([docnum], "text", numterms=5)
            assert [t for t, _ in ours] == [t for t, _ in theirs], docnum
            for (_, a), (_, b) in zip(ours, theirs):
                assert a == pytest.approx(b, rel=1e-9)
        # multi-doc expansion
        theirs = ws.key_terms([3, 4, 5], "text", numterms=8)
        ours = s.key_terms([3, 4, 5], "text", numterms=8)
        assert [t for t, _ in ours] == [t for t, _ in theirs]


def test_key_terms_from_text_parity(spark, built, v_oracle):
    ix, pdf = built
    s = Searcher(ix)
    text = pdf["text"][11]
    with v_oracle.searcher() as ws:
        theirs = ws.key_terms_from_text("text", text, numterms=6)
    ours = s.key_terms_from_text("text", text, numterms=6)
    assert [t for t, _ in ours] == [t for t, _ in theirs]
    for (_, a), (_, b) in zip(ours, theirs):
        assert a == pytest.approx(b, rel=1e-9)


def test_more_like_parity(spark, built, v_oracle):
    ix, _ = built
    s = Searcher(ix)
    with v_oracle.searcher() as ws:
        for docnum in (2, 40, 121):
            res = ws.more_like(docnum, "text", top=10)
            theirs = [(int(h["id"]), h.score) for h in res]
            ours = [
                (int(r["docid"]), float(r["score"]))
                for r in s.more_like(docnum, "text", top=10).collect()
            ]
            assert [d for d, _ in ours] == [d for d, _ in theirs], docnum
            for (_, a), (_, b) in zip(ours, theirs):
                assert a == pytest.approx(b, rel=1e-9)
            assert docnum not in [d for d, _ in ours]  # source doc masked


def test_vectors_survive_merge(spark, tmp_path):
    pdf = corpus_pandas(80, seed=72, vocab_size=120).sort_values("url").reset_index(drop=True)
    store = SegmentStore(str(tmp_path / "mlt_merge"))
    half = len(pdf) // 2
    for sl in (pdf.iloc[:half], pdf.iloc[half:]):
        df = spark.createDataFrame(
            list(zip(sl["url"], sl["text"])), "url string, text string"
        )
        build_segment(spark, df, CFG, store, partitions=2)
    ix = Index(spark, store, CFG)
    before = Searcher(ix).key_terms([10], "text", numterms=5)
    merge_segments(spark, store, CFG)
    ix2 = Index(spark, store, CFG)
    assert ix2.vector_table("text") is not None
    after = Searcher(ix2).key_terms([10], "text", numterms=5)
    assert [t for t, _ in after] == [t for t, _ in before]
