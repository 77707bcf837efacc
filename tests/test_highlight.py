"""Highlighting parity with whoosh.highlight on identical inputs."""

from __future__ import annotations

import pytest

from whoosh_novo_spark.functions.highlight import (
    ContextFragmenter,
    HtmlFormatter,
    UppercaseFormatter,
    WholeFragmenter,
    highlights,
)

TEXTS = [
    "The quick brown fox jumped over the lazy dog and the quick cat ran after the fox into the quiet night",
    "Render pipelines shade every texture while the renderer keeps shading textures in the render farm",
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa",
    "Short text",
    "",
]

CASES = [
    ({"fox", "dog"}, {}),
    ({"render", "shade"}, {}),
    ({"quick"}, {"top": 2}),
    ({"alpha", "papa"}, {}),
    ({"missing"}, {}),
]


def _ref_highlight(whoosh_ref, text, terms, top=3, upper=False, whole=False):
    from whoosh.analysis import StandardAnalyzer
    from whoosh.highlight import (
        ContextFragmenter as RCF,
        HtmlFormatter as RHF,
        UppercaseFormatter as RUF,
        WholeFragmenter as RWF,
        highlight,
    )

    frag = RWF() if whole else RCF()
    fmt = RUF() if upper else RHF(tagname="b")
    return highlight(text, frozenset(terms), StandardAnalyzer(), frag, fmt, top=top)


@pytest.mark.parametrize("text", TEXTS, ids=lambda t: t[:18] or "empty")
@pytest.mark.parametrize("terms,kw", CASES, ids=lambda c: str(sorted(c))[:25] if isinstance(c, set) else str(c))
def test_html_highlight_matches_reference(whoosh_ref, text, terms, kw):
    ours = highlights(text, terms, formatter=HtmlFormatter(tagname="b"), **kw)
    theirs = _ref_highlight(whoosh_ref, text, terms, top=kw.get("top", 3))
    assert ours == theirs, (text[:30], terms)


@pytest.mark.parametrize("text", TEXTS[:3], ids=lambda t: t[:18])
def test_uppercase_highlight_matches_reference(whoosh_ref, text):
    terms = {"fox", "render", "alpha", "quick"}
    ours = highlights(text, terms, formatter=UppercaseFormatter())
    theirs = _ref_highlight(whoosh_ref, text, terms, upper=True)
    assert ours == theirs


@pytest.mark.parametrize("text", TEXTS[:3], ids=lambda t: t[:18])
def test_whole_fragmenter_matches_reference(whoosh_ref, text):
    terms = {"fox", "render", "alpha"}
    ours = highlights(
        text, terms, fragmenter=WholeFragmenter(), formatter=UppercaseFormatter()
    )
    theirs = _ref_highlight(whoosh_ref, text, terms, upper=True, whole=True)
    assert ours == theirs


def test_sentence_fragmenter_matches_reference(whoosh_ref):
    from whoosh.analysis import StandardAnalyzer
    from whoosh.highlight import SentenceFragmenter as RSF, UppercaseFormatter as RUF, highlight

    from whoosh_novo_spark.functions.highlight import SentenceFragmenter

    texts = [
        "The fox ran. The dog slept! Was the fox quick? Indeed it was... very quick.",
        "Render this. Shade that! And texture everything? Sure.",
        "no punctuation here just words fox dog",
    ]
    for text in texts:
        terms = {"fox", "render", "dog"}
        ours = highlights(
            text, terms, fragmenter=SentenceFragmenter(), formatter=UppercaseFormatter()
        )
        theirs = highlight(
            text, frozenset(terms), StandardAnalyzer(), RSF(), RUF()
        )
        assert ours == theirs, text


def test_highlight_hits_spark(spark, tmp_path):
    from whoosh_novo_spark.functions.highlight import highlight_hits
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.corpus import corpus_pandas
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    pdf = corpus_pandas(80, seed=131, vocab_size=80)
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    store = SegmentStore(str(tmp_path))
    df = spark.createDataFrame(list(zip(pdf["url"], pdf["text"])), "url string, text string")
    build_segment(spark, df, cfg, store, partitions=2)
    ix = Index(spark, store, cfg)
    s = Searcher(ix)
    res = s.search(ast.Term("text", "render"), limit=5)
    out = highlight_hits(
        s, res, ix.docmap(columns=["docid", "text"]), {"render"}
    ).collect()
    assert len(out) == 5
    for r in out:
        assert "<b" in r["highlight"] and "render" in r["highlight"].lower()


# --- Characters payload: pinpoint (non-retokenizing) highlighting ---------

def test_pinpoint_highlights_match_reference(spark, tmp_path, whoosh_ref):
    """Byte-identical excerpts with offsets read from the INDEX (the
    Characters payload), never re-tokenizing the stored text — parity with
    whoosh's Highlighter chars path (highlight.py:1068-1097) using
    PinpointFragmenter and WholeFragmenter."""
    from whoosh import fields as wfields
    from whoosh import query as wquery
    from whoosh.filedb.filestore import RamStorage
    from whoosh.highlight import Highlighter
    from whoosh.highlight import HtmlFormatter as RHF
    from whoosh.highlight import PinpointFragmenter as RPF
    from whoosh.highlight import WholeFragmenter as RWF

    from whoosh_novo_spark.functions.highlight import (
        HtmlFormatter,
        PinpointFragmenter,
        WholeFragmenter,
        index_highlights,
    )
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    rows = [(f"{i:04d}", t) for i, t in enumerate(TEXTS * 3) if t]

    cfg = IndexConfig(
        id_col="rid", fields=(FieldConfig("text", positions=True, chars=True),)
    )
    store = SegmentStore(str(tmp_path / "chars_ix"))
    df = spark.createDataFrame(rows, "rid string, text string")
    build_segment(spark, df, cfg, store, partitions=2)
    s = Searcher(Index(spark, store, cfg))

    schema = wfields.Schema(
        rid=wfields.ID(stored=True), text=wfields.TEXT(stored=True, chars=True)
    )
    wix = RamStorage().create_index(schema)
    w = wix.writer()
    for rid, t in rows:
        w.add_document(rid=rid, text=t)
    w.commit()

    for terms, frag_pair in [
        ({"fox", "dog"}, (PinpointFragmenter(), RPF())),
        ({"render", "shade"}, (PinpointFragmenter(surround=12), RPF(surround=12))),
        ({"quick"}, (PinpointFragmenter(autotrim=True), RPF(autotrim=True))),
        ({"alpha", "papa"}, (WholeFragmenter(), RWF())),
    ]:
        ours_frag, ref_frag = frag_pair
        q = ast.Or(tuple(ast.Term("text", t) for t in sorted(terms)))
        hits = s.search(q, limit=5).collect()
        stored = dict(rows)
        docmap = {
            r["docid"]: r["rid"]
            for r in s.index.docmap(columns=["docid", "rid"]).collect()
        }
        with wix.searcher() as ws:
            wq = wquery.Or([wquery.Term("text", t) for t in sorted(terms)])
            res = ws.search(wq, limit=5, terms=True)
            hl = Highlighter(fragmenter=ref_frag, formatter=RHF(tagname="b"))
            theirs = {hit["rid"]: hl.highlight_hit(hit, "text") for hit in res}
        assert theirs, terms
        for r in hits:
            rid = docmap[r["docid"]]
            got = index_highlights(
                s,
                r["docid"],
                "text",
                terms,
                stored[rid],
                fragmenter=ours_frag,
                formatter=HtmlFormatter(tagname="b"),
            )
            assert got == theirs[rid], (terms, rid, got, theirs[rid])


def test_chars_payload_positions_consistent(spark, tmp_path):
    """The stored (pos, start, end) agree with the positions array and
    with re-running the analyzer over the text."""
    import re as _re

    from pyspark.sql import functions as F

    from whoosh_novo_spark.functions.analysis import TOKEN_PATTERN
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    text = "The Quick brown fox, the quick FOX! a ox"
    cfg = IndexConfig(
        id_col="rid", fields=(FieldConfig("text", positions=True, chars=True),)
    )
    store = SegmentStore(str(tmp_path / "chars_one"))
    build_segment(
        spark,
        spark.createDataFrame([("a", text)], "rid string, text string"),
        cfg,
        store,
        partitions=1,
    )
    ix = Index(spark, store, cfg)
    rows = ix.postings().select("term", "positions", "chars").collect()
    for r in rows:
        assert r["chars"] is not None
        assert [c["pos"] for c in r["chars"]] == sorted(r["positions"])
        for c in r["chars"]:
            # the span points at the original token (case preserved)
            assert text[c["start"] : c["end"]].lower() == r["term"]
