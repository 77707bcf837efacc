"""The whole engine in one pass — a miniature web-search build exactly
as the 100 TB pipeline would run it:

    WARC archive -> parse responses -> extract text + lang
    -> keep latest capture per canonical URL
    -> extract links / host graph / PageRank / inbound anchors
    -> clean (PII)
    -> index (text + anchor_text fields)
    -> BM25 query -> host-PageRank prior re-rank

Every stage is covered unit-wise elsewhere; this test pins the
COMPOSITION: schemas line up, the anchor field indexes, the prior
re-ranks, and the winner is the page the synthetic web "endorses".
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warc_path(tmp_path_factory):
    from whoosh_novo_spark.sources.warc import write_warc_file

    d = tmp_path_factory.mktemp("warc")

    def page(body: str, links: list[tuple[str, str]] = ()) -> bytes:
        a = "".join(f'<a href="{u}">{t}</a>' for u, t in links)
        return f"<html><body><p>{body}</p>{a}</body></html>".encode()

    hub = [(f"http://press{i}.example/", "news site") for i in range(3)]
    recs = [
        # an OLD capture of the target page, superseded below
        (
            "http://solar.example/panels?utm_source=feed",
            dt.datetime(2026, 1, 1),
            page("outdated solar panel specs"),
        ),
        (
            "http://solar.example/panels",
            dt.datetime(2026, 3, 1),
            page(
                "solar panel efficiency report with installation data. "
                "Contact sales@solar.example for quotes."
            ),
        ),
        (
            "http://blog.example/panels",
            dt.datetime(2026, 2, 1),
            page("my solar panel efficiency notes and panel musings"),
        ),
        # three press hosts all endorse solar.example with anchor text
        *[
            (
                f"http://press{i}.example/story{i}",
                dt.datetime(2026, 2, 10),
                page(
                    f"industry coverage piece number {i}",
                    [("http://solar.example/panels", "efficiency benchmark")],
                ),
            )
            for i in range(3)
        ],
        # one lone page links to blog.example
        (
            "http://forum.example/t1",
            dt.datetime(2026, 2, 11),
            page("forum chatter", [("http://blog.example/panels", "some notes")]),
        ),
    ]
    p = str(d / "crawl.warc.gz")
    write_warc_file(p, recs, compress=True)
    return p


def test_warc_to_boosted_search(spark, warc_path, tmp_path):
    from whoosh_novo_spark.functions.urls import url_host
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.dedup import keep_latest_crawl
    from whoosh_novo_spark.operators.fusion import static_prior_boost
    from whoosh_novo_spark.operators.linkgraph import (
        extract_links,
        host_graph,
        inlink_anchor_text,
        pagerank,
    )
    from whoosh_novo_spark.operators.pipeline import clean_corpus
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore
    from whoosh_novo_spark.sources.warc import read_warc, warc_to_corpus

    # ingest: WARC -> (url, warc_ts, html, text, lang), newest capture wins
    corpus = warc_to_corpus(read_warc(spark, warc_path))
    assert corpus.columns == ["url", "warc_ts", "html", "text", "lang"]
    docs = keep_latest_crawl(corpus)
    assert docs.count() == 6  # 7 records, solar.example recrawl collapsed
    newest = docs.where(F.col("url").contains("solar")).collect()[0]
    assert "outdated" not in newest["text"]

    # link graph BEFORE cleaning (links live in html, not text)
    links = extract_links(docs)
    anchors = inlink_anchor_text(links)
    pr = pagerank(host_graph(links), src="src_host", dst="dst_host",
                  weight="weight", max_iter=15)

    # clean the text side (PII scrub must not disturb ranking tokens)
    cleaned = clean_corpus(docs, id_col="url", stages=("pii",))
    assert cleaned.where(F.col("url").contains("solar")).collect()[0][
        "text"
    ].count("sales@solar.example") == 0

    # index text + inbound anchor text
    enriched = cleaned.join(anchors, "url", "left").withColumn(
        "anchor_text", F.coalesce("anchor_text", F.lit(""))
    )
    store = SegmentStore(str(tmp_path / "ix"))
    cfg = IndexConfig(
        id_col="url", fields=(FieldConfig("text"), FieldConfig("anchor_text"))
    )
    build_segment(spark, enriched.select("url", "text", "anchor_text"), cfg, store)
    s = Searcher(Index(spark, store, cfg))

    # lexical-only: blog.example outranks solar.example on "panel"
    # (higher tf density in the shorter doc) — exactly the case link
    # evidence exists to correct
    q = ast.Or((ast.Term("text", "panel"), ast.Term("anchor_text", "efficiency")))
    hits = s.search(q, limit=5)
    with_host = hits.join(s.index.docmap(["docid", "url"]), "docid").select(
        url_host("url").alias("host"), "score"
    )
    boosted = static_prior_boost(with_host, pr, w=2.0).collect()
    assert boosted[0]["id"] == "solar.example"

    # the anchor field alone retrieves the endorsed page for a word its
    # own text never says ("benchmark")
    a_hits = s.search(ast.Term("anchor_text", "benchmark"), limit=3)
    urls = [
        r["url"]
        for r in a_hits.join(s.index.docmap(["docid", "url"]), "docid").collect()
    ]
    assert urls == ["http://solar.example/panels"]
