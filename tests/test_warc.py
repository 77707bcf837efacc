"""WARC source: ISO 28500 parse/write round-trips and the full ingest
chain WARC file -> canonical corpus table -> index -> query."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest

from whoosh_novo_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_to_corpus,
    write_warc_file,
)

TS = dt.datetime(2026, 3, 1, 12, 0, 0)
PAGES = [
    ("http://a.example.com/page", TS, b"<html><body><p>the render engine shades the scene</p></body></html>"),
    ("http://b.example.com/", dt.datetime(2026, 3, 2, 0, 0, 0), b"<html><b>und der schnelle braune fuchs springt</b></html>"),
    ("http://c.example.com/x?q=1", dt.datetime(2026, 3, 3, 6, 30, 0), b"plain bytes no markup"),
]


@pytest.mark.parametrize("compress", [False, True])
def test_round_trip(spark, tmp_path, compress):
    ext = "warc.gz" if compress else "warc"
    p = str(tmp_path / f"rt.{ext}")
    write_warc_file(p, PAGES, compress=compress)
    got = sorted(read_warc(spark, p).collect(), key=lambda r: r.url)
    assert [(r.url, r.warc_ts, bytes(r.html)) for r in got] == sorted(PAGES)


def test_non_response_records_skipped(tmp_path):
    # hand-built file: warcinfo + request + response; only the response
    # record may surface, with the HTTP header stripped
    body = b"<html>kept</html>"
    http = b"HTTP/1.1 200 OK\r\n\r\n" + body
    raw = b"".join(
        [
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\nsoftware\n\r\n\r\n",
            b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://x.com/\r\n"
            b"Content-Length: 18\r\n\r\nGET / HTTP/1.1\r\n\r\n\r\n\r\n",
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x.com/\r\n"
            b"WARC-Date: 2026-03-01T00:00:00Z\r\n"
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http
            + b"\r\n\r\n",
        ]
    )
    recs = list(parse_warc_bytes(raw))
    assert recs == [("http://x.com/", dt.datetime(2026, 3, 1), body)]


def test_resource_records_and_missing_date():
    payload = b"raw resource bytes"
    raw = (
        b"WARC/1.0\nWARC-Type: resource\nWARC-Target-URI: http://r.com/f\n"
        + f"Content-Length: {len(payload)}\n\n".encode()
        + payload
    )
    # default record_types: resource skipped
    assert list(parse_warc_bytes(raw)) == []
    recs = list(parse_warc_bytes(raw, record_types=("resource",)))
    # payload NOT treated as HTTP; absent WARC-Date -> None
    assert recs == [("http://r.com/f", None, payload)]


def test_multimember_gzip_is_commoncrawl_shape(tmp_path):
    p = str(tmp_path / "mm.warc.gz")
    write_warc_file(p, PAGES, compress=True)
    data = open(p, "rb").read()
    # one gzip member per record: a second magic appears after the first member
    assert data[:2] == b"\x1f\x8b" and data.count(b"\x1f\x8b\x08") >= len(PAGES)
    assert len(list(parse_warc_bytes(data))) == len(PAGES)


def test_warc_to_corpus_shape_and_lang(spark, tmp_path):
    p = str(tmp_path / "corpus.warc")
    write_warc_file(p, PAGES, compress=False)
    corpus = warc_to_corpus(read_warc(spark, p))
    assert corpus.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r.url: r for r in corpus.collect()}
    assert rows["http://a.example.com/page"].text == "the render engine shades the scene"
    assert rows["http://a.example.com/page"].lang == "en"
    assert rows["http://b.example.com/"].lang == "de"


def test_full_chain_warc_to_query(spark, tmp_path):
    """WARC file -> corpus -> keep-latest -> build -> BM25 query."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.dedup import keep_latest_crawl
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    recrawl = PAGES + [
        ("http://a.example.com/page", dt.datetime(2026, 4, 1), b"<html>newer capture mentions gardens</html>")
    ]
    p = str(tmp_path / "chain.warc.gz")
    write_warc_file(p, recrawl, compress=True)
    corpus = keep_latest_crawl(warc_to_corpus(read_warc(spark, p)))
    assert corpus.count() == 3  # the stale capture of /page dropped

    store = SegmentStore(str(tmp_path / "ix"))
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    build_segment(spark, corpus, cfg, store, partitions=4)
    s = Searcher(Index(spark, store, cfg))
    hits = s.search(ast.Term("text", "gardens"), limit=5).collect()
    assert len(hits) == 1
    old = s.search(ast.Term("text", "render"), limit=5).collect()
    assert old == []  # only the NEWEST capture of /page was indexed


def _record(url: str, http: bytes) -> bytes:
    header = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return header + http + b"\r\n\r\n"


def test_http_body_chunked_and_gzip():
    import gzip as _gz

    from whoosh_novo_spark.sources.warc import parse_warc_bytes

    html = b"<html><body>chunked gzip page body</body></html>"

    def chunks(b: bytes, size: int) -> bytes:
        out = b""
        for i in range(0, len(b), size):
            c = b[i : i + size]
            out += f"{len(c):x}\r\n".encode() + c + b"\r\n"
        return out + b"0\r\n\r\n"

    # chunked identity
    http1 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunks(html, 7)
    )
    # gzip content-encoding
    gz = _gz.compress(html)
    http2 = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        + f"Content-Length: {len(gz)}\r\n\r\n".encode() + gz
    )
    # chunked + gzip together (decode order: dechunk, then gunzip)
    http3 = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + chunks(gz, 11)
    )
    # malformed chunk framing -> raw bytes kept, record not dropped
    http4 = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"zz\r\nnot-a-chunk"
    )
    data = (
        _record("http://c1.example/", http1)
        + _record("http://c2.example/", http2)
        + _record("http://c3.example/", http3)
        + _record("http://c4.example/", http4)
    )
    got = {u: b for u, _, b in parse_warc_bytes(data)}
    assert got["http://c1.example/"] == html
    assert got["http://c2.example/"] == html
    assert got["http://c3.example/"] == html
    assert got["http://c4.example/"] == b"zz\r\nnot-a-chunk"


def test_http_body_truncated_gzip_keeps_raw_bytes():
    """A truncated gzip body raises EOFError (not OSError) and corrupt
    deflate data inside the stream raises zlib.error — both routine in
    real crawls (WARC-Truncated); the documented contract is 'any decode
    failure returns the bytes as captured', not a failed ingest task."""
    import gzip as _gz

    from whoosh_novo_spark.sources.warc import parse_warc_bytes

    html = b"<html><body>will be truncated mid-stream</body></html>"
    gz = _gz.compress(html)
    trunc = gz[: len(gz) // 2]  # valid header, truncated stream -> EOFError
    corrupt = gz[:12] + bytes(b ^ 0xFF for b in gz[12:])  # zlib.error
    http_t = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + trunc
    )
    http_c = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + corrupt
    )
    data = _record("http://t.example/", http_t) + _record(
        "http://c.example/", http_c
    )
    got = {u: b for u, _, b in parse_warc_bytes(data)}
    assert got["http://t.example/"] == trunc
    assert got["http://c.example/"] == corrupt
