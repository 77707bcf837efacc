"""WARC source: read Common-Crawl-style web archives (ISO 28500) into
the canonical corpus table ``(url, warc_ts, html, text, lang)``.

Common Crawl publishes its snapshots as WARC files — sequences of
records, each a ``WARC/1.x`` header block (CRLF-separated, blank-line
terminated, with an exact ``Content-Length``) followed by the payload.
``response`` records carry the full HTTP response; the page bytes sit
after the HTTP header block.  This module parses that format with a
pure-bytes function shared by the Spark kernel and the test
round-trips, plus a minimal writer so an index can be exported back to
the archive format.

Scale notes: files arrive through Spark's ``binaryFile`` source — one
file = one input row = one parse task, which matches how Common Crawl
shards its corpus (tens of thousands of ~1 GB members per snapshot), so
parallelism is the file count, no shuffle anywhere.  Each file must fit
in executor memory (a binaryFile invariant); the gzip path streams
member-by-member but materializes the decompressed bytes, so size
executors for the ~5x inflation of a compressed WARC.  The kernel is
``mapInPandas`` — Arrow-batched on the way out, and the per-file loop
is parse work no SQL expression can express.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"


def _split_headers(block: bytes) -> dict[str, str]:
    """WARC named fields, lower-cased keys; continuation lines folded."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(b"\n"):
        line = raw.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("ascii", "replace").lower()
        headers[last] = value.strip().decode("utf-8", "replace")
    return headers


def _parse_warc_date(value: str) -> dt.datetime | None:
    """``WARC-Date`` is ISO 8601 UTC (``2026-01-01T00:00:00Z``); returned
    as a naive UTC datetime (Spark TimestampType convention here)."""
    try:
        parsed = dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if parsed.tzinfo is not None:
        parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return parsed


def _dechunk(body: bytes) -> bytes:
    """Reassemble a ``Transfer-Encoding: chunked`` HTTP body (hex size
    line, CRLF, chunk, CRLF, ... 0-size terminator).  Raises on any
    malformed framing — the caller falls back to the raw bytes."""
    out, pos = [], 0
    while True:
        nl = body.index(b"\r\n", pos)
        size = int(body[pos:nl].split(b";")[0], 16)
        if size == 0:
            return b"".join(out)
        start = nl + 2
        chunk = body[start : start + size]
        if len(chunk) != size:
            raise ValueError("truncated chunk")
        out.append(chunk)
        pos = start + size + 2


def _http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload: bytes after the header block,
    with the two wire encodings real crawls store verbatim undone —
    ``Transfer-Encoding: chunked`` reassembled and ``Content-Encoding:
    gzip/deflate`` decompressed (Common Crawl keeps the raw HTTP bytes,
    so both appear).  Conservative: any decode failure returns the
    bytes as captured rather than dropping the record.  A payload that
    does not look like HTTP is returned whole."""
    if not payload.startswith(b"HTTP/"):
        return payload
    head, body = b"", b""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if idx != -1:
            head, body = payload[:idx], payload[idx + len(sep):]
            break
    else:
        return b""
    h = _split_headers(head)  # status line has no ':' and is skipped
    if "chunked" in h.get("transfer-encoding", "").lower():
        try:
            body = _dechunk(body)
        except (ValueError, IndexError):
            pass
    enc = h.get("content-encoding", "").lower()
    if "gzip" in enc:
        import zlib

        try:
            body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
        except (OSError, EOFError, zlib.error):
            # a TRUNCATED gzip body raises EOFError and corrupt deflate
            # data inside the stream raises zlib.error — neither
            # subclasses OSError, and both are routine in real crawls
            # (WARC-Truncated); honor the 'return bytes as captured'
            # contract instead of failing the whole ingest task
            pass
    elif "deflate" in enc:
        import zlib

        for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
            try:
                body = zlib.decompress(body, wbits)
                break
            except zlib.error:
                continue
    return body


def parse_warc_bytes(
    data: bytes,
    record_types: tuple[str, ...] = ("response",),
) -> Iterator[tuple[str, dt.datetime | None, bytes]]:
    """Yields ``(url, warc_ts, html_bytes)`` for each wanted record of
    one WARC file (gzip members decompressed transparently).  Records
    without a target URI, and types outside ``record_types``
    (request / metadata / warcinfo ...), are skipped.  ``resource``
    records, when requested, yield their payload as-is; ``response``
    records yield the HTTP body."""
    if data[:2] == _GZIP_MAGIC:
        # multi-member gzip (Common Crawl: one member per record) —
        # GzipFile consumes all members
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start == -1:
            break
        hdr_end, sep_len = -1, 4
        for sep in (b"\r\n\r\n", b"\n\n"):
            idx = data.find(sep, start)
            if idx != -1 and (hdr_end == -1 or idx < hdr_end):
                hdr_end, sep_len = idx, len(sep)
        if hdr_end == -1:
            break
        headers = _split_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # unrecoverable: cannot locate the next record
        body_start = hdr_end + sep_len
        payload = data[body_start : body_start + length]
        pos = body_start + length
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        if rtype in record_types and url:
            ts = _parse_warc_date(headers.get("warc-date", ""))
            html = _http_body(payload) if rtype == "response" else payload
            yield (url, ts, html)


WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """DataFrame of ``(url, warc_ts, html)`` from every WARC file under
    ``path`` (glob ok; ``.warc`` and ``.warc.gz`` both fine).  Compose
    with ``sources/extract.ingest_html`` and
    ``functions/textstats.lang_id`` (or just ``warc_to_corpus``) for
    the full canonical table."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(it):
        for pdf in it:
            rows = [
                rec
                for data in pdf["content"]
                for rec in parse_warc_bytes(bytes(data), record_types)
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.mapInPandas(gen, WARC_SCHEMA)


def warc_to_corpus(
    df: DataFrame, full_entities: bool = False, charset: str = "UTF-8"
) -> DataFrame:
    """``read_warc`` output -> the canonical corpus shape
    ``(url, warc_ts, html, text, lang)``: text via the HTML extraction
    pipeline (JVM expr path by default), lang via the function-word
    profile classifier.  Everything downstream (clean_corpus,
    keep_latest_crawl, build_segment) takes this table."""
    from whoosh_novo_spark.functions.textstats import lang_id
    from whoosh_novo_spark.sources.extract import ingest_html

    out = ingest_html(df, full_entities=full_entities, charset=charset)
    return out.withColumn("lang", lang_id("text"))


def write_warc_file(
    path: str,
    records: Iterable[tuple[str, dt.datetime, bytes]],
    compress: bool = False,
) -> None:
    """Minimal WARC writer (one ``response`` record per input, wrapped
    in an HTTP/1.1 200 header) — the export half of the round-trip, and
    what the tests synthesize fixtures with.  ``compress=True`` writes
    one gzip member per record, the Common Crawl convention that keeps
    members independently seekable."""
    chunks: list[bytes] = []
    for url, ts, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        record = header + http + b"\r\n\r\n"
        chunks.append(gzip.compress(record) if compress else record)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
