"""The spark-submit deployment script end to end as a subprocess —
the path users actually run.  One fresh-JVM invocation covers the full
flag surface: WARC ingest, recrawl dedup, anchor field, PageRank-prior
docmap column, and a smoke query.  This exists because the script
builds its own SparkSession (not tests' tuned one), so session-sizing
regressions — like the 200-shuffle-partitions x 1g-heap OOM this gate
was added after — only surface here."""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_full_flag_surface(tmp_path):
    from whoosh_novo_spark.sources.warc import write_warc_file

    page = (
        b'<html><body>solar panel efficiency report '
        b'<a href="http://b.example/q">benchmark data</a></body></html>'
    )
    recs = [
        ("http://a.example/p?utm_source=x", dt.datetime(2026, 1, 1),
         b"<html><body>old capture</body></html>"),
        ("http://a.example/p", dt.datetime(2026, 2, 1), page),
        ("http://b.example/q", dt.datetime(2026, 1, 15),
         b"<html><body>plain words here</body></html>"),
    ]
    warc = tmp_path / "crawl.warc.gz"
    write_warc_file(str(warc), recs, compress=True)

    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "build_index.py"),
            "--from-warc", "--keep-latest", "--canonical", "--anchors",
            "--pagerank-prior", "--title", "--lang-routed", "--report",
            "--input", str(warc),
            "--index", str(tmp_path / "ix"),
            "--query", "solar", "--k", "3",
        ],
        env=env, capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    report, res = json.loads(lines[0]), json.loads(lines[-1])
    # the data card describes the corpus actually indexed (after the
    # recrawl dedup collapsed the re-captured URL)
    assert report["n_docs"] == 2
    # 3 records -> 2 docs (recrawl collapsed); the lang-routed query
    # expands over text@<lang> variants and finds the page
    assert res["doc_count"] == 2
    assert res["query"]["terms"] == ["solar"]
    assert len(res["query"]["top"]) == 1
