"""Recrawl dedup: keep the latest capture per canonical URL.

The first pass of every multi-snapshot web pipeline (reference has no
counterpart — its index assumes one row per document; this is the
ingest stage that MAKES that true for a Common-Crawl-style corpus).
"""

from __future__ import annotations

import datetime as dt

import pytest

from whoosh_novo_spark.operators.dedup import keep_latest_crawl


def _ts(day: int, hour: int = 0):
    return dt.datetime(2026, 1, day, hour, 0, 0)


@pytest.fixture(scope="module")
def crawl(spark):
    rows = [
        # three snapshots of the same page; newest wins
        ("http://example.com/a", _ts(1), b"h1", "old a", "en"),
        ("http://example.com/a", _ts(2), b"h2", "mid a", "en"),
        ("http://example.com/a", _ts(3), b"h3", "new a", "en"),
        # tracking-param recrawl variants collapse under canonicalization
        ("http://example.com/b?utm_source=feed", _ts(1), b"h4", "old b", "en"),
        ("http://EXAMPLE.com/b", _ts(5), b"h5", "new b", "en"),
        # distinct pages survive independently
        ("http://example.com/c?q=1", _ts(2), b"h6", "only c", "de"),
        # exact (url, ts) tie — deterministic winner
        ("http://example.com/d", _ts(4), b"h7", "tie d x", "en"),
        ("http://example.com/d", _ts(4), b"h8", "tie d y", "en"),
        # null timestamp loses to a real one
        ("http://example.com/e", None, b"h9", "null e", "en"),
        ("http://example.com/e", _ts(1), b"ha", "dated e", "en"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_keeps_latest_per_canonical_url(crawl):
    out = keep_latest_crawl(crawl)
    by_text = {r.text for r in out.collect()}
    assert "new a" in by_text and "old a" not in by_text and "mid a" not in by_text
    assert "new b" in by_text and "old b" not in by_text
    assert "only c" in by_text
    assert "dated e" in by_text and "null e" not in by_text
    # exactly one survivor per canonical url: a, b, c, d, e
    assert out.count() == 5


def test_schema_and_original_url_preserved(crawl):
    out = keep_latest_crawl(crawl)
    assert out.columns == crawl.columns
    assert dict(out.dtypes) == dict(crawl.dtypes)
    # the survivor keeps its ORIGINAL url text (not the canonical form)
    b = [r for r in out.collect() if r.text == "new b"]
    assert b[0].url == "http://EXAMPLE.com/b"


def test_tie_break_deterministic_and_partition_invariant(crawl):
    outs = []
    for nparts in (1, 3, 7):
        out = keep_latest_crawl(crawl.repartition(nparts))
        outs.append(sorted((r.url, r.text) for r in out.collect()))
    assert outs[0] == outs[1] == outs[2]
    # the (url, ts) tie resolved to exactly one of the two rows
    d = [t for _, t in outs[0] if t.startswith("tie d")]
    assert len(d) == 1


def test_no_canonicalize_keeps_url_variants(crawl):
    out = keep_latest_crawl(crawl, canonicalize=False)
    # utm variant and case variant are now distinct keys
    texts = {r.text for r in out.collect()}
    assert "old b" in texts and "new b" in texts


def test_explicit_tie_col(spark):
    rows = [
        ("http://x.com/p", _ts(1), "v1", 3),
        ("http://x.com/p", _ts(1), "v2", 7),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string, pri int")
    out = keep_latest_crawl(df, tie_col="pri").collect()
    assert len(out) == 1 and out[0].text == "v2"


def test_plan_is_mapside_combinable_no_window(crawl):
    plan = keep_latest_crawl(crawl)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan
    assert "Window" not in plan, plan


def test_pipeline_stage_composes(crawl):
    from whoosh_novo_spark.operators.pipeline import clean_corpus

    out = clean_corpus(
        crawl.withColumn("doc_id", crawl.url),
        id_col="doc_id",
        stages=("url_normalize", "latest_crawl"),
    )
    assert out.count() == 5


# ---------------- streaming twin ----------------

B1 = [
    ("http://s.com/a?utm_source=x", "2026-01-01 00:00:00", "a v1"),
    ("http://s.com/a", "2026-01-02 00:00:00", "a v2"),  # same-batch newer
    ("http://s.com/b", "2026-01-05 00:00:00", "b v1"),
]
B2 = [
    ("http://S.com/a", "2026-01-09 00:00:00", "a v3"),  # newer -> emits
    ("http://s.com/b", "2026-01-03 00:00:00", "b stale"),  # late stale -> suppressed
    ("http://s.com/b", "2026-01-05 00:00:00", "b v1"),  # exact redelivery -> suppressed
    ("http://s.com/c", "2026-01-01 00:00:00", "c v1"),
]
_SCHEMA = "url string, warc_ts timestamp, text string"


def _run_stream(spark, tmp_path, name, batches):
    from whoosh_novo_spark.streaming.dedup import latest_crawl_stream

    src = str(tmp_path / f"src_{name}")
    for rows in batches:
        spark.createDataFrame(
            [(u, dt.datetime.fromisoformat(t), x) for u, t, x in rows], _SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        latest_crawl_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_emits_only_strictly_newer(spark, tmp_path):
    got = _run_stream(spark, tmp_path, "latest_crawl_s1", [B1, B2])
    texts = sorted(r.text for r in got)
    # batch 1: a v2 (beats same-batch v1), b v1; batch 2: a v3, c v1;
    # stale + redelivered b rows suppressed
    assert texts == ["a v2", "a v3", "b v1", "c v1"]


def test_stream_final_state_matches_batch_operator(spark, tmp_path):
    from whoosh_novo_spark.operators.dedup import keep_latest_crawl

    got = _run_stream(spark, tmp_path, "latest_crawl_s2", [B1, B2])
    # last emission per canonical url == batch keep-latest over all rows
    final = {}
    for r in sorted(got, key=lambda r: r.warc_ts):
        final[r.url.lower().split("?")[0]] = (r.warc_ts, r.text)
    allrows = spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(t), x) for u, t, x in B1 + B2], _SCHEMA
    )
    batch = {
        r.url.lower().split("?")[0]: (r.warc_ts, r.text)
        for r in keep_latest_crawl(allrows).collect()
    }
    assert final == batch
