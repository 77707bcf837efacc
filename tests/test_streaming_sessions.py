"""Streaming stateful sessionization (applyInPandasWithState): closed
sessions from a file-source stream match the batch sessionize operator's
closed prefix (every session except each user's open tail)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path, rows, n, schema="user_id string, ts timestamp, value double"):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture(scope="module")
def event_rows():
    base = dt.datetime(2023, 5, 1, 8, 0, 0)
    rows = []
    # user A: two sessions split by a 2h gap, then an open tail session
    for m in (0, 5, 12):
        rows.append(("A", base + dt.timedelta(minutes=m), 1.0))
    for m in (150, 160):
        rows.append(("A", base + dt.timedelta(minutes=m), 2.0))
    rows.append(("A", base + dt.timedelta(minutes=400), 3.0))
    # user B: one closed session + open tail
    for m in (0, 20):
        rows.append(("B", base + dt.timedelta(minutes=m), 5.0))
    rows.append(("B", base + dt.timedelta(minutes=300), 7.0))
    return rows


def test_stream_sessions_match_batch_closed_prefix(spark, tmp_path, event_rows):
    from whoosh_novo_spark.operators.events import sessionize
    from whoosh_novo_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "events_src")
    # two micro-batches (split mid-session to exercise cross-batch state)
    _write_batch(spark, src, event_rows[:4], 1)
    _write_batch(spark, src, event_rows[4:], 2)

    schema = "user_id string, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["start_ep"], r["end_ep"], r["n_events"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }

    batch_df = spark.createDataFrame(event_rows, schema)
    sess = sessionize(batch_df, gap_seconds=1800).collect()
    # closed prefix = all batch sessions except each user's last
    last_per_user = {}
    for r in sess:
        k = r["user_id"]
        if k not in last_per_user or r["session_no"] > last_per_user[k]:
            last_per_user[k] = r["session_no"]
    want = set()
    vals = {}
    for u, ts, v in event_rows:
        vals.setdefault(u, []).append((int(ts.timestamp()), v))
    for r in sess:
        if r["session_no"] == last_per_user[r["user_id"]]:
            continue
        total = sum(
            v for ep, v in vals[r["user_id"]] if r["start_ep"] <= ep <= r["end_ep"]
        )
        want.add(
            (r["user_id"], r["start_ep"], r["end_ep"], r["n_events"], round(total, 6))
        )
    assert got == want and len(want) == 3


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    """Watermarked tumbling windows over a file stream == the batch
    tumbling_counts operator on the same rows (complete set via two
    triggers + final watermark flush)."""
    from whoosh_novo_spark.operators.events import tumbling_counts
    from whoosh_novo_spark.streaming.sessions import windowed_counts_stream

    base = dt.datetime(2023, 5, 1, 8, 0, 0)
    rows = []
    for i in range(40):
        rows.append(
            (f"u{i % 3}", base + dt.timedelta(minutes=7 * i), "click" if i % 2 else "view", float(i))
        )
    src = str(tmp_path / "wsrc")
    schema = "user_id string, ts timestamp, event_type string, value double"
    _write_batch(spark, src, rows[:25], 1, schema)
    _write_batch(spark, src, rows[25:], 2, schema)

    stream = spark.readStream.schema(schema).parquet(src)
    out = windowed_counts_stream(stream, window_seconds=3600, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch_df = spark.createDataFrame(rows, schema)
    want = {
        (r["bucket"], r["event_type"]): (r["n"], r["total"])
        for r in tumbling_counts(batch_df, gap_seconds=3600).collect()
    }
    assert got == want and len(want) > 4
