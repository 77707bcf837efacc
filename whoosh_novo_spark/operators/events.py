"""Event-stream analytics over the events table — the window/sessionization
operators a training-data/telemetry pipeline needs (all pure Spark SQL,
DuckDB-oracle-gated in the driver contract).

- tumbling-window aggregates (time-bucketed counts/sums)
- gap-based sessionization (classic lag() + cumulative-sum session ids)
- per-user activity stats with top-k
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """(bucket epoch secs, event_type) -> count, sum(value)."""
    bucket = (F.floor(F.unix_timestamp("ts") / gap_seconds) * gap_seconds).cast("long")
    return (
        events.groupBy(bucket.alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy("bucket", "event_type")
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when the
    time since the user's previous event exceeds ``gap_seconds``.
    Returns one row per session: (user_id, session_no, n_events,
    start/end epoch, duration)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    ep = F.unix_timestamp("ts")
    with_gap = events.withColumn("_prev", F.lag(ep).over(w)).withColumn(
        "_new", (F.col("_prev").isNull() | ((ep - F.col("_prev")) > gap_seconds)).cast("int")
    )
    with_sid = with_gap.withColumn(
        "session_no", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ep).alias("start_ep"),
            F.max(ep).alias("end_ep"),
        )
        .withColumn("duration", (F.col("end_ep") - F.col("start_ep")).cast("long"))
        .orderBy("user_id", "session_no")
    )


def session_stats(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Per-user session summary: session count, mean events/session."""
    s = sessionize(events, gap_seconds)
    return (
        s.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.max("duration").alias("max_duration"),
        )
        .orderBy("user_id")
    )


def top_users_by_value(events: DataFrame, k: int = 20) -> DataFrame:
    return (
        events.groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_value"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(k)
    )
