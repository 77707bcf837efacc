"""Stateful streaming sessionization (custom stateful operator).

Batch sessionization lives in ``operators/events.sessionize`` (window
lag + cumulative session numbering).  Streams can't window over "all
events so far", so this is the canonical ``applyInPandasWithState``
shape: state = the per-user OPEN session (start/last/event count/value
sum); each micro-batch's events extend it, a gap > ``gap_seconds``
CLOSES the current session (emitted downstream) and opens a new one, and
an idle timeout closes sessions for users who stop sending events.

Semantics notes (documented, tested):
- events are processed in timestamp order WITHIN each (user, batch);
  late events older than the open session's last timestamp are clamped
  to it (streaming at scale pairs this with a watermark upstream).
- only CLOSED sessions are emitted; the open tail stays in state, so a
  terminated stream leaves at most one unemitted session per user —
  exactly the prefix property the batch operator's output satisfies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id string, start_ep long, end_ep long, n_events long, "
    "total_value double, closed_by string"
)
STATE_SCHEMA = "start_ep long, last_ep long, n_events long, total_value double"


def _session_fn(gap_seconds: int, timeout_ms: int):
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        user = key[0]
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, tv = state.get
                closed.append((user, s0, s1, n, tv, "timeout"))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for pdf in pdf_iter:
                pdf = pdf.sort_values("ep")
                for ep, val in zip(pdf["ep"], pdf["value"]):
                    ep = int(ep)
                    if cur is None:
                        cur = [ep, ep, 0, 0.0]
                    elif ep - cur[1] > gap_seconds:
                        closed.append((user, cur[0], cur[1], cur[2], cur[3], "gap"))
                        cur = [ep, ep, 0, 0.0]
                    cur[1] = max(cur[1], ep)
                    cur[2] += 1
                    cur[3] += float(val)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "start_ep", "end_ep", "n_events", "total_value", "closed_by",
            ],
        )

    return fn


def windowed_counts_stream(
    events: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    operators/events.tumbling_counts.  Late rows older than ``watermark``
    are dropped and finalized windows emit exactly once in append mode."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{window_seconds} seconds").alias("w"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("total"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("bucket"),
            key_col,
            "n",
            F.round("total", 4).alias("total"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming DataFrame of CLOSED sessions per user.

    ``events`` is a streaming DataFrame with (user, timestamp, value);
    downstream: ``.writeStream.outputMode("append")``."""
    prepped = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("ep"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
