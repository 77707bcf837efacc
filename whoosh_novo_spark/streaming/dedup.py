"""Stateful streaming exact-dedup — drop cross-batch duplicate documents.

The batch twin is ``operators/dedup.exact_duplicates`` (hash-groupBy); a
stream can't group over "all documents so far", so this is the
``applyInPandasWithState`` shape: key = the content fingerprint (the same
``functions.textstats.fingerprint`` expression as the batch operator, so
stream and batch agree on what counts as a duplicate), state = (id of the
first-seen doc, duplicates suppressed so far).

Semantics (tested against a pandas replay in tests/test_streaming_dedup.py):
- the FIRST document of each fingerprint passes through (within one
  micro-batch, the lowest id wins — deterministic under repartitioning);
  every later arrival of the same fingerprint is suppressed;
- suppressed arrivals increment a per-fingerprint counter kept in state;
- state is per-fingerprint and must persist for the stream's lifetime to
  guarantee exactness.  At 100 TB that is the classic state-size
  trade-off: bound it with ``ttl_ms`` (fingerprints idle longer than the
  TTL expire, so a very late duplicate of a cold document may pass) —
  exactly the watermark-for-state compromise every streaming dedup makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whoosh_novo_spark.functions.textstats import fingerprint

OUTPUT_SCHEMA = "doc_id string, fp string"
STATE_SCHEMA = "first_id string, n_dups long"


def _dedup_fn(ttl_ms: int | None):
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        fp = key[0]
        out = []
        if state.hasTimedOut:
            state.remove()
        else:
            seen = state.exists
            first_id, n_dups = state.get if seen else (None, 0)
            for pdf in pdf_iter:
                for doc_id in pdf["doc_id"].astype(str).sort_values():
                    if not seen:
                        out.append((doc_id, fp))
                        first_id, seen = doc_id, True
                    else:
                        n_dups += 1
            state.update((first_id, int(n_dups)))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["doc_id", "fp"])

    return fn


def dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of first-seen documents (doc_id, fp); duplicate
    content arriving later — in the same or any subsequent micro-batch —
    is suppressed.  Downstream: join back to the payload stream by id, or
    feed the ids straight into the streaming index ingest."""
    prepped = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        fingerprint(text_col).alias("fp"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("fp").applyInPandasWithState(
        _dedup_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


_TS_FLOOR = -(2**62)  # nulls sort below any real timestamp


def _latest_fn(out_cols: list[str], ttl_ms: int | None):
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=out_cols)
            return
        best_ts, best_tie = state.get if state.exists else (_TS_FLOOR, _TS_FLOOR)
        cand = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values(["_ts_us", "_tie"], kind="mergesort").iloc[-1]
            if cand is None or (top["_ts_us"], top["_tie"]) > (cand["_ts_us"], cand["_tie"]):
                cand = top
        if cand is not None and (int(cand["_ts_us"]), int(cand["_tie"])) > (best_ts, best_tie):
            state.update((int(cand["_ts_us"]), int(cand["_tie"])))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield cand[out_cols].to_frame().T
        else:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(columns=out_cols)

    return fn


def latest_crawl_stream(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canonicalize: bool = True,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of ``operators/dedup.keep_latest_crawl`` — the
    monotone-upsert form a continuous crawl needs: a capture passes
    through iff it is STRICTLY newer than every capture of the same
    canonical URL emitted so far (per (ts, full-row-hash tie), so exact
    redeliveries are idempotently suppressed too).  Late-arriving stale
    snapshots and same-batch older variants emit nothing; at most one
    row per URL per micro-batch (the batch's newest, if it beats state).

    The output is an UPSERT stream: downstream
    ``operators/build.update_documents`` keyed by the URL converges on
    exactly the batch operator's keep-latest result — a retraction-free
    contract, which is why "emit only strictly-newer" is the right
    semantics rather than "emit the per-batch max always".

    State per canonical URL is two longs (epoch-micros + tie hash);
    bound lifetime with ``ttl_ms`` (an idle URL expires; a very late
    stale capture of an expired URL would then pass — the standard
    state-TTL compromise, same as ``dedup_stream``)."""
    cols = list(docs.columns)
    from whoosh_novo_spark.functions.urls import url_normalize

    key_expr = url_normalize(F.col(url_col)) if canonicalize else F.col(url_col)
    prepped = (
        docs.withColumn("_url_key", key_expr)
        .withColumn(
            "_ts_us", F.coalesce(F.unix_micros(F.col(ts_col)), F.lit(_TS_FLOOR))
        )
        .withColumn("_tie", F.xxhash64(*[F.col(c) for c in cols]))
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("_url_key").applyInPandasWithState(
        _latest_fn(cols, ttl_ms),
        outputStructType=docs.schema,
        stateStructType="max_ts long, tie long",
        outputMode="append",
        timeoutConf=timeout,
    )
