"""Stateful streaming TEXT near-dup detection (MinHash + banded LSH).

Batch twin: ``operators/dedup.minhash_dedup_pairs``.  Documents are
shingled and MinHash-signed on arrival (same Arrow-batched shingler and
hash family as the batch operator); ``applyInPandasWithState`` keys by
(band, band-key) and keeps each bucket's (id, signature) history, so a
document whose estimated Jaccard against ANY earlier same-bucket
document clears ``tau`` is reported as a pair the moment it arrives —
same or later micro-batch.

Semantics mirror streaming/near_dup.py: append rows (a, b, est_jaccard,
band) with ``b`` after ``a``; a pair colliding in several bands emits
once per band (dropDuplicates(["a","b"]) downstream for set semantics);
state per bucket is FIFO-capped and optionally TTL-bounded.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whoosh_novo_spark.operators.dedup import minhash_signatures_rowwise

OUTPUT_SCHEMA = "a string, b string, est_jaccard double, band int"
STATE_SCHEMA = "ids array<string>, packed binary"


def _fn(tau: float, n_hashes: int, ttl_ms: int | None, max_per_bucket: int):
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        band = int(key[0])
        out = []
        if state.hasTimedOut:
            state.remove()
        else:
            if state.exists:
                ids, packed = state.get
                ids = list(ids)
                stored = np.frombuffer(packed, dtype=np.int64).reshape(
                    -1, n_hashes
                )
            else:
                ids, stored = [], np.empty((0, n_hashes), dtype=np.int64)
            for pdf in pdf_iter:
                pdf = pdf.sort_values("did")
                for did, sig in zip(pdf["did"].astype(str), pdf["sig"]):
                    s = np.asarray(sig, dtype=np.int64)
                    if len(stored):
                        est = (stored == s).mean(axis=1)
                        for j in np.nonzero(est >= tau)[0]:
                            out.append(
                                (ids[j], did, round(float(est[j]), 6), band)
                            )
                    ids.append(did)
                    stored = np.vstack([stored, s[None, :]])
                    if len(ids) > max_per_bucket:
                        ids = ids[-max_per_bucket:]
                        stored = stored[-max_per_bucket:]
            state.update((ids, stored.tobytes()))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["a", "b", "est_jaccard", "band"])

    return fn


def minhash_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    tau: float = 0.5,
    hash_fn: str = "xxhash64",
    ttl_ms: int | None = None,
    max_per_bucket: int = 512,
) -> DataFrame:
    """Streaming DataFrame of near-duplicate pairs (a, b, est_jaccard,
    band).  Same signature family as the batch operator for the same
    ``hash_fn`` — replaying the batches reproduces the batch pair set."""
    rows_per_band = n_hashes // n_bands
    # row-wise signatures: a streaming groupBy aggregation cannot precede
    # the stateful operator, and none is needed — the signature is a
    # per-document computation (parity-tested vs the batch aggregation)
    sigs = minhash_signatures_rowwise(
        docs, id_col, text_col, k, n_hashes, hash_fn
    ).select(F.col("id").cast("string").alias("did"), "sig")
    banded = sigs.select(
        "did",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("did", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return banded.groupBy("band", "key").applyInPandasWithState(
        _fn(tau, n_hashes, ttl_ms, max_per_bucket),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
