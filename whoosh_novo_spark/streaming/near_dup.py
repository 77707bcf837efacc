"""Stateful streaming embedding NEAR-dup detection (banded sign-LSH).

The batch twin is ``operators/similarity.embedding_near_dup_pairs``
(b bands x r hyperplanes, candidates from any shared band code, exact
cosine verify).  The streaming shape keys ``applyInPandasWithState`` by
(band, code): the state of each bucket is the unit vectors seen there so
far, and every arrival is cosine-verified against its bucket history —
so a near-duplicate of ANY earlier document (same or previous
micro-batch) is reported as a pair the moment it arrives.

Semantics:
- emits (a, b, cos, band) append rows: ``b`` arrived after ``a`` (ids
  are compared in ascending order within a micro-batch, so with
  monotonically increasing ids a < b always) and cos(a, b) >= tau;
- a pair colliding in SEVERAL bands is emitted once per colliding band —
  dropDuplicates(["a", "b"]) downstream if you need set semantics (the
  per-band rows are append-only, so a stateless within-the-sink distinct
  suffices; pairs never repeat across batches because only NEW arrivals
  are compared against history);
- recall matches the batch path (same planes, same banding: ~0.98 at
  cos 0.85-0.95 with the r=8 x b=16 defaults);
- state per bucket is capped at ``max_per_bucket`` unit vectors (FIFO
  eviction — a bucket that big means boilerplate embeddings; cap plus
  ``ttl_ms`` bound total state like every streaming dedup must).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whoosh_novo_spark.operators.similarity import _planes, band_codes_udf

OUTPUT_SCHEMA = "a string, b string, cos double, band int"
# ids + row-major float64 unit vectors (packed; schema-stable)
STATE_SCHEMA = "ids array<string>, packed binary"


def _near_dup_fn(tau: float, dim: int, ttl_ms: int | None, max_per_bucket: int):
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
                stored = np.frombuffer(packed, dtype=np.float64).reshape(-1, dim)
            else:
                ids, stored = [], np.empty((0, dim), dtype=np.float64)
            for pdf in pdf_iter:
                pdf = pdf.sort_values("vid")
                for vid, vec in zip(pdf["vid"].astype(str), pdf["v"]):
                    u = np.asarray(vec, dtype=np.float64)
                    n = np.linalg.norm(u)
                    if n > 0:
                        u = u / n
                    if len(stored):
                        cos = stored @ u
                        for j in np.nonzero(cos >= tau)[0]:
                            out.append(
                                (ids[j], vid, round(float(cos[j]), 6), band)
                            )
                    ids.append(vid)
                    stored = np.vstack([stored, u[None, :]])
                    if len(ids) > max_per_bucket:
                        ids = ids[-max_per_bucket:]
                        stored = stored[-max_per_bucket:]
            state.update((ids, stored.tobytes()))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["a", "b", "cos", "band"])

    return fn


def near_dup_stream(
    vecs: DataFrame,
    dim: int,
    tau: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ttl_ms: int | None = None,
    max_per_bucket: int = 256,
) -> DataFrame:
    """Streaming DataFrame of near-duplicate pairs (a, b, cos, band).
    ``dim`` must be given explicitly (a stream has no first() to probe).
    Same deterministic planes as the batch operator for the same seed."""
    planes = _planes(dim, n_bands * n_planes, seed)
    coded = vecs.select(
        F.col(id_col).cast("string").alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        band_codes_udf(planes, n_bands)(F.col(vec_col)).alias("codes"),
    ).select("vid", "v", F.posexplode("codes").alias("band", "code"))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return coded.groupBy("band", "code").applyInPandasWithState(
        _near_dup_fn(tau, dim, ttl_ms, max_per_bucket),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
