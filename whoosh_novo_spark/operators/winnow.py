"""Winnowing document fingerprints + containment detection.

Whole-document near-dup (MinHash/SimHash over the full shingle set,
operators/dedup.py) misses CONTAINMENT: a page that embeds a 300-word
chunk of another document inside 3,000 words of its own text has low
whole-doc Jaccard but is exactly the partial-overlap case a
training-data pipeline must catch (wiki mirrors wrapping articles in
boilerplate, quote farms, licence blocks).  Winnowing (Schleimer,
Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — the MOSS algorithm) selects a sparse,
position-robust subset of k-gram hashes with a GUARANTEE: any shared
token run of at least ``window + k - 1`` tokens contributes at least
one shared fingerprint, while storing only ~2/(window+1) of the k-gram
hashes.

Operators:

- winnow_fingerprint_udf: Arrow-batched text -> array<bigint> kernel
  (distinct winnowed fingerprints per document)
- winnow_fingerprints:    (id, fp) long table
- containment_pairs:      pairs whose shared-fingerprint overlap
  relative to the SMALLER document exceeds tau — the asymmetric
  "B is (partly) inside A" signal

Scale notes (100 TB lens): the kernel is one Arrow-batched pass per
row (vocab-hash + k vectorized multiply-adds + one sliding-window
argmin — no per-token Python); the only shuffle is the fingerprint
equi-join, and ``max_fp_df`` drops boilerplate fingerprints shared by
more than that many documents BEFORE the join (the same skew guard as
ngram_jaccard_pairs / simhash — a licence-block fingerprint appearing
in 10M docs must never reach the pair generator).  Fingerprint density
is ~2n/(window+1) per doc, so the exploded table is a small multiple
of the corpus row count, not of its token count.

Reference parity: whoosh-novo has no fingerprinting surface; this
module covers SURVEY.md's training-data-pipeline axis (document
fingerprinting / rolling hash) alongside operators/dedup.py.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# FNV-1a 64-bit prime as the polynomial base; uint64 arithmetic wraps
# mod 2^64 (numpy unsigned overflow is defined as wraparound).
_BASE = np.uint64(1099511628211)

_TOKEN_RX = re.compile(r"[\w*]+(?:\.?[\w*]+)*", re.ASCII)


def _token_hash(tok: str) -> int:
    """Deterministic 64-bit token hash (md5 prefix — stable across runs,
    processes and PYTHONHASHSEED, unlike builtin hash)."""
    return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")


def _winnow_one(toks: list[str], k: int, window: int, cache: dict) -> np.ndarray:
    """Winnowed fingerprint set of one token list (distinct int64 values).

    Vectorized: per-distinct-token md5 (cached across the Arrow batch),
    k multiply-adds for the rolling k-gram hash, one sliding-window
    rightmost-argmin for the winnow selection.
    """
    n_kgrams = len(toks) - k + 1
    if n_kgrams <= 0:
        return np.empty(0, dtype=np.int64)
    for t in toks:
        if t not in cache:
            cache[t] = _token_hash(t)
    th = np.fromiter((cache[t] for t in toks), dtype=np.uint64, count=len(toks))
    h = np.zeros(n_kgrams, dtype=np.uint64)
    for j in range(k):
        h = h * _BASE + th[j : j + n_kgrams]
    w = min(window, n_kgrams)
    view = np.lib.stride_tricks.sliding_window_view(h, w)
    # the paper's rule: rightmost minimal hash in each window
    idx = w - 1 - view[:, ::-1].argmin(axis=1)
    pos = np.arange(view.shape[0]) + idx
    return np.unique(h[pos]).view(np.int64)


def winnow_fingerprint_udf(k: int = 5, window: int = 4):
    """Arrow-batched winnowing kernel: text -> array<bigint> of distinct
    winnowed k-gram fingerprints (rightmost-min rule, guarantee length
    ``window + k - 1`` tokens).  Tokenization matches tokens_sql /
    shingle_array_udf (ASCII \\w, lowercase) so fingerprints compose
    with the rest of the dedup stack."""
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k}, window={window}")

    def fp_fn(s: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for text in s.fillna(""):
            toks = [t.lower() for t in _TOKEN_RX.findall(text)]
            out.append(_winnow_one(toks, k, window, cache).tolist())
        return pd.Series(out, dtype=object)

    return pandas_udf(fp_fn, "array<bigint>")


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Long fingerprint table (id, fp): one row per distinct winnowed
    fingerprint per document."""
    arr = winnow_fingerprint_udf(k, window)(F.col(text_col))
    return docs.select(F.col(id_col).alias("id"), F.explode(arr).alias("fp"))


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    tau: float = 0.5,
    max_fp_df: int | None = 1000,
) -> DataFrame:
    """Partial-overlap pairs (a < b) with
    ``containment = |FP_a ∩ FP_b| / min(|FP_a|, |FP_b|) >= tau`` —
    high when the smaller document's content is (mostly) inside the
    larger one, regardless of how much unrelated text the larger adds;
    whole-doc Jaccard on the same pair shrinks toward 0 as the host
    grows.  Columns: a, b, inter, containment.

    ``max_fp_df`` drops fingerprints shared by more than that many docs
    before the join (boilerplate/licence blocks — the skew guard; a
    real overlap spans many fingerprints and survives the loss)."""
    fp = winnow_fingerprints(docs, id_col, text_col, k, window)
    if max_fp_df is not None:
        hot = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_fp_df)
        )
        fp = fp.join(hot.select("fp"), "fp", "left_anti")
    sizes = fp.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = fp.select(F.col("id").alias("a"), "fp")
    b = fp.select(F.col("id").alias("b"), "fp")
    inter = (
        a.join(b, "fp")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "containment",
            F.round(
                F.col("inter").cast("double") / F.least(F.col("sza"), F.col("szb")), 6
            ),
        )
        .where(F.col("containment") >= tau)
        .select("a", "b", "inter", "containment")
    )
