"""Exact-substring deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better" — public): remove every
repeated occurrence of any sufficiently long span, KEEPING the first,
across the whole corpus.  This is the finest-grained member of the
dedup family (document-level exact_duplicates, line-level
remove_duplicate_lines, near-dup MinHash/SimHash, containment winnow
— all in this repo); it catches the long quoted passage pasted into
thousands of otherwise-distinct pages.

The published tool builds a corpus-wide suffix array on one large
machine; the Spark-native formulation here works at TOKEN granularity
(documented approximation — span boundaries snap to tokens, which for
a ``min_tokens`` of 50 changes nothing material) and never builds a
global index:

1. one Arrow pass per doc: tokenize, rolling ``min_tokens``-gram hash
   over md5 token values (globally consistent across docs — the winnow
   technique, vectorized);
2. explode (id, pos, hash); rank every occurrence of each hash by
   (id, pos) — rank 1 is the occurrence the corpus keeps (the
   paper's keep-one semantics); occurrences with rank > 1 mark their
   ``min_tokens`` token positions as covered;
3. per doc, paint the covered intervals (delta array + cumsum) in a
   final Arrow kernel that re-tokenizes WITH char offsets and rebuilds
   the text from the original bytes of the kept token runs (kept
   regions are byte-identical; inter-run whitespace collapses to one
   space, documented).

A span of length L >= min_tokens that repeats produces L-min_tokens+1
repeated grams at every later occurrence — their painted intervals
tile the whole span, so the entire later copy is removed while the
first copy's grams (all rank 1) leave it untouched.

Scale notes (100 TB lens): the shuffles key on the gram hash (rank
window) and the doc id (interval collection) — the gram-hash key is
md5-uniform, and the per-hash window only ranks the occurrence list of
ONE gram (the pathological single-gram hot key is exactly a massively
duplicated span, which is the thing being removed; its window input is
the occurrence count, not the corpus).  The covered-position lists per
doc are bounded by the doc's own token count.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_TOKEN_RX = re.compile(r"\S+")

_BASE = np.uint64(1099511628211)


def _token_hashes(toks: list[str], cache: dict) -> np.ndarray:
    for t in toks:
        if t not in cache:
            cache[t] = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
    return np.fromiter((cache[t] for t in toks), dtype=np.uint64, count=len(toks))


def _gram_hashes(th: np.ndarray, k: int) -> np.ndarray:
    n = th.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * _BASE + th[j : j + n]
    return h.view(np.int64)


def _gram_udf(k: int):
    def fn(s: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for text in s.fillna(""):
            toks = _TOKEN_RX.findall(text)
            out.append(_gram_hashes(_token_hashes(toks, cache), k).tolist())
        return pd.Series(out, dtype=object)

    return pandas_udf(fn, "array<bigint>")


def _rebuild_udf(k: int):
    """(text, covered_starts) -> text with covered token runs removed;
    kept runs are original bytes, joined by single spaces."""

    def fn(text_s: pd.Series, cov_s: pd.Series) -> pd.Series:
        out = []
        for text, cov in zip(text_s.fillna(""), cov_s):
            if cov is None or len(cov) == 0:
                out.append(text)
                continue
            spans = [(m.start(), m.end()) for m in _TOKEN_RX.finditer(text)]
            L = len(spans)
            delta = np.zeros(L + 1, dtype=np.int64)
            starts = np.asarray([c for c in cov if 0 <= c < L], dtype=np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, np.minimum(starts + k, L), -1)
            covered = np.cumsum(delta[:-1]) > 0
            pieces = []
            run_start = None
            for i in range(L + 1):
                keep = i < L and not covered[i]
                if keep and run_start is None:
                    run_start = i
                elif not keep and run_start is not None:
                    pieces.append(text[spans[run_start][0] : spans[i - 1][1]])
                    run_start = None
            out.append(" ".join(pieces))
        return pd.Series(out, dtype=object)

    return pandas_udf(fn, "string")


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
) -> DataFrame:
    """Removes every occurrence AFTER THE FIRST (corpus order by
    (id, pos)) of any repeated ``min_tokens``-token span.  Returns the
    input rows with ``text_col`` rewritten and an ``n_tokens_removed``
    audit column; rows never disappear (a fully-duplicated later copy
    becomes empty text)."""
    if min_tokens < 2:
        raise ValueError(f"min_tokens must be >= 2, got {min_tokens}")
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(_gram_udf(min_tokens)(F.col(text_col))).alias("pos", "h"),
    )
    w = Window.partitionBy("h").orderBy(F.col("id").asc(), F.col("pos").asc())
    dup_pos = (
        grams.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") > 1)
        .select("id", "pos")
    )
    covered = dup_pos.groupBy("id").agg(F.collect_list("pos").alias("_cov"))
    n_toks = F.size(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    )
    out = (
        docs.join(covered, F.col(id_col) == F.col("id"), "left")
        .withColumn("_pre_n", F.when(F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "", 0).otherwise(n_toks))
        .withColumn(
            text_col,
            _rebuild_udf(min_tokens)(
                F.col(text_col), F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
            ),
        )
        .withColumn(
            "n_tokens_removed",
            (F.col("_pre_n") - F.when(F.trim(F.col(text_col)) == "", 0).otherwise(
                F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
            )).cast("int"),
        )
        .drop("id", "_cov", "_pre_n")
    )
    return out
