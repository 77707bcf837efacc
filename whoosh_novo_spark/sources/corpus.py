"""Deterministic Common-Crawl-style synthetic corpus.

Input shape mandated by BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Generation is fully seeded (numpy PCG64) and *distributed*: content is
seeded per fixed GLOBAL chunk of row ids (not per partition), so the same
(seed, n_docs) produces byte-identical rows at ANY partition count and
cluster size — the per-row invariant "byte-identical text per url" holds
across runs and parallelism levels, which is what the scaling benchmark
compares (tests/test_corpus_determinism.py).

Text is Zipf-distributed words over a fixed vocabulary plus tokenizer edge
cases (stopwords, 1-char tokens, mixed case, accents, under_score and
dotted.token forms — see FIXTURES.md §1).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# Fixed base vocabulary: common words (some are whoosh stopwords on purpose),
# domain words, and tokenizer edge cases.
_EDGE_WORDS = [
    "the", "a", "of", "and", "is", "to", "in", "it", "you", "that",  # stopwords
    "x", "y", "z", "q",  # 1-char (dropped by minsize=2)
    "Big-Time", "under_score", "dotted.token", "CamelCase", "MiXeD",
    "café", "straße", "Ça", "naïve",  # unicode lower/fold cases
    "3.141", "42", "2x4",
]


def _vocab(size: int) -> list[str]:
    base = [f"w{i:05d}" for i in range(size)]
    # sprinkle recognizable head words at the front (Zipf head)
    head = [
        "render", "shade", "texture", "spark", "index", "query", "search",
        "merge", "block", "score", "term", "posting", "crawl", "page",
    ]
    return (head + base)[:size]


#: generation granularity: content is seeded per fixed GLOBAL chunk of
#: row ids, so the same (seed, n_docs) produces byte-identical rows at
#: ANY partition count — the per-row invariant the two-cluster-size
#: scaling comparison relies on (BASELINE.json input_hint)
_CHUNK = 4096


def _partition_pdf(
    start: int, count: int, seed: int, vocab: np.ndarray, zipf_s: float
) -> pd.DataFrame:
    """Rows [start, start+count) assembled from global chunks."""
    parts = []
    c0 = start // _CHUNK
    c1 = (start + count - 1) // _CHUNK
    for c in range(c0, c1 + 1):
        cs = c * _CHUNK
        pdf = _chunk_pdf(c, seed, vocab, zipf_s)
        lo = max(start, cs) - cs
        hi = min(start + count, cs + _CHUNK) - cs
        parts.append(pdf.iloc[lo:hi])
    return pd.concat(parts, ignore_index=True)


def _chunk_pdf(
    chunk_id: int, seed: int, vocab: np.ndarray, zipf_s: float
) -> pd.DataFrame:
    start, count = chunk_id * _CHUNK, _CHUNK
    rng = np.random.default_rng(np.random.SeedSequence([seed, chunk_id]))
    n_vocab = len(vocab)
    ranks = np.arange(1, n_vocab + 1, dtype=np.float64)
    probs = ranks**-zipf_s
    probs /= probs.sum()

    doc_ids = np.arange(start, start + count, dtype=np.int64)
    lengths = rng.integers(8, 300, size=count)
    texts = []
    edge = np.asarray(_EDGE_WORDS, dtype=object)
    for i in range(count):
        words = vocab[rng.choice(n_vocab, size=lengths[i], p=probs)]
        # inject a few edge-case words deterministically
        n_edge = int(rng.integers(0, 4))
        if n_edge:
            words = np.concatenate([words, edge[rng.integers(0, len(edge), n_edge)]])
            words = words[rng.permutation(len(words))]
        texts.append(" ".join(words.tolist()))

    urls = [f"https://example{d % 997}.com/p/{d:012d}" for d in doc_ids]
    base_ts = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
    ts = [base_ts + _dt.timedelta(seconds=int(d) * 7) for d in doc_ids]
    html = [f"<html><body>{t}</body></html>".encode() for t in texts]
    langs = np.asarray(["en", "en", "en", "de", "fr", "es"], dtype=object)[
        rng.integers(0, 6, size=count)
    ]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": html, "text": texts, "lang": langs}
    )


def synthesize_corpus(
    spark: SparkSession,
    n_docs: int = 1000,
    n_partitions: int = 8,
    seed: int = 42,
    vocab_size: int = 10_000,
    zipf_s: float = 1.1,
) -> DataFrame:
    """Distributed deterministic corpus: mapInPandas over a partition spec."""
    vocab = np.asarray(_vocab(vocab_size), dtype=object)
    per = n_docs // n_partitions
    spec = [
        (p, p * per, per if p < n_partitions - 1 else n_docs - per * (n_partitions - 1))
        for p in range(n_partitions)
    ]
    spec_df = spark.createDataFrame(spec, "part_id int, start long, cnt long").repartition(
        n_partitions, "part_id"
    )

    def gen(batches):
        for pdf in batches:
            for _, r in pdf.iterrows():
                yield _partition_pdf(int(r.start), int(r.cnt), seed, vocab, zipf_s)

    return spec_df.mapInPandas(gen, CORPUS_SCHEMA)


def corpus_pandas(n_docs: int, seed: int = 42, vocab_size: int = 2_000, zipf_s: float = 1.1) -> pd.DataFrame:
    """Driver-side single-partition variant for small unit tests — identical
    rows to synthesize_corpus(n_partitions=1)."""
    vocab = np.asarray(_vocab(vocab_size), dtype=object)
    return _partition_pdf(0, n_docs, seed, vocab, zipf_s)
