"""N-gram language-model quality scoring (the CCNet perplexity filter,
Spark-native).

CCNet (Wenzek et al. 2020 — public) ranks crawl documents by the
perplexity of a language model trained on a trusted corpus and keeps
the low-perplexity head; it is the standard model-based quality gate
between the heuristic filters (textstats/repetition) and training.
KenLM is not in this environment, so the model here is the one
published FOR distributed settings: **Stupid Backoff** (Brants et al.
2007, "Large Language Models in Machine Translation" — public), whose
whole point is that it needs only raw n-gram counts (no discounting,
no normalization pass) and therefore trains as two map-side-combined
Spark aggregations:

  S(w | w_prev) = count(w_prev w) / count(w_prev)   if count > 0
                = alpha * S(w)                       otherwise
  S(w)          = count(w) / N                       (unigram),
                  alpha * 1/N for OOV

Scores are not normalized probabilities, so the document statistic is
the published *pseudo*-perplexity exp(-mean log S) — monotone in model
surprise, which is all a FILTER needs; this is documented, not hidden.

Shapes (100 TB lens): training = unigram + bigram counts (shuffle keys
= vocabulary / bigram-vocabulary, map-side combined), truncated to the
top ``max_vocab`` / ``max_bigrams`` by count (reported, never silent
— truncation only makes rare context estimates back off, it cannot
crash or bias the head).  Scoring = one broadcast of the count tables
+ one Arrow-batched kernel pass; bucketing = one approxQuantile.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from whoosh_novo_spark.functions.bpe import pretokenize as _bpe_pretokenize


def _lm_tokens(text: str) -> list[str]:
    """LM tokens: lowercased word-ish pre-token pieces (reuses the BPE
    pre-tokenizer so every text function segments identically),
    whitespace stripped from the piece."""
    return [p.strip().lower() for p in _bpe_pretokenize(text) if p.strip()]


def train_stupid_backoff(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 200_000,
    max_bigrams: int = 1_000_000,
) -> dict:
    """Trains the count tables.  Returns ``{"uni": {tok: count},
    "bi": {(a, b): count}, "total": N, "truncated_uni": bool,
    "truncated_bi": bool}`` — plain dicts, broadcastable."""

    # one Arrow pass emits tokens AND bigram keys (Catalyst HOF lambdas
    # over per-token arrays are interpreted — the measured bottleneck the
    # shingle kernel already moved off; see operators/dedup.py shingles)
    def grams_fn(s: pd.Series) -> pd.DataFrame:
        unis, bis = [], []
        for t in s.fillna(""):
            toks = _lm_tokens(t)
            unis.append(toks)
            bis.append([f"{a}\x1f{b}" for a, b in zip(toks, toks[1:])])
        return pd.DataFrame({"u": unis, "b": bis})

    arr = pandas_udf(grams_fn, "struct<u: array<string>, b: array<string>>")(
        F.col(text_col)
    )
    grams = docs.select(arr.alias("g")).persist()
    uni_df = (
        grams.select(F.explode("g.u").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni_df.count()
    total = uni_df.agg(F.sum("c")).collect()[0][0] or 0
    uni_rows = uni_df.orderBy(F.desc("c"), F.asc("w")).limit(max_vocab).collect()

    bi_df = (
        grams.select(F.explode("g.b").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_bi = bi_df.count()
    bi_rows = bi_df.orderBy(F.desc("c"), F.asc("p")).limit(max_bigrams).collect()
    grams.unpersist()
    return {
        "uni": {r["w"]: r["c"] for r in uni_rows},
        "bi": {tuple(r["p"].split("\x1f", 1)): r["c"] for r in bi_rows},
        "total": int(total),
        "truncated_uni": n_uni > len(uni_rows),
        "truncated_bi": n_bi > len(bi_rows),
    }


def score_tokens(tokens: list[str], lm: dict, alpha: float = 0.4) -> float:
    """Mean negative log Stupid-Backoff score of a token sequence
    (plain-Python single-doc form; the Spark path batches via Arrow).
    Empty sequences score 0."""
    uni, bi, total = lm["uni"], lm["bi"], max(1, lm["total"])
    if not tokens:
        return 0.0
    nll = 0.0
    prev = None
    for w in tokens:
        cw = uni.get(w)
        s_uni = (cw / total) if cw else (alpha / total)
        if prev is not None:
            cb = bi.get((prev, w))
            cp = uni.get(prev)
            s = (cb / cp) if (cb and cp) else alpha * s_uni
        else:
            s = s_uni
        nll -= math.log(s)
        prev = w
    return nll / len(tokens)


def pseudo_perplexity_udf(lm: dict, alpha: float = 0.4):
    """Arrow-batched: text -> exp(mean neg log S) (double)."""

    def ppl_fn(s: pd.Series) -> pd.Series:
        return pd.Series(
            [math.exp(score_tokens(_lm_tokens(t), lm, alpha)) for t in s.fillna("")],
            dtype="float64",
        )

    return pandas_udf(ppl_fn, "double")


def perplexity_buckets(
    docs: DataFrame,
    lm: dict,
    text_col: str = "text",
    ppl_col: str = "ppl",
    bucket_col: str = "ppl_bucket",
    alpha: float = 0.4,
) -> DataFrame:
    """CCNet's head/middle/tail labels by pseudo-perplexity tertiles
    (approxQuantile over the scored corpus; 'head' = lowest perplexity
    = most like the training distribution)."""
    scored = docs.withColumn(ppl_col, pseudo_perplexity_udf(lm, alpha)(F.col(text_col)))
    q1, q2 = scored.approxQuantile(ppl_col, [1 / 3, 2 / 3], 0.001)
    return scored.withColumn(
        bucket_col,
        F.when(F.col(ppl_col) <= q1, F.lit("head"))
        .when(F.col(ppl_col) <= q2, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
