"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched
encoding — exact learned-vocabulary token accounting for a corpus.

`textstats.bpe_pretoken_count` estimates token budgets from GPT-2
pre-tokenizer pieces; this module learns an ACTUAL merge table from
the corpus (the BPE algorithm of Sennrich et al. 2016, as used
byte-level by GPT-2, Radford et al. 2019 — public papers) and encodes
with it, so token counts reflect a real vocabulary.

The distributed shape is the one every public tokenizer trainer uses
(HuggingFace tokenizers, SentencePiece): BPE training never touches
the raw corpus — it operates on the WORD HISTOGRAM.  So:

1. pre-tokenize + count words in Spark (one map-side-combined groupBy;
   output rows = distinct pre-tokens, millions at worst, not the
   corpus token count);
2. cap the histogram (``min_freq`` + ``max_words`` by frequency —
   truncation is logged, never silent; dropped tail words still encode
   fine at query time, they just didn't vote on merges);
3. train the merge table on the driver over the histogram with the
   classic indexed incremental algorithm (pair -> affected-words
   index, O(affected) work per merge, not O(histogram));
4. encode documents with an Arrow-batched kernel applying merges in
   rank order (per-batch word -> tokens memo, so each distinct word
   in a batch is merged once).

Training and encoding share ONE Python pre-tokenizer function, so a
word can never tokenize differently at train and encode time.

Byte-level: words are UTF-8 byte sequences (ints 0-255 are the base
vocabulary, exactly GPT-2's convention, no unknown tokens possible);
concatenating a word's token byte strings reproduces the word's bytes
bit-for-bit (round-trip tested).

Scale notes (100 TB lens): the corpus-scale work is the word count
(one shuffle whose key cardinality is the vocabulary, with map-side
combine) and the encode pass (map-side Arrow kernel).  The driver
histogram is bounded by ``max_words``; merge training cost depends on
vocab_size and the histogram, not the corpus.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Python-regex form of the GPT-2 pre-tokenizer (textstats.
# BPE_PRETOKEN_RX_JAVA is the Java twin used by the ESTIMATOR; the
# trainer/encoder pair deliberately uses only this one).  ``re`` has no
# \p{L}/\p{N}; [^\W\d_] is unicode-letter, \d unicode-digit.
_PRETOKEN_RX = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?[^\s\w]+| ?_+"
    r"|\s+(?!\S)|\s+",
    re.UNICODE,
)


def pretokenize(text: str) -> list[str]:
    """GPT-2-style pre-token pieces, whitespace-only pieces dropped."""
    return [p for p in _PRETOKEN_RX.findall(text) if not p.isspace()]


def word_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — the trainer's only input.  One
    Arrow pre-tokenize pass + one map-side-combined count."""

    def words_fn(s: pd.Series) -> pd.Series:
        return pd.Series([pretokenize(t) for t in s.fillna("")], dtype=object)

    arr = pandas_udf(words_fn, "array<string>")(F.col(text_col))
    return (
        docs.select(F.explode(arr).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _train_merges_from_counts(
    word_counts: list[tuple[bytes, int]], n_merges: int
) -> list[tuple[bytes, bytes]]:
    """Classic indexed BPE training over a word histogram.

    Deterministic: the best pair each round is (count, pair bytes) —
    ties break on the lexicographically SMALLEST pair, independent of
    dict iteration order.
    """
    words: list[list[bytes]] = [
        [bytes([b]) for b in w] for w, _ in word_counts
    ]
    freqs = [c for _, c in word_counts]

    pair_counts: dict[tuple[bytes, bytes], int] = {}
    pair_words: dict[tuple[bytes, bytes], set[int]] = {}
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        best = None
        best_key = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            key = (-c, p)
            if best_key is None or key < best_key:
                best_key = key
                best = p
        if best is None:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            f = freqs[wi]
            # remove this word's contribution to all its current pairs
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
            # apply the merge within the word
            out: list[bytes] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            # add back the new contribution
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(wi)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 8192,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> dict:
    """Trains a byte-level BPE merge table on the corpus.  Returns
    ``{"merges": [(bytes, bytes), ...], "n_words": int, "n_words_used":
    int, "truncated": bool}``.  ``vocab_size`` counts the 256 byte base
    symbols; merges = vocab_size - 256."""
    if vocab_size <= 256:
        raise ValueError(f"vocab_size must exceed the 256 byte base, got {vocab_size}")
    hist = word_histogram(docs, text_col).where(F.col("freq") >= min_freq)
    n_words = hist.count()
    rows = (
        hist.orderBy(F.desc("freq"), F.asc("word")).limit(max_words).collect()
    )
    word_counts = [(r["word"].encode("utf-8"), r["freq"]) for r in rows]
    merges = _train_merges_from_counts(word_counts, vocab_size - 256)
    return {
        "merges": merges,
        "n_words": n_words,
        "n_words_used": len(word_counts),
        "truncated": n_words > len(word_counts),
    }


def _encode_word(wb: bytes, ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    syms = [bytes([b]) for b in wb]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_udf(merges: list[tuple[bytes, bytes]]):
    """Arrow-batched encoder: text -> array<binary> token byte strings
    (concatenation reproduces the pre-token bytes exactly).  Merges are
    applied lowest-rank-first, the standard BPE inference rule; a
    per-batch word memo merges each distinct word once."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def enc_fn(s: pd.Series) -> pd.Series:
        memo: dict[str, list[bytes]] = {}
        out = []
        for text in s.fillna(""):
            toks: list[bytes] = []
            for w in pretokenize(text):
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w.encode("utf-8"), ranks)
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out, dtype=object)

    return pandas_udf(enc_fn, "array<binary>")


def bpe_token_count_udf(merges: list[tuple[bytes, bytes]]):
    """Arrow-batched exact token count under the learned vocabulary."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def cnt_fn(s: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = []
        for text in s.fillna(""):
            n = 0
            for w in pretokenize(text):
                got = memo.get(w)
                if got is None:
                    got = len(_encode_word(w.encode("utf-8"), ranks))
                    memo[w] = got
                n += got
            out.append(n)
        return pd.Series(out, dtype="int64")

    return pandas_udf(cnt_fn, "long")
