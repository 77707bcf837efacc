"""Repetition signals for web-text quality filtering (the "Gopher
rules", Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher", Appendix A — public paper; thresholds
below are the published ones).

Repetitious documents (scraper artifacts, keyword-stuffed spam,
templated listings) are the single largest removable slice of a raw
web crawl, and none of the existing per-doc stats (quality_score,
stopword/alpha ratios — functions/textstats.py) detect them: a page
repeating one paragraph 50 times has perfect stopword and alpha
ratios.  The published signal suite:

- duplicate line / paragraph fraction  (share of lines that are
  repeats of an earlier identical line)
- duplicate line / paragraph CHARACTER fraction (share of characters
  in those repeated lines)
- top n-gram character fraction, n=2..4 (characters covered by the
  single most frequent n-gram)
- duplicate n-gram character fraction, n=5..10 (characters covered by
  any n-gram that occurs more than once; overlapping occurrences
  counted once per token position)

Everything is computed in ONE Arrow-batched kernel pass per document
(`repetition_signals_udf` -> one struct column) — counter dictionaries
per doc, no shuffle, no per-row Python UDF.  `gopher_repetition_filter`
applies the paper's thresholds (each overridable) and keeps the
per-signal values so a pipeline can audit WHY a document was dropped.

Scale notes (100 TB lens): a pure map-side projection — composes with
the parquet scan like every other textstats expression; the only cost
is the Arrow transfer of the text column itself.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_TOKEN_RX = re.compile(r"[\w*]+(?:\.?[\w*]+)*", re.ASCII)

# Published thresholds (Rae et al. 2021 Table A1): a document is
# removed when a signal EXCEEDS its threshold.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}

_FIELDS = list(GOPHER_THRESHOLDS)

_SCHEMA = "struct<" + ", ".join(f"{f}: double" for f in _FIELDS) + ">"


def _dup_unit_fracs(units: list[str]) -> tuple[float, float]:
    """(fraction of units that repeat an earlier identical unit,
    fraction of characters in those repeats)."""
    if not units:
        return 0.0, 0.0
    seen: set[str] = set()
    n_dup = 0
    dup_chars = 0
    total_chars = 0
    for u in units:
        total_chars += len(u)
        if u in seen:
            n_dup += 1
            dup_chars += len(u)
        else:
            seen.add(u)
    return (
        n_dup / len(units),
        dup_chars / total_chars if total_chars else 0.0,
    )


def _top_ngram_char_frac(toks: list[str], lens: list[int], n: int, total: int) -> float:
    """Characters covered by the most frequent n-gram (freq x its token
    characters) over total token characters."""
    if total <= 0 or len(toks) < n:
        return 0.0
    counts: dict[tuple, int] = {}
    for i in range(len(toks) - n + 1):
        g = tuple(toks[i : i + n])
        counts[g] = counts.get(g, 0) + 1
    best_chars = 0
    for g, c in counts.items():
        if c > 1:
            chars = c * sum(len(w) for w in g)
            if chars > best_chars:
                best_chars = chars
    return min(1.0, best_chars / total)


def _dup_ngram_char_frac(toks: list[str], lens: list[int], n: int, total: int) -> float:
    """Characters at token positions covered by ANY n-gram occurring
    more than once (overlaps counted once per position)."""
    if total <= 0 or len(toks) < n:
        return 0.0
    counts: dict[tuple, int] = {}
    for i in range(len(toks) - n + 1):
        g = tuple(toks[i : i + n])
        counts[g] = counts.get(g, 0) + 1
    covered = [False] * len(toks)
    for i in range(len(toks) - n + 1):
        if counts[tuple(toks[i : i + n])] > 1:
            for j in range(i, i + n):
                covered[j] = True
    return sum(l for l, c in zip(lens, covered) if c) / total


# vectorized n-gram identity: polynomial rolling "hash" over per-doc
# token IDS.  With ids < vocab-of-the-doc << B and uint64 wraparound the
# map is injective for any realistic document (a collision needs the
# polynomial values of two different id-tuples to coincide mod 2^64 —
# ~L^2 / 2^64 per doc); the exact dict-of-tuples form survives below as
# the comparison in tests/test_repetition.py (vectorized==exact parity).
_NG_BASE = np.uint64(1099511628211)


def _signals_np(toks: list[str], lens_l: list[int], total: int) -> dict[str, float]:
    """The 9 n-gram signals, one numpy pass per order: rolling id-hash,
    unique counts, cumsum window char lengths, interval-painted
    coverage."""
    out: dict[str, float] = {}
    L = len(toks)
    ids_map: dict[str, int] = {}
    ids = np.fromiter(
        (ids_map.setdefault(t, len(ids_map)) for t in toks), dtype=np.uint64, count=L
    )
    lens = np.asarray(lens_l, dtype=np.int64)
    # window char length of the n-gram starting at i via cumsum
    csum = np.concatenate(([0], np.cumsum(lens)))
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        key = (
            f"top_{n}gram_char_frac" if n <= 4 else f"dup_{n}gram_char_frac"
        )
        m = L - n + 1
        if total <= 0 or m <= 0:
            out[key] = 0.0
            continue
        h = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            h = h * _NG_BASE + ids[j : j + m]
        uniq, first_idx, inv, counts = np.unique(
            h, return_index=True, return_inverse=True, return_counts=True
        )
        if n <= 4:
            dup_u = counts > 1
            if not dup_u.any():
                out[key] = 0.0
                continue
            gram_chars = csum[first_idx + n] - csum[first_idx]
            best = int((counts[dup_u] * gram_chars[dup_u]).max())
            out[key] = min(1.0, best / total)
        else:
            starts = np.nonzero(counts[inv] > 1)[0]
            if starts.size == 0:
                out[key] = 0.0
                continue
            delta = np.zeros(L + 1, dtype=np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, starts + n, -1)
            covered = np.cumsum(delta[:-1]) > 0
            out[key] = float(lens[covered].sum()) / total
    return out


def repetition_signals(text: str) -> dict[str, float]:
    """All 13 Gopher repetition signals of one document (the Spark path
    batches this via Arrow).  Line/paragraph signals are set-based over
    the few units; the 9 n-gram signals are numpy-vectorized
    (tests pin parity with the exact dict-of-tuples formulation)."""
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    paras = [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]
    dl, dlc = _dup_unit_fracs(lines)
    dp, dpc = _dup_unit_fracs(paras)
    toks = [t.lower() for t in _TOKEN_RX.findall(text)]
    lens = [len(t) for t in toks]
    total = sum(lens)
    out = {
        "dup_line_frac": dl,
        "dup_line_char_frac": dlc,
        "dup_para_frac": dp,
        "dup_para_char_frac": dpc,
    }
    out.update(_signals_np(toks, lens, total))
    return out


def repetition_signals_udf():
    """Arrow-batched kernel: text -> struct of the 13 repetition
    signals, one pass per document."""

    def rep_fn(s: pd.Series) -> pd.DataFrame:
        rows = [repetition_signals(t) for t in s.fillna("")]
        return pd.DataFrame(rows, columns=_FIELDS)

    return pandas_udf(rep_fn, _SCHEMA)


def with_repetition_signals(
    df: DataFrame, text_col: str = "text", out_col: str = "rep"
) -> DataFrame:
    """Adds the signal struct column (map-side projection)."""
    return df.withColumn(out_col, repetition_signals_udf()(F.col(text_col)))


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    keep_signals: bool = True,
) -> DataFrame:
    """Drops documents exceeding ANY repetition threshold (the published
    Gopher rule; pass ``thresholds`` to override individual cutoffs).
    With ``keep_signals`` the struct column stays for auditing."""
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown repetition signals: {sorted(unknown)}")
        th.update(thresholds)
    out = with_repetition_signals(df, text_col, "rep")
    cond: Column | None = None
    for name, limit in th.items():
        c = F.col("rep")[name] <= F.lit(float(limit))
        cond = c if cond is None else cond & c
    out = out.where(cond)
    return out if keep_signals else out.drop("rep")
