"""Vectorized text analysis (Arrow/pandas), token-identical to the reference.

Reference chain (``StandardAnalyzer``, analyzers.py:190-217):
``RegexTokenizer | LowercaseFilter | StopFilter``

- ``RegexTokenizer`` (tokenizers.py:108-232): every match of
  ``[\\w\\*]+(\\.?[\\w\\*]+)*`` (Python ``re``, full-Unicode ``\\w``) is a
  token (group 0); token position = match ordinal.
- ``LowercaseFilter`` (filters.py:328-340): CPython ``str.lower()`` —
  full Unicode lowercasing.  We therefore lowercase with pandas
  ``Series.str.lower()`` (same CPython semantics), never Spark SQL
  ``lower()``, which can differ on some Unicode code points.
- ``StopFilter`` (filters.py:352-447): drop tokens with ``len < 2`` or in
  the 33-word default stop list; surviving tokens are *renumbered*
  consecutively starting from the first survivor's original ordinal
  (filters.py:418-432).

All functions operate on whole pandas Series/ndarrays (Arrow batches);
there is no per-row Python in the hot path beyond the regex findall itself.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

# Non-capturing form of the reference default_pattern (tokenizers.py:43).
# Identical match semantics; the original's capture group only changes
# re.findall's return shape, not what matches.
TOKEN_PATTERN = re.compile(r"[\w\*]+(?:\.?[\w\*]+)*", re.UNICODE)

# Default English stop list — whoosh's public STOP_WORDS (filters.py:47-84).
STOP_WORDS = frozenset(
    """a an and are as at be by can for from have if in is it may not of on
    or tbd that the this to us we when will with yet you your""".split()
)

MIN_WORD_SIZE = 2  # StopFilter minsize default (filters.py:391)


@dataclass
class TokenBatch:
    """Flat token arrays for one Arrow batch of documents.

    ``row`` maps each token back to its batch-row; ``pos`` holds the
    reference-renumbered position; tokens appear in document order.
    """

    row: np.ndarray  # int64, batch-local row index per token
    term: np.ndarray  # object (str)
    pos: np.ndarray  # int64, renumbered positions
    n_rows: int

    def doc_lengths(self) -> np.ndarray:
        """Post-filter token count per batch row (the scorable field length,
        fields.py:161 / whoosh3.py:234-243)."""
        out = np.zeros(self.n_rows, dtype=np.int64)
        if len(self.row):
            np.add.at(out, self.row, 1)
        return out


def _flatten_findall(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """findall per row -> flat (row_idx, token, original_ordinal) arrays."""
    tok_lists = texts.fillna("").str.findall(TOKEN_PATTERN)
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    n = len(texts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    if counts.sum() == 0:
        return row_idx, np.array([], dtype=object), np.array([], dtype=np.int64)
    flat = np.concatenate([np.asarray(lst, dtype=object) for lst in tok_lists])
    # original ordinal within each doc: global arange minus each row's start
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    ordinal = np.arange(len(flat), dtype=np.int64) - starts
    return row_idx, flat, ordinal


def standard_analyze_batch(
    texts: pd.Series,
    stops: frozenset[str] = STOP_WORDS,
    minsize: int = MIN_WORD_SIZE,
    maxsize: int | None = None,
    stem: bool = False,
) -> TokenBatch:
    """StandardAnalyzer over a batch: tokenize -> lower -> stop (+renumber)."""
    row_idx, flat, ordinal = _flatten_findall(texts)
    n = len(texts)
    if len(flat) == 0:
        return TokenBatch(row_idx, flat, ordinal, n)

    lowered = pd.Series(flat, dtype=object).str.lower()
    lens = lowered.str.len().to_numpy()
    keep = (lens >= minsize) & ~lowered.isin(stops).to_numpy()
    if maxsize is not None:
        keep &= lens <= maxsize

    row_k = row_idx[keep]
    term_k = lowered.to_numpy()[keep]
    ord_k = ordinal[keep]

    if stem:
        from whoosh_novo_spark.functions.porter import stem_array

        term_k = stem_array(term_k)

    # StopFilter renumbering (filters.py:418-426): within each doc the first
    # survivor keeps its original ordinal p0; later survivors get p0+1, p0+2...
    pos = _renumber(row_k, ord_k, n)
    return TokenBatch(row_k, term_k, pos, n)


def _renumber(row_k: np.ndarray, ord_k: np.ndarray, n_rows: int) -> np.ndarray:
    if len(row_k) == 0:
        return ord_k
    # row_k is sorted (document order). Find each doc's first-survivor index.
    first_mask = np.empty(len(row_k), dtype=bool)
    first_mask[0] = True
    np.not_equal(row_k[1:], row_k[:-1], out=first_mask[1:])
    group_start = np.maximum.accumulate(np.where(first_mask, np.arange(len(row_k)), 0))
    rank_in_doc = np.arange(len(row_k)) - group_start
    p0 = ord_k[group_start]
    return p0 + rank_in_doc


def simple_analyze_batch(texts: pd.Series) -> TokenBatch:
    """SimpleAnalyzer (analyzers.py:76-100): tokenize + lower, no stop filter."""
    row_idx, flat, ordinal = _flatten_findall(texts)
    if len(flat) == 0:
        return TokenBatch(row_idx, flat, ordinal, len(texts))
    lowered = pd.Series(flat, dtype=object).str.lower().to_numpy()
    return TokenBatch(row_idx, lowered, ordinal, len(texts))


def id_analyze_batch(texts: pd.Series) -> TokenBatch:
    """IDTokenizer (tokenizers.py:73-90): whole value is one token."""
    vals = texts.fillna("").to_numpy(dtype=object)
    nonempty = np.array([len(v) > 0 for v in vals], dtype=bool)
    rows = np.arange(len(vals), dtype=np.int64)[nonempty]
    return TokenBatch(rows, vals[nonempty], np.zeros(nonempty.sum(), dtype=np.int64), len(vals))


def keyword_analyze_batch(texts: pd.Series, lowercase: bool = False) -> TokenBatch:
    """KEYWORD field (fields.py:1035-1081): whitespace-split tokens."""
    tok_lists = texts.fillna("").str.split()
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    n = len(texts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    if counts.sum() == 0:
        return TokenBatch(row_idx, np.array([], dtype=object), np.array([], dtype=np.int64), n)
    flat = np.concatenate([np.asarray(x, dtype=object) for x in tok_lists])
    if lowercase:
        flat = pd.Series(flat, dtype=object).str.lower().to_numpy()
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    ordinal = np.arange(len(flat), dtype=np.int64) - starts
    return TokenBatch(row_idx, flat, ordinal, n)


def ngram_analyze_batch(texts: pd.Series, minsize: int = 2, maxsize: int = 4) -> TokenBatch:
    """NgramWordAnalyzer-style: tokenize+lower then char n-grams per token
    (ngrams.py:42-247). Position = source-token ordinal (all grams of one
    word share its position, NgramFilter ngrams.py:169-186)."""
    base = simple_analyze_batch(texts)
    rows, terms, poss = [], [], []
    for r, t, p in zip(base.row, base.term, base.pos):
        L = len(t)
        for size in range(minsize, maxsize + 1):
            for i in range(0, L - size + 1):
                rows.append(r)
                terms.append(t[i : i + size])
                poss.append(p)
    return TokenBatch(
        np.asarray(rows, dtype=np.int64),
        np.asarray(terms, dtype=object),
        np.asarray(poss, dtype=np.int64),
        base.n_rows,
    )


def stemming_analyze_batch(texts: pd.Series) -> TokenBatch:
    """StemmingAnalyzer (analyzers.py:221-261): standard chain + Porter stem."""
    return standard_analyze_batch(texts, stem=True)


def _fold_accents(term_arr: np.ndarray) -> np.ndarray:
    """Accent folding: NFKD-decompose and drop combining marks — the same
    effect as the reference CharsetFilter with its accent map
    (filters.py:450-501, support/charset.py) for Latin accents."""
    import unicodedata

    def fold(s: str) -> str:
        return "".join(
            c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
        )

    uniq, inv = np.unique(term_arr, return_inverse=True)
    folded = np.array([fold(u) for u in uniq], dtype=object)
    return folded[inv]


def folding_analyze_batch(texts: pd.Series) -> TokenBatch:
    """FancyAnalyzer-style accent-folding chain: standard + accent fold
    (RegexTokenizer | Lowercase | Stop | CharsetFilter(accent_map))."""
    tb = standard_analyze_batch(texts)
    if len(tb.term) == 0:
        return tb
    return TokenBatch(tb.row, _fold_accents(tb.term), tb.pos, tb.n_rows)


def fancy_analyze_batch(texts: pd.Series) -> TokenBatch:
    """FancyAnalyzer (analyzers.py:257-295): whitespace-gap tokenize ->
    IntraWordFilter (position-renumbering subword splits) -> lowercase ->
    stop filter (renumbering survivors)."""
    from whoosh_novo_spark.functions.intraword import IntraWord

    iw = IntraWord()
    tok_lists = texts.fillna("").str.split()
    rows: list[int] = []
    terms: list[str] = []
    poss: list[int] = []
    for r, words in enumerate(tok_lists):
        if not words:
            continue
        expanded = iw.apply([(w, i) for i, w in enumerate(words)])
        # lowercase + stop (renumber survivors like StopFilter)
        pos_counter = None
        for text, pos in expanded:
            low = text.lower()
            if len(low) >= MIN_WORD_SIZE and low not in STOP_WORDS:
                if pos_counter is None:
                    pos_counter = pos
                else:
                    pos_counter += 1
                rows.append(r)
                terms.append(low)
                poss.append(pos_counter)
    return TokenBatch(
        np.asarray(rows, dtype=np.int64),
        np.asarray(terms, dtype=object),
        np.asarray(poss, dtype=np.int64),
        len(texts),
    )


ANALYZERS = {
    "standard": standard_analyze_batch,
    "simple": simple_analyze_batch,
    "id": id_analyze_batch,
    "keyword": keyword_analyze_batch,
    "ngram": ngram_analyze_batch,
    "stemming": stemming_analyze_batch,
    "folding": folding_analyze_batch,
    "fancy": fancy_analyze_batch,
}


def analyze_query_terms(text: str, analyzer: str = "standard") -> list[str]:
    """Analyze query text with the same chain (qparser mode='query' uses the
    field analyzer, default.py:206-248). Returns the surviving terms in order."""
    batch = ANALYZERS[analyzer](pd.Series([text]))
    return [str(t) for t in batch.term]


# --- convenience Spark-facing UDF builders -------------------------------

def tokens_udf(analyzer: str = "standard"):
    """pandas UDF: text -> array<string> of analyzed tokens (for textstats,
    golden tests, and ad-hoc use — the build path uses mapInPandas and
    never materializes per-doc arrays)."""
    from pyspark.sql.functions import pandas_udf

    fn = ANALYZERS[analyzer]

    @pandas_udf("array<string>")
    def _tok(s: pd.Series) -> pd.Series:
        tb = fn(s)
        out: list[list[str]] = [[] for _ in range(tb.n_rows)]
        for r, t in zip(tb.row, tb.term):
            out[r].append(t)
        return pd.Series(out)

    return _tok
