"""Arrow fast tokenizer (r6): _flatten_codes must be token-identical to
_flatten_findall + factorize — ASCII rows ride the RE2 split + phase-2
dot correction, non-ASCII rows the original findall; mixed batches merge
without cross-row interference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import whoosh_novo_spark.functions.analysis as A


def _multiset(row_idx, codes, uniq):
    return sorted(zip(row_idx.tolist(), (uniq[c] for c in codes.tolist())))


def _ref(texts: pd.Series):
    row_idx, flat, _ord = A._flatten_findall(texts)
    return sorted(zip(row_idx.tolist(), flat.tolist()))


TRICKY = [
    "a..b a.b.c 3.141 x. .y ** a*b under_score dotted.token",
    "café straße naïve Ça",  # pure non-ASCII rows -> findall branch
    "mix.éd ascii.then.unicodeé",  # non-ASCII with dots
    "", None, "...", "***", "..a..", "_x_ __ a ONE",
    "tab\tsep\nnewline  spaces",
    "ends with dot. and*star*",
]


@pytest.mark.parametrize(
    "rows",
    [TRICKY, TRICKY[::-1], ["plain ascii only here"] * 5, ["é"] * 3],
    ids=["tricky", "tricky-rev", "ascii-only", "nonascii-only"],
)
def test_flatten_codes_token_identity(rows):
    s = pd.Series(rows, dtype=object)
    row_idx, codes, uniq = A._flatten_codes(s)
    assert _multiset(row_idx, codes, uniq) == _ref(s)


def test_flatten_codes_on_corpus_sample():
    from whoosh_novo_spark.sources.corpus import corpus_pandas

    pdf = corpus_pandas(2000, seed=5, vocab_size=500)  # has accented edge words
    s = pdf["text"]
    row_idx, codes, uniq = A._flatten_codes(s)
    assert _multiset(row_idx, codes, uniq) == _ref(s)
    # within-row order preserved per branch: doc lengths and per-doc tf
    # fall out identical through the aggregate chain
    a_out, a_lens = A._standard_aggregate(s)
    assert int(a_lens.sum()) > 0


def test_aggregate_equals_generic_chain_on_mixed_batch():
    s = pd.Series(TRICKY, dtype=object)
    aggdf, lens = A._standard_aggregate(s)
    tb = A.standard_analyze_batch(s)
    ref = {}
    for r, t in zip(tb.row.tolist(), tb.term.tolist()):
        ref[(r, t)] = ref.get((r, t), 0) + 1
    got = {
        (int(r), t): int(tf)
        for r, t, tf in zip(aggdf["row"], aggdf["term"], aggdf["tf"])
    }
    assert got == ref
    assert lens.tolist() == tb.doc_lengths().tolist()
