"""r6: tf-aggregated analyzer fast paths == token-stream groupby.

The build's stage-2 analysis for positions-free fields now routes
standard/stemming/lang_* chains through ``_standard_aggregate`` (factorize +
integer-key unique) instead of a per-token pandas groupby; these gates pin
(row, term, tf) + doc-length identity against the token-stream chains the
goldens already verify."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from whoosh_novo_spark.functions.analysis import (
    AGGREGATE_ANALYZERS,
    ANALYZERS,
    standard_aggregate_batch,
    stemming_aggregate_batch,
)

TEXTS = [
    "Spark the DATA and data of query querying rows",
    "a an the of x y z",  # all stopped or 1-char
    "",
    "café straße Ça naïve dotted.token under_score CamelCase",
    "merge merge merge merged merges merging MERGE",
    None,
    "w00001 w00001 render shade texture render",
]


def _ref(analyzer: str, s: pd.Series):
    tb = ANALYZERS[analyzer](s)
    ref = (
        pd.DataFrame({"row": tb.row, "term": tb.term, "pos": tb.pos})
        .groupby(["row", "term"], sort=False)
        .agg(tf=("pos", "size"))
        .reset_index()
        .sort_values(["row", "term"])
        .reset_index(drop=True)
    )
    return ref, tb.doc_lengths()


@pytest.mark.parametrize(
    "analyzer,agg_fn",
    [
        ("standard", standard_aggregate_batch),
        ("stemming", stemming_aggregate_batch),
        ("lang_de", AGGREGATE_ANALYZERS["lang_de"]),
        ("lang_en", AGGREGATE_ANALYZERS["lang_en"]),
        ("lang_zh", AGGREGATE_ANALYZERS["lang_zh"]),  # no stops, no stemmer
    ],
)
def test_aggregate_equals_token_stream(analyzer, agg_fn):
    s = pd.Series(TEXTS, dtype=object)
    ref, ref_lens = _ref(analyzer, s)
    got, lens = agg_fn(s)
    got = got.sort_values(["row", "term"]).reset_index(drop=True)
    assert list(got["row"]) == list(ref["row"])
    assert list(got["term"]) == list(ref["term"])
    assert list(got["tf"]) == list(ref["tf"])
    assert list(lens) == list(ref_lens)


def test_aggregate_rows_ascending_for_first_of_row():
    """build.py's _true_len emission requires the aggregate output's row
    column to be a sorted run sequence."""
    got, _ = standard_aggregate_batch(pd.Series(TEXTS, dtype=object))
    rows = got["row"].to_numpy(dtype=np.int64)
    assert (np.diff(rows) >= 0).all()


def test_stem_collision_merges_tf():
    """Two distinct tokens stemming to the same term in one doc must merge
    into a single posting with summed tf (token-stream semantics)."""
    s = pd.Series(["query queries querying"], dtype=object)
    got, lens = stemming_aggregate_batch(s)
    assert list(got["term"]) == ["queri"]
    assert list(got["tf"]) == [3]
    assert list(lens) == [3]
