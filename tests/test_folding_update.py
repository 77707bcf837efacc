"""Accent-folding analyzer and update_document semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from whoosh_novo_spark.functions.analysis import folding_analyze_batch, ngram_analyze_batch


def test_folding_analyzer():
    tb = folding_analyze_batch(pd.Series(["Café naïve Zürich straße piñata"]))
    assert list(tb.term) == ["cafe", "naive", "zurich", "straße", "pinata"]
    # ß is not a combining-mark case; whoosh's accent_map also maps it —
    # documented divergence: NFKD keeps ß (charset-table folding would
    # give 'ss'); acceptable for the folding variant


def test_folding_matches_reference_charset(whoosh_ref):
    """Token parity with the reference CharsetFilter(accent_map) chain on
    common Latin accents."""
    from whoosh.analysis import CharsetFilter, LowercaseFilter, RegexTokenizer, StopFilter
    from whoosh.support.charset import accent_map

    chain = RegexTokenizer() | LowercaseFilter() | StopFilter() | CharsetFilter(accent_map)
    texts = ["Café piñata résumé naïve São Paulo", "éèêë áàâä úùûü óòôö"]
    for text in texts:
        ref = [t.text for t in chain(text)]
        tb = folding_analyze_batch(pd.Series([text]))
        assert list(tb.term) == ref, text


def test_ngram_field_matches_reference(whoosh_ref):
    """NGRAMWORDS-style grams equal the reference NgramWordAnalyzer."""
    from whoosh.analysis import NgramWordAnalyzer

    na = NgramWordAnalyzer(minsize=2, maxsize=3)
    texts = ["hello spark", "Tokenize ME"]
    for text in texts:
        ref = [t.text for t in na(text)]
        tb = ngram_analyze_batch(pd.Series([text]), minsize=2, maxsize=3)
        assert sorted(tb.term) == sorted(ref), text


def test_update_documents(spark, tmp_path):
    from pyspark.sql import functions as F

    from whoosh_novo_spark.operators.merge import update_documents
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    store = SegmentStore(str(tmp_path))
    df1 = spark.createDataFrame(
        [("u1", "old version about render"), ("u2", "stable doc shade"),
         ("u3", "another render doc")],
        "url string, text string",
    )
    update_documents(spark, store, cfg, df1)
    df2 = spark.createDataFrame(
        [("u1", "new version about texture"), ("u4", "brand new shade doc")],
        "url string, text string",
    )
    m = update_documents(spark, store, cfg, df2)
    assert m.has_tombstones and m.deleted_count == 1

    ix = Index(spark, store, cfg)
    s = Searcher(ix)
    # u1's old content no longer matches; its new content does
    render_urls = {
        r["url"]
        for r in s.fetch(s.search(ast.Term("text", "render"), limit=None), ["url"]).collect()
    }
    texture_urls = {
        r["url"]
        for r in s.fetch(s.search(ast.Term("text", "texture"), limit=None), ["url"]).collect()
    }
    shade_urls = {
        r["url"]
        for r in s.fetch(s.search(ast.Term("text", "shade"), limit=None), ["url"]).collect()
    }
    assert render_urls == {"u3"}
    assert texture_urls == {"u1"}
    assert shade_urls == {"u2", "u4"}
