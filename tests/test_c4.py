"""C4 cleaning rules: per-rule line goldens (terminal punctuation,
min words, javascript), page-level drops (sentences, lorem ipsum,
curly brace, blocklist), paper ordering (page rules see line-filtered
text), UDF-free plan, real-corpus smoke."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.c4 import c4_clean_lines, c4_filter

SF = "/root/testdata/sf0.001"


def _clean(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(c4_clean_lines("t", **kw).alias("v")).collect()[0]["v"]


def test_line_rules(spark):
    text = "\n".join(
        [
            "This line has enough words and ends properly.",   # kept
            "No terminal punctuation here at all",              # dropped: no punct
            "Too short.",                                       # dropped: < 5 words
            'He said "stop right there now!"',                  # kept: quote after !
            "Enable JavaScript to view the comments.",          # dropped: javascript
            "Is this a question with many words?",              # kept
        ]
    )
    got = _clean(spark, text)
    assert got == "\n".join(
        [
            "This line has enough words and ends properly.",
            'He said "stop right there now!"',
            "Is this a question with many words?",
        ]
    )
    assert _clean(spark, text, min_words_per_line=9) == ""
    assert _clean(spark, None) == ""


def test_page_rules(spark):
    good = (
        "The first sentence is here today.\n"
        "The second sentence arrives promptly now.\n"
        "The third sentence completes the page."
    )
    rows = [
        (0, good),
        (1, "Just one good sentence lives here."),                      # < 3 sentences
        (2, good + "\nAnd also some lorem ipsum filler text appears."),  # lorem ipsum
        (3, good.replace("today", "today {")),                          # curly brace
        (4, good.replace("promptly", "badword")),                       # blocklist
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in c4_filter(df, blocklist=["BadWord"]).collect())
    assert kept == [0]
    # without a blocklist doc 4 passes
    kept2 = sorted(r["doc_id"] for r in c4_filter(df).collect())
    assert kept2 == [0, 4]


def test_page_rules_see_line_filtered_text(spark):
    """A page with 3 sentences of chrome but only 1 surviving real
    sentence is dropped — the paper's ordering."""
    text = (
        "Cookie notice short.\n"          # dropped line (< 5 words)
        "Menu item thing short.\n"        # dropped line
        "Only this single sentence here survives the line pass."
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    assert c4_filter(df).count() == 0


def test_udf_free_plan(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = c4_filter(df, blocklist=["a"])._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_real_corpus_smoke(spark):
    """The synthetic corpus is punctuation-free single-line word soup —
    C4's terminal-punctuation rule correctly rejects ALL of it (that is
    the rule working, not a bug); a planted prose doc survives."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    assert c4_filter(docs, min_words_per_line=3, min_sentences=1).count() == 0
    prose = spark.createDataFrame(
        [(10**9, "A real sentence lives right here.\nAnd a second one follows it.")],
        "doc_id long, text string",
    )
    kept = c4_filter(docs.unionByName(prose), min_words_per_line=3, min_sentences=1)
    assert [r["doc_id"] for r in kept.collect()] == [10**9]
