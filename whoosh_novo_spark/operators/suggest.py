"""Spelling suggestions from the indexed lexicon.

Reference: ``whoosh.spelling.ReaderCorrector`` (spelling.py:89-117) —
candidates are terms within ``maxdist`` edits (sharing ``prefix`` leading
chars), scored ``-(maxdist + 0.5/frequency)`` so ranking is frequency
desc, then term asc (spelling.py:109-116; the automaton lexicon walk
becomes a levenshtein predicate over the terms table, which Catalyst
evaluates with pushdown on the field + prefix)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest(
    index,
    fieldname: str,
    text: str,
    limit: int = 5,
    maxdist: int = 2,
    prefix: int = 0,
) -> list[str]:
    df = suggest_df(index, fieldname, text, limit, maxdist, prefix)
    return [r["term"] for r in df.collect()]


def suggest_df(
    index,
    fieldname: str,
    text: str,
    limit: int = 5,
    maxdist: int = 2,
    prefix: int = 0,
) -> DataFrame:
    t = (
        # suggestion scans the field's whole lexicon (levenshtein can't
        # bound the term range); pruning still drops other fields' files
        index.terms_span(fieldname=fieldname)
        .where(F.col("field") == fieldname)
        .groupBy("term")
        .agg(F.sum("cf").alias("freq"))
    )
    cond = (F.col("term") != text) & (
        F.levenshtein(F.col("term"), F.lit(text)) <= maxdist
    )
    if prefix:
        cond = cond & (F.col("term").startswith(text[:prefix]))
    # score = -(maxdist + 0.5/freq)  (spelling.py:113-116)
    score = -(
        F.lit(float(maxdist))
        + F.lit(0.5) / F.greatest(F.col("freq"), F.lit(1.0))
    )
    return (
        t.where(cond)
        .select("term", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(limit)
    )
