"""Positional (span) queries: the general phrase kernel.

Reference: ``Phrase`` compiles to ``SpanNear2(terms, slop, ordered=True,
mindist=1)`` (positional.py:237-271); a doc matches when the iterative
span-combination yields a non-empty span set (spans.py:652-700), and the
score is the wrapped IntersectionMatcher's score — i.e. the SUM of the
phrase words' BM25 scores, counting duplicate words once per occurrence in
the phrase (spans.py:630-640: one matcher per phrase word).

Span algebra replicated exactly (spans.py:55-191):
- a term occurrence is the span (pos, pos)
- combining a with b keeps (a.start, b.end) when
  ``mindist <= dist <= slop`` with dist = 0 if overlapping else
  b.start - a.end (ordered), and ordered requires a.start <= b.start.

Spark plan: the docid-set prefilter is the flat AND single-scan path
(cheap, distributed); only candidate docs' position arrays flow into a
per-doc Arrow kernel (applyInPandas over docid groups).  Phrase words are
typically rare enough that candidates ≪ corpus; the kernel never sees
non-matching docs' positions.
"""

from __future__ import annotations

from bisect import bisect_left

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_novo_spark.plans import ast


def _combine_spans(
    pos_lists: list[list[int]], slop: int, ordered: bool, mindist: int
) -> bool:
    """SpanNear2Matcher._get_spans (spans.py:652-700), boolean variant."""
    aspans = [(p, p) for p in pos_lists[0]]
    i = 1
    while i < len(pos_lists) and aspans:
        bspans = [(p, p) for p in pos_lists[i]]
        spans = set()
        starts = [b[0] for b in bspans]
        for a_start, a_end in aspans:
            start = a_start if ordered else max(0, a_start - slop)
            j = bisect_left(starts, start)
            while j < len(bspans):
                b_start, b_end = bspans[j]
                j += 1
                if b_end < a_start - slop or (ordered and a_start > b_start):
                    continue
                if b_start > a_end + slop:
                    break
                # distance_to (spans.py:169-175)
                if not (b_start > a_end or a_start > b_end):  # overlaps
                    dist = 0
                elif a_end < b_start:
                    dist = b_start - a_end
                else:
                    dist = a_start - b_end
                if mindist <= dist <= slop:
                    spans.add((min(a_start, b_start), max(a_end, b_end)))
        aspans = sorted(spans)
        i += 1
    return bool(aspans) and i == len(pos_lists)


def phrase_with_slop(searcher, q: ast.Phrase, stats) -> DataFrame:
    """General phrase path (any slop, duplicate words)."""
    ix = searcher.index
    spark = ix.spark
    empty = spark.createDataFrame([], "docid long, score double")
    words = list(q.words)
    uniq = sorted(set(words))
    word_counts = {w: words.count(w) for w in uniq}
    if any(stats.get((q.fieldname, w)) is None for w in uniq):
        return empty  # Phrase shortcuts to Null on a missing word
                      # (positional.py:258-261)

    # stage 1: distributed prefilter — docs containing ALL distinct words,
    # with per-(doc,word) scores and positions in one scan
    cnt_map = F.create_map(
        *[F.lit(x) for w in uniq for x in (w, float(word_counts[w]))]
    )
    p = ix.postings().where(
        (F.col("field") == q.fieldname) & F.col("term").isin(uniq)
    )
    score = searcher._terms_score_col(
        q.fieldname, [(w, stats[(q.fieldname, w)], 1.0) for w in uniq]
    )
    # duplicate phrase words score once per phrase occurrence (one matcher
    # per word in SpanNear2Matcher)
    rows = p.select(
        "docid",
        "term",
        (score * cnt_map[F.col("term")]).alias("score"),
        "positions",
    )
    n = len(uniq)
    cand = (
        rows.groupBy("docid")
        .agg(
            F.count(F.lit(1)).alias("_nc"),
            F.sum("score").alias("score"),
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("posmap"),
        )
        .where(F.col("_nc") == n)
    )

    return _span_filter(cand, words, q.slop, True, 1)


def _span_filter(
    cand: DataFrame, words: list[str], slop: int, ordered: bool, mindist: int
) -> DataFrame:
    """mapInPandas filter: each candidate row carries all its position
    lists, so the span check is partition-local — no extra shuffle beyond
    the candidate aggregation itself."""

    def kernel(batches):
        for pdf in batches:
            keep = [
                _combine_spans(
                    [sorted(posmap[w]) for w in words], slop, ordered, mindist
                )
                for posmap in pdf["posmap"]
            ]
            yield pdf.loc[keep, ["docid", "score"]]

    return cand.select("docid", "score", "posmap").mapInPandas(
        kernel, "docid long, score double"
    )


def spannear2(
    searcher,
    fieldname: str,
    words: list[str],
    slop: int = 1,
    ordered: bool = True,
    mindist: int = 1,
) -> DataFrame:
    """Direct SpanNear2 over term words (spans.py:530-700)."""
    q = ast.Phrase(fieldname, tuple(words), slop=slop)
    stats = searcher._cached_stats([(fieldname, w) for w in set(words)])
    ix = searcher.index
    if any(stats.get((fieldname, w)) is None for w in set(words)):
        return ix.spark.createDataFrame([], "docid long, score double")
    if ordered and mindist == 1:
        return phrase_with_slop(searcher, q, stats)
    # unordered / custom mindist variant: same plan, different kernel params
    uniq = sorted(set(words))
    p = ix.postings().where((F.col("field") == fieldname) & F.col("term").isin(uniq))
    score = searcher._terms_score_col(
        fieldname, [(w, stats[(fieldname, w)], 1.0) for w in uniq]
    )
    rows = p.select("docid", "term", score.alias("score"), "positions")
    cand = (
        rows.groupBy("docid")
        .agg(
            F.count(F.lit(1)).alias("_nc"),
            F.sum("score").alias("score"),
            F.map_from_entries(F.collect_list(F.struct("term", "positions"))).alias("posmap"),
        )
        .where(F.col("_nc") == len(uniq))
    )

    return _span_filter(cand, list(words), slop, ordered, mindist)
