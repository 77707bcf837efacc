"""Corpus data card: one summary dict for a documents table — the
"datasheet" numbers every released dataset publishes (counts, length
distribution, language mix, duplication rate, quality signals, top
domains).

Designed for few jobs, not many: one scalar aggregation row carries
every sum/mean/distinct-count, one approxQuantile call carries the
length distribution, and the optional top-K breakdowns are one bounded
groupBy each.  Everything is JVM-side expressions from
functions/textstats; the result is a plain JSON-able dict.

Scale notes (100 TB lens): the scalar agg and quantile sketch are
map-side-combined single passes; `count_distinct` over the doc
fingerprint is the one vocabulary-cardinality shuffle (exact dup-rate
— swap in approx_count_distinct via ``exact_dups=False`` when a 2%
sketch is enough, which at data-card scale it usually is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.textstats import (
    fingerprint,
    quality_score,
    token_count,
)
from whoosh_novo_spark.functions.urls import url_host


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    url_col: str | None = None,
    top_k: int = 10,
    exact_dups: bool = True,
) -> dict:
    """Returns the data-card dict: ``n_docs``, ``n_chars``,
    ``n_tokens``, ``mean_quality``, ``dup_rate`` (1 - distinct
    fingerprints / docs), ``token_quantiles`` (p10/p50/p90/p99), plus
    ``languages`` (share by ``lang_col``) and ``top_domains`` (by
    ``url_col``) when those columns are named."""
    t = F.col(text_col)
    fp = fingerprint(text_col)
    distinct_fp = (
        F.count_distinct(fp) if exact_dups else F.approx_count_distinct(fp)
    )
    row = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(t)).alias("n_chars"),
        F.sum(token_count(text_col)).alias("n_tokens"),
        F.avg(quality_score(text_col)).alias("mean_quality"),
        distinct_fp.alias("n_distinct"),
    ).collect()[0]
    n_docs = row["n_docs"] or 0
    report: dict = {
        "n_docs": int(n_docs),
        "n_chars": int(row["n_chars"] or 0),
        "n_tokens": int(row["n_tokens"] or 0),
        "mean_quality": round(float(row["mean_quality"] or 0.0), 4),
        "dup_rate": round(1.0 - (row["n_distinct"] / n_docs), 4) if n_docs else 0.0,
    }
    if n_docs:
        q = docs.select(token_count(text_col).cast("double").alias("tc")).approxQuantile(
            "tc", [0.1, 0.5, 0.9, 0.99], 0.001
        )
        report["token_quantiles"] = {
            "p10": int(q[0]), "p50": int(q[1]), "p90": int(q[2]), "p99": int(q[3])
        }
    if lang_col is not None and n_docs:
        rows = (
            docs.groupBy(lang_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc(lang_col))
            .limit(top_k)
            .collect()
        )
        report["languages"] = {r[lang_col]: round(r["n"] / n_docs, 4) for r in rows}
    if url_col is not None and n_docs:
        rows = (
            docs.groupBy(url_host(F.col(url_col)).alias("host"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("host"))
            .limit(top_k)
            .collect()
        )
        report["n_top_domains_docs"] = int(sum(r["n"] for r in rows))
        report["top_domains"] = {r["host"]: int(r["n"]) for r in rows}
    return report
