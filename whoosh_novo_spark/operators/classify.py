"""Key-term extraction / query expansion (Bo1 / Bo2 / KL models).

Reference: ``whoosh.classify`` — ExpansionModel formulas
(classify.py:39-95), Expander accumulation over top-N docs'
(term, weight) vectors (classify.py:98-160), scoring + normalization +
(-score, term) ordering (classify.py:167-200).

Spark shape: the "vectors" are just postings rows of the top-N docids
(a broadcast semi-join — no forward index needed), the per-term top-N
weights one groupBy, collection frequencies a broadcast terms-table join,
and each model is a closed-form column expression.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOG2 = math.log(2.0)


def _bo1(w_top, cf, N, top_total, coll_total):
    f = cf / F.lit(float(N))
    return (w_top * F.log((1.0 + f) / f) + F.log(1.0 + f)) / F.lit(LOG2)


def _bo2(w_top, cf, N, top_total, coll_total):
    f = w_top * F.lit(float(top_total)) / F.lit(float(coll_total))
    return (w_top * F.log((1.0 + f) / f) + F.log(1.0 + f)) / F.lit(LOG2)


def _kl(w_top, cf, N, top_total, coll_total):
    wit_tt = w_top / F.lit(float(top_total))
    wic_ct = cf / F.lit(float(coll_total))
    kl = wit_tt * F.log(wit_tt / (w_top / F.lit(float(coll_total)))) / F.lit(LOG2)
    return F.when(wit_tt < wic_ct, F.lit(0.0)).otherwise(kl)


_MODELS = {"bo1": _bo1, "bo2": _bo2, "kl": _kl}


def _normalizer(model: str, maxscore: float, top_total: float, N: int, coll_total: float) -> float:
    """classify.py:56-84 normalizer() per model (maxweight == max score)."""
    if model == "bo1":
        if not maxscore:
            return maxscore or 1.0
        f = maxscore / N
        return (maxscore * math.log((1.0 + f) / f) + math.log(1.0 + f)) / LOG2
    if model == "bo2":
        if not coll_total:
            return maxscore or 1.0
        f = maxscore * N / coll_total
        return maxscore * math.log((1.0 + f) / f, 2) + math.log(1.0 + f, 2)
    if model == "kl":
        if not coll_total:
            return maxscore or 1.0
        return maxscore * math.log(coll_total / top_total) / LOG2 * top_total
    raise ValueError(model)


def expanded_terms(
    searcher,
    top_docids: DataFrame | None,
    fieldname: str,
    number: int = 5,
    model: str = "bo1",
    normalize: bool = True,
    docnums: list[int] | None = None,
) -> list[tuple[str, float]]:
    """The N most important terms of the given top documents
    (Expander.expanded_terms, classify.py:167-200).

    ``top_docids``: DataFrame with a ``docid`` column (e.g. from
    ``Searcher.search``).  ``docnums``: alternatively, a driver-side docid
    list — compiled to an IN-list predicate that parquet row-group pruning
    can use, and served from the docid-sorted vectors table when the field
    is vector=True (one row group instead of a postings scan)."""
    ix = searcher.index
    N = ix.doc_count_all
    coll_total = ix.manifest.field_length(fieldname)

    src = None
    if docnums is not None:
        vt = ix.vector_table(fieldname)
        if vt is not None:
            src = vt.where(F.col("docid").isin([int(d) for d in docnums]))
    if src is None:
        base = ix.postings_span(fieldname).where(F.col("field") == fieldname)
        if docnums is not None:
            src = base.where(F.col("docid").isin([int(d) for d in docnums]))
        else:
            src = base.join(
                F.broadcast(top_docids.select("docid")), "docid", "left_semi"
            )
    p = src
    per_term = p.groupBy("term").agg(F.sum("weight").alias("w_top"))
    top_total = per_term.agg(F.sum("w_top")).collect()[0][0] or 0.0
    if not top_total:
        return []

    cf = (
        ix.terms()
        .where(F.col("field") == fieldname)
        .groupBy("term")
        .agg(F.sum("cf").alias("cf"))
    )
    j = per_term.join(cf, "term")
    score = _MODELS[model](F.col("w_top"), F.col("cf"), N, top_total, coll_total)
    scored = j.select("term", score.alias("score"))
    rows = scored.orderBy(F.desc("score"), F.asc("term")).limit(
        max(number * 4, number)
    ).collect()
    if not rows:
        return []
    maxscore = max(r["score"] for r in rows)
    norm = (
        _normalizer(model, maxscore, top_total, N, coll_total)
        if normalize
        else maxscore
    )
    out = [(r["term"], r["score"] / norm) for r in rows]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:number]


def expanded_terms_from_weights(
    searcher,
    weights: dict[str, float],
    fieldname: str,
    number: int = 5,
    model: str = "bo1",
    normalize: bool = True,
) -> list[tuple[str, float]]:
    """Expander.add_text path (classify.py:155-165): the 'top documents'
    vector is a driver-side term->weight map (one analyzed text).  The
    only cluster work is the collection-frequency lookup for those terms;
    scoring is closed-form on the driver (a single doc's vocabulary)."""
    if not weights:
        return []
    ix = searcher.index
    N = ix.doc_count_all
    coll_total = ix.manifest.field_length(fieldname)
    top_total = float(sum(weights.values()))
    stats = searcher._cached_stats([(fieldname, t) for t in weights])

    def score_py(w_top: float, cf: float) -> float:
        if model == "bo1":
            f = cf / N
            return (w_top * math.log((1.0 + f) / f) + math.log(1.0 + f)) / LOG2
        if model == "bo2":
            f = w_top * top_total / coll_total
            return (w_top * math.log((1.0 + f) / f) + math.log(1.0 + f)) / LOG2
        if model == "kl":
            wit_tt = w_top / top_total
            wic_ct = cf / coll_total
            if wit_tt < wic_ct:
                return 0.0
            return wit_tt * math.log(wit_tt / (w_top / coll_total)) / LOG2
        raise ValueError(model)

    tlist = []
    for term, w_top in weights.items():
        st = stats.get((fieldname, term))
        if st is None:
            continue  # term absent from the lexicon is skipped (classify.py:188)
        tlist.append((score_py(float(w_top), float(st.cf)), term))
    if not tlist:
        return []
    maxscore = max(s for s, _ in tlist)
    norm = (
        _normalizer(model, maxscore, top_total, N, coll_total)
        if normalize
        else maxscore
    )
    out = [(t, s / norm) for s, t in tlist]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:number]
