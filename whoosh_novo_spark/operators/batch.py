"""Batch query evaluation: many top-k queries in ONE Spark job.

The reference evaluates queries one at a time on one core
(searching.py:772-859).  At cluster scale the right shape for a query *set*
is a single pass: a tiny broadcast frame of (qid, term, factor) joined into
one postings scan, one (qid, docid) aggregation, and a per-qid top-k
window.  Per-query work amortizes to near zero; the postings scan reads
each needed term's posting list exactly once even if many queries share
terms.

Supports the flat boolean shapes of the reference query set — Term,
And/Or/DisjunctionMax over Terms (FIXTURES.md §2).  Arbitrary nested trees
fall back to ``Searcher.search`` per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.query import Searcher
from whoosh_novo_spark.plans import ast


def _flatten(q: ast.Query) -> tuple[str, list[ast.Term]] | None:
    """(qtype, term leaves) for flat shapes, else None."""
    qn = q.normalize()
    if isinstance(qn, ast.Term):
        return "or", [qn]
    if isinstance(qn, (ast.And, ast.Or, ast.DisjunctionMax)):
        if not all(isinstance(c, ast.Term) for c in qn.children):
            return None
        if isinstance(qn, ast.Or) and qn.minmatch and qn.minmatch > 1:
            return None
        kind = {ast.And: "and", ast.Or: "or", ast.DisjunctionMax: "dismax"}[type(qn)]
        return kind, list(qn.children)
    return None


def search_batch(
    searcher: Searcher,
    queries: dict[str, ast.Query],
    limit: int = 10,
    stats_mode: str = "auto",
) -> DataFrame:
    """Evaluate all queries; returns (qid, docid, score, rank) with
    rank 1..limit per qid ordered (score desc, docid asc) — identical
    per-query results to Searcher.search.

    ``stats_mode``: "cached" (the default via "auto") pre-fetches stats
    in one bounded driver lookup and bakes literal factors into the
    broadcast map; "joined" computes the idf stats with a broadcast join
    against the terms table INSIDE the one batch job.  Measured on the
    600k scaling harness the joined plan is ~8% SLOWER end-to-end (the
    in-plan stats query-stage + per-segment fold cost more than the
    1.3 s driver lookup they replace), so "auto" resolves to cached;
    "joined" stays available for clusters where a driver round-trip to
    the terms table is expensive (e.g. remote object storage)."""
    ix = searcher.index
    spark = ix.spark

    flat: dict[str, tuple[str, list[ast.Term]]] = {}
    fallback: dict[str, ast.Query] = {}
    for qid, q in queries.items():
        sh = _flatten(q)
        if sh is None:
            fallback[qid] = q
        else:
            flat[qid] = sh

    model = searcher.model
    if not model.separable():
        # non-separable models can't share one base expression across the
        # broadcast map; evaluate per query instead
        fallback.update({qid: queries[qid] for qid in flat})
        flat = {}

    fieldnames = sorted({t.fieldname for _, ts in flat.values() for t in ts})
    joined = stats_mode == "joined" and all(
        ix.config.field(f).scorable and searcher._supports_joined_stats(f)
        for f in fieldnames
    )

    parts: list[DataFrame] = []
    if flat:
        # internal INT query ids: the (qid x posting) fanout pushes tens of
        # millions of rows through join-hash, agg-hash and shuffle — an
        # int key is materially cheaper than a repeated string; the
        # string qid is re-attached after the top-k filter (tiny)
        qno_of = {qid: i for i, qid in enumerate(flat)}
        stats = None
        if not joined:
            pairs = sorted(
                {(t.fieldname, t.text) for _, ts in flat.values() for t in ts}
            )
            stats = searcher._cached_stats(list(pairs))
        qt_rows = []
        qmeta_rows = []
        for qid, (kind, ts) in flat.items():
            n = len(ts)
            present = 0
            for t in ts:
                if joined:
                    # presence/idf resolved in-plan by the stats join;
                    # the map carries only the per-term boost
                    qt_rows.append((qno_of[qid], t.fieldname, t.text, float(t.boost)))
                    continue
                st = stats.get((t.fieldname, t.text))
                if st is None:
                    continue
                present += 1
                scorable = ix.config.field(t.fieldname).scorable
                factor = (
                    model.factor(searcher, t.fieldname, st) if scorable else 1.0
                ) * t.boost
                qt_rows.append((qno_of[qid], t.fieldname, t.text, float(factor)))
            qmeta_rows.append((qno_of[qid], kind, n, present))
        if not joined:
            # drop AND queries with absent required terms before the big
            # scan — known driver-side here, so filter the PYTHON rows
            # instead of paying a broadcast + semi join in the plan
            # (joined mode relies on the post-agg _nc == n_terms check
            # instead — absence is not known driver-side there)
            dead = {
                qno
                for qno, kind, n, present in qmeta_rows
                if kind == "and" and present < n
            }
            if dead:
                qt_rows = [r for r in qt_rows if r[0] not in dead]
                qmeta_rows = [r for r in qmeta_rows if r[0] not in dead]
        qt = spark.createDataFrame(
            qt_rows, "qno int, field string, term string, factor double"
        )
        # per-query metadata (qtype / required-term count / string qid):
        # for small batches these ride as literal MAPs on the aggregate
        # instead of two broadcast joins + two createDataFrame round
        # trips (r6 — measured ~0.3-0.5 s of the cold batch50 plan);
        # big batches keep the joins so codegen never sees a giant map
        lit_meta = len(qmeta_rows) <= 256
        qmeta = None
        if not lit_meta:
            qmeta = spark.createDataFrame(
                qmeta_rows, "qno int, qtype string, n_terms int, present int"
            )

        texts = sorted({t for _, _, t, _ in qt_rows})
        p = ix.postings_span_pairs(
            [(f, t) for f in fieldnames for t in texts]
        ).where(F.col("field").isin(fieldnames) & F.col("term").isin(texts))
        # one scan x broadcast join: each posting row fans out only to the
        # queries that contain its term
        w, flq = F.col("weight"), F.col("len_q")
        if joined:
            # (field, term, df, cf) broadcast side folded across segments
            sides = []
            by_field: dict[str, list[str]] = {}
            for _, f, t, _ in qt_rows:
                by_field.setdefault(f, []).append(t)
            for f in fieldnames:
                agg = searcher._term_stats_agg(f, sorted(set(by_field[f])))
                sides.append(agg.select(F.lit(f).alias("field"), "term", "df", "cf"))
            stats_side = sides[0]
            for s_ in sides[1:]:
                stats_side = stats_side.unionByName(s_)
            p = p.join(F.broadcast(stats_side), ["field", "term"])
            dfc, cfc = F.col("df").cast("double"), F.col("cf")
            if len(fieldnames) == 1:
                base = model.score_col_stats(
                    searcher, fieldnames[0], w, flq, dfc, cfc
                )
            else:
                base = None
                for f in fieldnames:
                    b = model.score_col_stats(searcher, f, w, flq, dfc, cfc)
                    base = (
                        F.when(F.col("field") == f, b)
                        if base is None
                        else base.when(F.col("field") == f, b)
                    )
        elif len(fieldnames) == 1:
            base = (
                model.base_col(searcher, fieldnames[0], w, flq)
                if ix.config.field(fieldnames[0]).scorable
                else w
            )
        else:
            base = None
            for f in fieldnames:
                b = (
                    model.base_col(searcher, f, w, flq)
                    if ix.config.field(f).scorable
                    else w
                )
                base = (
                    F.when(F.col("field") == f, b)
                    if base is None
                    else base.when(F.col("field") == f, b)
                )
        j = p.join(F.broadcast(qt), ["field", "term"])
        scored = j.select(
            "qno", "docid", (base * F.col("factor")).alias("score")
        )
        import os as _os

        if _os.environ.get("WNS_BATCH_ONE_SHUFFLE", "0") == "1":
            # MEASURED NEGATIVE (r5, VERDICT r4 task #6 A/B, kept as an
            # opt-in for shuffle-bound clusters): hash partitioning on
            # qno alone satisfies both the groupBy(qno, docid)
            # ClusteredDistribution (subset rule) and the top-k window's
            # partitionBy(qno), collapsing two exchanges to one — but
            # interleaved same-session medians at the 1M index /
            # 50-query batches were 2.84 s (two-shuffle) vs 2.86 s
            # (one-shuffle): AQE already coalesces the small second
            # exchange, and the single-key shuffle forgoes map-side
            # (qno, docid) combining.  Results identical up to fp
            # summation order (<=3 ulp).  Full A/B in
            # BENCH/BASELINE.md §r5.
            scored = scored.repartition("qno")
        grouped = scored.groupBy("qno", "docid").agg(
            F.sum("score").alias("_sum"),
            F.max("score").alias("_max"),
            F.count(F.lit(1)).alias("_nc"),
        )
        if lit_meta:
            m_type = F.create_map(
                *[F.lit(x) for qno, qtype, _n, _p in qmeta_rows for x in (qno, qtype)]
            )
            m_n = F.create_map(
                *[F.lit(x) for qno, _qt, n, _p in qmeta_rows for x in (qno, n)]
            )
            agg = grouped.where(
                (m_type[F.col("qno")] != "and")
                | (F.col("_nc") == m_n[F.col("qno")])
            )
            res = agg.select(
                "qno",
                "docid",
                F.when(m_type[F.col("qno")] == "dismax", F.col("_max"))
                .otherwise(F.col("_sum"))
                .alias("score"),
            )
        else:
            agg = grouped.join(F.broadcast(qmeta), "qno").where(
                (F.col("qtype") != "and") | (F.col("_nc") == F.col("n_terms"))
            )
            res = agg.select(
                "qno",
                "docid",
                F.when(F.col("qtype") == "dismax", F.col("_max"))
                .otherwise(F.col("_sum"))
                .alias("score"),
            )
        w_ = Window.partitionBy("qno").orderBy(F.desc("score"), F.asc("docid"))
        topk = res.withColumn("rank", F.row_number().over(w_)).where(
            F.col("rank") <= limit
        )
        if lit_meta:
            m_qid = F.create_map(
                *[F.lit(x) for q, n in qno_of.items() for x in (n, q)]
            )
            parts.append(
                topk.select(
                    m_qid[F.col("qno")].alias("qid"), "docid", "score", "rank"
                )
            )
        else:
            names = spark.createDataFrame(
                [(n, q) for q, n in qno_of.items()], "qno int, qid string"
            )
            parts.append(
                topk.join(F.broadcast(names), "qno").select(
                    "qid", "docid", "score", "rank"
                )
            )

    for qid, q in fallback.items():
        r = searcher.search(q, limit=limit)
        parts.append(
            r.select(
                F.lit(qid).alias("qid"),
                "docid",
                "score",
                F.row_number()
                .over(Window.orderBy(F.desc("score"), F.asc("docid")))
                .alias("rank"),
            )
        )

    if not parts:
        return spark.createDataFrame([], "qid string, docid long, score double, rank int")
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out
