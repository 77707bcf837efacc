"""Hybrid retrieval: fuse ranked lists from heterogeneous retrievers
(BM25 index search, ANN / exact cosine similarity) into one ranking.

The reference engine is lexical-only; a training-data / search pipeline at
web scale runs BOTH a lexical top-k (this engine's BM25 path) and a vector
top-k (similarity.py's cosine/IVF/PQ paths) and fuses the shortlists.
Two standard fusers:

- **Reciprocal-Rank Fusion** (Cormack, Clarke & Buettcher, SIGIR 2009):
  ``rrf(d) = sum_i w_i / (k + rank_i(d))``.  Rank-based, so BM25 scores
  and cosine similarities need no calibration; k=60 is the published
  default.
- **Weighted-score fusion** (CombSUM with min-max normalization; Vogt &
  Cottrell 1999): per-source min-max to [0,1], then a convex combination.

Scale: the inputs are top-k shortlists (the expensive work — index scan,
ANN probe — already happened inside each retriever), so fusion is an
O(sources x k) aggregation over tiny DataFrames.  The un-partitioned
row_number window is therefore deliberate: ranking a shortlist is a
single-task job by construction.  Never feed an unbounded scored corpus
through a fuser at scale — cut each source to its serving k first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize(sources, id_col, score_col) -> list[DataFrame]:
    """Project each source to (id, s).  Defaults: first column is the id,
    second is the score — the shape every retriever in this engine returns
    (Searcher.search -> (docid, score), cosine_topk -> (vec_id, cos), ...)."""
    out = []
    for df in sources:
        ic = id_col or df.columns[0]
        sc = score_col or df.columns[1]
        out.append(df.select(F.col(ic).alias("id"), F.col(sc).alias("s")))
    return out


def with_rank(df: DataFrame, id_col: str | None = None,
              score_col: str | None = None) -> DataFrame:
    """(id, s, rank) with rank = 1-based position by (s desc, id asc) —
    the engine's universal tie-break, so equal scores rank deterministically."""
    (n,) = _normalize([df], id_col, score_col)
    w = Window.orderBy(F.desc("s"), F.asc("id"))
    return n.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    sources: list[DataFrame],
    k: int = 60,
    weights: list[float] | None = None,
    limit: int | None = None,
    id_col: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked result lists.

    Returns (id, rrf) ordered rrf desc, id asc.  An id absent from a
    source simply contributes nothing for it (standard RRF).  With <=
    a handful of sources the per-id sum has a fixed tiny operand count,
    so the float64 result is reproducible across engines given identical
    integer ranks — which is what the DuckDB contract row relies on.
    """
    norm = _normalize(sources, id_col, score_col)
    ws = weights or [1.0] * len(norm)
    if len(ws) != len(norm):
        raise ValueError(f"{len(norm)} sources but {len(ws)} weights")
    parts = []
    for df, w in zip(norm, ws):
        win = Window.orderBy(F.desc("s"), F.asc("id"))
        parts.append(
            df.select(
                "id",
                (F.lit(float(w)) / (F.lit(int(k)) + F.row_number().over(win)))
                .alias("contrib"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = (
        u.groupBy("id")
        .agg(F.sum("contrib").alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("id"))
    )
    return out.limit(limit) if limit is not None else out


def weighted_score_fuse(
    sources: list[DataFrame],
    weights: list[float] | None = None,
    limit: int | None = None,
    id_col: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """CombSUM with per-source min-max normalization: each source's scores
    map to [0,1] (a constant-score source maps to 1.0), missing ids count
    as 0, and the fused score is the weighted sum.  Returns (id, fused)
    ordered fused desc, id asc."""
    norm = _normalize(sources, id_col, score_col)
    ws = weights or [1.0] * len(norm)
    if len(ws) != len(norm):
        raise ValueError(f"{len(norm)} sources but {len(ws)} weights")
    parts = []
    for df, w in zip(norm, ws):
        stats = df.agg(
            F.min("s").alias("lo"), F.max("s").alias("hi")
        )  # shortlist-sized: one tiny agg per source
        scaled = df.crossJoin(F.broadcast(stats)).select(
            "id",
            (
                F.lit(float(w))
                * F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
                    (F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo"))
                )
            ).alias("contrib"),
        )
        parts.append(scaled)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = (
        u.groupBy("id")
        .agg(F.sum("contrib").alias("fused"))
        .orderBy(F.desc("fused"), F.asc("id"))
    )
    return out.limit(limit) if limit is not None else out


def rrf_fuse_batch(
    sources: list[DataFrame],
    k: int = 60,
    weights: list[float] | None = None,
    limit: int | None = None,
    qid_col: str | None = None,
    id_col: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """Per-query RRF over BATCHED retriever outputs — the serving-scale
    shape: search_batch (qid, docid, score, ...) x cosine_topk_batch /
    ivf_pq_topk_batch (qid, vec_id, cos, ...) fused in ONE job, one
    window rank per (source, qid) partition (parallel across queries, no
    single-partition funnel).  Defaults: first column is the qid, second
    the id, third the score.  Returns (qid, id, rrf) ordered within each
    qid by rrf desc, id asc; ``limit`` cuts per qid.  Per-qid results are
    identical to rrf_fuse on that query's slices (parity-tested)."""
    norm = []
    for df in sources:
        qc = qid_col or df.columns[0]
        ic = id_col or df.columns[1]
        sc = score_col or df.columns[2]
        norm.append(
            df.select(
                F.col(qc).alias("qid"), F.col(ic).alias("id"), F.col(sc).alias("s")
            )
        )
    ws = weights or [1.0] * len(norm)
    if len(ws) != len(norm):
        raise ValueError(f"{len(norm)} sources but {len(ws)} weights")
    parts = []
    for df, w in zip(norm, ws):
        win = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("id"))
        parts.append(
            df.select(
                "qid",
                "id",
                (F.lit(float(w)) / (F.lit(int(k)) + F.row_number().over(win)))
                .alias("contrib"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = u.groupBy("qid", "id").agg(F.sum("contrib").alias("rrf"))
    if limit is not None:
        wtop = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("id"))
        out = out.withColumn("_r", F.row_number().over(wtop)).where(
            F.col("_r") <= limit
        ).drop("_r")
    return out.orderBy("qid", F.desc("rrf"), F.asc("id"))


def hybrid_search_batch(
    searcher,
    queries: dict,
    embeddings: DataFrame,
    query_vecs: dict,
    k: int = 10,
    shortlist: int = 100,
    rrf_k: int = 60,
    weights: list[float] | None = None,
) -> DataFrame:
    """Batched hybrid serving: ALL lexical queries in one search_batch
    job, ALL vector queries in one cosine_topk_batch scan, one fused
    aggregation — three jobs total for the whole batch, so the per-query
    marginal cost stays milliseconds.  ``queries`` maps qid -> Query AST;
    ``query_vecs`` maps the same qids -> query vector.  A qid present in
    only one map fuses from that side alone (standard RRF)."""
    from whoosh_novo_spark.operators.batch import search_batch
    from whoosh_novo_spark.operators.similarity import cosine_topk_batch

    spark = searcher.index.spark
    bm = search_batch(searcher, queries, limit=shortlist).select(
        "qid", "docid", "score"
    )
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in v]) for qid, v in query_vecs.items()],
        "qid string, qvec array<double>",
    )
    cs = cosine_topk_batch(embeddings, qdf, k=shortlist).select(
        "qid", "vec_id", "cos"
    )
    return rrf_fuse_batch([bm, cs], k=rrf_k, weights=weights, limit=k)


def hybrid_search(
    searcher,
    query,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    rrf_k: int = 60,
    weights: list[float] | None = None,
) -> DataFrame:
    """Lexical BM25 + exact-cosine hybrid: run both retrievers to a
    ``shortlist`` cut, RRF-fuse, return the top ``k`` (id, rrf).

    The vector side swaps freely for an ANN shortlist (ivf_pq_topk etc.)
    since RRF only consumes ranks; this convenience wires the exact path.
    """
    from whoosh_novo_spark.operators.similarity import cosine_topk

    bm = searcher.search(query, limit=shortlist)
    cs = cosine_topk(embeddings, query_vec, k=shortlist)
    return rrf_fuse([bm, cs], k=rrf_k, weights=weights, limit=k)


def static_prior_boost(
    results: DataFrame,
    prior: DataFrame,
    w: float = 1.0,
    id_col: str | None = None,
    score_col: str | None = None,
    prior_id: str | None = None,
    prior_col: str | None = None,
    log_space: bool = True,
    default: float | None = None,
) -> DataFrame:
    """Re-rank a shortlist with a query-INDEPENDENT prior (PageRank,
    host trust, freshness): ``boosted = score + w * prior01`` where
    ``prior01`` is the prior min-max-normalized WITHIN the shortlist
    (in log space by default — PageRank masses span orders of
    magnitude, and classic web ranking adds ``w*log(pagerank)``; the
    within-shortlist normalization makes ``w`` mean "fraction of a
    score unit", self-calibrated like ``weighted_score_fuse``).

    ``results`` is (id, score) — the engine's top-k shape, e.g.
    ``Searcher.search`` output joined to stored urls and mapped to a
    host key when the prior is host-level (``linkgraph.pagerank`` over
    ``host_graph``; see tests).  ``prior`` is (key, value); ids with no
    prior row get ``default`` (when None, the smallest prior in the
    shortlist — i.e. no boost, never a crash on log(0)).

    Scale: the shortlist is k rows and is explicitly broadcast, so the
    join against a big prior table is one broadcast-hash probe with no
    shuffle of the prior side.  A PAGE-granularity prior over 10^12
    docs should instead be written as a docmap column at build time and
    boosted in-plan; this operator is for the host/domain-granularity
    priors that stay join-sized.  All equal priors => ranking unchanged.
    """
    ic = id_col or results.columns[0]
    sc = score_col or results.columns[1]
    pi = prior_id or prior.columns[0]
    pc = prior_col or prior.columns[1]
    r = results.select(F.col(ic).alias("id"), F.col(sc).alias("s"))
    p = prior.select(F.col(pi).alias("id"), F.col(pc).cast("double").alias("p"))
    # r-preserving outer join CAN'T broadcast its preserved side (Spark
    # broadcast-hash builds the non-preserved side only), so: inner join
    # with the k-row shortlist broadcast (one shuffle-free probe of the
    # prior table), then union the unmatched shortlist rows back.
    matched = p.join(F.broadcast(r), "id").select("id", "s", "p")
    missing = r.join(
        F.broadcast(matched.select("id")), "id", "left_anti"
    ).withColumn("p", F.lit(None).cast("double"))
    joined = matched.unionByName(missing)
    floor = F.min("p") if default is None else F.lit(float(default))
    stats = joined.agg(floor.alias("dflt"))
    j = joined.crossJoin(F.broadcast(stats)).select(
        "id", "s", F.coalesce("p", "dflt").alias("p")
    )
    val = F.log(F.col("p")) if log_space else F.col("p")
    j = j.withColumn("v", val)
    mm = j.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    out = j.crossJoin(F.broadcast(mm)).select(
        "id",
        (
            F.col("s")
            + F.lit(float(w))
            * F.coalesce(  # all-missing / non-positive-prior rows: no boost
                F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
                    (F.col("v") - F.col("lo")) / (F.col("hi") - F.col("lo"))
                ),
                F.lit(0.0),
            )
        ).alias("boosted"),
    )
    return out.orderBy(F.desc("boosted"), F.asc("id"))
