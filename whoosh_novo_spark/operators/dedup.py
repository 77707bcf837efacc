"""Deduplication operators for large-scale training-data pipelines.

All deterministic and (except simhash) built purely from JVM-side SQL
expressions, with md5-based hashing reproducible in DuckDB so the driver
oracle can recompute signatures bit-for-bit:

- exact_duplicates: canonical-text fingerprint groupBy (hash-groupBy dedup)
- shingles / ngram_jaccard_pairs: exact k-word-shingle Jaccard join
- minhash_signatures / lsh_candidate_pairs: MinHash + banded LSH —
  the scale path (candidate generation without the quadratic join)
- simhash: 64-bit SimHash via a vectorized pandas UDF (bit-level ops are
  the one place SQL is the wrong tool); near-dup = small Hamming distance
- embedding near-dup lives in operators/similarity.py

Scale notes: shingle explode -> groupBy is shuffle-heavy but linear;
LSH buckets join on (band, band_hash) so only same-bucket pairs shuffle.
Head shingles (boilerplate) are the skew risk — ngram_jaccard_pairs caps
per-shingle fanout with a document-frequency filter, the standard guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.textstats import fingerprint, hash64, tokens_sql


def exact_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ids: int | None = None,
) -> DataFrame:
    """Groups of docs with identical normalized token streams.
    Returns (fp, n, ids sorted) for groups with n >= 2.

    ``max_ids`` bounds the per-group array for the 100 TB path (VERDICT
    r3 #3: a boilerplate page duplicated 10^7 times must not become one
    multi-GB row).  The cap is applied BEFORE the collect aggregation
    (rank-filter inside the same shuffle), so the agg buffer itself is
    bounded — a post-hoc slice() would still materialize the full array.
    ``n`` always counts the whole group.  For keep-first dedup at scale
    use ``exact_duplicate_stats`` (no arrays at all)."""
    fp = docs.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
    if max_ids is None:
        return (
            fp.groupBy("fp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sort_array(F.collect_list("id")).alias("ids"),
            )
            .where(F.col("n") >= 2)
        )
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("id")
    ranked = fp.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sort_array(
                F.collect_list(F.when(F.col("_rn") <= max_ids, F.col("id")))
            ).alias("ids"),
        )
        .where(F.col("n") >= 2)
    )


def exact_duplicate_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Array-free exact-dup summary for the scale path: (fp, n, keep)
    with keep = min(id) — everything keep-first dedup needs.  Pure
    hash-groupBy with map-side partial aggregation; no per-group state
    beyond two scalars, so pathological boilerplate groups cost O(1)
    memory."""
    fp = docs.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("keep"))
        .where(F.col("n") >= 2)
    )


def shingle_array_udf(k: int = 3):
    """Arrow-batched distinct-k-shingle generator: text -> array<string>
    (the row-wise building block shared by shingles() and the
    streaming-safe row-wise MinHash signatures)."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    rx = _re.compile(r"[\w*]+(?:\.?[\w*]+)*", _re.ASCII)

    def sh_fn(s: pd.Series) -> pd.Series:
        out = []
        for text in s.fillna(""):
            toks = [t.lower() for t in rx.findall(text)]
            if len(toks) < k:
                out.append([])
                continue
            out.append(
                list(
                    dict.fromkeys(
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    )
                )
            )
        return pd.Series(out, dtype=object)

    return pandas_udf(sh_fn, "array<string>")


def shingles(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3, impl: str = "pandas"
) -> DataFrame:
    r"""Distinct k-word shingles per doc: (id, shingle).

    ``impl="pandas"`` (default) generates shingles in an Arrow-batched
    UDF — Catalyst evaluates higher-order lambda functions INTERPRETED
    (outside whole-stage codegen), which made the pure-SQL
    transform/slice/concat_ws expression the measured bottleneck of the
    whole MinHash pipeline (111 s of a 124 s run at 110k docs; the
    pandas path does the same work in ~8 s).  ``impl="sql"`` keeps the
    expression-only variant (same output set, parity-tested) for
    pure-SQL deployments.  Both tokenize with the Java-regex semantics
    of tokens_sql (ASCII \w), matching the DuckDB oracle."""
    if impl == "pandas":
        arr = shingle_array_udf(k)(F.col(text_col))
        return docs.select(
            F.col(id_col).alias("id"), F.explode(arr).alias("shingle")
        )
    toks = tokens_sql(text_col)
    sh = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array())
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    tau: float = 0.4,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets: pairs (a < b) with
    jaccard >= tau.  ``max_shingle_df`` drops boilerplate shingles shared
    by more than that many docs (skew guard; standard practice)."""
    sh = shingles(docs, id_col, text_col, k)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= tau)
        .select("a", "b", "jaccard")
    )
    return out


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 13,
    min_overlaps: int = 1,
) -> DataFrame:
    """Benchmark decontamination: drop every training document sharing
    at least ``min_overlaps`` distinct n-grams with ANY evaluation
    document (the published rule: GPT-3, Brown et al. 2020 Appendix C
    used 13-gram collision; Gopher and later pipelines follow it).
    Returns the surviving training rows unchanged.

    Scale: eval sets are tiny next to the corpus, so the eval shingle
    side is broadcast by AQE; the corpus side is one shingle pass + a
    semi-join — no corpus-x-corpus work.  ``min_overlaps > 1`` relaxes
    the rule for short boilerplate-prone n (the paper uses 1 at n=13
    because a 13-gram collision is effectively never chance)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    etc = eval_text_col or text_col
    corpus_sh = shingles(docs, id_col, text_col, n)
    eval_sh = shingles(
        eval_docs.select(F.col(etc).alias("_t")).withColumn(
            "_eid", F.monotonically_increasing_id()
        ),
        "_eid",
        "_t",
        n,
    ).select("shingle").distinct()
    hits = (
        corpus_sh.join(eval_sh, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .where(F.col("_hits") >= min_overlaps)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(hits, id_col, "left_anti")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, sig array<long>): sig[i] = min over shingles of hash_i(s).
    Pure SQL — one explode + one groupBy with n_hashes min aggregates.

    ``hash_fn``: "md5" (default) keeps the DuckDB-reproducible
    hash64 convention the driver oracle recomputes bit-for-bit;
    "xxhash64" is the SCALE path — a native 64-bit hash, no hex
    string or base conversion, measured ~4x faster end-to-end on the
    pipeline bench.  Signatures from the two functions differ (both
    are valid MinHash families); pick one per corpus."""
    sh = shingles(docs, id_col, text_col, k)
    if hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    else:
        aggs = [
            F.min(hash64(F.col("shingle"), seed=i)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    g = sh.groupBy("id").agg(*aggs)
    return g.select("id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"))


def minhash_signatures_rowwise(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Row-wise MinHash signatures — NO shuffle: the shingle set stays a
    per-row array and each sig component is array_min over a transform.
    Same hash family as minhash_signatures (identical signatures,
    parity-tested), but streaming-safe: usable before a stateful
    operator where a streaming groupBy aggregation is not.  Documents
    with fewer than k tokens (empty shingle set) are dropped, matching
    the groupBy variant's behavior."""
    arr = shingle_array_udf(k)(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), arr.alias("_sh")).where(
        F.size("_sh") > 0
    )
    # NB: the lambda must take exactly ONE parameter — pyspark inspects
    # the lambda arity, and a second (default) parameter turns it into
    # the (element, index) form, silently shadowing the closure
    def _hash_lambda(i):
        if hash_fn == "xxhash64":
            return lambda s: F.xxhash64(F.lit(i), s)
        prefix = str(i) + "\x1f"
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), s)), 1, 15), 16, 10
        ).cast("bigint")

    comps = [
        F.array_min(F.transform(F.col("_sh"), _hash_lambda(i)))
        for i in range(n_hashes)
    ]
    return base.select("id", F.array(*comps).alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become a candidate
    pair.  Join is on (band, band_key) — only same-bucket docs shuffle."""
    bands = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(F.col("id").alias("a"), "band", "key")
    b = bands.select(F.col("id").alias("b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    tau: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """LSH candidates verified by exact signature agreement ratio
    (estimated Jaccard) >= tau.  Returns (a, b, est_jaccard).

    Single-pass shape (r4): the signature array rides along through the
    band explode and the (band, key) self-join, so the signature
    aggregation subtree is evaluated once per join side instead of once
    for candidates plus once per verification side (3x -> 2x; the
    duplicate (a, b) rows from multi-band collisions are distinct-ed
    AFTER the cheap est computation)."""
    # the groupBy signature variant is deliberate here: its exchange
    # MATERIALIZES the signatures before the band explode.  The
    # shuffle-free rowwise variant is faster standalone (2.9 vs 8.9 s
    # at 110k docs) but under the explode the projection is pushed
    # below it and the interpreted hash transforms recompute 4x per
    # side — measured 22 s vs 8 s end-to-end.  Rowwise is for
    # streaming (and single-pass consumers); groupBy for this join.
    sigs = minhash_signatures(docs, id_col, text_col, k, n_hashes, hash_fn)
    rows_per_band = n_hashes // n_bands
    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a_side = bands.select(F.col("id").alias("a"), F.col("sig").alias("sig_a"), "band", "key")
    b_side = bands.select(F.col("id").alias("b"), F.col("sig").alias("sig_b"), "band", "key")
    est = (
        a_side.join(b_side, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                ).cast("double")
                / F.size("sig_a"),
                6,
            ),
        )
        .where(F.col("est_jaccard") >= tau)
        .select("a", "b", "est_jaccard")
        .distinct()
    )
    return est


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 60  # md5's first 15 hex chars: DuckDB-recomputable signed range


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash over tf-weighted token hashes (vectorized pandas UDF;
    Arrow batches, numpy bit ops — no per-row Python loops).

    Token hash: first 15 hex chars of md5 (60 bits) — the same
    DuckDB-reproducible convention as ``functions.textstats.hash64``, so
    the driver oracle recomputes the signature bit-for-bit in SQL.
    Returns (id, simhash long)."""
    from pyspark.sql.functions import pandas_udf

    from whoosh_novo_spark.functions.analysis import standard_analyze_batch

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        tb = standard_analyze_batch(texts)
        n = tb.n_rows
        if len(tb.term) == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        uniq, inv = np.unique(tb.term, return_inverse=True)
        hs = np.array(
            [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in uniq],
            dtype=np.uint64,
        )
        tok_h = hs[inv]
        nb = SIMHASH_BITS
        bits = ((tok_h[:, None] >> np.arange(nb, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )  # (n_tokens, nb) of 0/1
        contrib = bits * 2 - 1
        acc = np.zeros((n, nb), dtype=np.int64)
        np.add.at(acc, tb.row, contrib)
        out_bits = (acc > 0).astype(np.uint64)
        vals = (out_bits << np.arange(nb, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
        return pd.Series(vals.astype(np.int64))

    return docs.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, bucketed by 16-bit
    chunks (a pair within hamming<=3 must agree on >=1 of 4 chunks —
    pigeonhole), so no quadratic join.

    ``max_bucket`` skew guard (r4): template-heavy corpora concentrate
    many near-identical signatures into a few chunk values, making one
    bucket's self-join quadratic (measured 449 s at 110k synthetic docs
    without the guard).  Buckets larger than the cap are dropped from
    the CANDIDATE side only; a pair inside a dropped bucket is still
    found through any of its other 3 chunks unless all four of its
    buckets are that hot (then the docs are boilerplate-grade similar
    and belong to exact-dedup anyway).  None disables the guard."""
    sh = simhash64(docs, id_col, text_col)
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    if max_bucket is not None:
        hot = (
            chunks.groupBy("chunk", "key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("chunk", "key")
        )
        chunks = chunks.join(F.broadcast(hot), ["chunk", "key"], "left_anti")
    a = chunks.select(F.col("id").alias("a"), F.col("simhash").alias("ha"), "chunk", "key")
    b = chunks.select(F.col("id").alias("b"), F.col("simhash").alias("hb"), "chunk", "key")
    pairs = (
        a.join(b, ["chunk", "key"]).where(F.col("a") < F.col("b")).select("a", "b", "ha", "hb").distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming).select(
        "a", "b", "hamming"
    )


def keep_latest_crawl(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canonicalize: bool = True,
    tie_col: str | None = None,
) -> DataFrame:
    """Recrawl dedup: one row per (canonical) URL — the LATEST capture.

    Common-Crawl-style corpora carry the same page once per crawl
    snapshot; every published web pipeline's first dedup pass keeps the
    newest capture per URL before any content-level dedup runs.  With
    ``canonicalize=True`` the key is ``url_normalize(url)`` (tracking
    params stripped, query sorted, scheme/host case-folded...), so
    `?utm_source=` recrawl variants collapse too; the surviving row
    keeps its ORIGINAL url text.

    Ties on (url, ts) are broken deterministically: by the highest
    value of ``tie_col`` when given, else by the highest ``xxhash64``
    over the full row — the result never depends on partitioning or
    input order.

    Scale: one hash aggregation, ``max(struct(ts, tie, row))``, which
    is map-side combinable (partial_max) — a URL recrawled in every one
    of 100 snapshots contributes ONE row per map partition to the
    shuffle, so hot URLs cannot create a skewed reduce key the way a
    rank-window formulation would (the same lesson as
    ``remove_duplicate_spans``' keep-first plan, BENCH/BASELINE.md
    §0r5ss).  Null timestamps sort lowest (struct comparison is
    nulls-first), so a real timestamp always beats a missing one.
    """
    from whoosh_novo_spark.functions.urls import url_normalize

    cols = docs.columns
    key = url_normalize(F.col(url_col)) if canonicalize else F.col(url_col)
    tie = F.col(tie_col) if tie_col else F.xxhash64(*[F.col(c) for c in cols])
    picked = docs.groupBy(key.alias("_url_key")).agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("_ts"),
                tie.alias("_tie"),
                F.struct(*[F.col(c) for c in cols]).alias("_row"),
            )
        ).alias("_pick")
    )
    return picked.select("_pick._row.*")
