"""Deterministic sampling / corpus-mixing operators for training-data
pipelines.

A 100 TB pretraining corpus is never used whole: it is sampled, split
and re-weighted (e.g. temperature-based language mixing, ref: the
multilingual sampling rule popularized by mBERT/XLM-R, p_l^alpha).
Everything here is DETERMINISTIC — selection depends only on (key,
seed), never on partitioning, executor count or row order — so a
sample drawn today equals the sample drawn after a re-shard, and the
DuckDB oracle can recompute the exact row set.

Operators:

- hash_sample:       Bernoulli-by-hash row sampling (shuffle-free)
- split_by_hash:     train/val/test split labels (shuffle-free)
- stratified_sample: per-stratum Bernoulli rates (shuffle-free)
- stratified_quota:  EXACTLY k rows per stratum, smallest-k by hash
                     rank (two-phase: threshold prefilter + bounded
                     window — the scale path)
- temperature_quotas / temperature_mix: p_l^alpha corpus mixing with
                     exact per-language quotas

Scale notes (100 TB lens): the Bernoulli ops are pure map-side
filters — no shuffle, no state, trivially linear. stratified_quota's
naive formulation (row_number over the whole stratum) would funnel an
entire language through one reducer; instead we (a) count per stratum
(map-side-combined agg, #strata rows), (b) prefilter to u < t where t
keeps ~quota + 6*sqrt(quota) + 16 expected survivors (Chernoff: the
probability of losing exactness is < 1e-8 per stratum), and (c) rank
only the ~quota survivors.  The window's input is O(quota), not
O(n_stratum), so a 10-billion-row language with a 1M quota ranks 1M
rows, not 10B.

All hashing is the repo-standard 60-bit md5 prefix (functions/
textstats.hash64), bit-reproducible in DuckDB as
``('0x' || substr(md5(seed || chr(31) || key), 1, 15))::BIGINT``.

Reference parity: whoosh-novo has no sampling surface (it is a search
library); this module covers SURVEY.md's training-data-pipeline axis
alongside operators/dedup.py and operators/similarity.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.textstats import hash64

# 60-bit hash space: hash64 values are uniform on [0, 2^60).
_H_SPACE = float(1 << 60)


def _u(key: Column, seed: int) -> Column:
    """Deterministic uniform-[0,1) value per key (DuckDB-reproducible)."""
    return hash64(key.cast("string"), seed=seed) / F.lit(_H_SPACE)


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash-uniform value
    is below ``rate``.  Unlike DataFrame.sample this is stable across
    re-sharding and repeated runs, and a row's membership depends only
    on (key, seed) — disjoint seeds give independent samples.

    Scale: a pure map-side filter; Catalyst keeps it inside the scan's
    WholeStageCodegen, no shuffle.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.where(_u(F.col(key_col), seed) < F.lit(rate))


def split_by_hash(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Adds a split label ('train'/'val'/'test', any names) by cumulative
    hash-threshold buckets.  Every row gets exactly one label; the
    assignment is deterministic in (key, seed) so the test set never
    leaks into train across pipeline re-runs or re-shards.

    ``weights`` need not sum to 1 — they are normalized.  Label order
    follows dict insertion order (cumulative thresholds).
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = _u(F.col(key_col), seed)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float] | float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. downsample English to 10%, keep
    all Swahili).  A float applies one rate to every stratum; a dict
    maps stratum value -> rate, strata absent from the dict are DROPPED
    (rate 0) — the explicit-allowlist semantics a mixing config wants.

    Scale: map-side filter; the rate lookup compiles to a CASE chain
    (bounded by #strata, which is small by definition).
    """
    u = _u(F.col(key_col), seed)
    if isinstance(fractions, float):
        return df.where(u < F.lit(fractions))
    rate = None
    for value, r in fractions.items():
        cond = F.col(stratum_col) == F.lit(value)
        rate = F.when(cond, F.lit(float(r))) if rate is None else rate.when(cond, F.lit(float(r)))
    rate = rate.otherwise(F.lit(0.0))
    return df.where(u < rate)


def _prefilter_threshold(quota: int, n: int) -> float:
    """Hash-value cutoff that keeps ~quota + 6*sqrt(quota) + 16 expected
    survivors.  Chernoff lower-tail: P(Binomial(n, t) < quota) < 1e-8,
    so prefiltered selection equals the exact full-stratum ranking with
    overwhelming probability — and the exactness is still VERIFIED, not
    assumed: tests/test_sampling.py asserts prefilter==exact parity and
    the driver row's DuckDB oracle ranks the full stratum.
    """
    if n <= 0 or quota >= n:
        return 1.0
    return min(1.0, (quota + 6.0 * math.sqrt(quota) + 16.0) / n)


def stratified_quota(
    df: DataFrame,
    stratum_col: str,
    quotas: dict[str, int] | int,
    key_col: str = "doc_id",
    seed: int = 0,
    prefilter: bool = True,
) -> DataFrame:
    """EXACTLY min(quota, n_stratum) rows per stratum: the quota smallest
    rows by (hash64(key), key) within each stratum.  Deterministic in
    (key, seed); independent of partitioning and row order.

    An int applies one quota to every stratum; a dict maps stratum ->
    quota (absent strata dropped).

    Scale: two-phase.  Phase 1 counts per stratum (map-side-combined
    agg; output rows = #strata).  Phase 2 prefilters to the hash range
    expected to hold the quota (+6-sigma slack — _prefilter_threshold)
    and ranks only the survivors, so the per-stratum window sees
    O(quota) rows, never O(n_stratum).  Set ``prefilter=False`` to rank
    the full stratum (the oracle formulation; used by tests to prove
    the two plans select identical rows).
    """
    quota_map: dict | None = None if isinstance(quotas, int) else dict(quotas)
    if quota_map is not None:
        df = df.where(F.col(stratum_col).isin(list(quota_map)))

    h = hash64(F.col(key_col).cast("string"), seed=seed)
    df = df.withColumn("_h", h)

    if quota_map is None:
        quota_col = F.lit(int(quotas))
    else:
        qc = None
        for value, q in quota_map.items():
            cond = F.col(stratum_col) == F.lit(value)
            qc = F.when(cond, F.lit(int(q))) if qc is None else qc.when(cond, F.lit(int(q)))
        quota_col = qc.otherwise(F.lit(0))

    if prefilter:
        # bounded collect: one row per stratum (strata are languages /
        # sources / buckets — small by construction)
        counts = {
            r["s"]: r["n"]
            for r in df.groupBy(F.col(stratum_col).alias("s")).count().withColumnRenamed("count", "n").collect()
        }
        thr = None
        for value, n in counts.items():
            q = int(quotas) if quota_map is None else int(quota_map.get(value, 0))
            t = _prefilter_threshold(q, n)
            cond = F.col(stratum_col) == F.lit(value)
            lim = F.lit(int(t * _H_SPACE))
            thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
        if thr is not None:
            df = df.where(F.col("_h") < thr.otherwise(F.lit(0)))

    w = Window.partitionBy(stratum_col).orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota_col)
        .drop("_h", "_rk")
    )


def quota_per_stratum(
    df: DataFrame,
    stratum: str | Column,
    quota: int,
    key_col: str = "doc_id",
    seed: int = 0,
    stratum_name: str = "_stratum",
) -> DataFrame:
    """At most ``quota`` rows per stratum — the HIGH-CARDINALITY twin of
    stratified_quota, for strata like web domains where the number of
    distinct values is itself data-scale (millions of hosts) and the
    driver-side count collect of stratified_quota's prefilter would not
    be bounded.  Fully distributed: per-stratum counts stay a
    DataFrame, the Chernoff prefilter threshold is computed as a SQL
    expression and JOINED back (AQE broadcasts it when small), so no
    stratum ever funnels more than O(quota) rows through its rank
    window and nothing is collected to the driver.

    Selection semantics are IDENTICAL to
    ``stratified_quota(..., quotas=quota)``: the quota smallest rows by
    (hash64(key), key) per stratum — deterministic in (key, seed),
    partition- and re-run-stable (parity-tested).

    ``stratum`` may be a column name or an expression (e.g.
    ``url_host(F.col("url"))``); an expression is materialized as
    ``stratum_name`` and kept in the output.
    """
    if isinstance(stratum, str):
        scol = F.col(stratum)
        sname = stratum
    else:
        df = df.withColumn(stratum_name, stratum)
        scol = F.col(stratum_name)
        sname = stratum_name
    q = int(quota)
    df = df.withColumn("_h", hash64(F.col(key_col).cast("string"), seed=seed))
    counts = df.groupBy(scol.alias(sname)).agg(F.count(F.lit(1)).alias("_n"))
    # _prefilter_threshold as SQL: min(1, (q + 6 sqrt(q) + 16) / n) when
    # n > q else 1 — then scaled into hash space.
    t = F.when(
        F.col("_n") <= F.lit(q), F.lit(1.0)
    ).otherwise(
        F.least(
            F.lit(1.0),
            F.lit(q + 6.0 * math.sqrt(q) + 16.0) / F.col("_n").cast("double"),
        )
    )
    thr = counts.withColumn("_thr", (t * F.lit(_H_SPACE)).cast("bigint")).select(
        sname, "_thr"
    )
    w = Window.partitionBy(sname).orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return (
        df.join(thr, sname)
        .where(F.col("_h") < F.col("_thr"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.lit(q))
        .drop("_h", "_thr", "_rk")
    )


def temperature_quotas(
    counts: dict[str, int], total: int, alpha: float = 0.5
) -> dict[str, int]:
    """Per-stratum quotas for temperature-based mixing: weight each
    stratum by p_l^alpha (p_l = n_l / N), normalize, allocate
    quota_l = floor(total * w_l + 1e-9) capped at n_l.

    alpha=1 reproduces the natural distribution; alpha=0 is uniform;
    alpha~0.3-0.7 is the standard multilingual-pretraining compromise
    (upsample tail languages without drowning the head).

    The +1e-9 makes integer boundaries engine-stable: the DuckDB oracle
    recomputes the same formula and 1-ulp libm differences cannot flip
    a floor.  Caps are NOT redistributed (documented semantics — the
    result may undershoot ``total`` when a tail stratum saturates);
    this keeps the allocation a pure per-stratum formula that a single
    SQL expression reproduces.
    """
    n_total = float(sum(counts.values()))
    if n_total <= 0:
        return {s: 0 for s in counts}
    weights = {s: (n / n_total) ** alpha for s, n in counts.items()}
    z = sum(weights[s] for s in sorted(weights))
    return {
        s: min(int(counts[s]), int(math.floor(total * weights[s] / z + 1e-9)))
        for s in counts
    }


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    total: int,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    seed: int = 0,
    prefilter: bool = True,
) -> DataFrame:
    """Temperature-weighted corpus mixing: compute p_l^alpha quotas over
    the observed stratum distribution, then select each stratum's quota
    deterministically (smallest hash64 rank — stratified_quota).

    Scale: one counting agg (#strata output rows, bounded driver
    collect) + the stratified_quota two-phase selection.  The whole
    selection is reproducible row-for-row from (key, seed, total,
    alpha) — the driver row's DuckDB oracle recomputes counts, weights,
    quotas AND the final row set from raw parquet.
    """
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s")).count().withColumnRenamed("count", "n").collect()
    }
    quotas = temperature_quotas(counts, total=total, alpha=alpha)
    return stratified_quota(
        df, stratum_col, quotas, key_col=key_col, seed=seed, prefilter=prefilter
    )
