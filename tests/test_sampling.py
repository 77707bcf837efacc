"""Deterministic sampling / corpus-mixing operators: hash Bernoulli
sampling, hash splits, per-stratum rates, exact quotas, temperature
mixing — verified for determinism, partition-invariance, exactness
(prefilter == full-rank parity) and bit-parity with a DuckDB recompute
of the whole selection pipeline."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.sampling import (
    hash_sample,
    split_by_hash,
    stratified_quota,
    stratified_sample,
    temperature_mix,
    temperature_quotas,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows_df(spark):
    # 4000 keyed rows over 4 skewed strata (en-heavy, like a web corpus)
    rows = []
    for i in range(4000):
        lang = "en" if i % 8 < 5 else ("de" if i % 8 < 7 else ("fr" if i % 8 == 7 and i % 16 < 8 else "sw"))
        rows.append((i, lang))
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_hash_sample_deterministic_partition_invariant(rows_df):
    a = _ids(hash_sample(rows_df, 0.25, seed=3))
    b = _ids(hash_sample(rows_df.repartition(17, "lang"), 0.25, seed=3))
    c = _ids(hash_sample(rows_df.coalesce(1), 0.25, seed=3))
    assert a == b == c
    # binomial(4000, .25): mean 1000, sd ~27.4 -> 6 sigma bounds
    assert 835 <= len(a) <= 1165


def test_hash_sample_seeds_independent(rows_df):
    a = set(_ids(hash_sample(rows_df, 0.25, seed=1)))
    b = set(_ids(hash_sample(rows_df, 0.25, seed=2)))
    assert a != b
    # independent samples: |a & b| ~ Binomial(4000, 0.0625), 6-sigma
    assert abs(len(a & b) - 250) < 100


def test_hash_sample_no_shuffle(rows_df):
    explained = hash_sample(rows_df, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained


def test_split_by_hash_exhaustive_and_stable(rows_df):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = split_by_hash(rows_df, w, seed=5)
    s2 = split_by_hash(rows_df.repartition(13), w, seed=5)
    m1 = {r["doc_id"]: r["split"] for r in s1.collect()}
    m2 = {r["doc_id"]: r["split"] for r in s2.collect()}
    assert m1 == m2
    assert set(m1.values()) == {"train", "val", "test"}
    assert len(m1) == 4000  # every row exactly one label
    n_train = sum(1 for v in m1.values() if v == "train")
    assert 3050 <= n_train <= 3350  # 3200 +- 6 sigma (~152)


def test_stratified_sample_allowlist_semantics(rows_df):
    out = stratified_sample(rows_df, "lang", {"en": 0.1, "sw": 1.0}, seed=9)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) == {"en", "sw"}  # de/fr dropped (rate 0)
    n_sw = rows_df.where(F.col("lang") == "sw").count()
    assert got["sw"] == n_sw  # rate 1.0 keeps everything
    n_en = rows_df.where(F.col("lang") == "en").count()
    assert 0.05 * n_en < got["en"] < 0.16 * n_en


def test_stratified_quota_exact_and_prefilter_parity(rows_df):
    quotas = {"en": 100, "de": 50, "sw": 10_000}  # sw quota > n_sw
    fast = stratified_quota(rows_df, "lang", quotas, seed=11, prefilter=True)
    slow = stratified_quota(rows_df, "lang", quotas, seed=11, prefilter=False)
    fast_ids = _ids(fast)
    assert fast_ids == _ids(slow)  # prefilter never changes the selection
    got = {r["lang"]: r["n"] for r in fast.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_sw = rows_df.where(F.col("lang") == "sw").count()
    assert got == {"en": 100, "de": 50, "sw": n_sw}  # EXACT counts, capped at n
    # partition invariance
    assert fast_ids == _ids(stratified_quota(rows_df.repartition(23, "doc_id"), "lang", quotas, seed=11))


def test_stratified_quota_int_shorthand(rows_df):
    out = stratified_quota(rows_df, "lang", 25, seed=2)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 25 for v in got.values()) and len(got) == 4


def test_temperature_quotas_formula():
    counts = {"en": 8000, "de": 1500, "sw": 500}
    nat = temperature_quotas(counts, total=1000, alpha=1.0)
    # alpha=1 reproduces the natural distribution (floor rounding)
    assert nat == {"en": 800, "de": 150, "sw": 50}
    uni = temperature_quotas(counts, total=999, alpha=0.0)
    assert uni == {"en": 333, "de": 333, "sw": 333}  # alpha=0 -> uniform
    mid = temperature_quotas(counts, total=1000, alpha=0.5)
    # tail upsampled vs natural, head downsampled
    assert mid["sw"] > 50 and mid["en"] < 800
    # quota never exceeds the stratum population
    capped = temperature_quotas({"en": 10, "de": 10_000}, total=5000, alpha=0.5)
    assert capped["en"] == 10


def test_temperature_mix_duckdb_parity(spark):
    """Full-pipeline bit-parity: DuckDB recomputes counts, p^alpha weights,
    floor quotas AND the hash-ranked row set from raw parquet, matching
    the engine row-for-row (the driver row's gate, replicated here)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in temperature_mix(docs, "lang", total=60, alpha=0.5, seed=7).select("doc_id", "lang").collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    exp = sorted(
        (int(a), b)
        for a, b in con.execute(
            """
WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang),
t AS (SELECT sum(n) AS nt FROM c),
w AS (SELECT lang, n, pow(n / t.nt, 0.5) AS wt FROM c, t),
z AS (SELECT sum(wt) AS z FROM w),
q AS (SELECT lang, least(n::BIGINT, floor(60 * wt / z.z + 1e-9)::BIGINT) AS quota FROM w, z),
h AS (SELECT doc_id, lang,
             ('0x' || substr(md5('7' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM documents),
r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rk FROM h)
SELECT r.doc_id, r.lang FROM r JOIN q USING (lang) WHERE r.rk <= q.quota
"""
        ).fetchall()
    )
    assert got == exp and len(got) > 0


def test_prefilter_threshold_keeps_quota():
    from whoosh_novo_spark.operators.sampling import _prefilter_threshold

    assert _prefilter_threshold(100, 50) == 1.0  # quota >= n: keep all
    t = _prefilter_threshold(1000, 10_000_000)
    # expected survivors ~ quota + 6 sqrt(quota) + 16, tiny vs stratum
    assert 1000 / 1e7 < t < 1300 / 1e7
