"""URL canonicalization + distributed per-domain quota: hand goldens
for host/registered-domain/normalize, idempotence, dedup composition,
quota_per_stratum == stratified_quota selection parity with no driver
collect, and codegen-friendly (UDF-free) plans."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.urls import (
    url_host,
    url_normalize,
    url_registered_domain,
)
from whoosh_novo_spark.operators.sampling import quota_per_stratum, stratified_quota


def _one(spark, expr, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(expr.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize(
    "url,host",
    [
        ("https://Example.COM/p/x", "example.com"),
        ("http://example.com:8080/p", "example.com"),
        ("https://user:pw@sub.Example.org:443/", "sub.example.org"),
        ("example.com/no-scheme", "example.com"),
        ("ftp://files.example.net/a", "files.example.net"),
        ("", ""),
    ],
)
def test_url_host_goldens(spark, url, host):
    assert _one(spark, url_host(F.col("u")), url) == host


@pytest.mark.parametrize(
    "url,dom",
    [
        ("https://www.example.com/a", "example.com"),
        ("https://a.b.news.co.uk/x", "news.co.uk"),
        ("https://shop.com.au", "shop.com.au"),
        ("https://deep.sub.site.org/", "site.org"),
        ("https://localhost/x", "localhost"),
    ],
)
def test_registered_domain_goldens(spark, url, dom):
    assert _one(spark, url_registered_domain(F.col("u")), url) == dom


@pytest.mark.parametrize(
    "url,norm",
    [
        # case, default port, fragment
        ("HTTPS://Example.COM:443/Path/#frag", "https://example.com/Path"),
        # tracking params stripped, remaining sorted, trailing slash
        (
            "http://a.com/p/?utm_source=x&b=2&a=1&fbclid=z",
            "http://a.com/p?a=1&b=2",
        ),
        # non-default port kept, no path -> /
        ("http://a.com:8080?z=1", "http://a.com:8080/?z=1"),
        # scheme-less input defaults to http
        ("A.com/x/", "http://a.com/x"),
        # only tracking params -> query dropped entirely
        ("https://a.com/p?utm_campaign=c&gclid=g", "https://a.com/p"),
    ],
)
def test_url_normalize_goldens(spark, url, norm):
    assert _one(spark, url_normalize(F.col("u")), url) == norm


def test_normalize_idempotent(spark):
    urls = [
        "HTTPS://Example.COM:443/Path/?b=2&a=1&utm_source=x#f",
        "http://a.com",
        "sub.co.uk/x?ref=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = [r["v"] for r in df.select(url_normalize(F.col("u")).alias("v")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "u string")
    twice = [r["v"] for r in df2.select(url_normalize(F.col("u")).alias("v")).collect()]
    assert once == twice


def test_normalize_enables_url_dedup(spark):
    """The same page under 4 spellings collapses to ONE canonical URL."""
    variants = [
        "https://Example.com/page?b=2&a=1",
        "HTTPS://example.COM:443/page?a=1&b=2#top",
        "https://example.com/page/?a=1&b=2&utm_medium=email",
        "https://example.com/page?utm_source=t&b=2&a=1",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)], "doc_id long, u string")
    n = df.select(url_normalize(F.col("u")).alias("c")).distinct().count()
    assert n == 1


def test_no_udf_in_plan(spark):
    df = spark.createDataFrame([("https://a.com/x",)], "u string")
    plan = (
        df.select(url_normalize(F.col("u")), url_host(F.col("u")), url_registered_domain(F.col("u")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # no Python UDF of any kind


def test_quota_per_stratum_matches_stratified_quota(spark):
    rng = random.Random(17)
    rows = [
        (i, f"https://example{rng.randrange(40)}.com/p/{i:06d}") for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = quota_per_stratum(df, url_host(F.col("url")), 25, seed=4, stratum_name="host")
    # identical selection to the low-cardinality operator on the same input
    ref_df = df.withColumn("host", url_host(F.col("url")))
    ref = stratified_quota(ref_df, "host", 25, seed=4, prefilter=False)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in ref.collect()
    )
    # exact cap per host, partition invariance
    counts = {r["host"]: r["n"] for r in got.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 25 for v in counts.values()) and len(counts) == 40
    again = quota_per_stratum(
        df.repartition(19, "doc_id"), url_host(F.col("url")), 25, seed=4, stratum_name="host"
    )
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_quota_per_stratum_small_strata_kept_whole(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 5 else "b") for i in range(100)], "doc_id long, s string"
    )
    got = {r["s"]: r["n"] for r in quota_per_stratum(df, "s", 30, seed=1).groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert got == {"a": 5, "b": 30}  # under-quota stratum fully kept
