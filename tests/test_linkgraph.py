"""Link graph: href/anchor extraction goldens, UDF-free plan gate,
PageRank vs a dense numpy oracle (dangling mass, damping, weights),
partition invariance, host-graph weights, and inbound anchor text
composed into an indexed field that ranks the linked-to document."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.linkgraph import (
    extract_links,
    host_graph,
    inlink_anchor_text,
    pagerank,
)

PAGE = """
<html><head><title>t</title></head><body>
<!-- <a href="http://commented.example/x">nope</a> -->
<a href="http://abs.example/Page?utm_source=x&b=2&a=1">Absolute <b>Link</b></a>
<A HREF='//proto.example/p'>proto&nbsp;relative</A>
<a class=x href=/root/sub>root relative</a>
<a href="other.html#frag">sibling page</a>
<a href="../up/two.html">up one</a>
<a href="?page=2">next page</a>
<a href="#top">fragment only</a>
<a href="mailto:a@b.c">mail</a>
<a href="javascript:void(0)">js</a>
<a name="no-href">not a link</a>
</body></html>
"""


@pytest.fixture(scope="module")
def links(spark):
    df = spark.createDataFrame(
        [("https://Src.Example.com/dir/page.html", PAGE)], "url string, html string"
    )
    return extract_links(df)


def test_extract_links_goldens(links):
    got = {(r["dst"], r["anchor"]) for r in links.collect()}
    assert got == {
        ("http://abs.example/Page?a=1&b=2", "Absolute Link"),
        ("https://proto.example/p", "proto relative"),
        ("https://src.example.com/root/sub", "root relative"),
        ("https://src.example.com/dir/other.html", "sibling page"),
        ("https://src.example.com/up/two.html", "up one"),
        ("https://src.example.com/dir/page.html?page=2", "next page"),
    }
    assert links.select("src").distinct().collect()[0]["src"] == (
        "https://Src.Example.com/dir/page.html"
    )


def test_extract_links_binary_html_and_self_drop(spark):
    html = b'<a href="https://self.example/p">me</a><a href="https://o.example/q">you</a>'
    df = spark.createDataFrame(
        [("https://self.example/p", html)], "url string, html binary"
    )
    got = [r["dst"] for r in extract_links(df).collect()]
    assert got == ["https://o.example/q"]
    both = extract_links(df, drop_self=False).count()
    assert both == 2


def test_extract_links_plan_is_jvm_only(links):
    plan = links._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def _numpy_pagerank(edges, n, alpha, iters, weights=None):
    """Dense oracle: uniform teleport + uniform dangling redistribution."""
    W = np.zeros((n, n))
    for k, (i, j) in enumerate(edges):
        W[i, j] += 1.0 if weights is None else weights[k]
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * W[i] / out[i]
        dangling = r[out == 0].sum()
        r = (1 - alpha) / n + alpha * (contrib + dangling / n)
    return r


@pytest.mark.parametrize("alpha", [0.85, 0.5])
def test_pagerank_matches_numpy_oracle(spark, alpha):
    # 6 nodes; node 4 dangling; node 5 only links out; a 2-cycle; a hub.
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (5, 0), (5, 4), (3, 4)]
    df = spark.createDataFrame(
        [(f"n{i}", f"n{j}") for i, j in edges], "src string, dst string"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, alpha=alpha, max_iter=25, tol=None).collect()
    }
    want = _numpy_pagerank(edges, 6, alpha, 25)
    assert set(got) == {f"n{i}" for i in range(6)}
    for i in range(6):
        assert got[f"n{i}"] == pytest.approx(want[i], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_weighted_and_partition_invariant(spark):
    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 2.0), (3, 0, 1.0)]
    rows = [(f"n{i}", f"n{j}", w) for i, j, w in edges]
    want = _numpy_pagerank(
        [(i, j) for i, j, _ in edges], 4, 0.85, 15, weights=[w for *_, w in edges]
    )
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "src string, dst string, w double"
        ).repartition(parts)
        got = {
            r["node"]: r["rank"]
            for r in pagerank(df, weight="w", max_iter=15, tol=None).collect()
        }
        for i in range(4):
            assert got[f"n{i}"] == pytest.approx(want[i], abs=1e-9)


def test_pagerank_tol_early_stop(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=50, tol=1e-12).collect()}
    # symmetric 2-cycle: exact fixed point is 1/2 each
    assert got["a"] == pytest.approx(0.5, abs=1e-9)
    assert got["b"] == pytest.approx(0.5, abs=1e-9)


def test_host_graph_weights(spark):
    rows = [
        ("http://a.com/1", "http://b.com/x"),
        ("http://a.com/2", "http://b.com/y"),
        ("http://a.com/1", "http://a.com/2"),  # intra-host, dropped
        ("http://b.com/x", "http://a.com/1"),
    ]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(df).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}
    intra = host_graph(df, inter_host_only=False)
    assert intra.where(
        (F.col("src_host") == "a.com") & (F.col("dst_host") == "a.com")
    ).collect()[0]["weight"] == 1


def test_inlink_anchor_text_top_and_bounds(spark):
    rows = (
        [("s", "http://t.example/p", "Quantum Widgets")] * 3
        + [("s", "http://t.example/p", "click here")] * 5
        + [("s", "http://t.example/p", f"rare {i}") for i in range(4)]
        + [("s", "http://o.example/q", "Other " + "x" * 200)]
    )
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = {r["url"]: r["anchor_text"] for r in inlink_anchor_text(df, max_anchors=2).collect()}
    # count-desc then lexicographic: "click here"(5) then "quantum widgets"(3)
    assert got["http://t.example/p"] == "click here quantum widgets"
    assert len(got["http://o.example/q"]) <= 80
    pruned = {
        r["url"]: r["anchor_text"]
        for r in inlink_anchor_text(df, max_anchors=10, min_count=2).collect()
    }
    assert pruned["http://t.example/p"] == "click here quantum widgets"
    assert "http://o.example/q" not in pruned  # singleton pruned


def test_anchor_field_ranks_linked_doc(spark, tmp_path):
    """The composition the module exists for: inbound anchor text is
    indexed as a field of the TARGET doc, which then ranks for a query
    term appearing only in anchors of pages that link to it."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    docs = spark.createDataFrame(
        [
            ("http://t.example/p", "a page about nothing in particular"),
            ("http://o.example/q", "another page of plain words"),
        ],
        "url string, text string",
    )
    links = spark.createDataFrame(
        [("http://x.example/1", "http://t.example/p", "quantum widgets")] * 2,
        "src string, dst string, anchor string",
    )
    anchors = inlink_anchor_text(links)
    enriched = docs.join(anchors, "url", "left").withColumn(
        "anchor_text", F.coalesce("anchor_text", F.lit(""))
    )
    store = SegmentStore(str(tmp_path / "ix"))
    cfg = IndexConfig(
        id_col="url",
        fields=(FieldConfig("text"), FieldConfig("anchor_text")),
    )
    build_segment(spark, enriched, cfg, store, partitions=2)
    s = Searcher(Index(spark, store, cfg))
    hits = s.search(ast.Term("anchor_text", "quantum"), limit=5).collect()
    assert len(hits) == 1
    docmap = {r["url"]: r["docid"] for r in s.index.docmap(["url", "docid"]).collect()}
    assert docmap["http://t.example/p"] == hits[0]["docid"]


def test_static_prior_boost_reorders_and_degenerates(spark):
    from whoosh_novo_spark.operators.fusion import static_prior_boost

    results = spark.createDataFrame(
        [("a", 10.0), ("b", 9.9), ("c", 5.0)], "docid string, score double"
    )
    prior = spark.createDataFrame(
        [("a", 1e-6), ("b", 1e-2), ("c", 1e-4)], "node string, p double"
    )
    got = static_prior_boost(results, prior, w=1.0).collect()
    # log-space min-max: a->0, b->1, c->0.5; boosted: a 10.0, b 10.9, c 5.5
    vals = {r["id"]: r["boosted"] for r in got}
    assert vals["a"] == pytest.approx(10.0)
    assert vals["b"] == pytest.approx(10.9)
    assert vals["c"] == pytest.approx(5.5)
    assert [r["id"] for r in got] == ["b", "a", "c"]

    # equal priors: ranking and scores unchanged
    flat = spark.createDataFrame(
        [("a", 0.3), ("b", 0.3), ("c", 0.3)], "node string, p double"
    )
    same = static_prior_boost(results, flat, w=5.0).collect()
    assert [r["id"] for r in same] == ["a", "b", "c"]
    assert same[0]["boosted"] == pytest.approx(10.0)

    # missing prior with explicit default floor: only b is boosted
    partial = spark.createDataFrame([("b", 1e-2)], "node string, p double")
    part = {
        r["id"]: r["boosted"]
        for r in static_prior_boost(results, partial, default=1e-6).collect()
    }
    assert part["b"] == pytest.approx(10.9)
    assert part["a"] == pytest.approx(10.0)
    # default=None degenerates gracefully: the one present prior IS the
    # floor, all priors equal, ranking unchanged
    nd = {r["id"]: r["boosted"] for r in static_prior_boost(results, partial).collect()}
    assert nd == {"a": pytest.approx(10.0), "b": pytest.approx(9.9), "c": pytest.approx(5.0)}

    # no priors at all: identity
    none = spark.createDataFrame([("zz", 1.0)], "node string, p double")
    ident = {r["id"]: r["boosted"] for r in static_prior_boost(results, none).collect()}
    assert ident == {"a": pytest.approx(10.0), "b": pytest.approx(9.9), "c": pytest.approx(5.0)}


def test_pagerank_prior_end_to_end(spark, tmp_path):
    """Full composition: index pages, search, map hits to hosts, boost
    with host PageRank — the trusted-host page overtakes a same-score
    peer."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.fusion import static_prior_boost
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore
    from whoosh_novo_spark.functions.urls import url_host

    docs = spark.createDataFrame(
        [
            ("http://big.example/p", "solar panels and solar output data"),
            ("http://tiny.example/q", "solar panels and solar output data"),
            ("http://other.example/r", "unrelated words entirely"),
        ],
        "url string, text string",
    )
    # many hosts endorse big.example; tiny.example gets one link
    edges = [("h%d.example" % i, "big.example") for i in range(8)] + [
        ("h0.example", "tiny.example")
    ]
    eg = spark.createDataFrame(edges, "src_host string, dst_host string")
    pr = pagerank(eg, src="src_host", dst="dst_host", max_iter=15)

    store = SegmentStore(str(tmp_path / "ix"))
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
    build_segment(spark, docs, cfg, store, partitions=2)
    s = Searcher(Index(spark, store, cfg))
    hits = s.search(ast.Term("text", "solar"), limit=5)
    with_urls = hits.join(s.index.docmap(["docid", "url"]), "docid").select(
        url_host("url").alias("host"), F.col("score")
    )
    boosted = static_prior_boost(with_urls, pr, w=1.0).collect()
    assert boosted[0]["id"] == "big.example"
    assert boosted[0]["boosted"] > boosted[1]["boosted"]


def test_canonical_url_extraction(spark):
    from whoosh_novo_spark.operators.linkgraph import canonical_url

    rows = [
        # rel-first attribute order + tracking params normalized away
        ("http://a.example/p?utm_source=x",
         '<link rel="canonical" href="http://a.example/p"/>'),
        # href-first attribute order, relative href resolved
        ("http://a.example/dir/v2", '<link href="../p" rel=canonical >'),
        # og:url fallback (no link rel)
        ("http://a.example/q",
         '<meta property="og:url" content="http://a.example/q-final" />'),
        # cross-host canonical ignored (conservative rule)
        ("http://a.example/r",
         '<link rel="canonical" href="http://evil.example/steal"/>'),
        # none declared
        ("http://a.example/s", "<p>plain</p>"),
        # link rel wins over og:url when both present
        ("http://a.example/t",
         '<link rel="canonical" href="/t-canon"/>'
         '<meta property="og:url" content="http://a.example/t-og"/>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["url"]: r["canonical"] for r in canonical_url(df).collect()}
    assert got == {
        "http://a.example/p?utm_source=x": "http://a.example/p",
        "http://a.example/dir/v2": "http://a.example/p",
        "http://a.example/q": "http://a.example/q-final",
        "http://a.example/r": None,
        "http://a.example/s": None,
        "http://a.example/t": "http://a.example/t-canon",
    }


def test_canonical_composes_with_keep_latest(spark):
    import datetime as dt

    from whoosh_novo_spark.operators.dedup import keep_latest_crawl
    from whoosh_novo_spark.operators.linkgraph import canonical_url

    canon = '<link rel="canonical" href="http://m.example/page"/>'
    rows = [
        ("http://m.example/page?sid=1", dt.datetime(2026, 1, 1), canon + "v1"),
        ("http://m.example/page", dt.datetime(2026, 2, 1), canon + "v2"),
        ("http://m.example/other", dt.datetime(2026, 1, 5), "<p>no canon</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html string")
    keyed = canonical_url(df).withColumn(
        "_k", F.coalesce("canonical", "url")
    )
    out = keep_latest_crawl(keyed, url_col="_k").drop("_k", "canonical")
    got = {r["url"]: r["html"][-2:] for r in out.collect()}
    # both declared-canonical rows collapse, the newest survives with
    # its original url bytes; the undeclared page is untouched
    assert got == {"http://m.example/page": "v2", "http://m.example/other": "p>"}


def _numpy_ppr(edges, n, alpha, iters, t):
    """Personalized oracle: teleport vector t, dangling mass -> t."""
    W = np.zeros((n, n))
    for i, j in edges:
        W[i, j] += 1.0
    out = W.sum(axis=1)
    r = t.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * W[i] / out[i]
        dangling = r[out == 0].sum()
        r = (1 - alpha) * t + alpha * (contrib + dangling * t)
    return r


def test_trustrank_matches_numpy_and_demotes_spam_farm(spark):
    # trusted cluster: 0 <-> 1, 1 -> 2; spam farm: 3,4,5 all cite each
    # other (inflates uniform PageRank) but no trusted path reaches it
    edges = [(0, 1), (1, 0), (1, 2), (3, 4), (4, 5), (5, 3), (4, 3), (3, 5)]
    df = spark.createDataFrame(
        [(f"n{i}", f"n{j}") for i, j in edges], "src string, dst string"
    )
    seeds = spark.createDataFrame([("n0",), ("n1",)], "node string")
    t = np.array([0.5, 0.5, 0, 0, 0, 0.0])
    want = _numpy_ppr(edges, 6, 0.85, 20, t)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=20, tol=None, teleport=seeds).collect()
    }
    for i in range(6):
        assert got[f"n{i}"] == pytest.approx(want[i], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the farm's mutual citations earn ~nothing without trusted inlinks
    assert max(got["n3"], got["n4"], got["n5"]) < 1e-9
    # ...while uniform PageRank rewards the farm above the trusted tail
    uni = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=20, tol=None).collect()
    }
    assert min(uni["n3"], uni["n4"], uni["n5"]) > uni["n2"] * 0.9


def test_trustrank_weighted_seeds(spark):
    edges = [(0, 2), (1, 2), (2, 0)]
    df = spark.createDataFrame(
        [(f"n{i}", f"n{j}") for i, j in edges], "src string, dst string"
    )
    seeds = spark.createDataFrame([("n0", 3.0), ("n1", 1.0)], "node string, w double")
    t = np.array([0.75, 0.25, 0.0])
    want = _numpy_ppr(edges, 3, 0.85, 15, t)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=15, tol=None, teleport=seeds).collect()
    }
    for i in range(3):
        assert got[f"n{i}"] == pytest.approx(want[i], abs=1e-9)
    with pytest.raises(ValueError, match="zero total weight"):
        pagerank(df, teleport=spark.createDataFrame([("n0", 0.0)], "node string, w double"))


def test_nofollow_and_meta_robots(spark):
    from whoosh_novo_spark.operators.linkgraph import meta_robots

    html = (
        '<a href="http://f.example/a" rel="nofollow">paid</a>'
        "<a href='http://f.example/b' rel=ugc>comment</a>"
        '<a href="http://f.example/c" rel="noopener sponsored">ad</a>'
        '<a href="http://f.example/d" rel="noopener">organic</a>'
        '<a href="http://f.example/e">plain</a>'
    )
    df = spark.createDataFrame([("http://s.example/", html)], "url string, html string")
    followed = sorted(r["dst"] for r in extract_links(df, drop_nofollow=True).collect())
    assert followed == ["http://f.example/d", "http://f.example/e"]
    assert extract_links(df).count() == 5  # default keeps everything

    pages = [
        ("p1", '<meta name="robots" content="noindex, follow">'),
        ("p2", '<meta content="nofollow" name="robots">'),
        ("p3", '<meta name="robots" content="none">'),
        ("p4", '<meta name="robots" content="noodp">'),  # substring, no match
        ("p5", "<p>nothing</p>"),
    ]
    got = {
        r["url"]: (r["robots_noindex"], r["robots_nofollow"])
        for r in meta_robots(
            spark.createDataFrame(pages, "url string, html string")
        ).collect()
    }
    assert got == {
        "p1": (True, False),
        "p2": (False, True),
        "p3": (True, True),
        "p4": (False, False),
        "p5": (False, False),
    }


def test_docmap_materialized_prior(spark, tmp_path):
    """The page-granularity scale path static_prior_boost's docstring
    prescribes: at 10^12 docs the prior is written INTO the docmap as a
    stored column at build time (one per-row value, no external prior
    table at serving); the serving join reads only (docid, prior) via
    docmap column pruning."""
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.fusion import static_prior_boost
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    docs = spark.createDataFrame(
        [
            ("u1", "solar words solar data", 1e-3),
            ("u2", "solar words solar data", 1e-6),
        ],
        "url string, text string, pr double",
    )
    store = SegmentStore(str(tmp_path / "ix"))
    cfg = IndexConfig(
        id_col="url", fields=(FieldConfig("text"),), stored_cols=("pr",)
    )
    build_segment(spark, docs, cfg, store, partitions=2)
    s = Searcher(Index(spark, store, cfg))
    hits = s.search(ast.Term("text", "solar"), limit=5)
    prior = s.index.docmap(["docid", "pr"])
    boosted = static_prior_boost(hits, prior, w=1.0).collect()
    # identical BM25 scores; the stored prior breaks the tie toward u1
    docmap = {r["docid"]: r["url"] for r in s.index.docmap(["docid", "url"]).collect()}
    assert docmap[boosted[0]["id"]] == "u1"
    assert boosted[0]["boosted"] > boosted[1]["boosted"]


def test_extract_links_streams(spark, tmp_path):
    """extract_links is a stateless projection (explode + string ops),
    so a continuous crawl can extract its link table in-stream —
    per-row output identical to batch."""
    src = str(tmp_path / "lsrc")
    rows = [
        (f"http://s{i}.example/p",
         f'<a href="http://t{i}.example/q">anchor {i}</a>'
         f'<a href="/local{i}">rel {i}</a>')
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("url string, html string").parquet(src)
    q = (
        extract_links(stream)
        .writeStream.format("memory")
        .queryName("links_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["src"], r["dst"], r["anchor"])
        for r in spark.sql("select * from links_stream").collect()
    }
    want = {(r["src"], r["dst"], r["anchor"]) for r in extract_links(df).collect()}
    assert got == want and len(got) == 12


def _numpy_hits(edges, n, iters):
    E = np.zeros((n, n))
    for i, j in edges:
        E[i, j] = 1.0
    h = np.full(n, 1.0 / np.sqrt(n))
    a = h.copy()
    for _ in range(iters):
        a = E.T @ h
        a = a / np.linalg.norm(a) if a.any() else a
        h = E @ a
        h = h / np.linalg.norm(h) if h.any() else h
    return h, a


def test_hits_matches_numpy_and_splits_roles(spark):
    from whoosh_novo_spark.operators.linkgraph import hits

    # 0,1 are pure hubs (link out to 2,3,4 = pure authorities);
    # 5 is isolated-ish (one link in from nothing, one out to nothing)
    edges = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (5, 0)]
    df = spark.createDataFrame(
        [(f"n{i}", f"n{j}") for i, j in edges], "src string, dst string"
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, max_iter=15, tol=None).collect()
    }
    h, a = _numpy_hits(edges, 6, 15)
    for i in range(6):
        assert got[f"n{i}"][0] == pytest.approx(h[i], abs=1e-9)
        assert got[f"n{i}"][1] == pytest.approx(a[i], abs=1e-9)
    # role split: the big hub n0 tops hub scores, n2/n3 top authorities
    assert got["n0"][0] == max(v[0] for v in got.values())
    assert got["n2"][1] == max(v[1] for v in got.values())
    assert got["n2"][0] == pytest.approx(0.0, abs=1e-12)  # pure authority


def test_hits_early_stop_converges(spark):
    from whoosh_novo_spark.operators.linkgraph import hits

    edges = [("h1", "a1"), ("h1", "a2"), ("h2", "a1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r for r in hits(df, max_iter=50, tol=1e-10).collect()}
    # fixed point of the 2x2 hub/authority system (dominant eigenvector)
    h, a = _numpy_hits([(0, 2), (0, 3), (1, 2)], 4, 60)
    assert got["h1"]["hub"] == pytest.approx(h[0], abs=1e-6)
    assert got["a1"]["authority"] == pytest.approx(a[2], abs=1e-6)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_pagerank_random_graph_sweep(spark, seed):
    """Random digraphs (parallel edges collapse to weights, dangling
    nodes, disconnected pieces) vs the dense oracle."""
    import random as _random

    rng = _random.Random(seed)
    n = rng.randint(5, 18)
    edges = []
    for _ in range(rng.randint(n, 3 * n)):
        i, j = rng.randrange(n), rng.randrange(n)
        if i != j:
            edges.append((i, j))
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(
        [(f"n{i}", f"n{j}") for i, j in edges], "src string, dst string"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=12, tol=None).collect()
    }
    # the operator's universe is the ids present in edges — remap them
    # to a compact index so the oracle shares the same node set
    present = sorted({x for e in edges for x in e})
    idx = {v: k for k, v in enumerate(present)}
    want = _numpy_pagerank(
        [(idx[i], idx[j]) for i, j in edges], len(present), 0.85, 12
    )
    assert set(got) == {f"n{i}" for i in present}
    for v in present:
        assert got[f"n{v}"] == pytest.approx(want[idx[v]], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


@pytest.mark.parametrize("seeded", [False, True])
def test_pagerank_local_fast_path_matches_distributed(spark, monkeypatch, seeded):
    """The r6 small-graph driver fast path must agree with the
    distributed iteration at 1e-9 (same update rule, teleport handling
    and early stop) — the env cap forces the distributed loop."""
    rng = __import__("random").Random(7)
    n = 14
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(40)
    ]
    edges = [(i, j) for i, j in edges if i != j] or [(0, 1)]
    df = spark.createDataFrame(
        [(f"n{i}", f"n{j}") for i, j in edges], "src string, dst string"
    )
    seeds = (
        spark.createDataFrame([("n0", 2.0), ("n1", 1.0)], "node string, w double")
        if seeded
        else None
    )
    fast = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=10, tol=1e-8, teleport=seeds).collect()
    }
    monkeypatch.setenv("WNS_PAGERANK_LOCAL_MAX_NODES", "0")
    slow = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=10, tol=1e-8, teleport=seeds).collect()
    }
    assert set(fast) == set(slow)
    for k in fast:
        assert fast[k] == pytest.approx(slow[k], abs=1e-9)
