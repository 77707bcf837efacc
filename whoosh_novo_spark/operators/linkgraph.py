"""Web link graph: href+anchor extraction, host graph, PageRank,
inbound anchor text as an indexable ranking field.

The reference engine has no link-graph machinery (it indexes documents
it is handed); a Common-Crawl-scale corpus, though, arrives WITH its
hyperlink structure, and every production web-search stack uses it
twice: as a static quality prior (PageRank over the host graph — what
Common Crawl itself publishes as its "host-level webgraph" releases)
and as a text signal (inbound anchor text indexed as a field of the
TARGET page, the classic way a page ranks for words it never says).
This module provides both halves so they compose with the existing
build (`build_segment` over an extra ``anchor`` field) and serving
(`operators/fusion.hybrid_search`-style score mixing) surfaces.

Design (100 TB lens):

- ``extract_links`` is pure Catalyst — ``regexp_extract_all`` over the
  decoded html, one explode per anchor element, URL resolution and
  canonicalization as string expressions (reusing
  ``functions/urls.url_normalize``).  No Python UDF: the projection
  stays inside whole-stage codegen, verified by the plan gate in
  tests/test_linkgraph.py.
- ``host_graph`` collapses the page graph to (src_host, dst_host,
  weight) with one map-side-combinable aggregation — at web scale this
  is ~3-5 orders of magnitude smaller than the page graph and is the
  granularity at which the public webgraph datasets are released.
- ``pagerank`` is DataFrame power iteration.  The edge table is
  normalized to per-source transition probabilities ONCE and persisted;
  each iteration shuffles only the rank vector (one row per node) into
  the edge join plus the contribution aggregation (one row per edge,
  map-side combined on dst).  Dangling mass is redistributed uniformly
  (the standard Page et al. 1999 / Langville-Meyer treatment), computed
  as ONE scalar aggregate per iteration; convergence is an L1-delta
  scalar per iteration — both bounded driver roundtrips, never per-node
  collects.  Every iteration ends in ``localCheckpoint(eager=True)`` to
  truncate lineage: without it the logical plan nests one join deeper
  per iteration and Catalyst analysis time grows superlinearly (on a
  real cluster with a reliable checkpoint dir, swap in
  ``DataFrame.checkpoint`` — same call site, flagged below).
- ``inlink_anchor_text`` bounds the per-page state: raw anchor
  occurrences are first reduced to DISTINCT (dst, anchor) counts (one
  combinable shuffle — a hub page linked a billion times with "click
  here" contributes one row per map partition), and only then does a
  row_number window pick the top ``max_anchors`` per page.  The window
  input is distinct-anchor rows, orders of magnitude smaller than raw
  inlinks; anchors are truncated to ``max_anchor_chars`` first so no
  single row is unbounded either.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.urls import url_host, url_normalize
from whoosh_novo_spark.sources.extract import _NAMED_ENTITIES

# href schemes that never name an http(s) document
_NON_HTTP = r"(?i)^(javascript:|mailto:|tel:|data:|ftp:|file:|about:|#)"
_ABS = r"(?i)^[a-z][a-z0-9+.-]*://"


def _decoded(df: DataFrame, html_col: str, charset: str) -> Column:
    """html column as string (decode only when it is binary)."""
    dtype = dict(df.dtypes).get(html_col)
    c = F.col(html_col)
    return F.decode(c, charset) if dtype == "binary" else c


def _clean_anchor(el: Column) -> Column:
    """Visible text of one <a ...>...</a> element: inner markup
    stripped, core entities decoded, whitespace canonicalized."""
    s = F.regexp_extract(el, r"(?is)<a\s[^>]*>(.*)</a\s*>$", 1)
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, rep in _NAMED_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def _resolve(href: Column, src: Column) -> Column:
    """Absolute URL for ``href`` found on page ``src`` (RFC 3986
    subset: absolute / protocol-relative / root-relative / query-only /
    path-relative, with ``./`` and up to three ``../`` levels collapsed
    — deeper traversals are vanishingly rare in real markup and degrade
    to an un-collapsed path, never to a wrong host)."""
    scheme = F.lower(F.regexp_extract(src, r"(?i)^([a-z][a-z0-9+.-]*)://", 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    host = url_host(src)
    rest = F.regexp_replace(src, _ABS, "")
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    base_dir = F.regexp_replace(path, r"[^/]*$", "")  # up to last '/'
    origin = F.concat(scheme, F.lit("://"), host)

    out = (
        F.when(href.rlike(_ABS), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .when(href.startswith("?"), F.concat(origin, path, href))
        .otherwise(F.concat(origin, base_dir, href))
    )
    out = F.regexp_replace(out, r"(?<=/)\./", "")
    for _ in range(3):
        out = F.regexp_replace(out, r"/[^/.][^/]*/\.\./", "/")
    return out


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    charset: str = "UTF-8",
    drop_self: bool = True,
    drop_nofollow: bool = False,
) -> DataFrame:
    """(src, dst, anchor) for every hyperlink in ``html_col``.

    ``src`` is the page URL as given; ``dst`` is the href resolved
    against the page and canonicalized with ``url_normalize`` (so
    fragment-only / tracking-param variants of one target collapse).
    Non-document schemes (javascript:, mailto:, tel:, data:, ftp:) and
    pure-fragment hrefs are dropped; with ``drop_self`` links that
    resolve back to the page itself are too.  ``drop_nofollow`` drops
    links carrying ``rel=nofollow`` (or its ugc/sponsored refinements)
    — the convention by which a page disclaims endorsement, so a
    PageRank feed should set it (anchor-TEXT aggregation may keep
    them; hence off by default and chosen per consumer).  One output
    row per anchor occurrence — aggregate downstream (``host_graph``,
    ``inlink_anchor_text``) where the weighting is chosen.

    Whole plan is JVM expressions (regexp_extract_all + explode +
    string ops): no BatchEvalPython/ArrowEval node, gated in tests.
    """
    s = _decoded(df, html_col, charset)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")  # commented-out links
    els = F.regexp_extract_all(s, F.lit(r"(?is)(<a\s[^>]*>.*?</a\s*>)"), 1)
    el = F.explode(els).alias("_el")
    out = df.select(F.col(url_col).alias("src"), el)
    if drop_nofollow:
        nf = (
            r"(?is)\brel\s*=\s*(\"[^\"]*\b(nofollow|ugc|sponsored)\b[^\"]*\""
            r"|'[^']*\b(nofollow|ugc|sponsored)\b[^']*'"
            r"|[^\s>\"']*(nofollow|ugc|sponsored))"
        )
        out = out.where(~F.col("_el").rlike(nf))

    dq = F.regexp_extract("_el", r"(?is)\bhref\s*=\s*\"([^\"]*)\"", 1)
    sq = F.regexp_extract("_el", r"(?is)\bhref\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract("_el", r"(?is)\bhref\s*=\s*([^\s\"'>]+)", 1)
    href = F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)
    out = out.withColumn("_href", F.trim(href)).where(
        (F.col("_href") != "") & ~F.col("_href").rlike(_NON_HTTP)
    )
    # a fragment on an otherwise-real href is fine (normalize drops it)
    out = out.withColumn("_href", F.regexp_replace("_href", r"#.*$", "")).where(
        F.col("_href") != ""
    )
    out = out.select(
        "src",
        url_normalize(_resolve(F.col("_href"), F.col("src"))).alias("dst"),
        _clean_anchor(F.col("_el")).alias("anchor"),
    )
    if drop_self:
        out = out.where(F.col("dst") != url_normalize(F.col("src")))
    return out


def host_graph(
    links: DataFrame,
    src: str = "src",
    dst: str = "dst",
    inter_host_only: bool = True,
) -> DataFrame:
    """(src_host, dst_host, weight): the page graph collapsed to hosts
    — one map-side-combinable count aggregation.  ``inter_host_only``
    drops intra-site navigation edges (menus, breadcrumbs), which
    dominate raw link counts but carry no endorsement signal; host-level
    PageRank is conventionally computed on the inter-host graph."""
    g = links.select(
        url_host(F.col(src)).alias("src_host"),
        url_host(F.col(dst)).alias("dst_host"),
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if inter_host_only:
        g = g.where(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    alpha: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) by damped power iteration over ``edges``.

    Semantics (Page et al. 1999): ``r' = (1-alpha)*t + alpha *
    (P^T r + dangling_mass * t)`` where P is the row-stochastic
    transition matrix over out-edges (``weight`` column taken as edge
    multiplicity when given), dangling_mass is the summed rank of
    nodes with no out-edges, and t is the teleport distribution —
    uniform 1/N by default, or PERSONALIZED via ``teleport``: a
    DataFrame of trusted seed nodes (first column; optional second
    column = seed weight), normalized to sum 1, zero elsewhere.  The
    personalized form is TrustRank (Gyongyi, Garcia-Molina & Pedersen,
    VLDB 2004): trust flows out of hand-vetted seeds, so link farms —
    which inflate uniform PageRank by citing each other — score ~0
    unless a trusted path reaches them.  Ranks sum to 1 at every
    iteration (seeded runs start at r=t).  Stops after ``max_iter``
    iterations or when the L1 delta drops below ``tol`` (pass
    ``tol=None`` to always run ``max_iter`` — what the numpy parity
    test does).

    Scale: the probability-normalized edge table is built once and
    persisted; per iteration the only moving data is the rank vector
    (one row per node) through one join and one combinable groupBy
    (one row per edge).  Dangling mass and the L1 delta are one scalar
    ``collect()`` each.  ``localCheckpoint(eager=True)`` after every
    iteration truncates lineage so the logical plan stays one-join
    deep regardless of iteration count — on a cluster with an HDFS/S3
    checkpoint dir prefer ``DataFrame.checkpoint()`` at the same call
    site for executor-loss resilience.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    # Bounded driver fast path (r6): below ~100k nodes the distributed
    # iteration is pure scheduling floor — each of max_iter rounds costs
    # several query stages of fixed overhead (~17 s/round measured on a
    # 2-node host graph in the CLI smoke, 265 s total), while a numpy
    # power iteration over the collected edge list finishes in
    # milliseconds with the SAME update rule (parity-gated at 1e-9
    # against the distributed path, tests/test_linkgraph.py).  The edge
    # collect is capped; bigger graphs keep the distributed iteration
    # unchanged.  Kill switch / cap: WNS_PAGERANK_LOCAL_MAX_NODES
    # (0 disables).
    import os as _os

    small_n = int(_os.environ.get("WNS_PAGERANK_LOCAL_MAX_NODES", "100000"))
    if 0 < n <= small_n:
        edge_cap = 2_000_000
        erows = e.limit(edge_cap + 1).collect()
        if len(erows) <= edge_cap:
            out = _pagerank_local(
                e.sparkSession, e, nodes, erows, alpha, max_iter, tol, teleport
            )
            nodes.unpersist()
            return out
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    probs = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("p"))
        .persist()
    )
    probs.count()  # materialize once; every iteration reuses the cache

    if teleport is None:
        tnodes = nodes.select("node", F.lit(1.0 / n).alias("t"))
    else:
        tc = teleport.columns
        tw = F.col(tc[1]).cast("double") if len(tc) > 1 else F.lit(1.0)
        # aggregate duplicate seed rows BEFORE the join (a repeated seed
        # node would otherwise fan out the join and emit duplicate rank
        # rows), and normalize over the seeds that intersect the graph's
        # node set — seeds absent from the edge-derived nodes must not
        # absorb teleport mass, or ranks no longer sum to 1
        seeds = (
            teleport.select(F.col(tc[0]).alias("node"), tw.alias("tw"))
            .groupBy("node")
            .agg(F.sum("tw").alias("tw"))
        )
        on_graph = nodes.join(seeds, "node", "left").select(
            "node", F.coalesce(F.col("tw"), F.lit(0.0)).alias("tw")
        )
        tot = on_graph.agg(F.sum("tw")).collect()[0][0]
        if not tot:
            raise ValueError(
                "teleport seeds have zero total weight on the graph's nodes"
            )
        tnodes = on_graph.select("node", (F.col("tw") / tot).alias("t"))
    tnodes = tnodes.persist()
    tnodes.count()

    ranks = tnodes.select("node", F.col("t").alias("rank")).localCheckpoint()
    # with-out-edge node set from the PERSISTED probs table: deriving it
    # from outw would re-run the full edge aggregation inside the
    # dangling-mass anti-join on EVERY iteration (the rank vector is
    # supposed to be the only moving data per round)
    src_nodes = probs.select(F.col("src").alias("node")).distinct().persist()
    for _ in range(max_iter):
        # dangling mass rides INSIDE the plan as a broadcast 1-row agg —
        # no separate driver job per iteration (the per-round barrier
        # floor measured in BENCH/BASELINE.md §0r5lg2); the checkpoint
        # is lazy when a delta job will materialize it anyway
        dangling = ranks.join(src_nodes, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contribs = (
            ranks.join(probs, ranks.node == probs.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("c"))
        )
        tscale = F.lit(1.0 - alpha) + F.lit(alpha) * F.col("dm")
        new_ranks = (
            tnodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.col("t") * tscale
                    + alpha * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=tol is None)
        )
        if tol is not None:
            delta = (  # this job also materializes the lazy checkpoint
                ranks.withColumnRenamed("rank", "r0")
                .join(new_ranks, "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("r0"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    probs.unpersist()
    nodes.unpersist()
    tnodes.unpersist()
    src_nodes.unpersist()
    return ranks


def _pagerank_local(
    spark,
    e: DataFrame,
    nodes: DataFrame,
    erows,
    alpha: float,
    max_iter: int,
    tol: float | None,
    teleport: DataFrame | None,
) -> DataFrame:
    """numpy power iteration for the bounded small-graph fast path —
    same update rule, teleport semantics and stopping condition as the
    distributed loop (see pagerank); parity-gated at 1e-9."""
    import numpy as np

    from pyspark.sql import types as T

    node_vals = [r["node"] for r in nodes.collect()]
    node_vals.sort(key=lambda v: (str(type(v)), v))  # deterministic order
    idx = {v: i for i, v in enumerate(node_vals)}
    n = len(node_vals)
    si = np.array([idx[r["src"]] for r in erows], dtype=np.int64)
    di = np.array([idx[r["dst"]] for r in erows], dtype=np.int64)
    w = np.array([float(r["w"]) for r in erows], dtype=np.float64)
    outw = np.bincount(si, weights=w, minlength=n)
    p = w / outw[si]
    has_out = np.zeros(n, dtype=bool)
    has_out[si] = True

    if teleport is None:
        t = np.full(n, 1.0 / n, dtype=np.float64)
    else:
        tc = teleport.columns
        tw = F.col(tc[1]).cast("double") if len(tc) > 1 else F.lit(1.0)
        seeds = (
            teleport.select(F.col(tc[0]).alias("node"), tw.alias("tw"))
            .groupBy("node")
            .agg(F.sum("tw").alias("tw"))
        )
        # bounded: only seeds that intersect the (<= cap) node set matter
        srows = nodes.join(seeds, "node", "inner").collect()
        t = np.zeros(n, dtype=np.float64)
        for r in srows:
            t[idx[r["node"]]] = float(r["tw"])
        tot = t.sum()
        if not tot:
            raise ValueError(
                "teleport seeds have zero total weight on the graph's nodes"
            )
        t /= tot

    r = t.copy()
    for _ in range(max_iter):
        contrib = np.bincount(di, weights=r[si] * p, minlength=n)
        dm = r[~has_out].sum()
        new = t * (1.0 - alpha + alpha * dm) + alpha * contrib
        if tol is not None:
            delta = np.abs(new - r).sum()
            r = new
            if delta < tol:
                break
        else:
            r = new

    node_t = e.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("node", node_t), T.StructField("rank", T.DoubleType())]
    )
    return spark.createDataFrame(
        [(v, float(r[i])) for v, i in idx.items()], schema
    )


def inlink_anchor_text(
    links: DataFrame,
    dst: str = "dst",
    anchor: str = "anchor",
    max_anchors: int = 20,
    max_anchor_chars: int = 80,
    min_count: int = 1,
) -> DataFrame:
    """(url, anchor_text): the top inbound anchor strings per target
    page, joined into one space-separated field ready to index as an
    ``anchor`` field of the target document (see
    tests/test_linkgraph.py for the build_segment composition).

    Two-stage bounding: occurrences -> distinct (dst, anchor) counts
    first (combinable — hub pages cost one row per map partition per
    distinct anchor), THEN a top-``max_anchors`` row_number window over
    the distinct rows.  ``min_count`` prunes singleton anchors before
    the window when the corpus is large; anchors longer than
    ``max_anchor_chars`` are truncated so no row is unbounded.  Ties
    break on the anchor string, so output is partitioning-independent.
    """
    a = F.trim(F.substring(F.lower(F.col(anchor)), 1, max_anchor_chars))
    counts = (
        links.select(F.col(dst).alias("url"), a.alias("a"))
        .where(F.col("a") != "")
        .groupBy("url", "a")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        counts = counts.where(F.col("cnt") >= min_count)
    top = Window.partitionBy("url").orderBy(F.desc("cnt"), F.asc("a"))
    picked = counts.withColumn("_rn", F.row_number().over(top)).where(
        F.col("_rn") <= max_anchors
    )
    return (
        picked.groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_rn"), F.col("a")))
                    ),
                    lambda s: s["a"],
                ),
                " ",
            ).alias("anchor_text")
        )
    )


def canonical_url(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    charset: str = "UTF-8",
    out_col: str = "canonical",
) -> DataFrame:
    """Attach the page-DECLARED canonical URL: ``<link rel="canonical"
    href=...>`` (either attribute order), falling back to the
    ``og:url`` meta property; resolved against the page and normalized
    like every dst in this module.  Null when the page declares none,
    or when the declaration points at a different host (cross-host
    canonicals are usually scraper spam pointing at the victim — the
    conservative crawl rule is to ignore them).

    Composition for recrawl dedup — URL-spelling variants AND declared
    mirrors collapse to one key, survivor still keeps its own bytes::

        key = F.coalesce(F.col("canonical"), F.col("url"))
        docs = keep_latest_crawl(canonical_url(docs).withColumn("_k", key),
                                 url_col="_k")

    Pure Catalyst (regexp_extract + string expressions), same plan
    guarantee as ``extract_links``.
    """
    s = _decoded(df, html_col, charset)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    link1 = F.regexp_extract(
        s,
        r"(?is)<link\s[^>]*rel\s*=\s*[\"']?canonical[\"']?[^>]*href\s*=\s*[\"']([^\"']+)[\"']",
        1,
    )
    link2 = F.regexp_extract(
        s,
        r"(?is)<link\s[^>]*href\s*=\s*[\"']([^\"']+)[\"'][^>]*rel\s*=\s*[\"']?canonical",
        1,
    )
    og1 = F.regexp_extract(
        s,
        r"(?is)<meta\s[^>]*property\s*=\s*[\"']og:url[\"'][^>]*content\s*=\s*[\"']([^\"']+)[\"']",
        1,
    )
    og2 = F.regexp_extract(
        s,
        r"(?is)<meta\s[^>]*content\s*=\s*[\"']([^\"']+)[\"'][^>]*property\s*=\s*[\"']og:url[\"']",
        1,
    )
    first = F.when(link1 != "", link1).when(link2 != "", link2)
    href = first.otherwise(F.when(og1 != "", og1).when(og2 != "", og2))
    resolved = url_normalize(_resolve(F.trim(href), F.col(url_col)))
    same_host = url_host(resolved) == url_host(F.col(url_col))
    return df.withColumn(
        out_col,
        F.when(href.isNotNull() & (F.trim(href) != "") & same_host, resolved),
    )


def meta_robots(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    charset: str = "UTF-8",
) -> DataFrame:
    """Attach ``robots_noindex`` / ``robots_nofollow`` booleans from the
    page's ``<meta name="robots" content="...">`` directive (either
    attribute order; ``none`` means both, per the published robots
    meta-tag convention).  A crawl pipeline drops noindex pages before
    ``build_segment`` and excludes nofollow pages' outlinks from
    PageRank; both compose as plain filters::

        pages = meta_robots(docs)
        to_index = pages.where(~F.col("robots_noindex"))
        links = extract_links(pages.where(~F.col("robots_nofollow")))

    Pure Catalyst, same plan guarantee as the other extractors here.
    """
    s = _decoded(df, html_col, charset)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    c1 = F.regexp_extract(
        s,
        r"(?is)<meta\s[^>]*name\s*=\s*[\"']?robots[\"']?[^>]*content\s*=\s*[\"']([^\"']*)[\"']",
        1,
    )
    c2 = F.regexp_extract(
        s,
        r"(?is)<meta\s[^>]*content\s*=\s*[\"']([^\"']*)[\"'][^>]*name\s*=\s*[\"']?robots[\"']?",
        1,
    )
    content = F.lower(F.when(c1 != "", c1).otherwise(c2))
    has = lambda kw: content.rlike(rf"(^|[\s,]){kw}([\s,]|$)")  # noqa: E731
    return df.withColumn(
        "robots_noindex", has("noindex") | has("none")
    ).withColumn("robots_nofollow", has("nofollow") | has("none"))


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    tol: float | None = 1e-6,
) -> DataFrame:
    """(node, hub, authority) by HITS power iteration (Kleinberg 1999,
    JACM): ``a' = E^T h``, ``h' = E a'``, each vector L2-normalized per
    round.  PageRank's complement as a link signal: authority rewards
    being cited by good HUBS (directories, link lists) rather than by
    high-traffic pages generally — the pair is the classic topic-portal
    vs endpoint split.

    Scale shape mirrors ``pagerank``: the edge table is persisted once;
    each half-step is one join of a node-sized vector with the edges
    plus a map-side-combinable sum; the L2 norm rides in-plan as a
    broadcast one-row aggregate (no driver collect per round); rounds
    end in a lazy ``localCheckpoint`` that the convergence job
    materializes.  Stops when the L1 delta of both vectors drops below
    ``tol`` (``tol=None`` runs exactly ``max_iter`` rounds — the numpy
    parity mode).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    e.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "authority", F.lit(0.0)
        )

    def _l2_normalized(df: DataFrame, col: str) -> DataFrame:
        norm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
        return df.crossJoin(F.broadcast(norm)).select(
            "node",
            F.when(F.col("_n") > 0, F.col(col) / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    import math

    hv = nodes.select(
        "node", F.lit(1.0 / math.sqrt(n)).alias("hub")
    ).localCheckpoint()
    av = nodes.select("node", F.lit(1.0 / math.sqrt(n)).alias("authority"))
    for _ in range(max_iter):
        new_a = (
            hv.join(e, hv.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        new_a = _l2_normalized(
            nodes.join(new_a, "node", "left").select(
                "node", F.coalesce("authority", F.lit(0.0)).alias("authority")
            ),
            "authority",
        ).localCheckpoint(eager=tol is None)
        new_h = (
            new_a.join(e, new_a.node == e.dst)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        new_h = _l2_normalized(
            nodes.join(new_h, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        ).localCheckpoint(eager=tol is None)
        if tol is not None:
            delta = (
                hv.withColumnRenamed("hub", "h0")
                .join(new_h, "node")
                .join(av.withColumnRenamed("authority", "a0"), "node")
                .join(new_a, "node")
                .agg(
                    F.sum(
                        F.abs(F.col("hub") - F.col("h0"))
                        + F.abs(F.col("authority") - F.col("a0"))
                    )
                )
                .collect()[0][0]
            )
            hv, av = new_h, new_a
            if delta < tol:
                break
        else:
            hv, av = new_h, new_a
    out = hv.join(av, "node")
    e.unpersist()
    nodes.unpersist()
    return out
