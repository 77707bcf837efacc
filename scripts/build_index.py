"""spark-submit entry point: build (or extend) an index over a web-pages
table and optionally run smoke queries.

    spark-submit --py-files "$(python -c 'from whoosh_novo_spark.session \
        import package_zip; print(package_zip())')" \
        scripts/build_index.py --input /path/pages.parquet \
        --index /path/index --query spark,index --k 10

This is the deployment shape the engine targets: the driver script plus
the package zip; no repo checkout needed on executors.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="parquet dir of (url, ..., text) docs")
    ap.add_argument("--index", default=None, help="segment store path")
    ap.add_argument(
        "--federate",
        default=None,
        help="comma-separated store paths: skip the build and answer "
        "--query over their federation (operators/federate.py) — the "
        "serving half of N independent per-partition build jobs",
    )
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--iceberg",
        action="store_true",
        help="treat --input as an Iceberg table location (sources/iceberg.py "
        "metadata walk) instead of a bare parquet dir",
    )
    ap.add_argument("--snapshot-id", type=int, default=None, help="with --iceberg")
    ap.add_argument("--as-of-ms", type=int, default=None, help="with --iceberg: time travel")
    ap.add_argument(
        "--from-html",
        action="store_true",
        help="derive the text column from the html:binary column at ingest "
        "(sources/extract.py JVM path; --full-entities switches to the Arrow "
        "kernel with full HTML5 entity decoding)",
    )
    ap.add_argument(
        "--from-warc",
        action="store_true",
        help="treat --input as WARC file(s) (glob ok, .warc/.warc.gz): "
        "parse response records and derive text+lang at ingest "
        "(sources/warc.py) — Common Crawl's own on-disk format",
    )
    ap.add_argument(
        "--keep-latest",
        action="store_true",
        help="recrawl dedup before indexing: keep only the newest capture "
        "per canonical URL (operators/dedup.keep_latest_crawl; needs a "
        "warc_ts column — always present with --from-warc)",
    )
    ap.add_argument(
        "--anchors",
        action="store_true",
        help="extract hyperlinks from the html column and index inbound "
        "anchor text as a second field 'anchor_text' of the TARGET page "
        "(operators/linkgraph.py) — needs an html column, e.g. --from-warc",
    )
    ap.add_argument(
        "--canonical",
        action="store_true",
        help="with --keep-latest: dedup on the page-declared canonical "
        "URL (link rel=canonical / og:url) when present, so declared "
        "mirrors collapse along with URL-spelling variants",
    )
    ap.add_argument(
        "--title",
        action="store_true",
        help="extract <title> from the html column and index it as a "
        "boosted 'title' field alongside the body (BM25F title "
        "weighting; needs an html column, e.g. --from-warc)",
    )
    ap.add_argument("--title-boost", type=float, default=2.0)
    ap.add_argument(
        "--pagerank-prior",
        action="store_true",
        help="compute host-level PageRank from the html column's links "
        "and store each page's host rank as a docmap column 'pr' — the "
        "materialized static prior fusion.static_prior_boost serves from "
        "(needs an html column, e.g. --from-warc)",
    )
    ap.add_argument(
        "--lang-routed",
        action="store_true",
        help="dispatch the text field's analyzer per ROW by the corpus "
        "lang column (mixed-language build: per-language stemming, stop "
        "lists and BM25 statistics; always available with --from-warc, "
        "which derives lang at ingest)",
    )
    ap.add_argument(
        "--report",
        action="store_true",
        help="print the corpus data card (counts, token quantiles, "
        "language mix, dup rate, top domains) before building",
    )
    ap.add_argument("--full-entities", action="store_true")
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--merge", action="store_true", help="compact after build")
    ap.add_argument("--query", default=None, help="comma-separated AND terms to smoke-query")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import os

    # phase tracing for the deployment smoke (WNS_CLI_TRACE=1): stderr
    # timestamps around each pipeline phase, used to attribute the CLI's
    # fixed costs (the pipeline is lazy, so wall time lands on actions)
    _trace_t = [time.time()]

    def _trace(name: str) -> None:
        if os.environ.get("WNS_CLI_TRACE") != "1":
            return
        t = time.time()
        print(f"[trace] {name}: +{t - _trace_t[0]:.1f}s", file=sys.stderr, flush=True)
        _trace_t[0] = t

    from pyspark.sql import SparkSession

    # Under spark-submit these configs come from the submit command and
    # the ones below are no-ops on the already-created session; when the
    # script is run bare (local smoke), Spark's defaults (1g driver heap,
    # 200 shuffle partitions x local[ALL] threads) OOM on iterative work
    # like --pagerank-prior — size them to the machine instead.
    _trace("argparse+imports")
    spark = (
        SparkSession.builder.appName("wns-build")
        .config("spark.sql.shuffle.partitions", str(os.cpu_count() or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    # when launched via spark-submit the session already exists; make sure
    # the package zip reaches executors even without --py-files
    try:
        from whoosh_novo_spark.session import ship_package

        ship_package(spark)
    except Exception:
        pass

    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    cfg = IndexConfig(
        id_col=args.id_col,
        fields=(FieldConfig(args.text_col, positions=args.positions),),
    )

    if args.federate:
        if not args.query:
            ap.error("--federate requires --query")
        from whoosh_novo_spark.operators.federate import FederatedIndex
        from whoosh_novo_spark.operators.query import Searcher
        from whoosh_novo_spark.plans import ast

        ix = FederatedIndex(spark, args.federate.split(","), cfg)
        terms = [t for t in args.query.split(",") if t]
        q = (
            ast.Term(args.text_col, terms[0])
            if len(terms) == 1
            else ast.And(tuple(ast.Term(args.text_col, t) for t in terms))
        )
        t0 = time.time()
        rows = Searcher(ix).search(q, limit=args.k).collect()
        print(json.dumps({
            "federated_stores": len(args.federate.split(",")),
            "segments": len(ix.manifest.segments),
            "doc_count": ix.doc_count_all,
            "query": {
                "terms": terms,
                "latency_sec": round(time.time() - t0, 3),
                "top": [[int(r["docid"]), round(float(r["score"]), 4)] for r in rows],
            },
        }))
        spark.stop()
        return

    if not args.input or not args.index:
        ap.error("--input and --index are required unless --federate is given")
    if args.from_warc and (args.iceberg or args.from_html):
        ap.error("--from-warc already yields extracted text; it excludes --iceberg/--from-html")
    _trace("session up")
    store = SegmentStore(args.index)
    if args.from_warc:
        from whoosh_novo_spark.sources.warc import read_warc, warc_to_corpus

        docs = warc_to_corpus(
            read_warc(spark, args.input), full_entities=args.full_entities
        )
    elif args.iceberg:
        from whoosh_novo_spark.sources.iceberg import read_iceberg

        docs = read_iceberg(
            spark, args.input, snapshot_id=args.snapshot_id, as_of_ms=args.as_of_ms
        )
    else:
        docs = spark.read.parquet(args.input)
    if args.from_html:
        from whoosh_novo_spark.sources.extract import ingest_html

        docs = ingest_html(
            docs, out_col=args.text_col, full_entities=args.full_entities
        )
    if args.canonical and not args.keep_latest:
        ap.error("--canonical refines --keep-latest's dedup key; pass both")
    if args.keep_latest:
        from whoosh_novo_spark.operators.dedup import keep_latest_crawl

        if args.canonical:
            # dedup key = the page-DECLARED canonical when present (so
            # declared mirrors collapse too), else the URL itself; the
            # surviving row keeps its own url bytes either way
            from pyspark.sql import functions as F

            from whoosh_novo_spark.operators.linkgraph import canonical_url

            docs = canonical_url(docs, url_col=args.id_col).withColumn(
                "_dedup_key", F.coalesce("canonical", args.id_col)
            )
            docs = keep_latest_crawl(docs, url_col="_dedup_key").drop(
                "_dedup_key", "canonical"
            )
        else:
            docs = keep_latest_crawl(docs, url_col=args.id_col)
    if args.lang_routed and "lang" not in docs.columns:
        ap.error("--lang-routed needs a lang column (e.g. --from-warc)")
    # Multiple downstream ACTIONS consume the cleaned corpus (report
    # stats, link extraction, PageRank, the build's docid stage): persist
    # it once so the ingest lineage (WARC parse -> recrawl dedup window)
    # is not re-executed per action.  MEMORY_AND_DISK spills on big
    # corpora — the standard 'materialize the cleaned corpus' shape; a
    # single-action run (plain build) skips the persist.
    _docs_pinned = None
    if args.report or args.pagerank_prior or args.anchors:
        docs = docs.persist()
        _docs_pinned = docs
    if args.report:
        _trace("lineage built (pre-report)")
        from whoosh_novo_spark.operators.report import corpus_report

        print(json.dumps(corpus_report(
            docs,
            text_col=args.text_col,
            lang_col="lang" if "lang" in docs.columns else None,
            url_col=args.id_col,
        )))
        _trace("report")
    fields = [
        FieldConfig(
            args.text_col, positions=args.positions, lang_routed=args.lang_routed
        )
    ]
    keep = [args.id_col, args.text_col]
    if args.lang_routed:
        keep.append("lang")
    stored: tuple[str, ...] | None = None
    if args.title:
        from whoosh_novo_spark.sources.extract import ingest_title

        if "html" not in docs.columns:
            ap.error("--title needs an html column (e.g. --from-warc)")
        docs = ingest_title(docs)
        fields.append(FieldConfig("title", boost=args.title_boost))
        keep.append("title")
    if args.anchors or args.pagerank_prior:
        from pyspark.sql import functions as F

        from whoosh_novo_spark.operators.linkgraph import extract_links

        if "html" not in docs.columns:
            ap.error(
                "--anchors/--pagerank-prior need an html column (e.g. --from-warc)"
            )
        links = extract_links(docs, url_col=args.id_col)
    if args.anchors:
        from whoosh_novo_spark.functions.urls import url_normalize
        from whoosh_novo_spark.operators.linkgraph import inlink_anchor_text

        # anchor targets are url_normalize'd by extract_links, but
        # keep_latest_crawl preserves the survivor's ORIGINAL url bytes —
        # join on a normalized key so a page whose captured URL differs
        # from canonical form (trailing slash, tracking params, host
        # case) still receives its inbound anchor text; the raw id_col
        # stays untouched for indexing
        anch = inlink_anchor_text(links).withColumnRenamed("url", "_norm_url")
        docs = docs.withColumn("_norm_url", url_normalize(F.col(args.id_col)))
        docs = docs.join(anch, "_norm_url", "left").drop("_norm_url").withColumn(
            "anchor_text", F.coalesce("anchor_text", F.lit(""))
        )
        fields.append(FieldConfig("anchor_text"))
        keep.append("anchor_text")
    if args.pagerank_prior:
        # host-level PageRank written INTO the docmap as a stored column
        # — the page-granularity prior path static_prior_boost documents:
        # no external prior table at serving, docmap([docid, pr]) only
        from whoosh_novo_spark.functions.urls import url_host
        from whoosh_novo_spark.operators.linkgraph import host_graph, pagerank

        _trace("pre-pagerank")
        pr = pagerank(
            host_graph(links), src="src_host", dst="dst_host",
            weight="weight", max_iter=15,
        ).withColumnRenamed("node", "_pr_host")
        docs = docs.withColumn("_pr_host", url_host(F.col(args.id_col)))
        # no forced broadcast: at the crawl scale this CLI advertises the
        # host table can exceed broadcast/driver limits (~10^8 hosts on a
        # full Common Crawl) — let AQE pick broadcast when it fits
        docs = docs.join(pr, "_pr_host", "left").withColumn(
            "pr", F.coalesce("rank", F.lit(0.0))
        )
        keep.append("pr")
        stored = ("pr",)
    cfg = IndexConfig(id_col=args.id_col, fields=tuple(fields), stored_cols=stored)
    docs = docs.select(*keep)
    _trace("pagerank+joins")
    t0 = time.time()
    m = build_segment(spark, docs, cfg, store, partitions=args.partitions)
    _trace("build_segment")
    if _docs_pinned is not None:
        _docs_pinned.unpersist()
    out = {
        "generation": m.generation,
        "segments": len(m.segments),
        "doc_count": m.doc_count_all,
        "build_sec": round(time.time() - t0, 2),
        "docs_per_sec": round(m.doc_count_all / (time.time() - t0), 1),
    }

    if args.merge:
        from whoosh_novo_spark.operators.merge import merge_segments

        m = merge_segments(spark, store, cfg)
        out["merged_segments"] = len(m.segments)

    if args.query:
        from whoosh_novo_spark.operators.query import Index, Searcher
        from whoosh_novo_spark.plans import ast

        ix = Index(spark, store, cfg)
        terms = [t for t in args.query.split(",") if t]

        def leaf(word: str) -> "ast.Query":
            if not args.lang_routed:
                return ast.Term(args.text_col, word)
            # routed build: terms live in text@<lang> virtual fields —
            # a cross-language query is the Or over the variants
            variants = ix.lang_variants(args.text_col) or [args.text_col]
            if len(variants) == 1:
                return ast.Term(variants[0], word)
            return ast.Or(tuple(ast.Term(v, word) for v in variants))

        q = (
            leaf(terms[0])
            if len(terms) == 1
            else ast.And(tuple(leaf(t) for t in terms))
        )
        s = Searcher(ix)
        t0 = time.time()
        rows = s.search(q, limit=args.k).collect()
        out["query"] = {
            "terms": terms,
            "latency_sec": round(time.time() - t0, 3),
            "top": [[int(r["docid"]), round(float(r["score"]), 4)] for r in rows],
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
