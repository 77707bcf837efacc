"""Concurrent query-serving throughput (QPS) bench.

The single-query legs in bench.py measure LATENCY of one job at a time;
a serving deployment runs many independent queries concurrently and cares
about THROUGHPUT and tail latency under that concurrency.  Spark supports
this natively: jobs submitted from different driver threads run
concurrently, and the FAIR scheduler keeps one heavy query from starving
the rest — exactly how a real query frontend shares a long-lived
SparkSession (the reference engine is single-process and answers one
query at a time; concurrency there means N OS processes and N copies of
the index cache).

Method: a fixed mixed workload (term / and2 / or3 / prefix over corpus
vocabulary, all warm) is answered by a thread pool at concurrency
c in {1, 4, 8, 16}; every query is a full top-10 search + collect.
Reports per-level QPS + p50/p95 per-query wall and the scaling curve.
Driver threads spend their time blocked in py4j/socket reads, so the
GIL does not serialize the JVM-side work.

Usage: python scripts/qps_bench.py [n_docs] [cpus]
Reuses the staged bench corpus/index at /tmp/wns_bench_* when present
(same corpus seed as bench.py); writes BENCH/qps.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.session import get_spark
    from whoosh_novo_spark.sources.corpus import synthesize_corpus
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    spark = get_spark(
        "wns-qps",
        cores=cpus,
        shuffle_partitions=max(32, cpus),
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )

    corpus_path = "/tmp/wns_bench_corpus"
    ix_path = "/tmp/wns_bench_ix_synth"
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),), stored_cols=())
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthesize_corpus(spark, n_docs=n_docs, n_partitions=cpus, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    # SegmentStore writes LATEST (+ manifest-<gen>.json), never a bare
    # "manifest" file — checking the wrong name re-built (appended!) a
    # duplicate segment over an existing store on every run
    if not os.path.exists(os.path.join(ix_path, "LATEST")):
        corpus = spark.read.parquet(corpus_path)
        build_segment(spark, corpus, cfg, SegmentStore(ix_path), partitions=None)

    s = Searcher(Index(spark, SegmentStore(ix_path), cfg))
    T = lambda w: ast.Term("text", w)  # noqa: E731

    words = ["render", "spark", "query", "merge", "block", "score", "index",
             "table", "shade", "texture", "w00042", "w00500", "w01234", "w02000"]
    workload = []
    for i, w in enumerate(words):
        workload.append((f"term_{w}", T(w)))
        workload.append((f"and2_{i}", ast.And((T(w), T(words[(i + 3) % len(words)])))))
        if i % 3 == 0:
            workload.append(
                (f"or3_{i}", ast.Or((T(w), T(words[(i + 1) % len(words)]),
                                     T(words[(i + 5) % len(words)])))))
    workload.append(("prefix_w0002", ast.Prefix("text", "w0002")))
    workload.append(("prefix_w0100", ast.Prefix("text", "w0100")))

    # warm: stats cache + file-range cache + JVM codegen for every shape
    for _name, q in workload:
        s.search(q, limit=10).collect()

    def run_one(q) -> float:
        t0 = time.time()
        s.search(q, limit=10).collect()
        return time.time() - t0

    results = {}
    n_queries = 48  # per concurrency level: whole workload ~= covered
    for conc in (1, 4, 8, 16):
        qs = [workload[i % len(workload)][1] for i in range(n_queries)]
        loadavg = round(os.getloadavg()[0], 2)
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=conc) as pool:
            lats = list(pool.map(run_one, qs))
        wall = time.time() - t0
        results[f"c{conc}"] = {
            "qps": round(n_queries / wall, 2),
            "wall_sec": round(wall, 3),
            "p50_sec": round(statistics.median(lats), 3),
            "p95_sec": round(sorted(lats)[int(0.95 * len(lats)) - 1], 3),
            "loadavg_start": loadavg,
        }
        print(f"c={conc}: {results[f'c{conc}']}", flush=True)

    out = {
        "n_docs": n_docs,
        "cpus": cpus,
        "n_queries_per_level": n_queries,
        "workload_mix": "14 term + 14 and2 + 5 or3 + 2 prefix, warm",
        "scheduler": "FAIR",
        "levels": results,
        "qps_speedup_c8_vs_c1": round(
            results["c8"]["qps"] / results["c1"]["qps"], 2
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/qps.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
