"""Federated-serving overhead A/B: one 1M-doc store vs the SAME corpus
split across two independently-built stores opened as a FederatedIndex.

Interleaved arms (single, federated, single, ...) with median-of-N per
query cancel window drift — the harness lesson from BENCH §0r5.  The
interesting number is the federation tax: extra file listing, the
docid-shift projection, and the cross-store stats fold.  Writes one
JSON line; redirect into BENCH/federate_ab.json.

Usage: python scripts/federate_ab.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from whoosh_novo_spark.operators.build import build_segment  # noqa: E402
from whoosh_novo_spark.operators.federate import FederatedIndex  # noqa: E402
from whoosh_novo_spark.operators.query import Index, Searcher  # noqa: E402
from whoosh_novo_spark.operators.wand import search_wand  # noqa: E402
from whoosh_novo_spark.plans import ast  # noqa: E402
from whoosh_novo_spark.schema import FieldConfig, IndexConfig  # noqa: E402
from whoosh_novo_spark.session import get_spark  # noqa: E402
from whoosh_novo_spark.sources.corpus import synthesize_corpus  # noqa: E402
from whoosh_novo_spark.sources.segment_store import SegmentStore  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("federate-ab", cores=cpus, shuffle_partitions=cpus)
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),), stored_cols=())

    corpus_path = "/tmp/wns_bench_corpus"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_path = "/tmp/wns_fed_corpus"
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            synthesize_corpus(spark, n_docs=n_docs, n_partitions=cpus, seed=42).write.mode(
                "overwrite"
            ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()

    single_path = "/tmp/wns_bench_ix_synth"
    if not os.path.exists(os.path.join(single_path, "LATEST")):
        single_path = "/tmp/wns_fed_single"
        if not os.path.exists(os.path.join(single_path, "LATEST")):
            build_segment(spark, corpus, cfg, SegmentStore(single_path), partitions=None)

    fed_paths = ["/tmp/wns_fed_a", "/tmp/wns_fed_b"]
    build_secs = []
    for i, p in enumerate(fed_paths):
        if os.path.exists(os.path.join(p, "LATEST")):
            continue
        shutil.rmtree(p, ignore_errors=True)
        half = corpus.where(F.crc32(F.col("url")) % 2 == i)
        t0 = time.time()
        build_segment(spark, half, cfg, SegmentStore(p), partitions=None)
        build_secs.append(round(time.time() - t0, 3))

    s_single = Searcher(Index(spark, SegmentStore(single_path), cfg))
    s_fed = Searcher(FederatedIndex(spark, fed_paths, cfg))
    assert s_fed.index.doc_count_all == s_single.index.doc_count_all == n

    T = lambda w: ast.Term("text", w)  # noqa: E731
    qset = {
        "q_term": T("spark"),
        "q_and2": ast.And((T("data"), T("index"))),
        "q_or3": ast.Or((T("spark"), T("query"), T("shuffle"))),
    }

    def run(searcher, q):
        t0 = time.time()
        searcher.search(q, limit=10).collect()
        return time.time() - t0

    def run_wand(searcher):
        t0 = time.time()
        search_wand(searcher, qset["q_or3"], limit=10, n_buckets=cpus).collect()
        return time.time() - t0

    # warm both arms once, then interleave
    for q in qset.values():
        run(s_single, q), run(s_fed, q)
    run_wand(s_single), run_wand(s_fed)

    out = {"n_docs": n, "reps": reps, "loadavg_start": round(os.getloadavg()[0], 2)}
    results: dict[str, dict[str, list[float]]] = {}
    for name, q in list(qset.items()) + [("q_or3_wand", None)]:
        results[name] = {"single": [], "federated": []}
        for _ in range(reps):
            if name == "q_or3_wand":
                results[name]["single"].append(run_wand(s_single))
                results[name]["federated"].append(run_wand(s_fed))
            else:
                results[name]["single"].append(run(s_single, q))
                results[name]["federated"].append(run(s_fed, q))
    for name, arms in results.items():
        ms, mf = statistics.median(arms["single"]), statistics.median(arms["federated"])
        out[name] = {
            "single_sec": round(ms, 3),
            "federated_sec": round(mf, 3),
            "overhead_pct": round(100 * (mf - ms) / ms, 1),
        }
    # rank parity spot check on the measured queries (belt and braces —
    # the real gate is tests/test_federated.py)
    for q in qset.values():
        a = [(r["docid"],) for r in s_single.search(q, limit=10).collect()]
        # docids differ across builds (different split); compare sizes only
        assert len(a) == s_fed.search(q, limit=10).count()
    out["fed_build_secs"] = build_secs
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
