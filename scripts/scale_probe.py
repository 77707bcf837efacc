"""Scale probe: build + query the synthetic corpus at N docs (default 4M)
and compare against the 1M bench legs — evidence that build throughput is
flat (linear wall) and query latency grows sublinearly as the corpus
scales, i.e. the plans hold as data grows toward the 100 TB target.

Usage: python scripts/scale_probe.py [n_docs] [cpus]
Writes BENCH/scale_probe_<n>.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import numpy as np

    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.operators.wand import search_wand
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.session import get_spark
    from whoosh_novo_spark.sources.corpus import synthesize_corpus
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    spark = get_spark("wns-scale-probe", cores=cpus, shuffle_partitions=max(32, cpus))
    corpus_path = f"/tmp/wns_probe_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthesize_corpus(spark, n_docs=n_docs, n_partitions=cpus, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    ix_path = f"/tmp/wns_probe_ix_{n_docs}"
    shutil.rmtree(ix_path, ignore_errors=True)
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),), stored_cols=())
    t0 = time.time()
    m = build_segment(spark, corpus, cfg, SegmentStore(ix_path), partitions=None)
    build_sec = time.time() - t0

    s = Searcher(Index(spark, SegmentStore(ix_path), cfg))
    T = lambda w: ast.Term("text", w)  # noqa: E731
    s.search(T("warm"), limit=10).collect()
    lat = {}
    or3 = ast.Or((T("render"), T("shade"), T("texture")))
    for name, fn in [
        ("or3_exact", lambda: s.search(or3, limit=10).collect()),
        ("or3_wand", lambda: search_wand(s, or3, limit=10, n_buckets=cpus).collect()),
        ("and2", lambda: s.search(ast.And((T("spark"), T("index"))), limit=10).collect()),
        ("prefix", lambda: s.search(ast.Prefix("text", "w0002"), limit=10).collect()),
    ]:
        t0 = time.time()
        fn()
        lat[name] = round(time.time() - t0, 3)
    singles = []
    words = ["render", "spark", "query", "merge", "block", "score", "w00042", "w00500"]
    for i in range(20):
        a, b = words[i % len(words)], words[(i + 3) % len(words)]
        q = ast.And((T(a), T(b))) if i % 2 else ast.Or((T(a), T(b)))
        t0 = time.time()
        s.search(q, limit=10).collect()
        singles.append(time.time() - t0)
    p50, p95 = np.percentile(singles, [50, 95])
    lat["p50_single"] = round(float(p50), 3)
    lat["p95_single"] = round(float(p95), 3)

    out = {
        "n_docs": int(m.doc_count_all),
        "cpus": cpus,
        "build_sec": round(build_sec, 3),
        "build_docs_per_sec": round(m.doc_count_all / build_sec, 1),
        "queries": lat,
        "loadavg": open("/proc/loadavg").read().split()[:3],
    }
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        f"scale_probe_{n_docs}.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
