"""Two-parallelism scaling run (north rule evidence).

The rule's N -> 4N executor criterion can't use a real cluster in this
sandbox; per the driver instruction we run the SAME job at two
parallelism levels (local[8] vs local[32]) on identical input and report
throughput at both plus scaling efficiency = T_low / (ratio * T_high).

Each level runs in its OWN subprocess (fresh JVM) so the master setting
is really different.  Partitioning is held constant across levels — only
the executor-thread count changes, exactly like adding executors.

Usage: python scripts/scaling_run.py [n_docs] [low_cores] [high_cores]
Writes BENCH/scaling_r{N}.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from whoosh_novo_spark.session import get_spark
from whoosh_novo_spark.schema import IndexConfig, FieldConfig
from whoosh_novo_spark.sources.corpus import synthesize_corpus
from whoosh_novo_spark.sources.segment_store import SegmentStore
from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.operators.batch import search_batch
from whoosh_novo_spark.plans import ast

cores = {cores}
n_docs = {n_docs}
parts = {parts}
spark = get_spark(f"scale-{{cores}}", cores=cores, shuffle_partitions=parts)
# local-scale split sizing so map stages stay wide (see session.py note)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
ixp = f"/tmp/wns_scale_{{cores}}"
shutil.rmtree(ixp, ignore_errors=True)
store = SegmentStore(ixp)
cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),))
# stage the corpus to parquet first: the timed job reads a table (the
# Iceberg-table shape of the north rule), not a generator
src = "/tmp/wns_scale_corpus"
if not os.path.exists(src + "/_SUCCESS_MARK_" + str(n_docs)):
    shutil.rmtree(src, ignore_errors=True)
    synthesize_corpus(spark, n_docs=n_docs, n_partitions=parts, seed=42).write.mode(
        "overwrite").parquet(src)
    open(src + "/_SUCCESS_MARK_" + str(n_docs), "w").close()
docs = spark.read.parquet(src).select("url", "text")

# warm the Python workers (imports of numpy/pandas per worker are a
# one-time session cost, not part of steady-state throughput)
shutil.rmtree(ixp + "_warm", ignore_errors=True)
warm_store = SegmentStore(ixp + "_warm")
build_segment(
    spark, synthesize_corpus(spark, n_docs=2000, n_partitions=cores, seed=7),
    cfg, warm_store, partitions=cores,
)

t0 = time.time()
m = build_segment(spark, docs, cfg, store, partitions=parts)
t_build = time.time() - t0

s = Searcher(Index(spark, store, cfg))
T = lambda w: ast.Term("text", w)
qs = {{}}
for i in range(40):
    qs[f"or{{i}}"] = ast.Or((T("render"), T("shade"), T(f"w{{i:05d}}")))
    qs[f"and{{i}}"] = ast.And((T("render"), T(f"w{{i:05d}}")))
search_batch(s, dict(list(qs.items())[:4]), limit=10).collect()  # warm
t0 = time.time()
search_batch(s, qs, limit=10).collect()
t_query = time.time() - t0
print("RESULT" + json.dumps({{
    "cores": cores, "n_docs": int(m.doc_count_all), "build_sec": round(t_build, 3),
    "docs_per_sec": round(m.doc_count_all / t_build, 1),
    "batch80_query_sec": round(t_query, 3),
    "queries_per_sec": round(len(qs) / t_query, 1),
}}))
spark.stop()
"""


def run_level(cores: int, n_docs: int, parts: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, n_docs=n_docs, parts=parts)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    parts = 2 * high  # identical partitioning at both levels
    r_low = run_level(low, n_docs, parts)
    r_high = run_level(high, n_docs, parts)
    ratio = high / low
    eff_build = r_low["build_sec"] / (ratio * r_high["build_sec"])
    eff_query = r_low["batch80_query_sec"] / (ratio * r_high["batch80_query_sec"])
    out = {
        "n_docs": n_docs,
        "partitions": parts,
        "low": r_low,
        "high": r_high,
        "cores_ratio": ratio,
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_query": round(eff_query, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
