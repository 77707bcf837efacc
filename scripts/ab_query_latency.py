"""Controlled same-host A/B of sf0.1 query latencies across code versions.

VERDICT r2 task #1: BENCH_r02 showed q_andnot +67%, q_fuzzy +48%,
q_or3_wand +32%, q_dismax +37%, p50 +40% vs BENCH_r01 at sf0.1 — but the
host has a documented +-2x noisy-neighbor variance and the two benches ran
hours apart.  This harness settles it: both code versions, back-to-back in
the SAME host window, interleaved A/B/A/B, N reps each, fresh subprocess
per rep (cold JVM, warm OS page cache), medians reported.

Usage:
    git worktree add /tmp/wns_r1 <r1-commit>
    python scripts/ab_query_latency.py [--reps 5] [--cores 32] \
        [--r1 /tmp/wns_r1] [--sf /root/testdata/sf0.1]

Each version builds its own index from the identical sf0.1 documents table
(manifest format changed between rounds, so sharing one on-disk index would
test the reader shim, not the query path).  The child leg below only uses
API surface present in both rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Runs under BOTH code versions: argv = repo_path ix_path sf_dir cores mode
CHILD = r"""
import json, os, sys, time
repo, ix_path, sf_dir, cores, mode = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5])
sys.path.insert(0, repo)
from whoosh_novo_spark.session import get_spark
from whoosh_novo_spark.schema import IndexConfig, FieldConfig
from whoosh_novo_spark.sources.segment_store import SegmentStore
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.plans import ast

spark = get_spark("ab-leg", cores=cores, shuffle_partitions=max(32, cores))
cfg = IndexConfig(id_col="doc_id", fields=(FieldConfig("text"),))

if mode == "build":
    import shutil
    from whoosh_novo_spark.operators.build import build_segment
    shutil.rmtree(ix_path, ignore_errors=True)
    store = SegmentStore(ix_path)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text")
    t0 = time.time()
    build_segment(spark, docs, cfg, store, partitions=max(8, cores // 2))
    print(json.dumps({"build_sec": round(time.time() - t0, 3)}))
    sys.exit(0)

store = SegmentStore(ix_path)
s = Searcher(Index(spark, store, cfg))
T = lambda w: ast.Term("text", w)
qset = {
    "q_term": T("spark"),
    "q_and2": ast.And((T("spark"), T("data"))),
    "q_and3": ast.And((T("spark"), T("data"), T("query"))),
    "q_or3": ast.Or((T("spark"), T("data"), T("query"))),
    "q_or_head": ast.Or((T("the"), T("data"), T("line"))),
    "q_dismax": ast.DisjunctionMax((T("spark"), T("data"), T("query"))),
    "q_andnot": ast.AndNot(T("spark"), T("data")),
    "q_prefix": ast.Prefix("text", "qu"),
    "q_fuzzy": ast.FuzzyTerm("text", "spark"),
}
s.search(T("warm"), limit=10).collect()
lat = {}
for name, q in qset.items():
    t0 = time.time()
    s.search(q, limit=10).collect()
    lat[name] = round(time.time() - t0, 3)

from whoosh_novo_spark.operators.wand import search_wand
t0 = time.time()
res = search_wand(s, qset["q_or3"], limit=10, n_buckets=cores)
if hasattr(res, "collect"):
    res.collect()
lat["q_or3_wand"] = round(time.time() - t0, 3)

from whoosh_novo_spark.operators.batch import search_batch
many = {}
for i in range(50):
    many[f"b{i}"] = ast.Or((T("spark"), T("data"), T(f"w{i:05d}")))
t0 = time.time()
search_batch(s, many, limit=10).collect()
lat["batch50_per_query"] = round((time.time() - t0) / 50, 4)

import numpy as np
singles = []
words = ["spark", "data", "query", "line", "merge", "batch", "table", "scan"]
for i in range(40):
    w1, w2 = words[i % len(words)], words[(i + 3) % len(words)]
    q = ast.And((T(w1), T(w2))) if i % 2 else ast.Or((T(w1), T(w2)))
    t0 = time.time()
    s.search(q, limit=10).collect()
    singles.append(time.time() - t0)
p50, p95 = np.percentile(singles, [50, 95])
lat["p50_single"] = round(float(p50), 3)
lat["p95_single"] = round(float(p95), 3)
print(json.dumps(lat))
"""

KEYS = [
    "q_term", "q_and2", "q_and3", "q_or3", "q_or_head", "q_dismax",
    "q_andnot", "q_prefix", "q_fuzzy", "q_or3_wand", "batch50_per_query",
    "p50_single", "p95_single",
]


def run_child(repo: str, ix: str, sf: str, cores: int, mode: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD)
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, path, repo, ix, sf, str(cores), mode],
            capture_output=True, text=True, timeout=900,
        )
        if out.returncode != 0:
            raise RuntimeError(f"{mode} leg failed for {repo}:\n{out.stderr[-2000:]}")
        return json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        os.unlink(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--r1", default="/tmp/wns_r1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH/ab_r1_vs_r3.json")
    args = ap.parse_args()

    versions = {"r1": args.r1, "r3": REPO}
    ixs = {v: f"/tmp/ab_ix_{v}" for v in versions}
    uptime = open("/proc/loadavg").read().strip()
    print(f"loadavg at start: {uptime}", file=sys.stderr)

    for v, repo in versions.items():
        b = run_child(repo, ixs[v], args.sf, args.cores, "build")
        print(f"built {v} index in {b['build_sec']}s", file=sys.stderr)

    reps: dict[str, list[dict]] = {v: [] for v in versions}
    for i in range(args.reps):
        order = ["r1", "r3"] if i % 2 == 0 else ["r3", "r1"]
        for v in order:
            lat = run_child(versions[v], ixs[v], args.sf, args.cores, "query")
            reps[v].append(lat)
            print(f"rep {i + 1} {v}: {json.dumps(lat)}", file=sys.stderr)

    med = {
        v: {k: round(statistics.median(r[k] for r in reps[v]), 4) for k in KEYS}
        for v in versions
    }
    table = []
    for k in KEYS:
        a, b = med["r1"][k], med["r3"][k]
        table.append({
            "query": k, "r1_median": a, "r3_median": b,
            "delta_pct": round(100.0 * (b - a) / a, 1) if a else None,
        })
    result = {
        "loadavg_start": uptime,
        "loadavg_end": open("/proc/loadavg").read().strip(),
        "reps": args.reps, "cores": args.cores, "sf": args.sf,
        "per_rep": reps, "medians": med, "table": table,
    }
    os.makedirs(os.path.dirname(os.path.join(REPO, args.out)), exist_ok=True)
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=2)
    w = max(len(k) for k in KEYS)
    print(f"{'query'.ljust(w)}  r1_med  r3_med  delta%")
    for row in table:
        print(f"{row['query'].ljust(w)}  {row['r1_median']:<6}  "
              f"{row['r3_median']:<6}  {row['delta_pct']}")


if __name__ == "__main__":
    main()
