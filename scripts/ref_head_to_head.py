"""Head-to-head vs the reference engine on the SAME rows, same host.

The reference publishes no performance numbers, so this measures them:
build wall + warm query latencies for whoosh-novo itself (single writer
AND its own multiprocess MpWriter path) vs this engine (local[32]),
over an identical pandas corpus — the "matches-or-beats its single-node
throughput at the same data scale" evidence, measured not asserted.

Usage: python scripts/ref_head_to_head.py [n_docs] [procs]
Writes BENCH/ref_head_to_head.json.
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import statistics
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
PROCS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
WORK = "/tmp/wns_h2h"


def load_reference():
    if "cached_property" not in sys.modules:
        m = types.ModuleType("cached_property")
        m.cached_property = functools.cached_property
        sys.modules["cached_property"] = m
    ref = "/root/reference/src"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import whoosh  # noqa: F401

    return whoosh


def med3(f):
    # one untimed per-shape warm-up first (applied identically to BOTH
    # engines): run 1 of a plan shape measures compile/JIT cold-start at
    # 2-3x steady state (bench.py has the measured 6-run profile)
    f()
    ts = []
    for _ in range(3):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 4)


def ref_leg(rows, procs: int):
    """Reference build (single-writer and MpWriter) + warm queries."""
    load_reference()
    from whoosh import fields, index, query
    from whoosh.analysis import StandardAnalyzer

    out = {}
    for tag, writer_kw in [
        ("single_writer", {}),
        (f"mp_writer_procs{procs}", {"procs": procs, "multisegment": True}),
    ]:
        path = f"{WORK}/ref_{tag}"
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path)
        schema = fields.Schema(
            url=fields.ID(stored=True),
            text=fields.TEXT(analyzer=StandardAnalyzer()),
        )
        ix = index.create_in(path, schema)
        t0 = time.time()
        w = ix.writer(**writer_kw)
        for url, text in rows:
            w.add_document(url=url, text=text)
        w.commit()
        wall = round(time.time() - t0, 3)
        out[tag] = {"build_sec": wall, "docs_per_sec": round(len(rows) / wall, 1)}

    # warm query latencies on the single-writer index (merged, best case)
    ix = index.open_dir(f"{WORK}/ref_single_writer")
    T = lambda w: query.Term("text", w)  # noqa: E731
    qs = {
        "q_term": T("render"),
        "q_and2": query.And([T("render"), T("shade")]),
        "q_or3": query.Or([T("render"), T("shade"), T("texture")]),
        "q_prefix": query.Prefix("text", "w0002"),
    }
    with ix.searcher() as s:
        s.search(T("warm"), limit=10)
        lat = {k: med3(lambda q=q: s.search(q, limit=10)) for k, q in qs.items()}
    out["query_sec_warm"] = lat
    return out


def engine_leg(pdf):
    from whoosh_novo_spark.operators.build import build_segment
    from whoosh_novo_spark.operators.query import Index, Searcher
    from whoosh_novo_spark.plans import ast
    from whoosh_novo_spark.schema import FieldConfig, IndexConfig
    from whoosh_novo_spark.session import get_spark
    from whoosh_novo_spark.sources.segment_store import SegmentStore

    spark = get_spark("h2h", cores=32)
    sdf = spark.createDataFrame(
        list(zip(pdf["url"], pdf["text"])), "url string, text string"
    )
    sdf.write.mode("overwrite").parquet(f"{WORK}/corpus")  # staged input, like bench.py
    corpus = spark.read.parquet(f"{WORK}/corpus")
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),), stored_cols=())
    path = f"{WORK}/engine_ix"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    build_segment(spark, corpus, cfg, SegmentStore(path), partitions=None)
    wall = round(time.time() - t0, 3)
    s = Searcher(Index(spark, SegmentStore(path), cfg))
    T = lambda w: ast.Term("text", w)  # noqa: E731
    qs = {
        "q_term": T("render"),
        "q_and2": ast.And((T("render"), T("shade"))),
        "q_or3": ast.Or((T("render"), T("shade"), T("texture"))),
        "q_prefix": ast.Prefix("text", "w0002"),
    }
    s.search(T("warm"), limit=10).collect()
    lat = {k: med3(lambda q=q: s.search(q, limit=10).collect()) for k, q in qs.items()}
    return {
        "build_sec": wall,
        "docs_per_sec": round(len(pdf) / wall, 1),
        "query_sec_warm": lat,
    }


def main():
    from whoosh_novo_spark.sources.corpus import corpus_pandas

    os.makedirs(WORK, exist_ok=True)
    pdf = corpus_pandas(N_DOCS, seed=42, vocab_size=10_000)
    rows = list(zip(pdf["url"], pdf["text"]))
    print(f"corpus: {len(rows)} docs, loadavg {os.getloadavg()[0]:.2f}", flush=True)

    t0 = time.time()
    ref = ref_leg(rows, PROCS)
    print(f"reference leg done in {time.time() - t0:.1f}s: {ref}", flush=True)

    t0 = time.time()
    eng = engine_leg(pdf)
    print(f"engine leg done in {time.time() - t0:.1f}s: {eng}", flush=True)

    result = {
        "design": (
            "identical pandas corpus rows fed to both engines on the same "
            "host; reference = whoosh-novo FileStorage index (its own "
            "single writer and MpWriter multiprocess paths, default "
            "limitmb); engine = build_segment on local[32], staged "
            "parquet input (bench.py methodology); queries median-of-3 "
            "warm, limit=10"
        ),
        "n_docs": N_DOCS,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "reference": ref,
        "engine": eng,
        "date": "2026-08-18",
    }
    out = Path(__file__).resolve().parent.parent / "BENCH" / "ref_head_to_head.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
