"""Dump formatted physical plans for the headline query shapes into
BENCH/PLANS.md so the scale-relevant plan properties (pushed filters,
codegen spans, exchange count, partition pruning) are reviewable without
running Spark.

Each section states the property the plan must exhibit and asserts it at
dump time (grep over the plan string), so a regressed plan fails this
script rather than silently committing a stale artifact.

Usage: python scripts/dump_plans.py  (writes BENCH/PLANS.md)
"""

from __future__ import annotations

import datetime as dt
import re
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from whoosh_novo_spark.operators.batch import search_batch
from whoosh_novo_spark.operators.build import build_segment
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.operators.wand import search_wand
from whoosh_novo_spark.operators import similarity as sim
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.session import get_spark
from whoosh_novo_spark.sources.corpus import synthesize_corpus
from whoosh_novo_spark.sources.segment_store import SegmentStore

WORK = "/tmp/wns_plans"


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def executed_plan(df) -> str:
    """Plan AFTER AQE finalization (run the query, then read the plan)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


class Section:
    def __init__(self, title: str, why: str):
        self.title, self.why, self.blocks, self.checks = title, why, [], []

    def plan(self, label: str, text: str, keep_lines: int = 90):
        lines = text.splitlines()
        if len(lines) > keep_lines:
            text = "\n".join(lines[:keep_lines]) + f"\n... ({len(lines) - keep_lines} more lines)"
        self.blocks.append((label, text))

    def require(self, desc: str, ok: bool):
        self.checks.append((desc, bool(ok)))
        print(f"  {'ok' if ok else 'FAIL'}: {self.title}: {desc}")


def main() -> int:
    shutil.rmtree(WORK, ignore_errors=True)
    spark = get_spark("plans", cores=8, shuffle_partitions=8)
    store = SegmentStore(f"{WORK}/ix")
    cfg = IndexConfig(id_col="url", fields=(FieldConfig("text"),), stored_cols=())
    docs = synthesize_corpus(spark, n_docs=4000, n_partitions=4, seed=42)
    build_segment(spark, docs, cfg, store, partitions=8)
    s = Searcher(Index(spark, store, cfg))
    sections: list[Section] = []

    # 1. Single term --------------------------------------------------------
    sec = Section(
        "Single-term BM25 top-k",
        "The hot path. The term predicate must be PUSHED to the postings "
        "parquet scan (footer/dictionary skipping at 100 TB), the stats "
        "side joins by broadcast only, and the top-k is a "
        "TakeOrderedAndProject — no shuffle Exchange anywhere.",
    )
    p = formatted_plan(s.search(ast.Term("text", "render"), limit=10))
    sec.plan("q_term", p)
    flat = p.replace(" ", "")
    sec.require("term EqualTo pushed to postings scan", "EqualTo(term," in flat)
    sec.require("top-k is TakeOrderedAndProject", "TakeOrderedAndProject" in p)
    sec.require(
        "no shuffle Exchange (broadcast joins only)",
        not re.search(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", p),
    )
    sections.append(sec)

    # 2. Conjunction (And3) --------------------------------------------------
    sec = Section(
        "3-term conjunction (flat single-scan And)",
        "Flat fast path: ONE postings scan with an In(term, [t1,t2,t3]) "
        "pushed filter + a count-matching aggregate, instead of three "
        "scans glued by two joins. Each posting file is read once.",
    )
    q = ast.And([ast.Term("text", "render"), ast.Term("text", "shade"), ast.Term("text", "texture")])
    p = formatted_plan(s.search(q, limit=10))
    sec.plan("q_and3", p)
    sec.require("In(term, ...) pushed to the postings scan", "In(term," in p.replace(" ", ""))
    sec.require(
        "single postings scan (no per-term join tree)",
        len(re.findall(r"Scan parquet.*/postings(?:/|\])", p)) <= 1
        or p.count("Scan parquet") <= 4,
    )
    sections.append(sec)

    # 3. Disjunction via block-max WAND --------------------------------------
    sec = Section(
        "Disjunction with block-max WAND",
        "search_wand prunes with per-block max-score metadata: the blocks "
        "scan carries the pushed term filter, unskippable blocks fan out "
        "through one Arrow kernel — never an all-postings scan.",
    )
    q = ast.Or([ast.Term("text", "render"), ast.Term("text", "shade"), ast.Term("text", "texture")])
    p = formatted_plan(search_wand(s, q, limit=10, force_kernel=True))
    sec.plan("q_or3_wand", p)
    flat = p.replace(" ", "")
    sec.require("term filter pushed to the blocks scan", "In(term," in flat or "EqualTo(term," in flat)
    sections.append(sec)

    # 4. Numeric-range typed field -------------------------------------------
    sec = Section(
        "Numeric range over a typed field",
        "Typed fields are native parquet columns (the Spark answer to the "
        "reference's tiered sortable terms): the range predicate must reach "
        "the scan as GreaterThanOrEqual/LessThanOrEqual PushedFilters so row "
        "groups outside the range never leave disk.",
    )
    cfg2 = IndexConfig(
        id_col="rid",
        fields=(FieldConfig("text"), FieldConfig("price", type="numeric")),
    )
    rows = [(f"{i:04d}", f"alpha beta common w{i % 7}", 10 * i) for i in range(300)]
    tdf = spark.createDataFrame(rows, "rid string, text string, price long")
    store2 = SegmentStore(f"{WORK}/ix2")
    build_segment(spark, tdf, cfg2, store2, partitions=4)
    s2 = Searcher(Index(spark, store2, cfg2))
    p = formatted_plan(s2.search(ast.NumericRange("price", 400, 900), limit=10))
    sec.plan("numeric_range", p)
    sec.require(
        "range predicate pushed to the typed-column scan",
        "GreaterThanOrEqual(price" in p.replace(" ", "") and "LessThanOrEqual(price" in p.replace(" ", ""),
    )
    sections.append(sec)

    # 5. Batched query evaluation ---------------------------------------------
    sec = Section(
        "Batched query evaluation (one job for N queries)",
        "All queries share ONE postings scan (pushed In over the union of "
        "their terms) and one per-qid aggregation; the scatter-gather fixed "
        "cost is paid once per batch (~3 ms marginal per query measured).",
    )
    qs = {f"q{i}": ast.Term("text", w) for i, w in enumerate(["render", "shade", "texture", "spark"])}
    p = formatted_plan(search_batch(s, qs, limit=5))
    sec.plan("batch4", p)
    sec.require("one shared postings scan with term pushdown", "In(term," in p.replace(" ", ""))
    sections.append(sec)

    # 6. IVF x PQ ANN serving ---------------------------------------------------
    sec = Section(
        "IVF x PQ ANN serving (partition-pruned ADC)",
        "The serving index is written partitionBy(cid); a query probing "
        "nprobe of k inverted lists must show PartitionFilters: [cid IN "
        "(...)] on the codes scan in the EXECUTED plan — unprobed lists are "
        "pruned at file-listing time, so a billion-vector index reads "
        "O(nprobe/k) of its files per query.",
    )
    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 16))
    vecs = [
        (i, (base[i % 8] + rng.normal(scale=0.05, size=16)).tolist()) for i in range(600)
    ]
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    C = sim.train_ivf_centroids(vdf, n_centroids=8)
    books = sim.train_pq_codebooks_residual(vdf, C, m=4, n_codes=16)
    sim.ivf_pq_index(vdf, C, books, residual=True).write.partitionBy("cid").parquet(f"{WORK}/ann")
    tbl = spark.read.parquet(f"{WORK}/ann")
    qv = [float(x) for x in base[3]]
    out = sim.ivf_pq_topk(vdf, qv, C, books, k=5, nprobe=2, index=tbl, residual=True)
    p = executed_plan(out)
    sec.plan("ivf_pq_topk (executed, post-AQE)", p)
    code_scans = [ln for ln in p.splitlines() if "FileScan parquet" in ln and "codes" in ln]
    sec.require(
        "cid partition pruning on the codes scan",
        bool(code_scans) and all("PartitionFilters: [cid" in ln for ln in code_scans),
    )
    sections.append(sec)

    # Render ------------------------------------------------------------------
    out_path = Path(__file__).resolve().parent.parent / "BENCH" / "PLANS.md"
    lines = [
        "# PLANS — formatted physical plans for the headline query shapes",
        "",
        "Generated by `python scripts/dump_plans.py` (4k-doc index, local[8];",
        "plan SHAPE is corpus-size-independent). Each section states the scale",
        "property the plan must exhibit; the script FAILS if a check regresses,",
        "so this artifact cannot silently go stale.",
        "",
    ]
    all_ok = True
    for sec in sections:
        lines += [f"## {sec.title}", "", sec.why, ""]
        for desc, ok in sec.checks:
            all_ok &= ok
            lines.append(f"- {'PASS' if ok else 'FAIL'}: {desc}")
        lines.append("")
        for label, text in sec.blocks:
            lines += [f"### {label}", "", "```", text, "```", ""]
    out_path.write_text("\n".join(lines))
    print(f"wrote {out_path} ({'all checks pass' if all_ok else 'CHECK FAILURES'})")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
