"""Dump .explain("formatted") for the round-6 optimization targets.

Usage: python scripts/dump_r06_plans.py <suffix>   (suffix = before|after)
Writes plans/r06/<query>_<suffix>.txt using the bench indexes
(/tmp/wns_bench_ix at sf0.1, /tmp/wns_bench_ix_synth at 1M docs) — run
bench.py first so the indexes exist.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from whoosh_novo_spark.operators.batch import search_batch
from whoosh_novo_spark.operators.query import Index, Searcher
from whoosh_novo_spark.operators.wand import search_wand
from whoosh_novo_spark.plans import ast
from whoosh_novo_spark.schema import FieldConfig, IndexConfig
from whoosh_novo_spark.session import get_spark
from whoosh_novo_spark.sources.segment_store import SegmentStore


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("r06-plans", cores=8, shuffle_partitions=32)
    T = lambda w: ast.Term("text", w)  # noqa: E731

    # 1M synthetic index (bench leg 2) — the scale-relevant plans
    cfg2 = IndexConfig(id_col="url", fields=(FieldConfig("text"),), stored_cols=())
    s2 = Searcher(Index(spark, SegmentStore("/tmp/wns_bench_ix_synth"), cfg2))
    or3 = ast.Or((T("render"), T("shade"), T("texture")))

    plans = {
        "q_term": s2.search(T("render"), limit=10),
        "q_and2": s2.search(ast.And((T("spark"), T("index"))), limit=10),
        "q_or3": s2.search(or3, limit=10),
        "q_dismax": s2.search(
            ast.DisjunctionMax((T("render"), T("shade"), T("texture"))), limit=10
        ),
        "q_andnot": s2.search(ast.AndNot(T("render"), T("shade")), limit=10),
        "q_prefix": s2.search(ast.Prefix("text", "w0002"), limit=10),
        "q_fuzzy": s2.search(ast.FuzzyTerm("text", "spark"), limit=10),
        "q_or3_wand": search_wand(s2, or3, limit=10, n_buckets=32),
        "batch": search_batch(
            s2,
            {f"b{i}": ast.Or((T("spark"), T("index"), T(f"w{i:05d}"))) for i in range(8)},
            limit=10,
        ),
    }
    for name, df in plans.items():
        (out_dir / f"{name}_{suffix}.txt").write_text(formatted_plan(df))
        print("wrote", name, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
