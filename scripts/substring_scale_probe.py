"""Scale probe for exact-substring dedup (the newest cleaning stage):
run remove_duplicate_spans over N synthetic docs with a PLANTED hot
boilerplate span — a fixed 60-token footer appended to a fraction of
docs, the classic web-template shape that makes every one of its
rolling grams a single hot shuffle key — and verify both throughput
and the exact keep-first token accounting at scale.

The zipfian synth corpus alone has essentially no natural 50-gram
repeats, so without planting, the probe would time only the
no-duplicate fast path; the planted footer exercises exactly the skew
the operator's docstring argues about (one gram's occurrence list =
the duplicated span's copy count, here N*frac rows through one window
key).

Usage: python scripts/substring_scale_probe.py [n_docs] [cpus] [frac_pct]
Writes BENCH/substring_probe_<n>.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FOOTER_TOKENS = 60
MIN_TOKENS = 50


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    frac_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    from pyspark.sql import functions as F

    from whoosh_novo_spark.operators.substring_dedup import remove_duplicate_spans
    from whoosh_novo_spark.session import get_spark
    from whoosh_novo_spark.sources.corpus import synthesize_corpus

    spark = get_spark(
        "wns-substr-probe", cores=cpus, shuffle_partitions=max(32, cpus)
    )
    footer = " ".join(f"boiler{i:04d}" for i in range(FOOTER_TOKENS))

    corpus_path = f"/tmp/wns_substr_corpus_{n_docs}_{frac_pct}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        base = synthesize_corpus(spark, n_docs=n_docs, n_partitions=cpus, seed=42)
        planted = base.withColumn(
            "text",
            F.when(
                F.crc32(F.col("url")) % 100 < frac_pct,
                F.concat(F.col("text"), F.lit(" " + footer)),
            ).otherwise(F.col("text")),
        )
        planted.write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_planted = corpus.where(F.crc32(F.col("url")) % 100 < frac_pct).count()

    t0 = time.time()
    out = remove_duplicate_spans(
        corpus, id_col="url", text_col="text", min_tokens=MIN_TOKENS
    )
    # force the rewritten text (count() alone lets Catalyst prune the
    # rebuild UDF — the 0r5z measurement gotcha), and collect the audit sum
    agg = out.agg(
        F.count("*").alias("rows"),
        F.sum("n_tokens_removed").alias("toks_removed"),
        F.sum(F.length("text")).alias("text_bytes"),
    ).collect()[0]
    wall = time.time() - t0

    # keep-first accounting: every planted copy after the first loses the
    # 60-token footer; random zipfian text contributes ~0 natural repeats
    expected_removed = (n_planted - 1) * FOOTER_TOKENS
    result = {
        "n_docs": n_docs,
        "cpus": cpus,
        "planted_docs": int(n_planted),
        "hot_gram_occurrences": int(n_planted),
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "toks_removed": int(agg.toks_removed),
        "expected_removed_footer_only": expected_removed,
        "rows_out": int(agg.rows),
        "min_tokens": MIN_TOKENS,
        "footer_tokens": FOOTER_TOKENS,
    }
    os.makedirs("BENCH", exist_ok=True)
    path = f"BENCH/substring_probe_{n_docs}.json"
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
