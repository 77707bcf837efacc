"""LLM-data-pipeline operator bench: dedup + similarity at synthetic scale.

The driver bench (bench.py) covers the index/query engine; this bench
times the training-data pipeline operators on synthetic inputs big
enough to exercise the distributed shapes (hash-groupBy, banded LSH
joins, Arrow-batched kernels):

- exact dedup over N_DOCS synthetic docs (10% planted duplicates)
- MinHash signatures + banded-LSH candidate pairs + verify
- SimHash signatures + Hamming near-pairs
- banded sign-LSH embedding near-dup over N_VECS vectors (1% planted
  noisy near-dups at cos 0.85-0.97)
- brute-force batched cosine top-k (100 queries in one scan)
- IVF: train + assign + nprobe query

Writes BENCH/pipeline.json and prints one JSON line.
Usage: python scripts/pipeline_bench.py [n_docs] [n_vecs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    dim = 64

    from pyspark.sql import functions as F

    from whoosh_novo_spark.session import get_spark
    from whoosh_novo_spark.sources.corpus import synthesize_corpus

    spark = get_spark("pipeline-bench", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    res: dict = {"n_docs": n_docs, "n_vecs": n_vecs, "dim": dim}

    # ---- corpus with planted exact duplicates (10%)
    docs = synthesize_corpus(spark, n_docs=n_docs, n_partitions=32, seed=11).select(
        "url", "text"
    )
    dups = (
        docs.limit(n_docs // 10)
        .select(F.concat(F.lit("dup-"), F.col("url")).alias("url"), "text")
    )
    corpus_path = f"/tmp/wns_pipe_docs_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        docs.unionByName(dups).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    total_docs = corpus.count()

    from whoosh_novo_spark.operators.dedup import (
        exact_duplicate_stats,
        minhash_dedup_pairs,
        simhash_near_pairs,
    )

    t0 = time.time()
    n_groups = exact_duplicate_stats(corpus, id_col="url").count()
    el = time.time() - t0
    res["exact_dedup_sec"] = round(el, 2)
    res["exact_dedup_docs_per_sec"] = round(total_docs / el)
    res["exact_dup_groups"] = n_groups
    print("LEG exact_dedup done", res["exact_dedup_sec"], file=sys.stderr)

    t0 = time.time()
    n_pairs = minhash_dedup_pairs(corpus, id_col="url", tau=0.8, hash_fn="xxhash64").count()
    el = time.time() - t0
    res["minhash_lsh_sec"] = round(el, 2)
    res["minhash_docs_per_sec"] = round(total_docs / el)
    res["minhash_pairs"] = n_pairs
    print("LEG minhash done", res["minhash_lsh_sec"], file=sys.stderr)

    t0 = time.time()
    n_sim = simhash_near_pairs(corpus, id_col="url", max_hamming=3).count()
    el = time.time() - t0
    res["simhash_sec"] = round(el, 2)
    res["simhash_docs_per_sec"] = round(total_docs / el)
    res["simhash_pairs"] = n_sim
    print("LEG simhash done", res["simhash_sec"], file=sys.stderr)

    # ---- embeddings with planted noisy near-dups (1%)
    emb_path = f"/tmp/wns_pipe_vecs_{n_vecs}"
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        n_planted = n_vecs // 100

        def gen(it):
            import pandas as pd

            for pdf in it:
                for seed_part in pdf["id"].to_numpy():
                    rng = np.random.default_rng(1000 + int(seed_part))
                    per = n_vecs // 64
                    base = rng.standard_normal((per, dim))
                    base /= np.linalg.norm(base, axis=1, keepdims=True)
                    ids = (int(seed_part) * per + np.arange(per)).astype("int64")
                    yield pd.DataFrame(
                        {"vec_id": ids, "embedding": [r.tolist() for r in base]}
                    )

        parts = spark.range(64).repartition(64)
        vecs = parts.mapInPandas(gen, "vec_id long, embedding array<double>")
        # planted partners: perturb the first n_planted vectors
        rng = np.random.default_rng(5)

        def plant(it):
            import pandas as pd

            for pdf in it:
                keep = pdf[pdf["vec_id"] < n_planted]
                out_ids, out_vecs = [], []
                for vid, v in zip(keep["vec_id"], keep["embedding"]):
                    x = np.asarray(v)
                    r = np.random.default_rng(9_000_000 + int(vid))
                    target = r.uniform(0.85, 0.97)
                    u = r.standard_normal(dim)
                    u -= (u @ x) * x
                    u /= np.linalg.norm(u)
                    y = x + np.sqrt(1.0 / target**2 - 1.0) * u
                    out_ids.append(10_000_000 + int(vid))
                    out_vecs.append([float(t) for t in y])
                yield pd.DataFrame(
                    {
                        "vec_id": pd.Series(out_ids, dtype="int64"),
                        "embedding": pd.Series(out_vecs, dtype=object),
                    }
                )

        partners = vecs.mapInPandas(plant, "vec_id long, embedding array<double>")
        vecs.unionByName(partners).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    total_vecs = emb.count()
    res["total_vecs"] = total_vecs

    from whoosh_novo_spark.operators.similarity import (
        cosine_topk_batch,
        embedding_near_dup_pairs,
        ivf_ann_topk,
        ivf_assign,
        train_ivf_centroids,
    )

    t0 = time.time()
    nd = embedding_near_dup_pairs(emb, tau=0.85, dim=dim).count()
    el = time.time() - t0
    res["near_dup_banded_sec"] = round(el, 2)
    res["near_dup_vecs_per_sec"] = round(total_vecs / el)
    res["near_dup_pairs"] = nd
    n_planted = n_vecs // 100
    res["near_dup_planted"] = n_planted
    print("LEG near_dup done", res["near_dup_banded_sec"], file=sys.stderr)

    # batched brute-force cosine: 100 queries in one scan
    qvecs = [
        (int(i), [float(x) for x in np.random.default_rng(i).standard_normal(dim)])
        for i in range(100)
    ]
    queries = spark.createDataFrame(qvecs, "qid long, qvec array<double>")
    t0 = time.time()
    cosine_topk_batch(emb, queries, k=10).count()
    el = time.time() - t0
    res["cosine_batch100_sec"] = round(el, 2)
    res["cosine_batch_vec_query_per_sec"] = round(total_vecs * 100 / el)
    print("LEG cosine done", res["cosine_batch100_sec"], file=sys.stderr)

    # IVF: train on bounded sample, assign all, one probe query
    t0 = time.time()
    cents = train_ivf_centroids(emb, n_centroids=64)
    assigned = ivf_assign(emb, cents)
    ivf_path = f"/tmp/wns_pipe_ivf_{n_vecs}"
    assigned.write.mode("overwrite").partitionBy("cid").parquet(ivf_path)
    el = time.time() - t0
    res["ivf_build_sec"] = round(el, 2)
    ivf_tbl = spark.read.parquet(ivf_path)
    t0 = time.time()
    for i in range(5):
        qv = [float(x) for x in np.random.default_rng(7 + i).standard_normal(dim)]
        ivf_ann_topk(
            emb, qv, centroids=cents, k=10, nprobe=8, assigned=ivf_tbl
        ).collect()
    res["ivf_query_p50_sec"] = round((time.time() - t0) / 5, 3)

    # PQ: train + encode all + ADC query (+rerank)
    from whoosh_novo_spark.operators.similarity import (
        pq_ann_topk,
        pq_encode,
        train_pq_codebooks,
    )

    t0 = time.time()
    books = train_pq_codebooks(emb, m=8, n_codes=256)
    pq_path = f"/tmp/wns_pipe_pq_{n_vecs}"
    pq_encode(emb, books).write.mode("overwrite").parquet(pq_path)
    res["pq_build_sec"] = round(time.time() - t0, 2)
    enc = spark.read.parquet(pq_path)
    t0 = time.time()
    for i in range(5):
        qv = [float(x) for x in np.random.default_rng(19 + i).standard_normal(dim)]
        pq_ann_topk(enc, qv, books, k=10, rerank=emb).collect()
    res["pq_query_rerank_p50_sec"] = round((time.time() - t0) / 5, 3)

    # IVF x PQ composed (r5): one-pass assign+encode serving index
    # written partitionBy(cid), probe-pruned ADC + exact re-rank —
    # the billion-vector serving shape
    from whoosh_novo_spark.operators.similarity import ivf_pq_index, ivf_pq_topk

    t0 = time.time()
    ivfpq_path = f"/tmp/wns_pipe_ivfpq_{n_vecs}"
    ivf_pq_index(emb, cents, books).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(ivfpq_path)
    res["ivf_pq_build_sec"] = round(time.time() - t0, 2)
    ivfpq_tbl = spark.read.parquet(ivfpq_path)
    t0 = time.time()
    for i in range(5):
        qv = [float(x) for x in np.random.default_rng(29 + i).standard_normal(dim)]
        ivf_pq_topk(
            emb, qv, cents, books, k=10, nprobe=8, index=ivfpq_tbl
        ).collect()
    res["ivf_pq_query_p50_sec"] = round((time.time() - t0) / 5, 3)
    print("LEG ivf_pq done", res["ivf_pq_build_sec"], file=sys.stderr)

    # serving lifecycle (r5): incremental append (10% of the corpus),
    # compaction after the appends, tombstone-filtered batch query
    from whoosh_novo_spark.operators.similarity import (
        ivf_pq_index_append,
        ivf_pq_index_compact,
        ivf_pq_topk_batch,
    )

    delta = emb.limit(max(1, n_vecs // 10)).withColumn(
        "vec_id", F.col("vec_id") + int(2 * n_vecs)
    )
    t0 = time.time()
    ivf_pq_index_append(delta, cents, books, ivfpq_path)
    res["ivf_pq_append_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    stats = ivf_pq_index_compact(spark, ivfpq_path)
    res["ivf_pq_compact_sec"] = round(time.time() - t0, 2)
    res["ivf_pq_compact_files"] = f"{stats['files_before']}->{stats['files_after']}"
    qs = [
        (f"q{i}", [float(x) for x in np.random.default_rng(37 + i).standard_normal(dim)])
        for i in range(20)
    ]
    dels = spark.range(0, n_vecs, 97).withColumnRenamed("id", "vec_id")  # ~1% dead
    t0 = time.time()
    ivf_pq_topk_batch(
        emb, qs, cents, books, k=10, nprobe=8,
        index=spark.read.parquet(ivfpq_path), deletes=dels,
    ).collect()
    res["ivf_pq_batch20_tombstoned_sec"] = round(time.time() - t0, 2)
    print("LEG ivf_pq lifecycle done", res["ivf_pq_compact_files"], file=sys.stderr)

    # webtext cleaning pipeline (r5): the composed pre-index pass a
    # crawl actually runs — repetition filter -> cross-doc line dedup ->
    # PII scrub -> per-domain cap -> temperature language mix — one
    # number for the whole chain plus the survivor count at each stage.
    from whoosh_novo_spark.functions.urls import url_host
    from whoosh_novo_spark.operators.pipeline import clean_corpus
    from whoosh_novo_spark.operators.sampling import quota_per_stratum, temperature_mix

    clean_path = f"/tmp/wns_pipe_clean_{n_docs}"
    if not os.path.exists(os.path.join(clean_path, "_SUCCESS")):
        synthesize_corpus(spark, n_docs=n_docs, n_partitions=32, seed=29).select(
            "url", "text", "lang"
        ).write.mode("overwrite").parquet(clean_path)
    clean_in = spark.read.parquet(clean_path)  # staged: time the CHAIN, not synthesis
    t0 = time.time()
    # C4 stays off: the synthetic corpus is punctuation-free word soup,
    # which C4's terminal-punctuation rule correctly rejects wholesale.
    cleaned = clean_corpus(
        clean_in,
        id_col="url",
        stages=("repetition", "line_dedup", "pii"),
        options={"line_dedup": {"max_df": 50}},
    ).drop("n_lines_removed")
    # materialization boundary: the sampling stages compute per-stratum
    # counts OVER their input (quota thresholds, temperature quotas) —
    # without a boundary Spark would re-evaluate the whole cleaning
    # chain once per stats pass.  At production scale this is the
    # parquet write between pipeline phases; here persist() plays that
    # role and the cost is charged to the cleaning leg.
    cleaned = cleaned.persist()
    n_clean = cleaned.count()
    t1 = time.time()
    capped = quota_per_stratum(
        cleaned, url_host(F.col("url")), max(1, n_docs // 500), key_col="url"
    )
    mixed = temperature_mix(capped, "lang", total=n_docs // 4, alpha=0.5, key_col="url")
    n_out = mixed.count()
    t2 = time.time()
    cleaned.unpersist()
    res["clean_pipeline_sec"] = round(t2 - t0, 2)
    res["clean_filter_sec"] = round(t1 - t0, 2)
    res["clean_sample_sec"] = round(t2 - t1, 2)
    res["clean_pipeline_docs_per_sec"] = round(n_docs / (t2 - t0))
    res["clean_survivors"] = n_clean
    res["clean_pipeline_out_docs"] = n_out
    print("LEG clean pipeline done", res["clean_pipeline_sec"], file=sys.stderr)

    # learned quality classifier (r5): bounded-sample training + the
    # full-corpus scoring pass (the part that runs at 10^12 docs).
    # Positives get a planted trusted-vocabulary suffix so the model
    # has signal; accuracy gates live in tests/test_quality_clf.py —
    # this leg measures the train wall and map-only scoring throughput.
    from whoosh_novo_spark.functions.quality_clf import (
        quality_probability,
        train_quality_classifier,
    )

    sample = clean_in.limit(20_000)
    pos = sample.withColumn(
        "text", F.concat("text", F.lit(" peer reviewed methodology archive"))
    )
    neg = sample.withColumn(
        "text", F.concat("text", F.lit(" click winner casino bonus free"))
    )
    t0 = time.time()
    qm = train_quality_classifier(pos, neg, max_iter=20)
    res["quality_train_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    n_scored = quality_probability(clean_in, qm).where(F.col("quality_p") >= 0).count()
    el = time.time() - t0
    res["quality_score_sec"] = round(el, 2)
    res["quality_score_docs_per_sec"] = round(n_scored / el)
    print("LEG quality done", res["quality_score_sec"], file=sys.stderr)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "pipeline.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
