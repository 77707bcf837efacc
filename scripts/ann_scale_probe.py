"""ANN scale probe: IVF x PQ vs brute force at vector-corpus scale.

The pipeline bench runs at 50k vectors; this probe scales the VECTOR
side the way scripts/scale_probe.py scales the index side — N synthetic
clustered vectors (default 1M, dim 64), then:

  1. ivf_pq_index build (train on bounded sample, assign+encode every
     vector, write partitionBy(cid)) — the one-time ingest cost;
  2. probe-pruned single-query latency (nprobe/n_centroids of the
     compressed codes scanned, exact re-rank of the shortlist);
  3. batched queries through ivf_pq_topk_batch (one job, Q queries);
  4. the same queries brute-force (cosine_topk_batch) — the exact
     baseline the approximation must beat;
  5. recall@10 of (2)/(3) against (4).

Also measures `recall_probe_ceiling` — exact re-rank over ALL probed
candidates — which splits a recall shortfall into its two causes:
coarse-probe misses (ceiling itself low -> raise n_centroids/nprobe)
vs ADC-shortlist misses (ceiling high, ADC recall low -> raise
shortlist or the code budget).

Writes BENCH/ann_scale.json and prints one JSON line.
Usage: python scripts/ann_scale_probe.py [n_vecs] [dim] [n_queries]
           [n_centroids] [nprobe] [shortlist]
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
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_centroids = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    nprobe = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    shortlist = int(sys.argv[6]) if len(sys.argv) > 6 else 300
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from whoosh_novo_spark.operators.similarity import (
        cosine_topk_batch,
        train_pq_codebooks_residual,
        ivf_pq_index,
        ivf_pq_topk,
        ivf_pq_topk_batch,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from whoosh_novo_spark.session import get_spark

    spark = get_spark("ann-scale", cores=cores, shuffle_partitions=cores)
    res = {"n_vecs": n_vecs, "dim": dim, "n_queries": n_queries, "cores": cores,
           "n_centroids": n_centroids, "nprobe": nprobe, "shortlist": shortlist}

    # HIERARCHICALLY clustered synthetic corpus (real embedding spaces
    # are clusters-of-subclusters; ANN's use case) — generated
    # distributed, deterministic per id.  A FLAT corpus with isotropic
    # in-cluster noise is ANN-adversarial: below cluster level the
    # margins are extreme order statistics of incompressible noise, and
    # recall@10 collapses for ANY fixed code budget (measured 0.21 at 1M
    # with raw 8-byte PQ — kept in BASELINE.md as the adversarial bound).
    n_centers = 256
    n_sub = 32
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((n_centers, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    subdirs = rng.standard_normal((n_centers, n_sub, dim))
    subdirs /= np.linalg.norm(subdirs, axis=2, keepdims=True)
    bc = spark.sparkContext.broadcast((centers, subdirs))

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            C, S = bc.value
            out = []
            for i in ids:
                r = np.random.default_rng(np.random.SeedSequence([int(i)]))
                c = int(i) % len(C)
                sc = (int(i) // len(C)) % S.shape[1]
                u = r.standard_normal(C.shape[1])
                v = C[c] + 0.4 * S[c][sc] + 0.15 * (u / np.linalg.norm(u))
                v /= np.linalg.norm(v)
                out.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": ids, "embedding": out})

    path = f"/tmp/wns_ann_scale_v3_{n_vecs}_{dim}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.time()
        spark.range(n_vecs).toDF("id").repartition(cores).mapInPandas(
            gen, "vec_id long, embedding array<double>"
        ).write.mode("overwrite").parquet(path)
        res["synth_sec"] = round(time.time() - t0, 2)
    emb = spark.read.parquet(path)

    # 1. serving-index build
    t0 = time.time()
    cents = train_ivf_centroids(emb, n_centroids=n_centroids, sample=max(16384, 32 * n_centroids))
    books = train_pq_codebooks_residual(emb, cents, m=8, n_codes=256, sample=16384)
    raw_books = train_pq_codebooks(emb, m=8, n_codes=256, sample=16384)
    res["train_sec"] = round(time.time() - t0, 2)
    idx_path = f"/tmp/wns_ann_scale_v3_idx_{n_vecs}_{dim}"
    t0 = time.time()
    ivf_pq_index(emb, cents, books, residual=True).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(idx_path)
    res["index_build_sec"] = round(time.time() - t0, 2)
    res["index_vecs_per_sec"] = round(n_vecs / res["index_build_sec"])
    idx = spark.read.parquet(idx_path)

    # query vectors: noisy twins of corpus members (true neighbors exist)
    queries = []
    for j in range(n_queries):
        r = np.random.default_rng(np.random.SeedSequence([int(j * 997 + 1)]))
        c = j % n_centers
        sc = j % n_sub
        u = r.standard_normal(dim)
        base = centers[c] + 0.4 * subdirs[c][sc] + 0.15 * (u / np.linalg.norm(u))
        w = r.standard_normal(dim)
        q = base / np.linalg.norm(base) + 0.1 * (w / np.linalg.norm(w))
        queries.append((j, [float(x) for x in q / np.linalg.norm(q)]))

    # 2. single-query latency (median of 5, warm)
    qv0 = queries[0][1]
    ivf_pq_topk(emb, qv0, cents, books, k=10, nprobe=nprobe, shortlist=shortlist, index=idx, residual=True).collect()
    lats = []
    for j in range(5):
        t0 = time.time()
        ivf_pq_topk(
            emb, queries[j][1], cents, books, k=10, nprobe=nprobe, shortlist=shortlist,
            index=idx, residual=True,
        ).collect()
        lats.append(time.time() - t0)
    res["single_query_p50_sec"] = round(sorted(lats)[len(lats) // 2], 3)

    # 3. batched
    t0 = time.time()
    batch = ivf_pq_topk_batch(
        emb, queries, cents, books, k=10, nprobe=nprobe, shortlist=shortlist, index=idx,
        residual=True,
    ).collect()
    res["batch_sec"] = round(time.time() - t0, 2)
    res["batch_per_query_sec"] = round(res["batch_sec"] / n_queries, 4)

    # 4. brute force baseline (one scan, all queries)
    qdf = spark.createDataFrame(
        [(j, v) for j, v in queries], "qid long, qvec array<double>"
    )
    t0 = time.time()
    exact_rows = cosine_topk_batch(emb, qdf, k=10).collect()
    res["brute_batch_sec"] = round(time.time() - t0, 2)

    # 5. recall
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    approx = {}
    for r in batch:
        approx.setdefault(int(str(r["qid"])), set()).add(r["vec_id"])
    recalls = [len(exact[j] & approx.get(j, set())) / 10 for j in exact]
    res["recall_at_10_residual"] = round(sum(recalls) / len(recalls), 3)

    # probe CEILING: fraction of the true top-10 whose coarse list is
    # probed at all — the best any shortlist/code budget could reach.
    # ceiling low -> raise n_centroids/nprobe; ceiling high but ADC
    # recall low -> raise shortlist / code budget.
    from whoosh_novo_spark.operators.similarity import _unit_rows

    Cn = _unit_rows(np.asarray(cents, dtype=np.float64))
    hit_ids = sorted({v for s in exact.values() for v in s})
    id_rows = emb.where(F.col("vec_id").isin([int(v) for v in hit_ids])).collect()
    X = _unit_rows(
        np.asarray([list(r["embedding"]) for r in id_rows], dtype=np.float64)
    )
    cid_of = dict(
        zip(
            [r["vec_id"] for r in id_rows],
            np.argmax(np.round(X @ Cn.T, 9), axis=1).tolist(),
        )
    )
    probe_sets = {}
    for j, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        q = q / np.linalg.norm(q)
        sims = np.round(q @ Cn.T, 9)
        probe_sets[j] = set(
            sorted(range(len(Cn)), key=lambda c: (-sims[c], c))[:nprobe]
        )
    ceil_hits = sum(
        1 for j in exact for v in exact[j] if cid_of[v] in probe_sets[j]
    )
    res["recall_probe_ceiling"] = round(ceil_hits / (10 * len(exact)), 3)
    # raw-vector PQ comparison at the same budget (inline index)
    t0 = time.time()
    raw_batch = ivf_pq_topk_batch(
        emb, queries, cents, raw_books, k=10, nprobe=nprobe, shortlist=shortlist
    ).collect()
    res["raw_batch_sec_inline_index"] = round(time.time() - t0, 2)
    raw_approx = {}
    for r in raw_batch:
        raw_approx.setdefault(int(str(r["qid"])), set()).add(r["vec_id"])
    raw_recalls = [len(exact[j] & raw_approx.get(j, set())) / 10 for j in exact]
    res["recall_at_10_raw_pq"] = round(sum(raw_recalls) / len(raw_recalls), 3)
    res["speedup_vs_brute_batch"] = round(
        res["brute_batch_sec"] / res["batch_sec"], 1
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_scale.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
