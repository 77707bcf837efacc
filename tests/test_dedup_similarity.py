"""Training-data ops: dedup (exact/jaccard/minhash/simhash), similarity
search, text statistics — verified against numpy/python oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from whoosh_novo_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_batch,
    lsh_ann_topk,
)

SF = "/root/testdata/sf0.001"

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "The quick brown fox JUMPS over the lazy dog again, and again today!"),  # exact dup of 0 after normalize
    (2, "the quick brown fox jumps over the lazy cat again and again today"),  # near dup
    (3, "completely different content about spark indexes and posting lists"),
    (4, "spark indexes and posting lists are completely different content about"),  # shares shingles with 3
    (5, "zzz yyy xxx www vvv uuu ttt sss rrr qqq"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(docs_df):
    groups = exact_duplicates(docs_df).collect()
    assert len(groups) == 1
    assert sorted(groups[0]["ids"]) == [0, 1]


def _py_shingles(text, k=3):
    import re

    toks = [t.lower() for t in re.findall(r"[\w*]+(?:\.?[\w*]+)*", text)]
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_ngram_jaccard_matches_python(docs_df):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, tau=0.1, max_shingle_df=None).collect()
    }
    for a in range(len(DOCS)):
        for b in range(a + 1, len(DOCS)):
            sa, sb = _py_shingles(DOCS[a][1]), _py_shingles(DOCS[b][1])
            j = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
            if j >= 0.1:
                assert (a, b) in got
                assert got[(a, b)] == pytest.approx(round(j, 6))
            else:
                assert (a, b) not in got


def test_minhash_finds_near_dups(docs_df):
    # 16 bands x 2 rows: P(candidate) ~= 1-(1-j^2)^16, ~0.998 at j=0.57
    pairs = {
        (r["a"], r["b"])
        for r in minhash_dedup_pairs(
            docs_df, n_hashes=32, n_bands=16, tau=0.4
        ).collect()
    }
    assert (0, 1) in pairs  # exact dup always agrees on all hashes
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup (true j ~ 0.57)
    assert (0, 5) not in pairs and (3, 5) not in pairs


def test_minhash_signature_determinism(docs_df, spark):
    s1 = {r["id"]: list(r["sig"]) for r in minhash_signatures(docs_df).collect()}
    s2 = {r["id"]: list(r["sig"]) for r in minhash_signatures(docs_df).collect()}
    assert s1 == s2
    assert s1[0] == s1[1]  # identical token streams -> identical signatures


def test_simhash_properties(docs_df):
    h = {r["id"]: r["simhash"] for r in simhash64(docs_df).collect()}
    assert h[0] == h[1]
    d_near = bin(h[0] ^ h[2]).count("1")
    d_far = bin(h[0] ^ h[5]).count("1")
    assert d_near < d_far
    assert d_near <= 12
    near = {(r["a"], r["b"]) for r in simhash_near_pairs(docs_df, max_hamming=12).collect()}
    assert (0, 1) in near


def test_cosine_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    cos = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))) for vid, v in vecs.items()
    }
    expected = sorted(cos.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    got = cosine_topk(emb, list(q), k=10).collect()
    assert [r["vec_id"] for r in got] == [v for v, _ in expected]
    for r, (_, c) in zip(got, expected):
        assert r["cos"] == pytest.approx(c, abs=2e-6)


def test_cosine_topk_batch_matches_single(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = emb.orderBy("vec_id").limit(3).collect()
    queries = spark.createDataFrame(
        [(str(r["vec_id"]), list(r["embedding"])) for r in vs],
        "qid string, qvec array<float>",
    )
    batch = cosine_topk_batch(emb, queries, k=5).collect()
    got: dict[str, list] = {}
    for r in batch:
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    for r in vs:
        solo = cosine_topk(emb, list(r["embedding"]), k=5).collect()
        assert [v for _, v in sorted(got[str(r["vec_id"])])] == [x["vec_id"] for x in solo]


def test_lsh_ann_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    exact = {r["vec_id"] for r in cosine_topk(emb, list(q), k=10).collect()}
    approx = {
        r["vec_id"]
        for r in lsh_ann_topk(
            emb, list(q), k=10, n_planes=4, probe_hamming=2
        ).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.5, recall
    assert 7 in approx  # the query vector itself is always found


def test_textstats(spark):
    from whoosh_novo_spark.functions.textstats import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    df = spark.createDataFrame(
        [
            (0, "The quick brown fox is running through the woods today"),
            (1, "the QUICK brown FOX is running, through the woods... today"),
            (2, "der Hund ist nicht mit der Katze und dem Vogel"),
            (3, "el perro es una mascota en la casa con los gatos"),
            (4, ""),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in df.select(
        "id",
        token_count("text").alias("n"),
        fingerprint("text").alias("fp"),
        lang_id("text").alias("lang"),
        quality_score("text").alias("q"),
    ).collect()}
    assert rows[0]["n"] == 10
    assert rows[0]["fp"] == rows[1]["fp"]  # punctuation/case robust
    assert rows[0]["lang"] == "en"
    assert rows[2]["lang"] == "de"
    assert rows[3]["lang"] == "es"
    assert rows[4]["lang"] == "und" and rows[4]["n"] == 0
    assert 0.0 <= rows[4]["q"] <= rows[0]["q"] <= 1.0


def test_bpe_pretoken_count(spark):
    """GPT-2 pre-tokenizer piece counts: hand-counted goldens + the
    invariants a token-budget estimator must hold (punctuation and
    contractions split off -> count >= whitespace-word count; whitespace
    never counted), plus DuckDB-twin parity on the same strings (the
    contract row's oracle drops the RE2-unsupported lookahead branch)."""
    import duckdb

    from whoosh_novo_spark.functions.textstats import bpe_pretoken_count, token_count

    texts = [
        (0, "The quick brown fox"),                      # 4 word pieces
        (1, "it's 2024, really?!"),                      # it |'s | 2024 |,| really |?!
        (2, "  leading and   trailing  spaces  "),
        (3, ""),
        (4, "a1b2 mixes letters4 and 42digits"),
        (5, "don't stop-believing... hold on"),
    ]
    df = spark.createDataFrame(texts, "id long, text string")
    got = {r["id"]: (r["nb"], r["nw"]) for r in df.select(
        "id",
        bpe_pretoken_count("text").alias("nb"),
        token_count("text").alias("nw"),
    ).collect()}
    assert got[0][0] == 4
    assert got[1][0] == 6
    assert got[3][0] == 0
    for i in range(6):
        assert got[i][0] >= got[i][1], f"row {i}: bpe {got[i][0]} < words {got[i][1]}"

    con = duckdb.connect()
    pat = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    for i, t in texts:
        (n,) = con.execute(
            "SELECT len(list_filter(regexp_extract_all(?, ?), p -> regexp_matches(p, '\\S')))",
            [t, pat],
        ).fetchone()
        assert n == got[i][0], f"duckdb twin diverges on row {i}"


def test_cosine_zero_norm_vectors(spark):
    """Zero vectors (failed encoders / padding rows — guaranteed in a
    web-scale table) must score cos=0, not abort the job with ANSI
    DIVIDE_BY_ZERO (regression: caught by the verify drive)."""
    from whoosh_novo_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_batch,
        embedding_all_pairs,
    )

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.7, 0.7]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["cos"] for r in cosine_topk(emb, [1.0, 0.0], k=4).collect()}
    assert got[1] == 1.0 and got[0] == 0.0 and got[3] == 0.0

    # zero QUERY vector: everything scores 0, nothing crashes
    allz = cosine_topk(emb, [0.0, 0.0], k=4).collect()
    assert {r["cos"] for r in allz} == {0.0}

    qs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0])], "qid long, qvec array<double>"
    )
    batch = cosine_topk_batch(emb, qs, k=4).collect()
    assert {r["cos"] for r in batch if r["qid"] == 1} == {0.0}
    assert max(r["cos"] for r in batch if r["qid"] == 0) == 1.0

    # all-pairs path: zero rows pair with cos=0 (below any sane tau)
    pairs = embedding_all_pairs(emb, tau=0.0).collect()
    zero_pairs = [r for r in pairs if r["a"] == 0 or r["b"] == 0]
    assert all(r["cos"] == 0.0 for r in zero_pairs)


def test_block_pair_all_pairs_is_complete(spark):
    """The block-pair distributed all-pairs join finds exactly the pairs a
    numpy brute force finds (no pair lost across block boundaries)."""
    import numpy as np

    from whoosh_novo_spark.operators.similarity import embedding_all_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((8, 16))
    vecs = base[rng.integers(0, 8, 60)] + 0.05 * rng.standard_normal((60, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["a"], r["b"]) for r in embedding_all_pairs(df, tau=0.9, n_blocks=5).collect()
    }
    v32 = vecs.astype(np.float32).astype(np.float64)
    nm = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    sim = nm @ nm.T
    want = {
        (i, j)
        for i in range(60)
        for j in range(i + 1, 60)
        if sim[i, j] >= 0.9
    }
    assert got == want and len(want) > 50


def test_lsh_ann_recall_on_clustered_data(spark):
    """recall@10 >= 0.9 on clustered embeddings (the workload ANN is for:
    true neighbors share buckets with high probability)."""
    import numpy as np

    from whoosh_novo_spark.operators.similarity import cosine_topk, lsh_ann_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 32)) * 3
    vecs = np.concatenate(
        [c + 0.15 * rng.standard_normal((30, 32)) for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    recalls = []
    for qid in (0, 35, 70, 155, 290):
        qv = [float(x) for x in vecs[qid]]
        exact = {r["vec_id"] for r in cosine_topk(df, qv, 10).collect()}
        ann = {
            r["vec_id"]
            for r in lsh_ann_topk(df, qv, 10, n_planes=6, probe_hamming=2).collect()
        }
        recalls.append(len(exact & ann) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_simhash_hamming_reflects_similarity(spark):
    """Near-identical docs have small SimHash Hamming distance; unrelated
    docs a large one (SimHash 60-bit md5 token hashes)."""
    from whoosh_novo_spark.operators.dedup import simhash_near_pairs

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (2, "completely different subject matter about databases and indexing engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs(df, max_hamming=10).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_lsh_near_dup_equals_exact_on_planted_parallels(spark):
    """The LSH same-bucket near-dup path finds EVERY pair the exact
    all-pairs scan finds when the near-dups are direction-preserving
    (positively scaled) copies — scaling cannot flip a sign bit, so the
    planted pairs provably share buckets (driver row
    embedding_near_dup_lsh relies on exactly this)."""
    import numpy as np

    from whoosh_novo_spark.operators.similarity import (
        embedding_all_pairs,
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((30, 16)).astype("float64")
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    rows += [(i + 1000, [float(x) * 1.5 for x in base[i]]) for i in range(30)]
    rows += [(i + 2000, [float(x) * 2.0 for x in base[i]]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    lsh = {
        (r["a"], r["b"], r["cos"])
        for r in embedding_near_dup_pairs(emb, tau=0.9, n_planes=8, seed=42).collect()
    }
    exact = {
        (r["a"], r["b"], r["cos"])
        for r in embedding_all_pairs(emb, tau=0.9).collect()
    }
    assert lsh == exact
    assert len(exact) == 90  # 3 pairs per planted triple


def test_banded_near_dup_recall_on_noisy_pairs(spark):
    """VERDICT r3 task #1: recall >= 0.9 on NOISY planted near-dups
    (cos in [0.85, 0.95], NOT exact scalar copies).  The single-table
    sign-LSH this replaced had recall ~0.21-0.29 here (P(all 8 bits
    agree) = (1-theta/pi)^8); OR-of-16-bands lifts it to ~0.98.
    Precision stays exact (every candidate is cosine-verified)."""
    import numpy as np

    from whoosh_novo_spark.operators.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(99)
    dim, n_pairs, n_background = 32, 60, 300
    rows, planted = [], []
    for i in range(n_pairs):
        x = rng.standard_normal(dim)
        x /= np.linalg.norm(x)
        # partner at a chosen cosine: y = x + t*u (u unit, orthogonal
        # to x) has cos(x, y) = 1/sqrt(1+t^2)
        target = rng.uniform(0.85, 0.95)
        u = rng.standard_normal(dim)
        u -= (u @ x) * x
        u /= np.linalg.norm(u)
        t = np.sqrt(1.0 / target**2 - 1.0)
        y = x + t * u
        a, b = 2 * i, 2 * i + 1
        rows.append((a, [float(v) for v in x]))
        rows.append((b, [float(v) for v in y]))
        planted.append((a, b))
    for j in range(n_background):
        g = rng.standard_normal(dim)
        rows.append((10000 + j, [float(v) for v in g]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(emb, tau=0.85, seed=42).collect()
    }
    # precision is exact by construction: every reported pair's true
    # cosine must clear tau
    vec = {i: np.asarray(v) for i, v in rows}
    for a, b in got:
        c = float(vec[a] @ vec[b] / (np.linalg.norm(vec[a]) * np.linalg.norm(vec[b])))
        assert round(c, 6) >= 0.85, (a, b, c)
    hits = sum((a, b) in got for a, b in planted)
    recall = hits / n_pairs
    assert recall >= 0.9, (recall, n_pairs - hits)


def test_exact_duplicates_capped_pathological_group(spark):
    """VERDICT r3 #3: one boilerplate text duplicated 10^6 times must not
    build a multi-GB collect_list row.  max_ids bounds the per-group
    array BEFORE the collect agg; n still counts the whole group; and
    the array-free exact_duplicate_stats path needs only (n, min(id))."""
    from whoosh_novo_spark.operators.dedup import (
        exact_duplicate_stats,
        exact_duplicates,
    )

    n = 1_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("same boilerplate page text repeated everywhere").alias("text"),
    )
    row = exact_duplicates(docs, max_ids=10).collect()[0]
    assert row["n"] == n
    assert row["ids"] == list(range(10))  # capped, sorted, keep-first head
    st = exact_duplicate_stats(docs).collect()[0]
    assert (st["n"], st["keep"]) == (n, 0)
    # uncapped default on a small group is unchanged
    small = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc")], "doc_id long, text string"
    )
    got = {r["fp"]: r["ids"] for r in exact_duplicates(small).collect()}
    assert list(got.values()) == [[1, 2]]


def test_simhash_bucket_cap_guards_skew(spark):
    """max_bucket drops only over-hot chunk buckets (boilerplate);
    near-pairs of distinctive docs survive through their other chunks."""
    from whoosh_novo_spark.operators.dedup import simhash_near_pairs

    boiler = [(i, "identical boilerplate page content repeated") for i in range(120)]
    distinct = [
        (1000, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1001, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    ]
    df = spark.createDataFrame(boiler + distinct, "doc_id long, text string")
    pairs = {
        (r["a"], r["b"])
        for r in simhash_near_pairs(df, max_hamming=10, max_bucket=50).collect()
    }
    assert (1000, 1001) in pairs
    # boilerplate pairs were suppressed by the cap (all four of their
    # chunk buckets are hot) — they belong to exact dedup
    assert not any(a < 120 and b < 120 for a, b in pairs)
    # without the guard the boilerplate pairs all appear
    full = simhash_near_pairs(df, max_hamming=10, max_bucket=None).count()
    assert full >= (120 * 119) // 2


def test_near_dup_tiled_gram_matches_untiled():
    """The tiled Gram kernel (r5, VERDICT r4 weak #1 fix) must report
    EXACTLY the pairs of a single-block Gram — tiling is a memory
    layout, not a semantics change.  Odd tile size exercises ragged
    edge blocks."""
    from whoosh_novo_spark.operators.similarity import _gram_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 12))
    V = np.vstack([base, base * 1.7 + rng.standard_normal((40, 12)) * 0.05])
    ids = np.arange(len(V), dtype=np.int64)
    ref = _gram_pairs(ids, V.copy(), tau=0.9, tile=len(V))  # one block
    got = _gram_pairs(ids, V.copy(), tau=0.9, tile=7)  # ragged tiles
    ref_set = set(zip(ref[0].tolist(), ref[1].tolist(), ref[2].tolist()))
    got_set = set(zip(got[0].tolist(), got[1].tolist(), got[2].tolist()))
    assert got_set == ref_set and len(ref_set) > 0


def test_near_dup_gram_kernel_bounded_memory():
    """A cap-sized pathological bucket (20k same-code vectors) must
    verify under a bounded peak allocation: the untiled m x m Gram here
    would be 20000^2 x 8 = 3.2 GB; the tiled kernel's peak is
    O(tile^2).  numpy registers its allocations with tracemalloc, so
    the assertion is a real memory bound, not a proxy."""
    import tracemalloc

    from whoosh_novo_spark.operators.similarity import _gram_pairs

    rng = np.random.default_rng(11)
    m, dim = 20_000, 8
    V = rng.standard_normal((m, dim))
    ids = np.arange(m, dtype=np.int64)
    tracemalloc.start()
    tracemalloc.reset_peak()
    _gram_pairs(ids, V, tau=0.999, tile=1024)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 200 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"


def test_near_dup_hot_bucket_guard(spark):
    """VERDICT r4 task #1: a boilerplate flood (many identical
    embeddings -> ALL their band buckets hot) is dropped by max_bucket
    before reaching the verify kernel; distinctive planted pairs
    survive through their non-hot bands."""
    from whoosh_novo_spark.operators.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(23)
    dim = 16
    flood_dir = rng.standard_normal(dim)
    rows = [(i, [float(x) for x in flood_dir * (1.0 + 0.001 * (i % 7))]) for i in range(200)]
    base = rng.standard_normal((20, dim))
    planted = []
    for j in range(20):
        a, b = 1000 + 2 * j, 1001 + 2 * j
        rows.append((a, [float(x) for x in base[j]]))
        rows.append((b, [float(x) for x in base[j] * 1.5]))
        planted.append((a, b))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(emb, tau=0.9, seed=42, max_bucket=50).collect()
    }
    for p in planted:
        assert p in got, p
    assert not any(a < 200 and b < 200 for a, b in got), "flood pairs not suppressed"
    # without the guard the flood's ~19.9k pairs all appear
    full = embedding_near_dup_pairs(emb, tau=0.9, seed=42, max_bucket=None).count()
    assert full >= (200 * 199) // 2


def test_banded_ann_noisy_query_recall(spark):
    """VERDICT r4 task #7: the online ANN path gated on NOISY queries
    (true neighbor at cos in [0.85, 0.95], not a scaled copy).  The
    banded path must hit recall >= 0.9; the single-table multi-probe
    path (lsh_ann_topk, kept for the driver row's pinned oracle) is
    measured here too to DOCUMENT its envelope — on this workload it
    recalls ~0.2-0.6 (P(all bits agree) decays as (1-theta/pi)^r and
    hamming<=2 probing only buys back a little), which is why banding
    is the recommended configuration."""
    import numpy as np

    from whoosh_novo_spark.operators.similarity import (
        lsh_ann_topk,
        lsh_ann_topk_banded,
    )

    rng = np.random.default_rng(41)
    dim, n_queries, n_background = 32, 25, 400
    rows, queries = [], []
    for i in range(n_queries):
        x = rng.standard_normal(dim)
        x /= np.linalg.norm(x)
        target = rng.uniform(0.85, 0.95)
        u = rng.standard_normal(dim)
        u -= (u @ x) * x
        u /= np.linalg.norm(u)
        y = x + np.sqrt(1.0 / target**2 - 1.0) * u
        rows.append((i, [float(v) for v in y]))  # corpus holds the neighbor
        queries.append((i, [float(v) for v in x]))  # query is the noisy twin
    for j in range(n_background):
        rows.append((1000 + j, [float(v) for v in rng.standard_normal(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    banded_hits = single_hits = 0
    for qid, qv in queries:
        got = {r["vec_id"] for r in lsh_ann_topk_banded(emb, qv, k=5).collect()}
        banded_hits += qid in got
        got1 = {
            r["vec_id"]
            for r in lsh_ann_topk(emb, qv, k=5, n_planes=8, probe_hamming=2).collect()
        }
        single_hits += qid in got1
    banded_recall = banded_hits / n_queries
    single_recall = single_hits / n_queries
    assert banded_recall >= 0.9, (banded_recall, single_recall)
    # the measured envelope gap this test exists to document
    assert banded_recall > single_recall, (banded_recall, single_recall)
