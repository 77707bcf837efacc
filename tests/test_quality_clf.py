"""Learned quality classifier: separable-vocabulary accuracy, scoring
plan stays JVM-side (no Python row UDF), save/load round-trip, filter
semantics, and partition invariance of the scored probabilities."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.quality_clf import (
    QualityModel,
    quality_filter,
    quality_probability,
    train_quality_classifier,
)

GOOD = (
    "the committee published a detailed analysis of regional water policy "
    "including historical context methodology and peer reviewed findings"
).split()
BAD = (
    "click here buy now free winner casino bonus cheap viagra deal offer "
    "limited subscribe jackpot prize claim urgent lottery"
).split()


def _docs(vocab, n, seed, words=25):
    rng = random.Random(seed)
    return [" ".join(rng.choice(vocab) for _ in range(words)) for _ in range(n)]


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame([(t,) for t in _docs(GOOD, 150, 1)], "text string")
    neg = spark.createDataFrame([(t,) for t in _docs(BAD, 150, 2)], "text string")
    return train_quality_classifier(pos, neg, n_features=1 << 14, max_iter=30)


def test_heldout_accuracy(spark, model):
    held = [(t, 1.0) for t in _docs(GOOD, 40, 3)] + [
        (t, 0.0) for t in _docs(BAD, 40, 4)
    ]
    df = spark.createDataFrame(held, "text string, label double")
    scored = quality_probability(df, model)
    agg = scored.select(
        ((F.col("quality_p") >= 0.5).cast("int") == F.col("label").cast("int"))
        .cast("int")
        .alias("ok")
    ).agg(F.avg("ok"))
    assert agg.collect()[0][0] >= 0.98


def test_scoring_plan_is_jvm_side(spark, model):
    df = spark.createDataFrame([("words here",)], "text string")
    scored = quality_probability(df, model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_partition_invariance(spark, model):
    rows = [(f"d{i}", t) for i, t in enumerate(_docs(GOOD, 10, 5) + _docs(BAD, 10, 6))]
    want = None
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "id string, text string").repartition(parts)
        got = {
            r["id"]: round(r["quality_p"], 9)
            for r in quality_probability(df, model).collect()
        }
        if want is None:
            want = got
        else:
            assert got == want


def test_filter_and_keep_score(spark, model):
    rows = [("g", " ".join(GOOD[:20])), ("b", " ".join(BAD[:15]))]
    df = spark.createDataFrame(rows, "id string, text string")
    kept = quality_filter(df, model)
    assert [r["id"] for r in kept.collect()] == ["g"]
    assert kept.columns == ["id", "text"]
    scored = quality_filter(df, model, keep_score=True)
    row = scored.collect()[0]
    assert row["id"] == "g" and row["quality_p"] >= 0.5


def test_save_load_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "qclf")
    model.save(path)
    back = QualityModel.load(path)
    assert back.n_features == model.n_features and back.bigrams == model.bigrams
    df = spark.createDataFrame(
        [(t,) for t in _docs(GOOD, 5, 7) + _docs(BAD, 5, 8)], "text string"
    )
    a = [round(r["quality_p"], 9) for r in quality_probability(df, model).collect()]
    b = [round(r["quality_p"], 9) for r in quality_probability(df, back).collect()]
    assert a == b


def test_clean_corpus_quality_stage(spark, model):
    from whoosh_novo_spark.operators.pipeline import clean_corpus

    rows = [
        ("d1", "http://a.example/x", " ".join(GOOD[:22]) + " " + " ".join(GOOD[:8])),
        ("d2", "http://b.example/y", " ".join(BAD[:18]) + " " + " ".join(BAD[:8])),
    ]
    df = spark.createDataFrame(rows, "doc_id string, url string, text string")
    out = clean_corpus(
        df,
        stages=("url_normalize", "quality"),
        options={"quality": {"model": model, "threshold": 0.5}},
    )
    assert [r["doc_id"] for r in out.collect()] == ["d1"]
    with pytest.raises(ValueError, match="needs options"):
        clean_corpus(df, stages=("quality",))


def test_quality_scoring_streams(spark, model, tmp_path):
    """The scoring pass is map-only, so it must compose unchanged with
    Structured Streaming — per-row probabilities identical to batch."""
    src = str(tmp_path / "qsrc")
    rows = [(f"d{i}", t) for i, t in enumerate(_docs(GOOD, 8, 21) + _docs(BAD, 8, 22))]
    df = spark.createDataFrame(rows, "id string, text string")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id string, text string").parquet(src)
    scored = quality_probability(stream, model)
    q = (
        scored.writeStream.format("memory")
        .queryName("qclf_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["id"]: round(r["quality_p"], 9)
        for r in spark.sql("select * from qclf_stream").collect()
    }
    want = {
        r["id"]: round(r["quality_p"], 9)
        for r in quality_probability(df, model).collect()
    }
    assert got == want and len(got) == 16
