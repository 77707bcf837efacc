"""Cross-document line dedup + PII scrubbing: drop-all boilerplate
semantics, blank/order/original-byte preservation, empty-survivor rows,
normalization control, partition invariance, line-frequency profile;
PII goldens per class, conservative-phone negatives, count audit,
UDF-free plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.pii import (
    pii_counts,
    scrub_pii,
    scrub_pii_docs,
)
from whoosh_novo_spark.operators.linededup import (
    line_frequencies,
    remove_duplicate_lines,
)


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "Accept Cookies"
    rows = []
    for i in range(8):
        rows.append(
            (
                i,
                f"unique opening line {i}\n{boiler}\n\nbody text number {i} here\nShared Footer Inc",
            )
        )
    rows.append((100, f"{boiler}\nshared footer inc"))  # all-boilerplate doc
    rows.append((101, None))  # null text
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_dropped_everywhere_content_kept(corpus):
    out = {r["doc_id"]: r for r in remove_duplicate_lines(corpus, max_df=2).collect()}
    for i in range(8):
        text = out[i]["text"]
        assert "Accept Cookies" not in text and "Shared Footer" not in text
        # unique lines, blank line, and original ORDER/bytes survive
        assert text == f"unique opening line {i}\n\nbody text number {i} here"
        assert out[i]["n_lines_removed"] == 2


def test_all_boilerplate_doc_survives_empty(corpus):
    out = {r["doc_id"]: r for r in remove_duplicate_lines(corpus, max_df=2).collect()}
    assert len(out) == corpus.count()  # no rows silently disappear
    assert out[100]["text"] == "" and out[100]["n_lines_removed"] == 2
    assert out[101]["text"] == ""  # null text -> empty, not a crash


def test_case_normalization_controls_matching(corpus):
    """'Shared Footer Inc' and 'shared footer inc' only co-count when
    normalize_case=True; with it off each spelling's df stays <= max_df
    in this corpus slice and the lines survive."""
    sensitive = remove_duplicate_lines(
        corpus.where(F.col("doc_id").isin(0, 1, 100)), max_df=2, normalize_case=False
    )
    texts = " | ".join(r["text"] for r in sensitive.collect())
    assert "Shared Footer Inc" in texts  # df=2 per exact spelling: kept
    insensitive = remove_duplicate_lines(
        corpus.where(F.col("doc_id").isin(0, 1, 100)), max_df=2, normalize_case=True
    )
    texts2 = " | ".join(r["text"] for r in insensitive.collect())
    assert "Shared Footer" not in texts2  # df=3 normalized: dropped


def test_line_frequencies_profile(corpus):
    freq = {r["line"].strip().lower(): r["df"] for r in line_frequencies(corpus).collect()}
    assert freq["accept cookies"] == 9
    assert freq["shared footer inc"] == 9  # case-normalized df
    assert freq["unique opening line 0"] == 1


def test_partition_invariance(corpus):
    a = sorted(
        (r["doc_id"], r["text"]) for r in remove_duplicate_lines(corpus, max_df=2).collect()
    )
    b = sorted(
        (r["doc_id"], r["text"])
        for r in remove_duplicate_lines(corpus.repartition(7, "doc_id"), max_df=2).collect()
    )
    assert a == b


def test_no_python_udf_in_plan(corpus):
    plan = (
        remove_duplicate_lines(corpus, max_df=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(scrub_pii("t").alias("v")).collect()[0]["v"]


def test_pii_email_ip_phone_goldens(spark):
    assert (
        _scrub(spark, "mail me at jane.doe+x@sub.example.co.uk today")
        == "mail me at <EMAIL> today"
    )
    assert _scrub(spark, "server at 192.168.0.1 responded") == "server at <IP> responded"
    assert _scrub(spark, "call +1 (555) 123-4567 or +44 20 7946 0958") == "call <PHONE> or <PHONE>"
    assert _scrub(spark, "fax (555) 123-4567 / 555-123-4567") == "fax <PHONE> / <PHONE>"


def test_pii_conservative_negatives(spark):
    """Prices, years, versions, plain integers stay untouched."""
    for text in (
        "price is 1234 dollars in 2024",
        "version 3.5.1 of the lib",
        "a 10000000 row table",
    ):
        assert _scrub(spark, text) == text


def test_pii_counts_and_docs_wrapper(spark):
    df = spark.createDataFrame(
        [(0, "a@b.com and c@d.org from 10.0.0.1"), (1, "clean text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii_docs(df).collect()}
    assert out[0]["pii"].asDict() == {"email": 2, "ip": 1, "phone": 0}
    assert out[0]["text"] == "<EMAIL> and <EMAIL> from <IP>"
    assert out[1]["pii"].asDict() == {"email": 0, "ip": 0, "phone": 0}
    assert out[1]["text"] == "clean text"
    # unknown class rejected; email host not double-counted as IP
    with pytest.raises(ValueError):
        df.select(scrub_pii("text", classes=("ssn",)))
    ip_of_email = spark.createDataFrame([("x@1.2.3.4.example.com",)], "t string")
    counts = ip_of_email.select(pii_counts("t").alias("c")).collect()[0]["c"]
    assert counts["email"] == 1 and counts["ip"] == 0


def test_pii_plan_udf_free(spark):
    df = spark.createDataFrame([(0, "t")], "doc_id long, text string")
    plan = scrub_pii_docs(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
