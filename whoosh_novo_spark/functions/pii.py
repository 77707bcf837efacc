"""PII scrubbing for web-text corpora — pure Catalyst regexp chain.

Public pretraining pipelines (C4, RefinedWeb, the BigScience/BigCode
data tooling — all public) redact obvious personally-identifying
spans before training: email addresses, IP addresses, phone numbers.
This module is the Spark-side expression form: one
``regexp_replace`` chain, JVM-side, no UDF, composing with the
parquet scan like every other textstats expression.

Honesty notes, documented rather than hidden:
- These are the standard REGEX classes.  Names, addresses and other
  free-text PII need an NER model, which this environment does not
  ship; the regex tier is what the cited public pipelines apply at
  crawl scale.
- The phone pattern is deliberately CONSERVATIVE (international
  +CC... form, or separator-structured 10+-digit national forms) —
  aggressive digit patterns redact prices, IDs and dates, which is
  worse for a training corpus than missing some phone spellings.

Each class replaces with a stable placeholder token so downstream
token statistics remain meaningful and redaction is auditable
(`pii_counts` reports per-class match counts per document).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex patterns (applied via regexp_replace / regexp_count).
EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RX = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RX = (
    # +CC international (7-14 digits with optional separators), or
    # (ddd) ddd-dddd / ddd-ddd-dddd style national forms
    r"\+\d{1,3}[ .-]?(?:\(\d{1,4}\)[ .-]?)?\d(?:[ .-]?\d){6,12}"
    r"|\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}"
    r"|\b\d{3}[.-]\d{3}[.-]\d{4}\b"
)

DEFAULT_PLACEHOLDERS: dict[str, str] = {
    "email": "<EMAIL>",
    "ip": "<IP>",
    "phone": "<PHONE>",
}

_CLASS_RX: dict[str, str] = {"email": EMAIL_RX, "ip": IPV4_RX, "phone": PHONE_RX}


def scrub_pii(
    col: Column | str,
    classes: tuple[str, ...] = ("email", "ip", "phone"),
    placeholders: dict[str, str] | None = None,
) -> Column:
    """Text with each requested PII class replaced by its placeholder.
    Order is fixed (email, ip, phone) so an email's host part is
    redacted as part of the email, not left for the IP pass."""
    c = F.col(col) if isinstance(col, str) else col
    ph = dict(DEFAULT_PLACEHOLDERS)
    if placeholders:
        ph.update(placeholders)
    unknown = set(classes) - set(_CLASS_RX)
    if unknown:
        raise ValueError(f"unknown PII classes: {sorted(unknown)}")
    for name in ("email", "ip", "phone"):
        if name in classes:
            c = F.regexp_replace(c, _CLASS_RX[name], ph[name])
    return c


def pii_counts(col: Column | str) -> Column:
    """struct(email, ip, phone) match counts — the audit signal (how
    much was redacted per document; also usable as a filter input:
    documents that are mostly PII are contact-scrape pages)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RX)).alias("email"),
        F.regexp_count(
            F.regexp_replace(c, EMAIL_RX, " "), F.lit(IPV4_RX)
        ).alias("ip"),
        F.regexp_count(c, F.lit(PHONE_RX)).alias("phone"),
    )


def scrub_pii_docs(
    docs: DataFrame,
    text_col: str = "text",
    classes: tuple[str, ...] = ("email", "ip", "phone"),
    audit: bool = True,
) -> DataFrame:
    """Rewrites ``text_col`` scrubbed; with ``audit`` adds the
    ``pii`` count struct computed from the ORIGINAL text."""
    out = docs
    if audit:
        out = out.withColumn("pii", pii_counts(F.col(text_col)))
    return out.withColumn(text_col, scrub_pii(F.col(text_col), classes))
