"""Cross-document line-level deduplication (boilerplate removal).

Document-level dedup (operators/dedup.py) keeps one copy of a repeated
PAGE; a web corpus also repeats individual LINES across millions of
otherwise-distinct pages — navigation labels, cookie banners, licence
footers, share buttons.  The standard treatment (CCNet, Wenzek et al.
2020; RefinedWeb, Penedo et al. 2023 — public papers) removes every
occurrence of any line whose document frequency exceeds a threshold:
a line that appears verbatim in many documents is boilerplate by
definition, and dropping ALL copies (not all-but-one) is the published
semantics — boilerplate carries no training signal anywhere.

Pipeline (all JVM-side until the final reassembly aggregate):
1. split documents into (id, pos, line) via posexplode(split) — no UDF;
2. fingerprint each non-blank line (md5 of the trimmed, optionally
   lowercased form — matching is normalized, OUTPUT keeps the original
   line bytes);
3. count line document-frequency (map-side-combined distinct-doc agg),
   keep only fingerprints with df > max_df — the HOT set, which is a
   tiny fraction of distinct lines at any threshold worth using;
4. left_anti join lines against the hot set (the only row-scale
   shuffle; the hot side is small and AQE broadcasts it);
5. reassemble text per document in original line order.

Scale notes (100 TB lens): the df count and anti-join shuffle on the
line fingerprint, which is near-uniform (md5) — no skewed key can
exist because identical lines share one fingerprint ROW after the
map-side combine, not one reducer's worth of raw rows.  Reassembly
shuffles on doc id, the same key the corpus is already bucketed by in
every other operator.  Blank lines are preserved verbatim (they are
formatting, not content, and counting them would make every document
pair share "duplicates").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_frequencies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize_case: bool = True,
) -> DataFrame:
    """Distinct-document frequency of every non-blank normalized line:
    (fp, line, df) — the corpus boilerplate profile (df desc = the
    site chrome)."""
    lines = _split_lines(docs, id_col, text_col, normalize_case)
    return (
        lines.where(F.col("_fp").isNotNull())
        .groupBy(F.col("_fp").alias("fp"))
        .agg(
            F.first("line").alias("line"),
            F.count_distinct(F.col("id")).alias("df"),
        )
    )


def _split_lines(
    docs: DataFrame, id_col: str, text_col: str, normalize_case: bool
) -> DataFrame:
    norm = F.trim(F.col("line"))
    if normalize_case:
        norm = F.lower(norm)
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    ).withColumn("_fp", F.when(F.trim(F.col("line")) != "", F.md5(norm)))


def remove_duplicate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 2,
    normalize_case: bool = True,
) -> DataFrame:
    """Removes EVERY occurrence of any non-blank line appearing in more
    than ``max_df`` distinct documents (the published boilerplate-line
    rule).  Returns the input rows with ``text_col`` rewritten (original
    line bytes and order preserved for surviving lines; blank lines
    kept) plus an ``n_lines_removed`` audit column.  A document whose
    every line is boilerplate survives as a row with empty text — the
    caller decides whether to drop it (e.g. with a token_count filter),
    so no rows silently disappear."""
    if max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    lines = _split_lines(docs, id_col, text_col, normalize_case)
    hot = (
        lines.where(F.col("_fp").isNotNull())
        .groupBy("_fp")
        .agg(F.count_distinct(F.col("id")).alias("df"))
        .where(F.col("df") > max_df)
        .select("_fp")
    )
    kept = lines.join(hot, "_fp", "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_orig = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
    return (
        docs.join(reassembled, F.col(id_col) == F.col("id"), "left")
        .withColumn(
            "n_lines_removed",
            (n_orig - F.coalesce(F.col("_n_kept"), F.lit(0))).cast("int"),
        )
        .withColumn(text_col, F.coalesce(F.col("_new_text"), F.lit("")))
        .drop("id", "_new_text", "_n_kept")
    )
