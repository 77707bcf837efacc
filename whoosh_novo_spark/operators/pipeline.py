"""One-call webtext cleaning pipeline — the canonical composition of
the corpus stages this engine ships, in the order the published
pipelines apply them (C4 / Gopher / CCNet / RefinedWeb):

    url_normalize -> C4 heuristics -> Gopher repetition filter ->
    cross-document line dedup -> PII scrub

`clean_corpus` assembles any subset via ``stages`` with per-stage
``options``.  Sampling/mixing (temperature_mix, quota_per_stratum) and
near-dup dedup (minhash/simhash/embedding) deliberately stay OUTSIDE
this call: they compute statistics over their input, so they belong
after a materialization boundary — re-evaluating the cleaning chain
once per stats pass is the measured 34% overhead recorded in
BENCH/BASELINE.md §0r5z.  Write the cleaned corpus (or persist it),
then sample.

Scale notes: every stage here is map-side except line_dedup (whose two
shuffles key on the md5 line fingerprint — skew-proof) — the composed
plan is one scan-through, and Catalyst fuses the map-side stages into
the same WholeStageCodegen/Arrow pass chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_novo_spark.functions.c4 import c4_filter
from whoosh_novo_spark.functions.pii import scrub_pii_docs
from whoosh_novo_spark.functions.repetition import gopher_repetition_filter
from whoosh_novo_spark.functions.urls import url_normalize
from whoosh_novo_spark.operators.linededup import remove_duplicate_lines
from whoosh_novo_spark.operators.substring_dedup import remove_duplicate_spans

DEFAULT_STAGES: tuple[str, ...] = (
    "url_normalize",
    "c4",
    "repetition",
    "line_dedup",
    "pii",
)

# opt-in stages accepted by ``stages`` but not run by default
# (substring dedup is the most expensive pass — one gram-hash rank
# shuffle over the corpus — and not every pipeline wants it;
# latest_crawl assumes a multi-snapshot corpus with a warc_ts column;
# quality needs a trained model passed via options["quality"]["model"])
OPTIONAL_STAGES: tuple[str, ...] = ("substring_dedup", "latest_crawl", "quality")


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
    stages: tuple[str, ...] = DEFAULT_STAGES,
    options: dict[str, dict] | None = None,
) -> DataFrame:
    """Runs the selected cleaning stages in the given order.  ``options``
    maps stage name -> keyword arguments forwarded to that stage's
    operator (see each operator's docstring).  Unknown stage names and
    option keys fail loudly."""
    opts = dict(options or {})
    known = set(DEFAULT_STAGES) | set(OPTIONAL_STAGES)
    unknown = set(opts) - known
    if unknown:
        raise ValueError(f"options for unknown stages: {sorted(unknown)}")
    out = docs
    for stage in stages:
        kw = dict(opts.get(stage, {}))
        if stage == "url_normalize":
            out = out.withColumn(url_col, url_normalize(F.col(url_col)))
        elif stage == "c4":
            out = c4_filter(out, text_col=text_col, **kw)
        elif stage == "repetition":
            kw.setdefault("keep_signals", False)
            out = gopher_repetition_filter(out, text_col=text_col, **kw)
        elif stage == "line_dedup":
            out = remove_duplicate_lines(out, id_col=id_col, text_col=text_col, **kw)
        elif stage == "substring_dedup":
            out = remove_duplicate_spans(out, id_col=id_col, text_col=text_col, **kw)
        elif stage == "latest_crawl":
            from whoosh_novo_spark.operators.dedup import keep_latest_crawl

            out = keep_latest_crawl(out, url_col=url_col, **kw)
        elif stage == "quality":
            from whoosh_novo_spark.functions.quality_clf import quality_filter

            if "model" not in kw:
                raise ValueError(
                    "stage 'quality' needs options={'quality': {'model': "
                    "QualityModel, ...}} (train_quality_classifier)"
                )
            out = quality_filter(out, kw.pop("model"), text_col=text_col, **kw)
        elif stage == "pii":
            kw.setdefault("audit", False)
            out = scrub_pii_docs(out, text_col=text_col, **kw)
        else:
            raise ValueError(f"unknown stage: {stage!r}")
    return out
