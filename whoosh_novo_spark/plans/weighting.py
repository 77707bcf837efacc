"""Pluggable weighting models (scoring.py:37-520 equivalents).

Each model turns (per-term statistics, weight column, quantized-length
column) into a JVM-side score Column.  Models whose score factors as
``term_factor x f(weight, length)`` (BM25F, TF_IDF, Frequency) are
*separable*: the flat single-scan fast path multiplies a broadcast
per-term factor map into one shared base expression.  Non-separable
models (PL2, DFree) get a per-term CASE chain — still one scan.

Reference formulas replicated exactly:
- BM25F   scoring.py:263-328 (B=0.75, K1=1.2)
- TF_IDF  scoring.py:468-494: weight * idf
- Frequency scoring.py:461-465: raw weight
- DFree   scoring.py:330-381 (Terrier's DFree; cf = collection weight,
          fl = total field length)
- PL2     scoring.py:385-446 (Terrier's PL2, c=1.0)
- MultiWeighting (per-field models), ReverseWeighting (0 - score),
  FunctionWeighting (user Column builder) scoring.py:514-610
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


class WeightingModel:
    """Base: build a score Column for one (field, term)."""

    def idf(self, searcher, df: int, fieldname: str | None = None) -> float:
        # dc is per-field for lang-routed virtual fields ("text@de" ->
        # de doc count), doc_count_all otherwise (scoring.py:50-56)
        return math.log(searcher.index.doc_count_for(fieldname) / (df + 1)) + 1.0

    def idf_col(self, searcher, df: Column, fieldname: str | None = None) -> Column:
        """Column twin of ``idf`` for per-term stats joined in as columns."""
        return (
            F.log(F.lit(float(searcher.index.doc_count_for(fieldname))) / (df + 1.0))
            + 1.0
        )

    def separable(self) -> bool:
        return False

    def factor(self, searcher, fieldname: str, stats) -> float:
        raise NotImplementedError

    def base_col(self, searcher, fieldname: str, w: Column, flq: Column) -> Column:
        raise NotImplementedError

    def score_col(self, searcher, fieldname: str, stats, w: Column, flq: Column) -> Column:
        if self.separable():
            return self.base_col(searcher, fieldname, w, flq) * F.lit(
                self.factor(searcher, fieldname, stats)
            )
        raise NotImplementedError

    def score_col_stats(
        self, searcher, fieldname: str, w: Column, flq: Column, df: Column, cf: Column
    ) -> Column | None:
        """Score Column where the per-term statistics are themselves Columns
        (the distributed multi-term expansion joins the terms table to the
        postings scan instead of collecting expansions to the driver).
        Returns None when the model can't express its score with column
        stats (e.g. an arbitrary user function) — callers fall back to the
        driver-side expansion with the reference's 1024-clause cap."""
        return None


@dataclass(frozen=True)
class BM25F(WeightingModel):
    B: float = 0.75
    K1: float = 1.2
    # whoosh scoring.py:276-296 accepts ``content_B=1.0``-style kwargs for
    # per-field B; here a hashable tuple of (fieldname, B) pairs, e.g.
    # ``BM25F(field_B=(("title", 1.0),))``.
    field_B: tuple = ()

    def field_b(self, fieldname: str) -> float:
        for f, b in self.field_B:
            if f == fieldname:
                return float(b)
        return self.B

    def separable(self) -> bool:
        return True

    def factor(self, searcher, fieldname, stats) -> float:
        return self.idf(searcher, stats.df, fieldname)

    def base_col(self, searcher, fieldname, w, flq) -> Column:
        avgfl = searcher.index.avg_field_length(fieldname)
        B, K1 = self.field_b(fieldname), self.K1
        denom = w + K1 * ((1 - B) + B * flq.cast("double") / F.lit(float(avgfl)))
        return (w * (K1 + 1)) / denom

    def score_col_stats(self, searcher, fieldname, w, flq, df, cf) -> Column:
        return self.base_col(searcher, fieldname, w, flq) * self.idf_col(
            searcher, df, fieldname
        )


@dataclass(frozen=True)
class TF_IDF(WeightingModel):
    def separable(self) -> bool:
        return True

    def factor(self, searcher, fieldname, stats) -> float:
        return self.idf(searcher, stats.df, fieldname)

    def base_col(self, searcher, fieldname, w, flq) -> Column:
        return w

    def score_col_stats(self, searcher, fieldname, w, flq, df, cf) -> Column:
        return w * self.idf_col(searcher, df, fieldname)


@dataclass(frozen=True)
class Frequency(WeightingModel):
    def separable(self) -> bool:
        return True

    def factor(self, searcher, fieldname, stats) -> float:
        return 1.0

    def base_col(self, searcher, fieldname, w, flq) -> Column:
        return w

    def score_col_stats(self, searcher, fieldname, w, flq, df, cf) -> Column:
        return w


@dataclass(frozen=True)
class DFree(WeightingModel):
    qf: float = 1.0

    def score_col(self, searcher, fieldname, stats, w, flq) -> Column:
        cf = float(stats.cf)
        fl = float(searcher.index.manifest.field_length(fieldname))
        dl = flq.cast("double")
        tf = w
        prior = tf / dl
        post = (tf + 1.0) / (dl + 1.0)
        invpriorcol = F.lit(fl / cf)
        norm = tf * F.log(post / prior)
        return F.lit(self.qf) * norm * (
            tf * F.log(prior * invpriorcol)
            + (tf + 1.0) * F.log(post * invpriorcol)
            + 0.5 * F.log(post / prior)
        )

    def score_col_stats(self, searcher, fieldname, w, flq, df, cf) -> Column:
        # identical formula with cf as a Column (invprior = fl / cf)
        fl = float(searcher.index.manifest.field_length(fieldname))
        dl = flq.cast("double")
        tf = w
        prior = tf / dl
        post = (tf + 1.0) / (dl + 1.0)
        invpriorcol = F.lit(fl) / cf
        norm = tf * F.log(post / prior)
        return F.lit(self.qf) * norm * (
            tf * F.log(prior * invpriorcol)
            + (tf + 1.0) * F.log(post * invpriorcol)
            + 0.5 * F.log(post / prior)
        )


@dataclass(frozen=True)
class PL2(WeightingModel):
    c: float = 1.0
    qf: float = 1.0

    def score_col(self, searcher, fieldname, stats, w, flq) -> Column:
        rec_log2_e = 1.0 / math.log(2)
        dc = searcher.index.doc_count_for(fieldname)
        avgfl = searcher.index.avg_field_length(fieldname)
        f = float(stats.cf) / dc
        TF = w * F.log(1.0 + (self.c * avgfl) / flq.cast("double"))
        norm = 1.0 / (TF + 1.0)
        return norm * F.lit(self.qf) * (
            TF * F.lit(math.log(1.0 / f))
            + F.lit(f * rec_log2_e)
            + 0.5 * F.log(2 * math.pi * TF)
            + TF * (F.log(TF) - F.lit(rec_log2_e))
        )

    def score_col_stats(self, searcher, fieldname, w, flq, df, cf) -> Column:
        rec_log2_e = 1.0 / math.log(2)
        dc = searcher.index.doc_count_for(fieldname)
        avgfl = searcher.index.avg_field_length(fieldname)
        f = cf / F.lit(float(dc))
        TF = w * F.log(1.0 + (self.c * avgfl) / flq.cast("double"))
        norm = 1.0 / (TF + 1.0)
        return norm * F.lit(self.qf) * (
            TF * (F.lit(0.0) - F.log(f))
            + f * F.lit(rec_log2_e)
            + 0.5 * F.log(2 * math.pi * TF)
            + TF * (F.log(TF) - F.lit(rec_log2_e))
        )


@dataclass(frozen=True)
class MultiWeighting(WeightingModel):
    """Per-field model override (scoring.py:546-575)."""

    default: WeightingModel
    fields: tuple[tuple[str, WeightingModel], ...] = ()

    def _for(self, fieldname: str) -> WeightingModel:
        for f, m in self.fields:
            if f == fieldname:
                return m
        return self.default

    def separable(self) -> bool:
        return False

    def score_col(self, searcher, fieldname, stats, w, flq) -> Column:
        return self._for(fieldname).score_col(searcher, fieldname, stats, w, flq)

    def score_col_stats(self, searcher, fieldname, w, flq, df, cf) -> Column | None:
        return self._for(fieldname).score_col_stats(searcher, fieldname, w, flq, df, cf)


@dataclass(frozen=True)
class ReverseWeighting(WeightingModel):
    """0 - subscore (scoring.py:578-610)."""

    model: WeightingModel

    def separable(self) -> bool:
        return False

    def score_col(self, searcher, fieldname, stats, w, flq) -> Column:
        return F.lit(0.0) - self.model.score_col(searcher, fieldname, stats, w, flq)

    def score_col_stats(self, searcher, fieldname, w, flq, df, cf) -> Column | None:
        inner = self.model.score_col_stats(searcher, fieldname, w, flq, df, cf)
        return None if inner is None else F.lit(0.0) - inner


class FunctionWeighting(WeightingModel):
    """Custom scoring function: fn(searcher, fieldname, stats, w, flq) ->
    Column (scoring.py:514-543's pure-function hook, vectorized)."""

    def __init__(self, fn):
        self.fn = fn

    def score_col(self, searcher, fieldname, stats, w, flq) -> Column:
        return self.fn(searcher, fieldname, stats, w, flq)
