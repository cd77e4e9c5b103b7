"""Corpus-composition analytics: lexical diversity and distribution
divergence between corpus slices.

North-star extension (the reference has no text surface — SURVEY.md §2.2
#10 is an empty ScalarFunction shell, /root/reference/src/planner/
logicalplan.rs:63-71). These are the monitoring aggregates a training-mix
pipeline tracks per source/language: did this crawl slice collapse to
boilerplate (diversity drop)? how far does a new source's unigram
distribution sit from the corpus (divergence)?

Both measures are built ONLY from exact integer token counts combined
with +,−,×,/ (and no transcendental functions), so — unlike entropy/KL,
whose per-term ``ln`` terms would have to be summed post-quantization —
the results are bit-deterministic across engines and partition orders,
and therefore oracle-hashable:

- **Simpson diversity** ``1 − Σ_t p_t²`` (probability two random tokens
  differ): ``1 − S₂/T²`` with ``S₂ = Σ cnt_t²`` and ``T = Σ cnt_t`` both
  exact (S₂ in DECIMAL(38,0) — at 100 TB a group's token count is ~1e12
  and its square overflows int64).
- **Total-variation distance** ``½ Σ_t |p_g(t) − p(t)|`` between a
  group's unigram distribution and the whole corpus: over the common
  denominator ``T_g·T`` the numerator is the exact integer
  ``Σ_{t∈g} |cnt_g(t)·T − cnt(t)·T_g| + (T − Σ_{t∈g} cnt(t))·T_g`` (the
  second term is the mass of corpus terms absent from the group — no
  full-vocabulary outer join needed, only the group's own terms join).

Plan shape (both): tokenize+explode → one map-side-combined groupBy to
(group, term) counts; every later aggregate runs over *already-reduced*
rows. The TVD global-count join is keyed on term — a vocabulary-sized
equi-join, deliberately NOT broadcast (web-scale vocabularies are
billions of terms; AQE may still broadcast when it measures small).
Group totals and the corpus total ride in as broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mura_spark.functions import text as TX


def _term_counts(df: DataFrame, group_col: str,
                 text_col: str) -> DataFrame:
    """(group, term, cnt) exact token counts — the shared first shuffle."""
    return (df.select(F.col(group_col).alias("grp"),
                      F.explode(TX.tokens(F.col(text_col))).alias("term"))
              .groupBy("grp", "term")
              .agg(F.count(F.lit(1)).alias("cnt")))


def simpson_diversity(df: DataFrame, group_col: str,
                      text_col: str) -> DataFrame:
    """Per-group Simpson diversity index in micro-units:
    ``(group, n_tokens, simpson_micro)`` with
    ``simpson_micro = ⌊(1 − Σcnt²/T²)·10⁶ + ½⌋``."""
    counts = _term_counts(df, group_col, text_col)
    sq = F.col("cnt").cast("decimal(19,0)")
    per_grp = counts.groupBy("grp").agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(sq * sq).alias("__s2"))
    t = F.col("n_tokens").cast("double")
    simpson = F.lit(1.0) - F.col("__s2").cast("double") / (t * t)
    return (per_grp.select(
        F.col("grp").alias(group_col), "n_tokens",
        F.floor(simpson * F.lit(1e6) + F.lit(0.5)).cast("bigint")
         .alias("simpson_micro")))


def total_variation(df: DataFrame, group_col: str,
                    text_col: str) -> DataFrame:
    """Per-group total-variation distance from the whole-corpus unigram
    distribution, in micro-units: ``(group, tvd_micro)``."""
    counts = _term_counts(df, group_col, text_col)
    global_cnt = (counts.groupBy("term")
                        .agg(F.sum("cnt").alias("__gcnt")))
    grp_tot = counts.groupBy("grp").agg(F.sum("cnt").alias("__tg"))
    corpus_tot = counts.agg(F.sum("cnt").alias("__t"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    joined = (counts.join(global_cnt, "term")
                    .join(F.broadcast(grp_tot), "grp")
                    .crossJoin(F.broadcast(corpus_tot)))
    inside = (joined.groupBy("grp")
              .agg(F.sum(F.abs(dec("cnt") * dec("__t")
                               - dec("__gcnt") * dec("__tg")))
                    .alias("__s_in"),
                   F.sum("__gcnt").alias("__c_in"),
                   F.first("__tg").alias("__tg"),
                   F.first("__t").alias("__t")))
    absent = (F.col("__t") - F.col("__c_in")).cast("decimal(19,0)") \
        * dec("__tg")
    num = F.col("__s_in") + absent
    denom = F.lit(2.0) * F.col("__tg").cast("double") \
        * F.col("__t").cast("double")
    tvd = num.cast("double") / denom
    return inside.select(
        F.col("grp").alias(group_col),
        F.floor(tvd * F.lit(1e6) + F.lit(0.5)).cast("bigint")
         .alias("tvd_micro"))
