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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mura_spark.functions.quantize import micro

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
        micro(simpson).alias("simpson_micro")))


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
        micro(tvd).alias("tvd_micro"))


def vocab_coverage(df: DataFrame, text_col: str,
                   ks: list[int]) -> DataFrame:
    """Vocabulary-size planning curve: for each candidate vocabulary
    size k, what fraction of all token occurrences the top-k most
    frequent tokens cover — ``(k, n_covered, coverage_micro)``.

    The tokenizer-budget question every pretraining run answers first.
    Plan: one map-side-combined groupBy to token counts; the top-max(k)
    selection is ORDER BY (cnt DESC, token ASC) LIMIT — distributed
    partial top-k, never a global window over the vocabulary — and all
    per-k sums run over that bounded frame (≤ max(k) rows) against the
    broadcast corpus total. Counts exact, coverage = exact-int /
    exact-int in double, micro-floored.
    """
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be positive, got {ks}")
    ks = sorted(set(ks))
    counts = (df.select(F.explode(TX.tokens(F.col(text_col)))
                         .alias("term"))
                .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    total = counts.agg(F.sum("cnt").alias("__t"))
    top = (counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
                 .limit(max(ks)))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = top.withColumn("__rn", F.row_number().over(w))
    grid = F.explode(F.array(*[F.lit(k) for k in ks])).alias("k")
    per_k = (ranked.select(grid, "cnt", "__rn")
                   .filter(F.col("__rn") <= F.col("k"))
                   .groupBy("k")
                   .agg(F.sum("cnt").alias("n_covered")))
    cov = F.col("n_covered").cast("double") / F.col("__t").cast("double")
    return (per_k.crossJoin(F.broadcast(total))
                 .select("k", "n_covered",
                         micro(cov).alias("coverage_micro")))


def unigram_logloss(df: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
    """Per-document unigram language-model surprisal (the CCNet-style
    LM quality filter, with the corpus itself as the LM):
    ``(id, n_tokens, logloss_micro)`` where each token contributes
    ``⌊ln(T/cnt(t))·10⁶ + ½⌋`` (its corpus surprisal in nats, micro) and
    the document score is the integer mean ``⌊Σ/n⌋``. High scores =
    improbable token streams (gibberish, rare-language leaks); very low
    scores = boilerplate. Quantize-then-sum keeps the per-token ``ln``
    (last-ulp engine drift) out of any float aggregation.

    Plan: token counts (one reduced shuffle) → per-term surprisal with
    the broadcast total → join back to (doc, term) occurrences on term —
    the vocabulary-keyed join, NOT broadcast (web-scale vocabularies) —
    → one integer-sum groupBy per document.
    """
    toks = df.select(F.col(id_col), F.explode(TX.tokens(F.col(text_col)))
                     .alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("__cnt"))
    total = counts.agg(F.sum("__cnt").alias("__t"))
    surprisal = (counts.crossJoin(F.broadcast(total))
                 .select("term",
                         micro(F.log(F.col("__t").cast("double")
                                     / F.col("__cnt").cast("double")))
                          .alias("__s")))
    per_doc = (toks.join(surprisal, "term")
                   .groupBy(id_col)
                   .agg(F.count(F.lit(1)).alias("n_tokens"),
                        F.sum("__s").alias("__sum")))
    return per_doc.select(
        id_col, "n_tokens",
        F.floor(F.col("__sum").cast("double")
                / F.col("n_tokens").cast("double"))
         .cast("bigint").alias("logloss_micro"))
