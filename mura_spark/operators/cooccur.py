"""Corpus co-occurrence statistics (bigram PMI).

Pointwise mutual information over adjacent token pairs — the collocation
/ multi-word-expression miner of a corpus-analysis pipeline (tokenizer
vocabulary candidates, domain phrase discovery). No reference analog (the
reference has no text surface — SURVEY.md §2.3); extension surface
alongside ``operators.tfidf``.

Definition: for adjacent pair (a, b),
``PMI = ln( p(a,b) / (p(a)·p(b)) )`` with ``p(a,b) = c_ab / N_bigrams``
and ``p(x) = c_x / N_tokens`` — i.e.
``ln( (c_ab · N_tok · N_tok) / (N_bi · c_a · c_b) )``.

Scale design (100 TB read):
- bigram extraction is a narrow per-row ``transform(sequence(...))`` —
  zero shuffle;
- unigram and bigram counting are each ONE hash shuffle with map-side
  partial aggregation; the two scalar totals ride as broadcast
  singleton cross-joins (never a driver collect);
- the two unigram-count lookups are plain equi-joins on the term — the
  vocabulary can be arbitrarily large, so they are NOT forced broadcast
  (AQE downgrades to broadcast when the ``min_count`` filter makes the
  surviving bigram side small, which it usually does);
- the final top-k is ``ORDER BY ... LIMIT k`` — a TakeOrdered, per-
  partition heaps then a k-row merge, never a global sort.

Scores are returned in integer micro-units (``floor(pmi·1e6 + 0.5)``):
JVM ``ln`` and libm ``ln`` differ in the last ulp, so the raw double is
not cross-engine hash-comparable (same convention as operators.tfidf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mura_spark.functions import text as TX


def bigrams(df: DataFrame, text_col: str) -> DataFrame:
    """(w1, w2): all adjacent token pairs, one row per occurrence.
    Documents with < 2 tokens contribute nothing. Narrow (no shuffle).

    Built as ``arrays_zip`` of the two shifted ``slice``s — these are
    codegen'd expressions, measured 10× faster than the equivalent
    ``transform(sequence(...), i -> struct(...))``, whose lambda runs on
    the interpreted HOF path (same pitfall functions/text.py documents
    for shingles)."""
    toks = TX.tokens(F.col(text_col))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(toks, 1, n).alias("w1"),
                         F.slice(toks, 2, n).alias("w2"))
    return (df.select(F.explode(pairs).alias("p"))
              .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")))


def pmi_bigrams(df: DataFrame, text_col: str, min_count: int = 5,
                k: int = 20) -> DataFrame:
    """Top-``k`` adjacent-pair collocations by PMI, among pairs occurring
    at least ``min_count`` times. Returns ``(bigram, n_pair,
    score_micro)`` ordered by (score desc, bigram asc) — the string
    tie-break makes the selected set deterministic.
    """
    from mura_spark.sources.parquet import ensure_min_partitions
    df = ensure_min_partitions(df)
    bi = bigrams(df, text_col)
    uni = (df.select(F.explode(TX.tokens(F.col(text_col))).alias("term"))
             .groupBy("term").agg(F.count(F.lit(1)).alias("c")))
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    bic = (bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair")))
    n_bi = bic.agg(F.sum("n_pair").alias("n_bi"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    scored = (bic.filter(F.col("n_pair") >= min_count)
              .join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(n_uni)).crossJoin(F.broadcast(n_bi)))
    # left-assoc double products — the oracle SQL mirrors this exact shape
    pmi = F.log((F.col("n_pair").cast("double") * F.col("n_uni")
                 * F.col("n_uni"))
                / (F.col("n_bi").cast("double") * F.col("c1")
                   * F.col("c2")))
    return (scored.select(
                F.concat_ws(" ", "w1", "w2").alias("bigram"),
                "n_pair",
                F.floor(pmi * F.lit(1_000_000) + F.lit(0.5)).cast("bigint")
                 .alias("score_micro"))
            .orderBy(F.col("score_micro").desc(), F.col("bigram").asc())
            .limit(k))


def bigram_logloss(df: DataFrame, id_col: str, text_col: str,
                   lam: float = 0.7, lam_uni: float = 0.3) -> DataFrame:
    """Per-document interpolated bigram LM surprisal — the
    context-aware upgrade of corpus.unigram_logloss (which a list of
    frequent words in random order can fool): each scored token
    contributes ``⌊ln(1/P)·10⁶+½⌋`` with
    ``P = λ·c(prev,cur)/c(prev) + λᵤ·c(cur)/T`` (Jelinek-Mercer
    interpolation, the classic KenLM-style backoff shape), and the
    document score is the integer mean over its n−1 scored positions.
    Pass both λ literals explicitly — computing ``1−λ`` in binary
    floating point would desynchronize from the oracle's literal.

    Plan: bigram extraction is the narrow arrays_zip map (no shuffle);
    unigram and bigram counting are one map-side-combined shuffle each;
    the score join is keyed on the bigram/term (vocabulary-scale,
    deliberately not broadcast); one integer-sum groupBy per document.
    Quantize-then-sum keeps ``ln`` out of any float aggregation.
    """
    from mura_spark.functions.quantize import micro
    from mura_spark.sources.parquet import ensure_min_partitions
    df = ensure_min_partitions(df)
    toks = TX.tokens(F.col(text_col))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(toks, 1, n).alias("prev"),
                         F.slice(toks, 2, n).alias("cur"))
    st = (df.select(F.col(id_col), F.explode(pairs).alias("p"))
            .select(id_col, F.col("p.prev").alias("prev"),
                    F.col("p.cur").alias("cur")))
    uni = (df.select(F.explode(TX.tokens(F.col(text_col))).alias("term"))
             .groupBy("term").agg(F.count(F.lit(1)).alias("c")))
    tot = uni.agg(F.sum("c").alias("T"))
    bc = st.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    u1 = uni.select(F.col("term").alias("prev"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("cur"), F.col("c").alias("c2"))
    p = (F.lit(lam) * (F.col("cb").cast("double")
                       / F.col("c1").cast("double"))
         + F.lit(lam_uni) * (F.col("c2").cast("double")
                             / F.col("T").cast("double")))
    scored = (st.join(bc, ["prev", "cur"]).join(u1, "prev")
                .join(u2, "cur").crossJoin(F.broadcast(tot))
                .select(F.col(id_col),
                        micro(F.log(F.lit(1.0) / p)).alias("__s")))
    per_doc = (scored.groupBy(id_col)
                     .agg(F.count(F.lit(1)).alias("n_scored"),
                          F.sum("__s").alias("__sum")))
    return per_doc.select(
        id_col, "n_scored",
        F.floor(F.col("__sum").cast("double")
                / F.col("n_scored").cast("double"))
         .cast("bigint").alias("logloss_micro"))
