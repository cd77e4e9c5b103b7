"""RAKE keyword extraction (Rose et al. 2010) re-expressed relationally.

Candidate phrases are the maximal runs of non-stopword tokens (the
stopwords act as phrase delimiters — the islands trick: a running count
of stopword positions is constant exactly on a run); each word scores
``deg(w)/freq(w)`` where every occurrence contributes its phrase's
length to ``deg``; a phrase scores the sum of its member words' scores.
The classic zero-training keyphrase extractor a corpus pipeline runs
for topic inventories and index terms.

Determinism: word scores are one correctly-rounded double division of
exact integers, micro-quantized BEFORE the phrase sum; phrase text is
rebuilt with an explicit position sort; top-k carries a (score desc,
phrase asc) tiebreak.

Scale: tokenization is a narrow map; the phrase-id window partitions by
document; word-score and phrase joins are keyed on the term/phrase —
vocabulary-scale equi-joins, never broadcast by assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mura_spark.functions import text as TX


def rake_keywords(df: DataFrame, id_col: str, text_col: str,
                  stopwords: list[str], k: int = 20) -> DataFrame:
    """Top-``k`` RAKE keyphrases over the corpus:
    ``(phrase, n_occ, score_micro)``."""
    toks = TX.tokens(F.col(text_col))
    tok = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(toks).alias("__pos", "__term"))
    st = F.when(F.col("__term").isin(stopwords), 1).otherwise(0)
    wdoc = (Window.partitionBy("__doc").orderBy("__pos")
                  .rowsBetween(Window.unboundedPreceding, 0))
    ph = tok.select("__doc", "__pos", "__term", st.alias("__st"),
                    F.sum(st).over(wdoc).alias("__pk"))
    w = ph.filter(F.col("__st") == 0).select("__doc", "__pk", "__pos",
                                             "__term")
    wp = Window.partitionBy("__doc", "__pk")
    pl = w.select("__doc", "__pk", "__pos", "__term",
                  F.count(F.lit(1)).over(wp).alias("__plen"))
    ws = (pl.groupBy("__term")
            .agg(F.floor(F.sum("__plen").cast("double")
                         / F.count(F.lit(1)).cast("double")
                         * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
                 .alias("__wscore")))
    ps = (pl.join(ws, "__term")
            .groupBy("__doc", "__pk")
            .agg(F.concat_ws(
                     " ",
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("__pos", "__term"))),
                         lambda x: x["__term"])).alias("phrase"),
                 F.sum("__wscore").alias("__score")))
    out = (ps.groupBy("phrase")
             .agg(F.count(F.lit(1)).alias("n_occ"),
                  F.max("__score").alias("score_micro")))
    return (out.orderBy(F.col("score_micro").desc(),
                        F.col("phrase").asc())
               .limit(k))
