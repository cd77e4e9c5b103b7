"""RAKE keyword extraction (Rose et al. 2010) re-expressed relationally.

Candidate phrases are the maximal runs of non-stopword tokens, where
BOTH stopwords AND punctuation/sentence boundaries act as phrase
delimiters (Rose et al.'s phrase-delimiter set — a phrase must never
span "dog. The cat"): punctuation runs are rewritten to a sentinel
delimiter token before tokenization, which also strips attached
punctuation from words ('dog.' scores as 'dog'). The islands trick (a
running count of delimiter positions is constant exactly on a run)
then cuts the runs; each word scores ``deg(w)/freq(w)`` where every
occurrence contributes its phrase's length to ``deg``; a phrase scores
the sum of its member words' scores. The classic zero-training
keyphrase extractor a corpus pipeline runs for topic inventories and
index terms.

Determinism: word scores are one correctly-rounded double division of
exact integers, micro-quantized BEFORE the phrase sum; phrase text is
rebuilt with an explicit position sort; top-k carries a (score desc,
phrase asc) tiebreak.

Scale: tokenization is a narrow map; the phrase-id window partitions by
document; word-score and phrase joins are keyed on the term/phrase —
vocabulary-scale equi-joins, never broadcast by assumption.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: sentinel token punctuation runs become — a phrase delimiter that can
#: never occur in the cleaned text (all punctuation is rewritten away)
DELIM = "¶"

#: non-word, non-whitespace runs (letters L*, numbers N*, explicit ASCII
#: whitespace — spelled out so Java and RE2 agree exactly)
_PUNCT_RE = r"[^\p{L}\p{N} \t\n\x0b\f\r]+"
_WS_RE = r"[ \t\n\x0b\f\r]+"


def rake_tokens(text: Column) -> Column:
    """RAKE tokenization: lowercase, rewrite punctuation runs to the
    sentinel delimiter token, split on whitespace, drop empties. The
    identical expression is rendered in SQL by the oracle twin."""
    punct = F.regexp_replace(F.lower(text), _PUNCT_RE, f" {DELIM} ")
    return F.filter(F.split(punct, _WS_RE), lambda x: x != "")


def rake_keywords(df: DataFrame, id_col: str, text_col: str,
                  stopwords: list[str], k: int = 20) -> DataFrame:
    """Top-``k`` RAKE keyphrases over the corpus:
    ``(phrase, n_occ, score_micro)``."""
    toks = rake_tokens(F.col(text_col))
    tok = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(toks).alias("__pos", "__term"))
    st = F.when(F.col("__term").isin(list(stopwords) + [DELIM]), 1) \
          .otherwise(0)
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
