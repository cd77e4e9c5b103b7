"""TF-IDF keyword extraction over a document corpus.

North-star extension surface (the reference has no text functions at all —
SURVEY.md §2.2 #10 is an empty ScalarFunction shell, logicalplan.rs:63-71);
this is the corpus-statistics building block a training-data pipeline uses
for keyword tagging, rare-term quality signals, and topic clustering.

Plan shape, designed for a sharded 100 TB corpus:

1. tokenize + explode → (doc, term) pairs — narrow after the scan.
2. ``groupBy(doc, term)`` → per-doc term frequencies (one shuffle; partial
   aggregation map-side combines repeated terms before the exchange).
3. ``groupBy(term)`` over the *already-reduced* tf table → document
   frequencies (second shuffle, but over |distinct (doc,term)| rows, not
   raw tokens).
4. corpus size joins in as a broadcast single-row aggregate; document
   frequency joins back on ``term`` — an equi-join that scales with
   vocabulary (NOT broadcast: at web scale the vocabulary is billions of
   terms; Catalyst/AQE may still broadcast it when it measures small).
5. per-doc top-k via ``row_number`` window partitioned by doc — bounded:
   each partition holds one document's distinct terms.

Scoring: smoothed idf = ln((N + 1)/(df + 1)), score = tf · idf — per-row
double arithmetic (deterministic cross-engine; ln is the same libm double
in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mura_spark.functions import text as TX


def tfidf_top_terms(docs: DataFrame, id_col: str, text_col: str,
                    k: int = 5, micro: bool = False) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, score), ties broken
    by term ascending so the selected set is deterministic.

    ``micro=True`` surfaces (and ranks by) ``score_micro`` — the score
    floor-quantized to integer micro-units, ``⌊tf·idf·10⁶ + ½⌋`` as bigint.
    JVM ``Math.log`` and other engines' libm ``ln`` can differ in the last
    ulp, so the raw double score is NOT cross-engine bit-stable; the
    quantized form is (a 1-ulp input shift only flips the floor within
    ~1e-10 of a half-integer). Use it wherever results are hash-compared
    across engines."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.select(F.col(id_col),
                       F.explode(TX.tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    raw = (F.col("__tf").cast("double")
           * F.log((F.col("__n") + F.lit(1.0)) / (F.col("__df") + F.lit(1.0))))
    score_col = "score_micro" if micro else "score"
    score = F.floor(raw * F.lit(1e6) + F.lit(0.5)) if micro else raw
    scored = (tf.join(dfreq, "term")
                .crossJoin(F.broadcast(n_docs))
                .withColumn(score_col, score))
    w = Window.partitionBy(id_col).orderBy(F.col(score_col).desc(),
                                           F.col("term").asc())
    return (scored.withColumn("__rnk", F.row_number().over(w))
            .filter(F.col("__rnk") <= k)
            .select(id_col, "term", score_col))
