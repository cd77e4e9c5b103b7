"""Full-text retrieval over a document corpus: BM25 scoring and
reciprocal-rank fusion.

North-star extension surface (the reference has no text or retrieval
functions at all — SURVEY.md §2.2 #10 is an empty ScalarFunction shell,
/root/reference/src/planner/logicalplan.rs:63-71). Retrieval is the other
half of a training-data pipeline's text stack next to dedup: corpus
search for curation ("find all docs about X"), contamination auditing
(query = benchmark prompt), and hard-negative mining for embedding
training.

Plan shape for :func:`bm25_topk`, designed for a sharded 100 TB corpus:

1. tokenize + explode → (doc, term) pairs — narrow after the scan.
2. **filter to the query's terms BEFORE the first shuffle**: the term set
   is a literal ``isin`` evaluated at the scan, so the tf aggregation
   shuffles only rows mentioning query terms (a tiny fraction of the
   token stream), never the whole corpus vocabulary.
3. ``groupBy(doc, term)`` → tf over the filtered pairs (one reduced
   shuffle, map-side combined).
4. document frequency per query term = a second groupBy over the
   already-reduced tf table (bounded: ≤ |terms| output rows), joined
   back broadcast.
5. corpus stats (N, avgdl) ride in as a broadcast single-row aggregate
   over per-doc lengths — lengths come from the same tokenization, one
   map-side-combined count per doc.
6. per-doc score = integer sum of per-term micro-scores; top-k via
   ``ORDER BY ... LIMIT k`` — Spark plans TakeOrderedAndProject (each
   partition keeps its local k, the driver merges k·partitions rows), so
   no single-partition window ever sees the full candidate set. The
   ``rank`` column is attached afterwards over the k survivors only.

Determinism (hash-comparable across engines): the per-term BM25 score is
a double expression ending in ``ln`` — JVM ``Math.log`` and libm ``ln``
can differ in the last ulp, so each term's score is floor-quantized to
integer micro-units *before* the per-doc sum, which then runs in exact
integer arithmetic (order-independent). Same convention as
:mod:`mura_spark.operators.tfidf`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mura_spark.functions.quantize import micro

from mura_spark.functions import text as TX


def bm25_topk(docs: DataFrame, id_col: str, text_col: str,
              query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    Returns ``(id, score_micro)`` ordered by ``(score_micro DESC, id
    ASC)`` — the id tiebreak makes the selected set deterministic.

    ``score_micro = Σ_t ⌊idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    · 10⁶ + ½⌋`` with the Robertson–Sparck-Jones smoothed idf
    ``ln(1 + (N − df + 0.5)/(df + 0.5))`` (always positive).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))

    ids = F.col(id_col)
    toks = docs.select(ids, TX.tokens(F.col(text_col)).alias("__toks"))
    # per-doc length (all terms, BEFORE the query filter — BM25's dl is
    # the full document length) rides THROUGH the explode on each pair
    # row, so the scoring join never touches the corpus-sized length
    # table again; corpus stats N / avgdl are one cheap single-row agg
    stats = (toks.select(F.size("__toks").alias("__dl"))
                 .agg(F.count(F.lit(1)).alias("__n"),
                      F.sum("__dl").alias("__tot")))
    pairs = (toks.select(ids, F.size("__toks").alias("__dl"),
                         F.explode("__toks").alias("term"))
                 .filter(F.col("term").isin(terms)))
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("__tf"),
                                           F.first("__dl").alias("__dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))

    dl = F.col("__dl").cast("double")
    avgdl = F.col("__tot").cast("double") / F.col("__n").cast("double")
    tfd = F.col("__tf").cast("double")
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5)))
    per_term = (idf * tfd * F.lit(k1 + 1.0)
                / (tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)))
    scored = (tf.join(F.broadcast(dfreq), "term")
                .crossJoin(F.broadcast(stats))
                .withColumn("__s", micro(per_term)))
    total = scored.groupBy(id_col).agg(F.sum("__s").alias("score_micro"))
    return _rank_topk(total, id_col, "score_micro", k)


def rrf_fuse(rankings: list[DataFrame], id_col: str, rank_col: str = "rank",
             k: int = 10, k0: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of N rankings → top-``k`` ``(id,
    rrf_micro, rank)``.

    Each input holds ``(id, rank)`` with rank 1 = best; an item absent
    from a ranking simply contributes nothing (the standard RRF
    convention). ``rrf_micro = Σ_r ⌊10⁶/(k0 + rank_r) + ½⌋`` — the
    per-ranking reciprocal is quantized per row, then summed as exact
    integers, so fusion is order-independent and hash-stable. Final ties
    break by id ascending.

    Scale: a union of the (already tiny — each ranking is itself a
    top-list) inputs plus one map-side-combined groupBy; the window
    orders ≤ Σ|rankings| pre-reduced rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not rankings:
        raise ValueError("rankings must be non-empty")
    # NOT micro(1/(k0+rank)): the SQL twin spells 1e6/(k0+rank), and
    # (1/x)*1e6 is not the same IEEE double as 1e6/x — the expression
    # tree must mirror the oracle exactly
    parts = [r.select(F.col(id_col),
                      F.floor(F.lit(1e6)
                              / (F.lit(float(k0)) + F.col(rank_col)
                                 .cast("double"))
                              + F.lit(0.5)).cast("bigint").alias("__c"))
             for r in rankings]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    total = allc.groupBy(id_col).agg(F.sum("__c").alias("rrf_micro"))
    return _rank_topk(total, id_col, "rrf_micro", k)


def _rank_topk(scored: DataFrame, id_col: str, score_col: str,
               k: int) -> DataFrame:
    """Top-``k`` by ``(score DESC, id ASC)`` with a 1-based ``rank``
    column. The limit runs as TakeOrderedAndProject (distributed partial
    top-k); the ranking window only ever sees the k survivors."""
    top = (scored.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
                 .limit(k))
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (top.withColumn("rank", F.row_number().over(w))
               .select(id_col, score_col, "rank"))
