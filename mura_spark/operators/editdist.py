"""Edit-distance similarity join (exact, lossless pruning) — the
string-metric member of the near-dup family (north-star extension; the
reference executes no joins, /root/reference/src/planner/queryplanner.rs:51
consumes a single FROM relation).

Levenshtein matching catches character-level near-dups (OCR noise, typo
farms, template fills) that token-level Jaccard misses. The naive join is
O(n²) string DPs; this operator makes it an equi-join:

1. fixed-length key: compare length-L prefixes (documents shorter than L
   are excluded up front — a stated, deterministic domain restriction);
2. candidate generation: each prefix's distinct character q-grams, pruned
   to the d·q+1 RAREST grams under a global (df, gram) order — the
   AllPairs prefix filter instantiated for edit distance. Lossless: one
   edit rewrites at most q length-q windows, so ed(a,b) ≤ d implies
   |G_a ∩ G_b| ≥ max(|G_a|,|G_b|) − d·q, and the prefix theorem then
   guarantees the two rare-first prefixes share a gram. df=1 grams are
   dropped first (they cannot produce a pair; dropping them only advances
   rare-first positions — superset of the true prefix, still lossless —
   same argument as dedup.jaccard_dup_pairs);
3. verification: one JVM-codegen ``levenshtein`` per surviving candidate.

Scale shape: one map-side-combined df groupBy, one equi-join on prefix
grams (bounded fanout: ≤ d·q+1 probes per document, rare-first so hot
grams never join), two hash joins to fetch prefixes, then the DP only on
candidates. No UDFs, no cartesian, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def editdist_pairs(df: DataFrame, id_col: str, text_col: str,
                   max_dist: int = 8, prefix_len: int = 64,
                   q: int = 3) -> DataFrame:
    """All pairs of documents (length ≥ ``prefix_len``) whose length-
    ``prefix_len`` prefixes are within Levenshtein distance ``max_dist``.
    Exact over that domain. Output: (id_a, id_b, dist), id_a < id_b.
    """
    n_grams = prefix_len - q + 1
    if n_grams - max_dist * q < 1:
        raise ValueError(
            f"pruning not lossless: need (prefix_len - q + 1) - max_dist*q "
            f">= 1, got {n_grams - max_dist * q}")
    pfx = (df.filter(F.length(F.col(text_col)) >= prefix_len)
             .select(F.col(id_col).alias("__id"),
                     F.substring(F.col(text_col), 1, prefix_len)
                      .alias("__pfx")))
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.lit(n_grams)),
        lambda i: F.col("__pfx").substr(i, F.lit(q))))
    ex = (pfx.select("__id", F.explode(grams).alias("gram")))
    dfreq2 = (ex.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") >= 2))
    w = Window.partitionBy("__id").orderBy("__df", "gram")
    probe = (ex.join(dfreq2, "gram")
               .withColumn("__pos", F.row_number().over(w))
               .filter(F.col("__pos") <= max_dist * q + 1)
               .select("__id", "gram"))
    a = probe.select(F.col("__id").alias("id_a"), "gram")
    b = probe.select(F.col("__id").alias("id_b"), "gram")
    cand = (a.join(b, "gram")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    pa = pfx.select(F.col("__id").alias("id_a"), F.col("__pfx").alias("__pa"))
    pb = pfx.select(F.col("__id").alias("id_b"), F.col("__pfx").alias("__pb"))
    return (cand.join(pa.hint("shuffle_hash"), "id_a")
                .join(pb.hint("shuffle_hash"), "id_b")
                .select("id_a", "id_b",
                        F.levenshtein("__pa", "__pb").alias("dist"))
                .filter(F.col("dist") <= max_dist))
