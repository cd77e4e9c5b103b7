"""Embedding similarity search (approximate-nearest-neighbor surface).

Two paths, per the standard scale playbook:

- **brute-force top-k** — the exact baseline: broadcast the (small) query
  set against the corpus, cosine via JVM-side ``zip_with``/``aggregate``,
  rank with a window partitioned by query id. No shuffle of the corpus at
  all when the query side broadcasts; the window shuffle is on
  (query_id, sim) pairs only — at 100 TB the corpus is scanned once,
  streamed, never materialized.
- **random-hyperplane LSH** — the scale path: H fixed seeded hyperplanes →
  sign-bit signature → band-bucket equi-join between query and corpus
  signatures → exact cosine re-rank within buckets. Approximate (tested for
  recall against brute force, not oracle-hashed).

Embedding near-dup (cosine ≥ t over all pairs) lives here too: exact
triangular variant for oracle verification plus the LSH-blocked variant.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mura_spark.functions.vectors import cosine, dot, norm

#: Hyperplane count for sign-LSH (signature bits). 16 bits / 4 bands of 4.
LSH_PLANES = 16
LSH_BANDS = 4


def _paired_cosine(dot_col, norm_a, norm_b):
    """cosine from a pair dot + precomputed per-row norms. Identical
    arithmetic to functions.vectors.cosine (dot / (sqrt·sqrt), clamped) —
    precomputing the norms changes the *cost* (1 array traversal per pair
    instead of 3), not the values, so oracle bit-exactness is preserved."""
    denom = norm_a * norm_b
    raw = F.when(denom == 0, F.lit(0.0)).otherwise(dot_col / denom)
    return F.least(F.greatest(raw, F.lit(-1.0)), F.lit(1.0))


def _hyperplanes(dim: int, count: int = LSH_PLANES,
                 seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free Gaussian hyperplanes (seeded; library-stable
    across runs — plain `random`, no numpy dependency in the plan)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(count)]


def topk_bruteforce(queries: DataFrame, corpus: DataFrame, k: int,
                    query_id: str = "query_id", corpus_id: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k for each query vector.

    The query side is broadcast (callers keep it small — a batch of probes);
    the corpus side streams through a single stage. Ties break on ascending
    neighbor id for determinism. Output: (query_id, neighbor_id, rank, sim).
    """
    q = F.broadcast(queries.select(F.col(query_id).alias("__qid"),
                                   F.col(vec_col).alias("__qvec"),
                                   norm(F.col(vec_col)).alias("__qn")))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(vec_col).alias("__cvec"),
                      norm(F.col(vec_col)).alias("__cn"))
    scored = q.join(c).select(
        F.col("__qid").alias(query_id),
        "neighbor_id",
        _paired_cosine(dot(F.col("__qvec"), F.col("__cvec")),
                       F.col("__qn"), F.col("__cn")).alias("sim"))
    w = (Window.partitionBy(query_id)
               .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id, "neighbor_id", "rank", "sim"))


def _signature(df: DataFrame, vec_col: str, planes: list[list[float]]):
    """Array of LSH_BANDS band-keys per row (bit-packed sign pattern)."""
    sig_bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        sig_bits.append(F.when(dot(F.col(vec_col), plane) >= 0, 1).otherwise(0))
    per_band = LSH_PLANES // LSH_BANDS
    bands = []
    for bidx in range(LSH_BANDS):
        bits = sig_bits[bidx * per_band:(bidx + 1) * per_band]
        packed = sum((b * (2 ** i) for i, b in enumerate(bits)), F.lit(0))
        bands.append(F.concat_ws("_", F.lit(bidx), packed))
    return F.array(*bands)


def topk_lsh(queries: DataFrame, corpus: DataFrame, k: int,
             query_id: str = "query_id", corpus_id: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64,
             seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing ≥1 LSH band with
    the query, re-ranked by exact cosine. Multi-band = multi-probe recall.
    Output schema matches :func:`topk_bruteforce`."""
    planes = _hyperplanes(dim, LSH_PLANES, seed)
    q = (queries.select(F.col(query_id).alias("__qid"),
                        F.col(vec_col).alias("__qvec"),
                        F.explode(_signature(queries, vec_col, planes))
                         .alias("band_key")))
    c = (corpus.select(F.col(corpus_id).alias("neighbor_id"),
                       F.col(vec_col).alias("__cvec"),
                       F.explode(_signature(corpus, vec_col, planes))
                        .alias("band_key")))
    cand = (q.join(c, "band_key")
             .select("__qid", "__qvec", "neighbor_id", "__cvec")
             .distinct())
    scored = cand.select(
        F.col("__qid").alias(query_id), "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("sim"))
    w = (Window.partitionBy(query_id)
               .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id, "neighbor_id", "rank", "sim"))


def embedding_dup_pairs(df: DataFrame, threshold: float,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        method: str = "exact") -> DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    ``method='exact'``: triangular all-pairs (id_a < id_b) — the oracle-
    verifiable baseline; quadratic, so only for corpora that fit a broadcast
    side or for per-bucket use. ``method='lsh'``: hyperplane-banded blocking
    then exact cosine verification — near-exact at scale (recall tested
    against the exact path). Output: (id_a, id_b, sim).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
                  norm(F.col(vec_col)).alias("__na"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
                  norm(F.col(vec_col)).alias("__nb"))
    if method == "exact":
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        dim = len(df.select(vec_col).first()[0])
        planes = _hyperplanes(dim, LSH_PLANES)
        ea = (df.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("__va"),
                        norm(F.col(vec_col)).alias("__na"),
                        F.explode(_signature(df, vec_col, planes)).alias("bk")))
        eb = (df.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("__vb"),
                        norm(F.col(vec_col)).alias("__nb"),
                        F.explode(_signature(df, vec_col, planes)).alias("bk")))
        pairs = (ea.join(eb, "bk").filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b", "__va", "__vb", "__na", "__nb")
                   .distinct())
    else:
        raise ValueError(f"unknown method {method!r}")
    return (pairs.select("id_a", "id_b",
                         _paired_cosine(dot(F.col("__va"), F.col("__vb")),
                                        F.col("__na"), F.col("__nb"))
                         .alias("sim"))
                 .filter(F.col("sim") >= threshold))
