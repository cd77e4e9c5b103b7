"""Deterministic sampling / dataset splitting.

Training-data pipelines need splits that are (a) reproducible across runs
and engines, (b) stable under repartitioning, and (c) joinable — the same
row always lands in the same split. ``DataFrame.sample`` satisfies none of
these (RNG seeded per partition). The portable answer is hashing a key
column: split membership is a pure function of the row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mura_spark.functions.hashing import md5_hash48

#: Denominator for hash-bucket fractions (per-mille resolution).
BUCKETS = 1000


def hash_bucket(key: Column) -> Column:
    """Stable bucket 0..999 from the portable MD5-derived hash of ``key``."""
    return md5_hash48(key.cast("string")) % BUCKETS


def split_by_hash(df: DataFrame, key: str,
                  fractions: dict[str, float]) -> dict[str, DataFrame]:
    """Partition rows into named splits by hash bucket.

    ``fractions`` maps split name → fraction (summing to ≤ 1; any
    remainder is dropped). Buckets are assigned by cumulative ranges, so
    growing one split keeps smaller splits' membership stable.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(F.col(key))
    out: dict[str, DataFrame] = {}
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * BUCKETS))
        out[name] = df.filter((b >= lo) & (b < hi))
        lo = hi
    return out


def cap_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                  n: int) -> DataFrame:
    """Keep at most ``n`` rows per group, the first ``n`` by ascending
    ``order_col`` (which must be unique within a group — e.g. a doc id —
    so the kept set is deterministic).

    This is the domain-mixing cap of a pretraining pipeline: bound how
    many documents any one (source, language) bucket contributes so a
    crawl-heavy domain cannot dominate the corpus.

    Scale shape: domain counts are few and huge (the exact skew this cap
    exists to fix), so a naive global window would funnel the whole
    corpus into ~#domains tasks. Expressing it as ``row_number() <= n``
    lets Catalyst insert ``WindowGroupLimit(Partial)`` *below* the
    exchange (Spark ≥ 3.5): each input partition keeps at most ``n``
    rows per group JVM-side before any shuffle, so the per-domain window
    tasks see O(partitions · n) rows regardless of corpus size. The
    pre-reduction is lossless (the global first-n by a total order is a
    subset of every partition's local first-n) and is asserted in
    tests/test_text.py.
    """
    from pyspark.sql.window import Window
    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


def stratified_sample(df: DataFrame, strata: str, key: str,
                      fractions: dict[str, float],
                      default: float = 0.0) -> DataFrame:
    """Deterministic per-stratum sampling: keep a different hash-bucket
    fraction of each stratum (e.g. downsample boilerplate-heavy sources,
    keep 100% of rare ones — the class-rebalancing step of a training-data
    pipeline).

    Membership is ``hash_bucket(key) < fraction(strata) * 1000`` — a pure
    row-local predicate: no shuffle, no RNG, stable across runs/engines/
    repartitioning, and the kept set for a stratum only grows as its
    fraction grows. ``fractions`` maps stratum VALUE → fraction; strata not
    listed keep ``default``. The per-stratum threshold compiles to a CASE
    expression, so at 100 TB this is a scan-side filter (no join against a
    fractions table needed until there are ~millions of strata)."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} is {frac}, not in [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction {default} not in [0, 1]")
    thresh = F.lit(int(round(default * BUCKETS)))
    for name, frac in fractions.items():
        thresh = F.when(F.col(strata) == name,
                        F.lit(int(round(frac * BUCKETS)))).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key)) < thresh)


def shuffle_key(key: Column, seed: int = 0) -> Column:
    """Deterministic per-row shuffle key: the portable MD5-derived hash of
    ``seed || key``. A pure function of (seed, row), so the induced global
    order is reproducible across runs, engines, and repartitionings, and a
    new seed gives an independent epoch order."""
    return md5_hash48(F.concat(F.lit(f"{seed}|"), key.cast("string")))


def global_shuffle(df: DataFrame, key: str, seed: int = 0,
                   n_partitions: int | None = None) -> DataFrame:
    """Deterministic global shuffle for training-data serving order.

    ``DataFrame.orderBy(rand())`` is neither reproducible nor stable under
    retries; this instead range-partitions + locally sorts by
    :func:`shuffle_key` — reading partition 0..N-1 in file order replays
    one uniform pseudo-random permutation of the corpus. One shuffle, no
    global merge (a single total-order sort would funnel the corpus
    through a driver-side range merge at write time); the range exchange
    samples key quantiles, and because the key is a uniform hash the
    resulting partitions are balanced regardless of input skew.
    """
    # The key column rides as a tie-break everywhere the 48-bit hash is
    # ordered: hash collisions are certain past ~2^24 rows (birthday bound)
    # and ties would otherwise order arbitrarily per run — breaking the
    # reproducibility contract exactly at the scale it matters.
    k = shuffle_key(F.col(key), seed)
    out = df.withColumn("__shuffle_key", k)
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "__shuffle_key", key)
    else:
        out = out.repartitionByRange("__shuffle_key", key)
    return (out.sortWithinPartitions("__shuffle_key", key)
            .drop("__shuffle_key"))


def weighted_sample(df: DataFrame, key: str, weight: Column) -> DataFrame:
    """Deterministic Bernoulli sampling with per-row keep probability
    ``weight`` (clamped to [0, 1]) — the quality-weighted downsampling
    step of a pretraining pipeline (keep high-quality documents with high
    probability, boilerplate rarely), without RNG.

    Keep iff ``hash_bucket(key) < weight·BUCKETS``: a pure row-local
    predicate, so membership is reproducible across runs/engines/
    repartitionings, monotone in the weight (raising a row's score never
    drops it), and executes at the scan — no shuffle at any scale.
    The hash is uniform, so the kept fraction of any weight-w cohort
    converges to w (exact to 1/BUCKETS resolution).
    """
    p = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_bucket(F.col(key)) < p * BUCKETS)


def sample_k_per_group(df: DataFrame, group_cols: list[str], key: str,
                       k: int, seed: int = 0) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, chosen uniformly and
    deterministically: rank by the seeded portable hash of the key and
    keep the first ``k`` — a fixed-size per-stratum sample (eval-set
    carving, per-domain inspection samples) with none of RNG reservoir
    sampling's run-to-run churn; a new seed redraws the sample.

    ``key`` must be unique within each group (e.g. a doc id) — same
    contract as :func:`cap_per_group`'s order column: the rank's final
    tie-break is the key itself, so duplicate keys would leave the kept
    row arbitrary per run and silently break reproducibility.

    Scale shape: identical to :func:`cap_per_group` — ``row_number() ≤ k``
    lets Catalyst run WindowGroupLimit(Partial) below the exchange, so
    each input partition pre-reduces to ≤ k rows per group before any
    shuffle; dominant groups never funnel whole partitions into one task.
    """
    from pyspark.sql.window import Window
    h = shuffle_key(F.col(key), seed)
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))
