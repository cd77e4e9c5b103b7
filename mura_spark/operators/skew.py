"""Skew-mitigated joins (salting).

AQE's skew-join splitting handles sort-merge skew at runtime, but two cases
still need explicit salting at 100 TB: (a) a shuffled join where one hot key
holds a double-digit share of the fact side, and (b) aggregations onto a hot
key. Salting replicates the *small* side R times and scatters the hot keys
of the big side across R sub-keys, so no single task owns a hot key.

(The reference has no joins at all — SURVEY.md §2.3 — extension surface.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the big side's keys scattered over ``n_salts``
    sub-keys and the small side replicated ``n_salts`` times.

    Result equals ``big.join(small, on, how)`` for 'inner' and 'left'
    (equivalence pinned in tests). The salt must be deterministic under
    task retries — ``rand()``/``monotonically_increasing_id`` are not — so
    it derives from a hash of the full row, which also spreads rows of the
    hot key uniformly.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full outer over the replicated small side would emit each
        # unmatched small row n_salts times — refuse rather than corrupt
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    salt_big = F.pmod(F.hash(*[F.col(c) for c in big.columns]),
                      F.lit(n_salts))
    b = big.withColumn("__salt", salt_big)
    s = (small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))))
    joined = b.join(s, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def salted_agg_count(df: DataFrame, key: str,
                     n_salts: int = 16) -> DataFrame:
    """Two-stage count per key: partial count on (key, salt), then final
    combine on key. Map-side combine already does this for built-in aggs —
    the explicit form exists for custom aggregation pipelines where the
    first stage is not combinable (e.g. collecting bounded samples per
    key). Output: (key, n)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (df.withColumn("__salt", salt)
                 .groupBy(key, "__salt")
                 .agg(F.count(F.lit(1)).alias("__pc")))
    return partial.groupBy(key).agg(F.sum("__pc").alias("n"))
