"""Upsert / keep-latest merge — the batch form of a CDC merge.

No reference analog (the reference has no INSERT/UPDATE/DELETE surface at
all, SURVEY.md §2.1); this is extension surface for the ingestion side of a
training-data pipeline: nightly document refreshes, re-crawled pages,
re-scored quality columns.

Scale notes: one hash shuffle on the key (the ranking window), no driver
participation. At 100 TB prefer writing the merged result bucketed by the
key (sources/bucketing.py) so the next merge's shuffle is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_latest(base: DataFrame, updates: DataFrame, key_cols: list[str],
                  version_col: str, tiebreak: str | None = None) -> DataFrame:
    """Merge ``updates`` into ``base``: one row per key — the highest
    ``version_col`` wins; on version ties the updates side wins (the CDC
    convention: a re-delivered row replaces the original), then
    ``tiebreak`` ascending for full determinism. Schemas must match.
    """
    b = base.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    order = [F.col(version_col).desc(), F.col("__src").desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (b.unionByName(u)
             .withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1)
             .drop("__rn", "__src"))


def scd2_history(updates: DataFrame, key_cols: list[str],
                 version_col: str,
                 valid_from: str = "valid_from",
                 valid_to: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension (type 2) history: every version of every
    key, with its validity interval — ``valid_from`` = the row's own
    version timestamp, ``valid_to`` = the next version's (NULL for the
    current row). The keep-all twin of :func:`upsert_latest`: pipelines
    that must reproduce "the corpus as of T" join on
    ``valid_from <= T AND (valid_to IS NULL OR valid_to > T)``.

    ``version_col`` must be unique per key (CDC change timestamps are).
    One hash shuffle on the key; ``lead`` runs in the same window pass.
    At 100 TB, write the result partitioned/bucketed by key so as-of
    lookups prune.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).asc())
    return (updates
            .withColumn(valid_from, F.col(version_col))
            .withColumn(valid_to, F.lead(version_col).over(w)))


def snapshot_diff(old, new, key_cols, compare_cols):
    """Row-level diff of two snapshots of the same keyed relation:
    ``(keys..., change)`` with change ∈ {'added', 'removed', 'changed'};
    unchanged keys are omitted. The audit view of every incremental
    rollup: what did today's snapshot do to yesterday's.

    One full-outer hash join on the key (the canonical diff shuffle —
    both sides partition by key, so 1000 executors each diff a disjoint
    key range). Change detection is null-safe equality (``<=>``) per
    compared column, so NULL→value and value→NULL transitions count as
    changes. Keys must be unique per snapshot (the usual snapshot
    contract — enforced upstream by upsert_latest).
    """
    from pyspark.sql import functions as F
    # presence flags can't rely on compare columns (they may be
    # legitimately NULL) — carry a sentinel literal per side
    o = old.select(*key_cols, *[F.col(c).alias(f"__o_{c}")
                                for c in compare_cols],
                   F.lit(True).alias("__in_o"))
    n = new.select(*key_cols, *[F.col(c).alias(f"__n_{c}")
                                for c in compare_cols],
                   F.lit(True).alias("__in_n"))
    j = o.join(n, key_cols, "full_outer")
    # empty compare_cols = presence-only diff (added/removed only)
    same = F.lit(True)
    for c in compare_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = same & eq
    change = (F.when(F.col("__in_o").isNull(), F.lit("added"))
               .when(F.col("__in_n").isNull(), F.lit("removed"))
               .when(~same, F.lit("changed")))
    return (j.withColumn("change", change)
             .filter(F.col("change").isNotNull())
             .select(*key_cols, "change"))
