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
