"""Top-k: sort + limit as a single physical operator.

The reference has Sort and Limit plan nodes but no combined top-k
(SURVEY.md §2.3 'Sorts/limits/top-k'). In Spark, ``orderBy(...).limit(k)``
is planned as ``TakeOrderedAndProject`` — per-partition bounded heaps and a
driver-side merge of k·P rows, never a global sort. That IS the top-k
operator; this module just names it and adds the grouped variant.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk(df: DataFrame, keys: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Physical plan: TakeOrderedAndProject (verify via
    explain — tested in tests/test_plan_shape.py)."""
    return df.orderBy(*keys).limit(k)


def topk_per_group(df: DataFrame, group_cols: Sequence[str],
                   keys: Sequence[Column], k: int,
                   rank_col: str = "rank") -> DataFrame:
    """Top-k within each group via row_number window — one shuffle on the
    group key; rank column kept for deterministic comparison."""
    w = Window.partitionBy(*group_cols).orderBy(*keys)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))
