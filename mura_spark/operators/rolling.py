"""Time-range rolling aggregates (RANGE-framed window functions).

No reference analog (mura has no window surface — SURVEY.md §2.3);
extension alongside the Phase-2 window operators.

The trailing-window feature family of an event pipeline (rolling 1-hour
spend, trailing error rate): a per-key window ordered by event time with a
RANGE frame over the preceding interval — every row gets the aggregate of
its key's events inside ``(t - interval, t]``, including simultaneous
peers. ROWS frames (``window_running_sum``) count rows; RANGE frames
measure TIME — the distinction matters exactly when event density varies,
which is what the feature is for.

Scale shape: one hash shuffle on the key + a per-partition sort — the
standard window cost; frame evaluation is a sliding two-pointer over each
key's sorted run (Spark's bounded-range frame), O(n) per key, state
bounded by the interval's row count. Sums run in DECIMAL so the sliding
accumulation order can never change low bits (suite money-sum convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_sum_seconds(df: DataFrame, key: str, ts_col: str, value: str,
                        window_seconds: int,
                        out_col: str = "rolling_sum") -> DataFrame:
    """Append ``out_col`` = exact decimal sum of ``value`` over this key's
    rows with event time in ``[t - window_seconds, t]`` (whole-second
    resolution: the frame orders on ``unix_timestamp``, so sub-second
    peers land in the same frame position — deterministic, and identical
    to the SQL rendering on both engines)."""
    epoch = F.unix_timestamp(F.col(ts_col))
    w = (Window.partitionBy(key).orderBy(epoch.asc())
         .rangeBetween(-window_seconds, 0))
    return df.withColumn(
        out_col,
        F.sum(F.col(value).cast("decimal(18,2)")).over(w).cast("double"))
