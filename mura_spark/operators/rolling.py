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

from mura_spark.functions.quantize import micro
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


def cumulative_users(df: DataFrame, key: str, ts_col: str,
                     bucket: str = "DAY") -> DataFrame:
    """Audience-growth curve: per time bucket, how many keys appear for
    the FIRST time and the running total of distinct keys seen so far —
    ``(bucket_start, n_new, cum_total)``.

    A naive expanding-window COUNT(DISTINCT) rescans history per bucket;
    this is the scalable first-touch formulation: one groupBy finds each
    key's first timestamp (map-side combined min), one groupBy rolls
    first-touches into buckets, and the running sum is a window over the
    already-aggregate-sized bucket table (days/hours — thousands of
    rows, so the single-partition ordering is bounded by the calendar,
    not the data).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    first = (df.groupBy(F.col(key).alias("__k"))
               .agg(F.min(ts_col).alias("__first")))
    daily = (first.groupBy(F.date_trunc(bucket, "__first")
                           .alias("bucket_start"))
                  .agg(F.count(F.lit(1)).alias("n_new")))
    w = (Window.orderBy("bucket_start")
               .rowsBetween(Window.unboundedPreceding, 0))
    return daily.withColumn("cum_total",
                            F.sum("n_new").over(w).cast("bigint"))


def decayed_value(df: DataFrame, key: str, ts_col: str, value_col: str,
                  half_life_hours: float = 168.0) -> DataFrame:
    """Recency-weighted engagement per key: ``(key, decayed_micro)``
    with each event contributing ``⌊value·2^(−age/half_life)·10⁶ + ½⌋``
    relative to the corpus's newest event. The standard time-decay
    feature for ranking/churn models.

    Per-row exp (engine-ulp-sensitive) quantizes to integer micro-units
    BEFORE the per-key sum — the same convention as every log-scored
    operator here — so the aggregate is order-independent and
    oracle-hashable. The reference timestamp is a broadcast single-row
    max; ages derive from exact epoch-microsecond integers.
    """
    from pyspark.sql import functions as F
    if half_life_hours <= 0:
        raise ValueError(f"half_life_hours must be > 0, "
                         f"got {half_life_hours}")
    ref = df.agg(F.max(ts_col).alias("__ref"))
    age_h = ((F.unix_micros(F.col("__ref"))
              - F.unix_micros(F.col(ts_col))).cast("double")
             / F.lit(3.6e9))
    contrib = micro(F.col(value_col).cast("double")
                    * F.pow(F.lit(2.0), -age_h
                            / F.lit(float(half_life_hours))))
    return (df.crossJoin(F.broadcast(ref))
              .select(F.col(key), contrib.alias("__c"))
              .groupBy(key)
              .agg(F.sum("__c").alias("decayed_micro")))


def activity_streaks(df, key_col: str, date_col):
    """Gaps-and-islands per key: collapse each key's distinct active
    days into maximal consecutive runs and report the longest streak —
    ``(key, n_active_days, max_streak)``. The retention/habit metric
    (DuoLingo-style) and the canonical islands formulation: within a
    key, ``day_index − row_number`` is constant exactly on a
    consecutive run, so one partitioned window + one groupBy finds all
    islands with no self-join.

    Plan: distinct (key, day) reduction → key-partitioned window
    (ordered by day) → two key-grain groupBys. Everything after the
    first reduction is day-grain, bounded by key × calendar.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    days = (df.select(F.col(key_col).alias("__k"),
                      F.col(date_col).alias("__d")).distinct())
    w = Window.partitionBy("__k").orderBy("__d")
    isl = days.select(
        "__k",
        (F.col("__d") - F.row_number().over(w)).alias("__i"))
    runs = (isl.groupBy("__k", "__i")
               .agg(F.count(F.lit(1)).alias("__len")))
    return (runs.groupBy(F.col("__k").alias(key_col))
                .agg(F.sum("__len").alias("n_active_days"),
                     F.max("__len").alias("max_streak")))
