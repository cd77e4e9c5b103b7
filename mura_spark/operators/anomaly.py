"""Statistical anomaly detection over grouped series (north-star
extension; the reference has no aggregate surface at all —
/root/reference/src/planner/queryplanner.rs:88 rejects aggregates).

The z-score detector works on INTEGER-valued observations (counts, or
fixed-point values pre-scaled to integers) so the per-group moment sums
(n, Σv, Σv²) are exact integers: the score

    z = (v·n − Σv) / sqrt(n·Σv² − (Σv)²)

is then a single deterministic double expression per row — identical
across engines and across partition orders, which is what lets the suite
hash-compare it against a SQL oracle (suite/common.py determinism rules).

Scale shape: one shuffle, on the group key, for the moments window; the
score itself is per-row arithmetic inside whole-stage codegen. At 100 TB
the observations are already an aggregate (e.g. hourly rollups), so the
window input is small relative to the raw data; skewed group sizes are
bounded by the series length, not the corpus size. The moment products
run in DECIMAL(38,0) (HUGEINT in the oracle) so Σv up to ~1e18 cannot
overflow the n·Σv² term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_zscores(df: DataFrame, group_cols: list[str], value_col: str,
                  out_col: str = "z") -> DataFrame:
    """Attach the within-group z-score of integer column ``value_col``.

    Groups with zero variance (or a single row) get a NULL score — there
    is no meaningful deviation to measure, and the caller's threshold
    filter drops them without a divide-by-zero.
    """
    w = Window.partitionBy(*group_cols)
    v = F.col(value_col).cast("bigint")
    n = F.count(F.lit(1)).over(w).cast("decimal(38,0)")
    s = F.sum(v).over(w).cast("decimal(38,0)")
    ssq = F.sum(v * v).over(w).cast("decimal(38,0)")
    var_n2 = (n * ssq - s * s).cast("double")  # n²·variance, exact integer
    num = (v.cast("decimal(38,0)") * n - s).cast("double")
    z = F.when(var_n2 > 0, num / F.sqrt(var_n2))
    return df.withColumn(out_col, z)


def zscore_outliers(df: DataFrame, group_cols: list[str], value_col: str,
                    threshold: float = 2.0) -> DataFrame:
    """Rows whose ``value_col`` deviates from its group mean by more than
    ``threshold`` standard deviations (zero-variance groups excluded)."""
    scored = group_zscores(df, group_cols, value_col)
    return scored.filter(F.abs(F.col("z")) > threshold)


def sql_group_zscore(value: str, partition: str) -> str:
    """DuckDB rendering of the :func:`group_zscores` score expression —
    keep in lockstep with the Spark form above."""
    n = f"CAST(COUNT(*) OVER ({partition}) AS HUGEINT)"
    s = f"CAST(SUM({value}) OVER ({partition}) AS HUGEINT)"
    ssq = f"CAST(SUM({value} * {value}) OVER ({partition}) AS HUGEINT)"
    var_n2 = f"CAST({n} * {ssq} - {s} * {s} AS DOUBLE)"
    num = f"CAST(CAST({value} AS HUGEINT) * {n} - {s} AS DOUBLE)"
    return (f"CASE WHEN {var_n2} > 0 "
            f"THEN {num} / sqrt({var_n2}) ELSE NULL END")


def cusum_series(df, time_col, value_col, scale: int = 2):
    """CUSUM change-point series over a time-bucketed total: cumulative
    sum of ``(bucket_total − grand_mean)``, the classic level-shift
    detector (Page 1954) — a drifting metric walks the CUSUM away from
    zero, and the |max| bucket is the most likely change point.

    Exactness: everything stays in integer fixed-point. With ``P_i`` the
    running prefix of bucket totals (exact decimal), the mean-centered
    cusum is ``P_i − i·T/n``; multiplying through by ``n`` gives
    ``n·P_i − i·T`` — pure integer arithmetic in 10^-scale units, no
    division anywhere (``cusum_scaled = n_buckets × cusum`` in those
    units). Output: ``(bucket, total, cusum_scaled, is_peak)``.

    Plan: one map-side-combined groupBy on the bucket (the only full
    shuffle — reduces to #buckets rows), then single-partition windows
    over the bucketed series. A time-bucketed series is ≤ thousands of
    rows regardless of input scale (days × years), so the one-partition
    window is bounded by the calendar, not the data.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    dec = f"decimal(18,{scale})"
    daily = (df.groupBy(F.col(time_col).alias("bucket"))
               .agg(F.sum(F.col(value_col).cast(dec)).alias("__tot")))
    w = (Window.orderBy("bucket")
               .rowsBetween(Window.unboundedPreceding, 0))
    tot = daily.agg(F.sum("__tot").alias("__T"),
                    F.count(F.lit(1)).alias("__n"))
    unit = 10 ** scale
    scaled = (
        daily.crossJoin(F.broadcast(tot))
             .select("bucket",
                     F.col("__tot").cast("double").alias("total"),
                     ((F.col("__n") * F.sum("__tot").over(w)
                       - F.row_number().over(Window.orderBy("bucket"))
                       * F.col("__T")) * unit)
                     .cast("bigint").alias("cusum_scaled")))
    peak = F.max(F.abs(F.col("cusum_scaled"))).over(
        Window.partitionBy())
    return scaled.select(
        "bucket", "total", "cusum_scaled",
        (F.abs(F.col("cusum_scaled")) == peak).alias("is_peak"))
