"""As-of join and range (interval) join — time-series operators Spark has no
native node for (the reference has no joins at all,
/root/reference/src/planner/queryplanner.rs:51 consumes a single FROM
relation; SURVEY.md §2.3).

Both are built as compositions of shuffle-friendly primitives:

- **as-of join**: tag the two inputs, union them, and take a running
  ``last(right value ignoring nulls)`` over a per-key window ordered by
  (time, side, tiebreak). One shuffle on the key — strictly cheaper than the
  naive inequality join (which Spark plans as a broadcast-nested-loop) and
  the shape production tick-data pipelines use. Right rows at the same
  timestamp sort before left rows, so the match condition is
  ``right.ts <= left.ts``; ties on timestamp resolve to the largest
  tiebreak value (deterministic, mirrored by the oracle's
  ``ORDER BY ts DESC, tiebreak DESC LIMIT 1`` lateral).
- **range join**: candidate pairs from an equi-join on (key, time-bucket)
  with each left row probing the buckets its window can reach, then the
  exact interval filter. Turns an inequality join into a bounded-fanout
  equi-join — the standard interval-join decomposition (same trick as
  Structured Streaming's stream-stream interval join state layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              tiebreak: str, value_cols: list[str],
              suffix: str = "_matched") -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` within the same ``by`` group (backward as-of).

    ``tiebreak`` (a right-side unique column) resolves equal timestamps to
    the largest value. ``value_cols`` are the right columns to carry over;
    ``on`` and ``tiebreak`` are carried automatically as
    ``{on}{suffix}`` / ``{tiebreak}{suffix}``. Left rows with no match get
    nulls (left-outer semantics).
    """
    carry = list(dict.fromkeys([on, tiebreak] + value_cols))
    l2 = left.select(
        "*", F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in carry])
    r2 = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in carry])
    # align schemas: right rows carry nulls for the left payload columns
    for c in left.columns:
        if c not in (by, on):
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l2.unionByName(r2.select(l2.columns))
    w = (Window.partitionBy(by)
               .orderBy(F.col(on).asc(), F.col("__side").asc(),
                        F.col("__tb").asc_nulls_first())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w)
               .alias(f"{c}{suffix}") for c in carry])
    return (matched.filter(F.col("__side") == 1)
            .drop("__side", "__tb", *[f"__r_{c}" for c in carry]))


def range_join(left: DataFrame, right: DataFrame, on: str, by: str,
               lower, upper, bucket_width_seconds: int,
               suffix: str = "_r") -> DataFrame:
    """Inner join of rows with ``left[on] + lower <= right[on] <=
    left[on] + upper`` within the same ``by`` group.

    ``lower``/``upper`` are signed second offsets (lower ≤ upper). Each left
    row probes every time bucket its window overlaps (fanout
    ``⌈(upper-lower)/width⌉ + 1``, constant), so the physical plan is a
    plain shuffled equi-join on (key, bucket) plus the exact filter — no
    nested-loop, no cross product.
    """
    if lower > upper:
        raise ValueError("lower must be <= upper")
    width = int(bucket_width_seconds)
    sec_l = F.unix_timestamp(left[on])
    sec_r = F.unix_timestamp(right[on])
    lo_b = F.floor((sec_l + F.lit(lower)) / width)
    hi_b = F.floor((sec_l + F.lit(upper)) / width)
    lhs = left.select(
        "*", sec_l.alias("__lsec"),
        F.explode(F.sequence(lo_b, hi_b)).alias("__bucket"))
    rhs = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns],
        sec_r.alias("__rsec"),
        F.floor(sec_r / width).alias("__bucket"))
    cond = ((F.col("__rsec") >= F.col("__lsec") + lower)
            & (F.col("__rsec") <= F.col("__lsec") + upper))
    return (lhs.join(rhs, on=[lhs["__bucket"] == rhs["__bucket"],
                              lhs[by] == rhs[f"{by}{suffix}"]])
               .filter(cond)
               .drop("__bucket", "__lsec", "__rsec"))
