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
from pyspark.sql import types as T
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
    nulls (left-outer semantics). NULL semantics follow the predicate:
    a right row with a NULL ``on`` or ``by`` can never satisfy
    ``right[on] <= left[on]`` / the group equality, so it is dropped
    before the union (asc-nulls-first window ordering would otherwise
    sort it before EVERY left row and match it); a left row with a
    NULL ``on`` matches nothing.
    """
    carry = list(dict.fromkeys([on, tiebreak] + value_cols))
    right = right.where(F.col(on).isNotNull() & F.col(by).isNotNull())
    # the whole matched right row travels as ONE struct: per-column
    # last(ignorenulls) would backfill a null value column from an OLDER
    # right row, mixing columns across rows
    row_struct = F.struct(*[F.col(c).alias(c) for c in carry])
    struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in carry])
    l2 = left.select(
        "*", F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(struct_type).alias("__r"))
    r2 = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"), row_struct.alias("__r"))
    # align schemas: right rows carry nulls for the left payload columns
    for c in left.columns:
        if c not in (by, on):
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l2.unionByName(r2.select(l2.columns))
    w = (Window.partitionBy(by)
               .orderBy(F.col(on).asc(), F.col("__side").asc(),
                        F.col("__tb").asc_nulls_first())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    return (matched.filter(F.col("__side") == 1)
            .select("*", *[F.col(f"__m.{c}").alias(f"{c}{suffix}")
                           for c in carry])
            .drop("__side", "__tb", "__r", "__m"))


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
    # whole-second bucket math (unix_timestamp truncates) is only the
    # CANDIDATE grid — hi_b pads one bucket so truncation can never drop a
    # boundary match; the exact filter below runs on the real timestamps.
    sec_l = F.unix_timestamp(left[on])
    sec_r = F.unix_timestamp(right[on])
    lo_b = F.floor((sec_l + F.lit(lower)) / width)
    hi_b = F.floor((sec_l + F.lit(upper)) / width) + 1
    lhs = left.select(
        "*", F.explode(F.sequence(lo_b, hi_b)).alias("__bucket"))
    rhs = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns],
        F.floor(sec_r / width).alias("__bucket"))
    on_r = F.col(f"{on}{suffix}")
    cond = ((on_r >= F.col(on) + F.expr(f"INTERVAL {lower} SECOND"))
            & (on_r <= F.col(on) + F.expr(f"INTERVAL {upper} SECOND")))
    return (lhs.join(rhs, on=[lhs["__bucket"] == rhs["__bucket"],
                              lhs[by] == rhs[f"{by}{suffix}"]])
               .filter(cond)
               .drop("__bucket"))


def _us_bucket(ts: Column, width_us: int) -> Column:
    """Epoch-microsecond bucket index — exact arithmetic: the modulo
    subtraction makes the numerator an exact multiple of the width, so
    the double division is error-free (µs epochs ≈ 1.7e15 are exactly
    representable; quotients are small integers)."""
    u = F.unix_micros(ts)
    return F.floor((u - u % width_us) / F.lit(width_us)).cast("long")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bucket: str = "1 hour") -> DataFrame:
    """All (left, right) interval pairs that overlap in time
    (closed-interval semantics: ``l_start ≤ r_end AND r_start ≤ l_end``).
    Column sets of the two inputs must be disjoint; every input column is
    carried through.

    The inequality pair-predicate becomes a bounded-fanout equi-join:
    each interval explodes to the time buckets it covers, pairs meet on
    the bucket key, and a pair is KEPT only in the bucket containing the
    later of the two start times — each overlapping pair survives in
    exactly one bucket, so no distinct/dedup shuffle is needed. Same
    decomposition as Structured Streaming's stream-stream interval-join
    state layout; fanout per row is interval_length / bucket_width, so
    ``bucket`` should be chosen near the typical interval length.
    At 100 TB: one shuffle on the bucket key; co-temporal skew (everyone
    online at 9am) is bounded by AQE skew-split on that join.
    """
    width = _parse_duration_us(bucket)
    lb = F.explode(F.sequence(_us_bucket(F.col(l_start), width),
                              _us_bucket(F.col(l_end), width))).alias("__b")
    rb = F.explode(F.sequence(_us_bucket(F.col(r_start), width),
                              _us_bucket(F.col(r_end), width))).alias("__b")
    l2 = left.select("*", lb)
    r2 = right.select("*", rb)
    later_start = F.greatest(F.col(l_start), F.col(r_start))
    keep = (_us_bucket(later_start, width) == F.col("__b"))
    overlap = ((F.col(l_start) <= F.col(r_end))
               & (F.col(r_start) <= F.col(l_end)))
    return l2.join(r2, "__b").filter(keep & overlap).drop("__b")


def _parse_duration_us(s: str) -> int:
    """'1 hour' / '30 minutes' / '90 seconds' → microseconds."""
    qty, unit = s.split()
    per = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
           "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(qty) * per * 1_000_000
