"""Interval sweep-line analytics (peak concurrency / interval stacking).

The "how many are active at once" family: sessions, connections, rooms,
GPU leases — anything with a (start, end) pair. The classic sweep-line
re-expressed relationally: explode each interval into a +1 start marker
and a −1 end marker, running-sum the markers in time order, and the
prefix maximum IS the peak concurrency. No reference analog (SURVEY.md
§2 — the reference has no temporal surface); extension beside the
as-of/range-join family (operators/asof.py).

Scale design: the sweep partitions by the grouping column (day, tenant,
…), so each partition's sequential running sum is bounded by that
group's interval count, and groups parallelize across the cluster. The
marker union is a projection (no shuffle); the only shuffle is the
window's partition-by. Tie rule: at equal timestamps, starts sort
BEFORE ends (closed intervals — a session ending at t and one starting
at t count as overlapping), which also guarantees the peak is always
reached on a start marker, making first-peak-time well defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency(intervals: DataFrame, part_col: str,
                     start_col: str, end_col: str) -> DataFrame:
    """Per-group peak number of simultaneously active intervals:
    ``(part_col, n_sessions, peak_concurrent, peak_at)`` where
    ``peak_at`` is the earliest instant the peak is first reached.

    Deterministic under timestamp ties: rows sharing (group, t, delta)
    produce the same multiset of running-sum values in any order, so
    both the max and the earliest peak timestamp are order-free.
    """
    starts = intervals.select(
        F.col(part_col).alias("__g"), F.col(start_col).alias("__t"),
        F.lit(1).alias("__d"))
    ends = intervals.select(
        F.col(part_col).alias("__g"), F.col(end_col).alias("__t"),
        F.lit(-1).alias("__d"))
    sweep = starts.unionByName(ends)
    w = (Window.partitionBy("__g")
               .orderBy(F.col("__t").asc(), F.col("__d").desc())
               .rowsBetween(Window.unboundedPreceding, 0))
    run = sweep.select(
        "__g", "__t", "__d", F.sum("__d").over(w).alias("__run"))
    peak = F.max("__run").over(Window.partitionBy("__g"))
    per = run.select("__g", "__t", "__d", "__run",
                     peak.alias("__peak"))
    return (per.groupBy(F.col("__g").alias(part_col))
               .agg((F.count(F.lit(1)) / F.lit(2)).cast("bigint")
                    .alias("n_sessions"),
                    F.max("__run").alias("peak_concurrent"),
                    F.min(F.when((F.col("__run") == F.col("__peak"))
                                 & (F.col("__d") == 1), F.col("__t")))
                     .alias("peak_at")))
