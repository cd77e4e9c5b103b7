"""Incremental aggregate maintenance (mergeable partial states).

The materialized-view pattern of a 100 TB event pipeline: never re-scan
history to refresh a rollup — keep a per-key STATE table of mergeable
partials (sum/count/min/max), fold each new batch's partials into it, and
finalize (avg = sum/count, etc.) only at read time. Correct because every
aggregate here is a commutative monoid, so
``agg(old ∪ new) == merge(agg(old), agg(new))`` — pinned by the suite
oracle (full recompute) and pytest.

Scale shape: building a batch's state is ONE reduced key-shuffle of the
batch only (history is never re-read); the merge is a union of two
dimension-sized state tables followed by the same reduced aggregation —
cost is O(|keys|), independent of corpus history. Sums run in
DECIMAL(18,2) so merge order can never change low bits (the suite's
money-sum convention, `suite/common.py`).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: State columns maintained per (keys, value) pair.
_STATE = ("sum_v", "cnt_v", "min_v", "max_v")


def partial_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Mergeable per-key state of one batch: exact decimal sum, count,
    min, max of ``value``."""
    v = F.col(value)
    return (df.groupBy(*keys)
            .agg(F.sum(v.cast("decimal(18,2)")).alias("sum_v"),
                 F.count(v).alias("cnt_v"),
                 F.min(v).alias("min_v"),
                 F.max(v).alias("max_v")))


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of state tables into one: union + the same monoid
    re-aggregation (sum of sums, sum of counts, min of mins, max of
    maxes). One reduced shuffle over dimension-sized inputs."""
    if not states:
        raise ValueError("need at least one state")
    u = reduce(DataFrame.unionByName, states)
    return (u.groupBy(*keys)
            .agg(F.sum("sum_v").alias("sum_v"),
                 F.sum("cnt_v").alias("cnt_v"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v")))


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time view over the state: total (double), count, min, max,
    derived mean — never stored, always consistent with the partials."""
    return state.select(
        *keys,
        F.col("sum_v").cast("double").alias("total"),
        F.col("cnt_v").alias("n"),
        F.col("min_v").alias("vmin"),
        F.col("max_v").alias("vmax"),
        (F.col("sum_v").cast("double") / F.col("cnt_v")).alias("mean"))
