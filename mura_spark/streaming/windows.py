"""Structured Streaming operators over event streams.

The reference has no streaming surface at all (SURVEY.md §2.3); this module
is extension surface shaped around the driver's ``events`` table
(event_id, ts, user_id, event_type, value, props).

Batch/stream symmetry: each transformation is written against a plain
DataFrame so the *same function* serves `spark.read` (batch backfill, and
the DuckDB-oracle correctness check) and `spark.readStream` (incremental).
That symmetry is the point of Structured Streaming — one declarative query,
two execution modes.

Scale notes: windowed aggregations keep state per (window, key); the
watermark bounds state size and admits late data up to the delay. State
store partitioning follows ``spark.sql.shuffle.partitions`` — size it to
keys, not input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_events_stream(spark, path: str, schema: StructType,
                       max_files_per_trigger: int = 1):
    """File-source stream over a parquet events directory/file."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def tumbling_counts(events: DataFrame, window_size: str = "1 hour",
                    watermark: str = "2 hours",
                    streaming: bool = False) -> DataFrame:
    """Per-(window, event_type) count + value sum over tumbling windows.

    With ``streaming`` the watermark bounds state and late data; in batch
    mode the watermark is omitted (it would be a no-op filter anyway).
    Output: (window_start, event_type, n_events, total_value).
    """
    src = events.withWatermark("ts", watermark) if streaming else events
    return (src.groupBy(F.window("ts", window_size).alias("w"), "event_type")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum("value").alias("total_value"))
               .select(F.col("w.start").alias("window_start"),
                       "event_type", "n_events", "total_value"))


def sliding_user_activity(events: DataFrame, window_size: str = "1 hour",
                          slide: str = "30 minutes",
                          watermark: str = "2 hours",
                          streaming: bool = False) -> DataFrame:
    """Sliding-window distinct-ish activity per user (count of events)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (src.groupBy(F.window("ts", window_size, slide).alias("w"),
                        "user_id")
               .agg(F.count(F.lit(1)).alias("n_events"))
               .select(F.col("w.start").alias("window_start"),
                       F.col("w.end").alias("window_end"),
                       "user_id", "n_events"))


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when a
    user's inter-event gap exceeds ``gap``. Window lag + running sum — the
    standard SQL-expressible formulation, so the DuckDB oracle can verify it.
    Output: (user_id, session_id, session_start, session_end, n_events).

    Streaming form: Spark's native ``session_window`` (see
    :func:`sessionize_stream`) — same semantics, state-store backed.
    """
    from pyspark.sql.window import Window
    gap_expr = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    with_gap = events.withColumn(
        "new_session",
        F.when(prev_ts.isNull(), F.lit(1))
         .when(F.col("ts") > prev_ts + gap_expr, F.lit(1))
         .otherwise(F.lit(0)))
    sessions = with_gap.withColumn(
        "session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (sessions.groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events")))


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming-native sessionization via ``session_window`` (state-store
    backed, watermark-bounded)."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events"))
