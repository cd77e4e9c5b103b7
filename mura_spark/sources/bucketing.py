"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides. Bucketing pre-partitions data by join key at write time
(``bucketBy`` + ``saveAsTable``); two tables bucketed on the same key with
the same bucket count then sort-merge join with **no Exchange on either
side** — the write-once/join-many trade every warehouse pipeline makes.
Verified by plan assertion in tests/test_sources.py.

(The reference has no write path or physical layer at all — SURVEY.md §2.3,
§4 — so this is extension surface.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "error") -> None:
    """Persist as a bucketed (optionally sort-within-bucket) managed table.

    Pick ``n_buckets`` so one bucket ≈ one task's worth of data at read
    time (hundreds of MB); bucket counts must match across tables that will
    join with each other.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a sort-merge join with zero shuffle."""
    return spark.table(left_table).join(spark.table(right_table), on=on,
                                        how=how)
