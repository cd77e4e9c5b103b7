"""Parquet source/sink helpers.

Parquet is the reference's only named storage format
(``/root/reference/src/parser/mod.rs:21-24``), intended but never opened by
it; here it is the primary columnar source, read through Spark's vectorized
reader with predicate pushdown and schema pruning (the execution the
reference's README promised — reference README.md:10).

The write path (absent from the reference entirely — no INSERT/COPY,
SURVEY.md §2.3) is provided as the engine's sink surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def scan(spark: SparkSession, path: str, schema: StructType | None = None,
         columns: list[str] | None = None) -> DataFrame:
    """Schema'd (or footer-inferred) Parquet scan with optional projection;
    the projection reaches the reader as ReadSchema pruning."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def write(df: DataFrame, path: str, mode: str = "error",
          partition_by: list[str] | None = None,
          target_file_rows: int | None = None) -> None:
    """Parquet sink. ``partition_by`` produces hive-style directory
    partitioning (the scan-side partition-pruning contract);
    ``target_file_rows`` caps rows per file so downstream scans parallelize
    (avoids the few-giant-files failure mode at scale)."""
    writer = df.write.mode(mode)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
