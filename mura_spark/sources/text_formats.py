"""CSV / JSON-lines sources and sinks.

The reference names only Parquet (``/root/reference/src/parser/mod.rs:21-24``
rejects other formats); these are extension surface. Both readers take an
explicit schema by default — schema inference requires an extra full pass
over the data (and at 100 TB, a full pass *is* the job), so inference is
opt-in for exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def scan_csv(spark: SparkSession, path: str,
             schema: StructType | None = None, header: bool = True,
             **options) -> DataFrame:
    """CSV scan. Column pruning still applies (the CSV reader parses only
    requested columns); predicate pushdown does not — filter-heavy
    pipelines should convert to Parquet first (see :func:`to_parquet`)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # extra pass; dev only
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def scan_jsonl(spark: SparkSession, path: str,
               schema: StructType | None = None, **options) -> DataFrame:
    """JSON-lines scan (one object per line — the splittable layout;
    multiline JSON files are not splittable and serialize the read)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "error",
              header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).json(path)


def to_parquet(df: DataFrame, path: str, mode: str = "error") -> None:
    """Materialize a text-format scan as Parquet — the conversion step any
    at-scale pipeline runs once so every later read gets columnar pruning,
    pushdown, and row-group parallelism."""
    df.write.mode(mode).parquet(path)


def scan_orc(spark: SparkSession, path: str,
             schema: StructType | None = None, **options) -> DataFrame:
    """ORC scan (built-in columnar reader — same pushdown/pruning class as
    Parquet, common as the interchange format of Hive-era warehouses)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def scan_jsonl_permissive(spark: SparkSession, path: str,
                          schema: str) -> DataFrame:
    """JSON-lines scan that survives corrupt rows (real ingest is never
    clean): well-formed rows parse against ``schema``; malformed lines
    surface whole in ``_corrupt_record`` with every data column NULL,
    so the pipeline can route them to a quarantine sink instead of
    failing the job (PERMISSIVE is row-local — no driver involvement,
    scales as the scan does).

    Spark caveat baked in here: a query selecting ONLY the corrupt
    column is disallowed over raw JSON (the parser would need the full
    row anyway); callers filtering quarantine rows should select data
    columns alongside, as the tests do."""
    full = schema.rstrip() + ", _corrupt_record STRING"
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def scan_xml(spark: SparkSession, path: str, row_tag: str = "row",
             schema: str | None = None) -> DataFrame:
    """Native XML scan (built into Spark 4 — the former spark-xml
    package): one DataFrame row per ``row_tag`` element. Always pass a
    schema in pipelines: XML inference reads the data twice and types
    drift per slice (same rule as CSV/JSONL here)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              root_tag: str = "rows", mode: str = "error") -> None:
    """Native XML sink; doubles round-trip via shortest-representation
    literals like the JSONL writer."""
    (df.write.mode(mode).format("xml")
       .option("rootTag", root_tag).option("rowTag", row_tag)
       .save(path))
