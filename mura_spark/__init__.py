"""mura_spark — a PySpark-native analytics engine with the capabilities of
sujithjay/mura (an in-memory SQL query compiler on Apache Arrow), rebuilt
Spark-first rather than ported.

The reference (/root/reference, Rust, ~899 LoC) is a SQL front-end: SQL →
logical plan, with Arrow as the declared memory model and Parquet as the
declared storage format (reference README.md:10). Its pipeline ends at the
logical plan; this package realizes the intended architecture on Spark SQL:

- :mod:`mura_spark.session`   — SparkSession facade (mura's REPL context)
- :mod:`mura_spark.catalog`   — external Parquet table catalog
  (reference src/planner/catalog.rs:20-32, finished rather than stubbed)
- :mod:`mura_spark.plan`      — fluent LogicalPlanBuilder equivalent
  (reference src/planner/logicalplan.rs:371-461)
- :mod:`mura_spark.expressions` — expression surface: predicates, casts,
  literals (reference src/planner/logicalplan.rs:27-149)
- :mod:`mura_spark.functions` — scalar function library (text, vectors)
- :mod:`mura_spark.operators` — relational + LLM-pipeline operators
  (dedup, similarity search, text analysis, top-k)
- :mod:`mura_spark.multimodal` — binary-column conventions + feature UDFs
- :mod:`mura_spark.streaming` — Structured Streaming over the events table
"""

from mura_spark.session import MuraSession, get_spark
from mura_spark.plan import PlanBuilder
from mura_spark.sources.table_format import MuraTable

__all__ = ["MuraSession", "get_spark", "PlanBuilder", "MuraTable"]
__version__ = "0.1.0"
