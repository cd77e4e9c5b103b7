"""Scalar-function library.

The reference declares a generic ``ScalarFunction { name, args, return_type }``
shell but implements zero concrete functions
(``/root/reference/src/planner/logicalplan.rs:63-71``; SURVEY.md §2.2 #10).
This package is the concrete library: portable hashing, text analysis, and
vector math — all built from ``pyspark.sql.functions`` so they run JVM-side
inside whole-stage codegen (no Python in the row path).
"""

from mura_spark.functions import hashing, text, vectors  # noqa: F401
