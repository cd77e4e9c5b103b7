"""Source/sink and skew-tool queries with value oracles.

CSV/JSONL round-trips pin the text-format readers/writers against the
parquet ground truth the oracle reads; the salted-join query pins the skew
tool's result equivalence end-to-end (salting must never change the
answer). Round-trip scratch space lives under /tmp — rewritten
(mode=overwrite) every run, so re-execution is idempotent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mura_spark.operators.skew import salted_join
from mura_spark.sources import text_formats as TF
from mura_spark.suite.common import sql_dsum, table

SPARK_QUERIES = {}
ORACLE_SQL = {}


def q(name, oracle=None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


@q("csv_roundtrip", "SELECT n_nationkey, n_name, n_regionkey FROM nation")
def csv_roundtrip(spark, sf):
    """nation → CSV (quoted text columns) → scan with explicit schema.
    Comments are dropped before writing: free-text columns exercise CSV
    quoting in pytest; the oracle pin here is the typed-column round-trip."""
    src = (table(spark, sf, "nation")
           .select("n_nationkey", "n_name", "n_regionkey"))
    path = "/tmp/mura_suite_csv_nation"
    TF.write_csv(src, path, mode="overwrite")
    return TF.scan_csv(spark, path,
                       schema="n_nationkey bigint, n_name string, "
                              "n_regionkey bigint")


@q("jsonl_roundtrip",
   "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier")
def jsonl_roundtrip(spark, sf):
    """supplier → JSON-lines → scan with explicit schema. Doubles survive
    exactly: the writer emits shortest-round-trip literals."""
    src = (table(spark, sf, "supplier")
           .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    path = "/tmp/mura_suite_jsonl_supplier"
    TF.write_jsonl(src, path, mode="overwrite")
    return TF.scan_jsonl(spark, path,
                         schema="s_suppkey bigint, s_name string, "
                                "s_nationkey bigint, s_acctbal double")


@q("orc_roundtrip",
   "SELECT p_partkey, p_name, p_size, p_retailprice FROM part")
def orc_roundtrip(spark, sf):
    """part → ORC → scan with explicit schema: pins the built-in columnar
    ORC reader/writer (same pushdown/pruning class as Parquet) against the
    parquet ground truth."""
    src = (table(spark, sf, "part")
           .select("p_partkey", "p_name", "p_size", "p_retailprice"))
    path = "/tmp/mura_suite_orc_part"
    TF.write_orc(src, path, mode="overwrite")
    return TF.scan_orc(spark, path,
                       schema="p_partkey bigint, p_name string, "
                              "p_size int, p_retailprice double")


@q("skew_salted_supplier_revenue",
   "SELECT s_name, COUNT(*) AS n_items, "
   f"{sql_dsum('l_extendedprice')} AS revenue "
   "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY s_name")
def skew_salted_supplier_revenue(spark, sf):
    """Supplier revenue through the salted join (big lineitem side scattered
    over 8 sub-keys, small supplier side replicated): the oracle is the
    plain join — salting must be invisible in the result."""
    li = table(spark, sf, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = (table(spark, sf, "supplier")
            .select(F.col("s_suppkey").alias("l_suppkey"), "s_name"))
    joined = salted_join(li, supp, on="l_suppkey", n_salts=8)
    return (joined.groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("double").alias("revenue")))
