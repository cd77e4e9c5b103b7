"""Copy-on-write MERGE INTO for hive-style parquet tables.

The reference has no mutation surface at all (its Parquet support is a
read-only scan — /root/reference/src/execution/mod.rs registers tables
for SELECT only), and this container ships no transactional table
format (Delta/Iceberg), so this operator supplies the MERGE mechanics
the sources family was missing — upsert/delete semantics with the same
partition-scoped cost model those formats implement:

- **Touched-partition pruning**: when the target is hive-partitioned,
  the source's distinct partition values (a dimension-sized collect,
  bounded by the partition count) prune the target read via an IN
  filter on the partition columns — partition pruning keeps the job
  O(touched partitions), never O(table).
- **Copy-on-write**: surviving target rows and merged/inserted rows are
  materialized through an eager ``localCheckpoint`` BEFORE any file is
  overwritten — the read plan must not lazily reference files the
  commit deletes (the self-overwrite hazard ``compact`` documents).
  The rewrite set is the touched partitions only, so checkpoint
  storage is bounded by them, not the table.
- **Dynamic partition overwrite commit**: only partitions present in
  the merged frame are replaced (overwrite_partitions); untouched
  partition directories are never listed, read, or rewritten.

What a real 100 TB deployment gains from a transactional format on top
of this — atomic multi-partition commit, snapshot isolation, time
travel — is out of scope here and called out in the docstrings rather
than half-implemented.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MergeStats:
    """Row-level outcome of one merge_into call."""
    updated: int
    deleted: int
    inserted: int
    copied: int  # unmatched target rows in touched partitions, rewritten


def merge_into(spark: SparkSession, target_path: str, source: DataFrame,
               key_cols: list[str],
               partition_cols: list[str] | None = None,
               when_matched: str = "update",
               insert_not_matched: bool = True) -> MergeStats:
    """MERGE ``source`` into the parquet table at ``target_path``.

    Semantics (the ANSI/Delta MERGE core):

    - matched on ``key_cols`` → ``when_matched``: ``"update"`` replaces
      the target row with the source row, ``"delete"`` drops it;
    - source rows matching no target row are inserted when
      ``insert_not_matched`` (classic upsert), else ignored;
    - target rows matching no source row are kept as-is.

    ``source`` must carry exactly the target's columns (schema
    evolution is a table-format feature, refused here) and at most one
    row per key — multiple source rows matching one target row make
    the merge ambiguous, so they raise (the Delta rule), enforced with
    one aggregation over the source.

    Returns :class:`MergeStats`; the table at ``target_path`` is
    mutated in place (touched partitions only when ``partition_cols``
    is given, else a full rewrite — partition your mutable tables).
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, "
                         f"got {when_matched!r}")
    target = spark.read.parquet(target_path)
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"source schema {sorted(source.columns)} != target schema "
            f"{sorted(target.columns)} (schema evolution needs a "
            f"transactional table format)")
    source = source.select(*target.columns)  # align column order

    dup = (source.groupBy(*key_cols).count()
                 .where(F.col("count") > 1).limit(1).collect())
    if dup:
        raise ValueError(
            f"multiple source rows share key "
            f"{[dup[0][k] for k in key_cols]} — merge is ambiguous "
            f"(dedupe the source first)")

    if partition_cols:
        # dimension-sized collect: one row per touched partition
        touched = (source.select(*partition_cols).distinct().collect())
        if not touched:
            return MergeStats(0, 0, 0, 0)
        pred = None
        for row in touched:
            clause = None
            for c in partition_cols:
                eq = F.col(c).eqNullSafe(F.lit(row[c]))
                clause = eq if clause is None else clause & eq
            pred = clause if pred is None else pred | clause
        target = target.where(pred)  # partition-pruned scan

    cols = list(target.columns)
    # explicit presence markers survive the full-outer join even for
    # rows whose every data column is NULL
    j = (target.withColumn("__t", F.lit(1)).alias("t")
               .join(source.withColumn("__s", F.lit(1)).alias("s"),
                     [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
                      for k in key_cols],
                     "full_outer"))
    status = (F.when(F.col("t.__t").isNotNull()
                     & F.col("s.__s").isNotNull(), F.lit("matched"))
               .when(F.col("s.__s").isNotNull(), F.lit("insert"))
               .otherwise(F.lit("copy")))
    take_source = status.isin("matched", "insert")
    out_cols = [F.when(take_source, F.col(f"s.{c}"))
                 .otherwise(F.col(f"t.{c}")).alias(c) for c in cols]
    merged = j.select(*out_cols, status.alias("__status"))

    # materialization barrier: the commit below deletes files this plan
    # reads, so pin the merged rows first (bounded by touched partitions)
    merged = merged.localCheckpoint(eager=True)
    counts = {r["__status"]: r["n"] for r in
              merged.groupBy("__status").agg(F.count("*").alias("n"))
                    .collect()}

    final = merged
    if when_matched == "delete":
        final = final.where(F.col("__status") != "matched")
    if not insert_not_matched:
        final = final.where(F.col("__status") != "insert")
    final = final.drop("__status")
    if partition_cols:
        (final.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy(*partition_cols)
              .parquet(target_path))
    else:
        final.write.mode("overwrite").parquet(target_path)

    return MergeStats(
        updated=counts.get("matched", 0) if when_matched == "update"
        else 0,
        deleted=counts.get("matched", 0) if when_matched == "delete"
        else 0,
        inserted=counts.get("insert", 0) if insert_not_matched else 0,
        copied=counts.get("copy", 0))
