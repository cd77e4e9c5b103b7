"""Streaming sinks: idempotent CDC apply via ``foreachBatch``.

Structured Streaming's file sinks are append-only; applying a CDC stream
(upserts keyed on an id) to a queryable table needs ``foreachBatch`` +
the batch upsert operator. This is the standard Spark pattern for
"stream into a mutable table" without a lakehouse format dependency
(Delta/Iceberg aren't in this environment; with them, the same batch
function targets ``MERGE INTO``).

Scale/correctness notes:
- foreachBatch re-executes a batch after failure, so the apply MUST be
  idempotent: keep-latest merge is (applying the same batch twice is a
  no-op), version-pinned by the CDC ordering column — NOT arrival order.
- The full-table rewrite per batch is the no-lakehouse cost; partition
  the table path (``partition_cols``) so a batch that touches few
  partitions can use dynamic partition overwrite instead of a full
  rewrite at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mura_spark.operators.upsert import upsert_latest


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through Hadoop's FileSystem so URI table paths
    (file:/, hdfs://, s3a://) resolve exactly like Spark's own reader —
    os.path.exists would be False for every URI, which here would mean
    'first batch' and silently overwrite the accumulated table."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def apply_cdc_batches(stream: DataFrame, table_path: str, keys: list[str],
                      version_col: str, checkpoint_dir: str,
                      partition_cols: list[str] | None = None,
                      available_now: bool = False):
    """Start a ``foreachBatch`` query that merges each micro-batch into the
    parquet table at ``table_path`` with keep-latest semantics
    (:func:`mura_spark.operators.upsert.upsert_latest` — newest
    ``version_col`` per key wins, batch side wins ties).

    Returns the StreamingQuery; caller owns ``awaitTermination``/``stop``.
    """
    spark = stream.sparkSession

    def apply(batch: DataFrame, batch_id: int) -> None:
        merged = _merge_into(spark, batch, table_path, keys, version_col)
        writer = merged.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(table_path)

    writer = (stream.writeStream
              .foreachBatch(apply)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _merge_into(spark: SparkSession, batch: DataFrame, table_path: str,
                keys: list[str], version_col: str) -> DataFrame:
    """Current table state merged with one batch (collected eagerly — the
    overwrite below invalidates the files the merge reads from).

    Only a MISSING table means first-batch: any other read failure
    (corrupt footer from a crashed overwrite, transient IO) must
    surface — falling back to the bare batch would silently replace
    the accumulated table with one micro-batch, losing every key the
    batch doesn't carry. And the first batch still needs the keep-
    latest reduction: under availableNow the entire initial load can
    arrive as one batch holding several versions of a key."""
    if not _fs_exists(spark, table_path):
        empty = spark.createDataFrame([], batch.schema)
        return upsert_latest(empty, batch, keys, version_col) \
            .localCheckpoint(eager=True)
    current = spark.read.parquet(table_path)
    merged = upsert_latest(current, batch, keys, version_col)
    # materialize BEFORE the overwrite truncates the input files
    return merged.localCheckpoint(eager=True)


def maintain_rollup_batches(stream: DataFrame, state_path: str,
                            keys: list[str], value: str,
                            checkpoint_dir: str,
                            available_now: bool = False):
    """Start a ``foreachBatch`` query that maintains the mergeable rollup
    state of :mod:`mura_spark.operators.incremental` over a stream: each
    micro-batch is reduced to its partial state (one reduced shuffle of
    the BATCH only) and monoid-merged into the dimension-sized state
    table — the streaming form of incremental materialized-view refresh;
    read-time consumers call ``incremental.finalize`` on ``state_path``.

    Unlike the CDC keep-latest sink, additive partials are NOT naturally
    idempotent (re-merging a delivered batch double-counts), so the apply
    records the last committed ``batch_id`` INSIDE the checkpoint
    directory (batch ids are only meaningful relative to the checkpoint
    that numbers them) and skips batches at or below it — redelivery of a
    completed batch is a no-op (pytest-pinned). A batch arriving with no
    marker in its checkpoint means the stream is starting from offset
    zero (new or wiped checkpoint → the source replays everything), so
    the state is REBUILT from that batch rather than merged — a fresh
    checkpoint can therefore never double-count into old state or
    silently skip new data. The marker is written after the state
    overwrite; a crash landing exactly between the two writes re-applies
    one batch — closing that window needs a transactional table format
    (Delta/Iceberg `MERGE` + txn), which this environment doesn't ship;
    the seam is the same ``apply`` function either way.

    Returns the StreamingQuery; caller owns ``awaitTermination``/``stop``.
    """
    import os

    spark = stream.sparkSession
    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "rollup_last_batch")

    from mura_spark.operators.incremental import merge_states, partial_state

    def apply(batch: DataFrame, batch_id: int) -> None:
        # only a MISSING marker means fresh checkpoint; an unreadable
        # or partial one (crash mid-write would be possible with a
        # truncating open - see the atomic os.replace below) must
        # surface rather than trigger the rebuild branch, which would
        # wipe accumulated state while the source resumes mid-stream
        last = None
        try:
            with open(marker) as fh:
                last = int(fh.read().strip())
        except FileNotFoundError:
            pass
        if last is not None and batch_id <= last:
            return
        new = partial_state(batch, keys, value)
        if last is None:
            # no marker in THIS checkpoint: the source is replaying from
            # offset zero — rebuild the state instead of merging into
            # whatever a previous checkpoint left behind
            merged = new
        else:
            # missing state dir (marker exists but state was removed
            # out-of-band) restarts from this batch; any OTHER read
            # failure — corrupt footer from a crashed overwrite,
            # transient IO — must surface, never silently replace
            # accumulated state with one batch's partials
            if _fs_exists(spark, state_path):
                current = spark.read.parquet(state_path)
            else:
                current = None
            merged = (merge_states([current, new], keys)
                      if current is not None else new)
        # materialize BEFORE the overwrite truncates the input files
        merged.localCheckpoint(eager=True).write.mode("overwrite") \
              .parquet(state_path)
        # atomic marker publish: a truncating open("w") killed between
        # truncate and flush would leave an EMPTY marker, which a
        # restart would read as "fresh checkpoint" and rebuild from one
        # batch; temp-write + os.replace can only ever expose the old
        # or the new complete marker
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, marker)

    writer = (stream.writeStream
              .foreachBatch(apply)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
