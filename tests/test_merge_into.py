"""Copy-on-write MERGE INTO over hive-partitioned parquet
(sources/merge.py): upsert/delete semantics, touched-partition-only
rewrites, ambiguity refusal, and the self-overwrite barrier."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F


def _target(spark, path):
    rows = [(k, m, f"v{k}") for m in range(1, 5) for k in
            range(m * 10, m * 10 + 3)]  # 3 rows in each of 4 partitions
    (spark.createDataFrame(rows, "k long, m int, val string")
          .repartition(1).write.partitionBy("m").parquet(path))


def _snapshot(path):
    return {f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/m=*/*.parquet")}


def test_merge_upsert_touches_only_source_partitions(spark, tmp_path):
    from mura_spark.sources.merge import merge_into
    path = str(tmp_path / "t")
    _target(spark, path)
    before = _snapshot(path)
    src = spark.createDataFrame(
        [(20, 2, "UPDATED"), (25, 2, "NEW"), (31, 3, "UPDATED")],
        "k long, m int, val string")
    stats = merge_into(spark, path, src, ["k"], partition_cols=["m"])
    assert (stats.updated, stats.inserted) == (2, 1)
    assert stats.copied == 4  # the other rows of partitions 2 and 3
    after = _snapshot(path)
    untouched_b = {f: t for f, t in before.items()
                   if "/m=1/" in f or "/m=4/" in f}
    untouched_a = {f: t for f, t in after.items()
                   if "/m=1/" in f or "/m=4/" in f}
    assert untouched_a == untouched_b  # same files, same mtimes
    got = {r.k: r.val for r in spark.read.parquet(path).collect()}
    assert got[20] == "UPDATED" and got[31] == "UPDATED"
    assert got[25] == "NEW" and got[21] == "v21" and got[10] == "v10"
    assert len(got) == 13


def test_merge_delete_and_no_insert(spark, tmp_path):
    from mura_spark.sources.merge import merge_into
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(20, 2, "x"), (99, 2, "x")],
                                "k long, m int, val string")
    stats = merge_into(spark, path, src, ["k"], partition_cols=["m"],
                       when_matched="delete", insert_not_matched=False)
    assert (stats.deleted, stats.inserted, stats.updated) == (1, 0, 0)
    keys = {r.k for r in spark.read.parquet(path).collect()}
    assert 20 not in keys and 99 not in keys and len(keys) == 11


def test_merge_unpartitioned_full_rewrite(spark, tmp_path):
    from mura_spark.sources.merge import merge_into
    path = str(tmp_path / "t")
    (spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string")
          .write.parquet(path))
    src = spark.createDataFrame([(2, "B"), (3, "c")],
                                "k long, val string")
    stats = merge_into(spark, path, src, ["k"])
    assert (stats.updated, stats.inserted, stats.copied) == (1, 1, 1)
    got = {r.k: r.val for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_refuses_ambiguous_source(spark, tmp_path):
    from mura_spark.sources.merge import merge_into
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(20, 2, "x"), (20, 2, "y")],
                                "k long, m int, val string")
    with pytest.raises(ValueError, match="ambiguous"):
        merge_into(spark, path, src, ["k"], partition_cols=["m"])


def test_merge_refuses_schema_drift(spark, tmp_path):
    from mura_spark.sources.merge import merge_into
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(20, 2, "x", 1.0)],
                                "k long, m int, val string, extra double")
    with pytest.raises(ValueError, match="schema"):
        merge_into(spark, path, src, ["k"], partition_cols=["m"])


def test_merge_empty_source_is_a_noop(spark, tmp_path):
    from mura_spark.sources.merge import merge_into
    path = str(tmp_path / "t")
    _target(spark, path)
    before = _snapshot(path)
    src = (spark.createDataFrame([], "k long, m int, val string"))
    stats = merge_into(spark, path, src, ["k"], partition_cols=["m"])
    assert (stats.updated, stats.inserted, stats.copied) == (0, 0, 0)
    assert _snapshot(path) == before
