"""Streaming + plugin-batch reads over MuraTable versions
(sources/table_stream.py): version offsets, file-diff micro-batches,
exactly-once restart via the checkpoint offset log."""

from __future__ import annotations

import pytest

from mura_spark.sources.table_format import MuraTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, m int, val string")


@pytest.fixture()
def registered(spark):
    from mura_spark.sources.table_stream import register
    register(spark)
    return spark


def _run_available(spark, path, checkpoint, out_dir):
    """One availableNow pass into a RECOVERABLE (parquet) sink; returns
    the cumulative rows landed so far (with multiplicity)."""
    q = (spark.readStream.format("mura_table").option("path", path)
         .load()
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = sorted((r.k, r.m, r.val)
                  for r in spark.read.parquet(out_dir).collect())
    return rows


def test_batch_plugin_snapshot_and_time_travel(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path,
                         _df(spark, [(1, 1, "a"), (2, 2, "b")]),
                         partition_cols=["m"])
    t.merge(_df(spark, [(2, 2, "B")]), key_cols=["k"])
    latest = spark.read.format("mura_table").option("path", path).load()
    assert {(r.k, r.m, r.val) for r in latest.collect()} \
        == {(1, 1, "a"), (2, 2, "B")}
    v1 = (spark.read.format("mura_table").option("path", path)
          .option("version", "1").load())
    assert {(r.k, r.m, r.val) for r in v1.collect()} \
        == {(1, 1, "a"), (2, 2, "b")}


def test_stream_tails_appends_exactly_once(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = MuraTable.create(spark, path, _df(spark, [(1, 1, "a")]),
                         partition_cols=["m"])
    assert _run_available(spark, path, ckpt, out) == [(1, 1, "a")]

    # new commits while the stream is down; restart from checkpoint
    t.append(_df(spark, [(2, 2, "b")]))
    t.append(_df(spark, [(3, 1, "c")]))
    # cumulative sink holds each row exactly ONCE: the checkpointed
    # version-1 offset is honored, nothing re-delivered
    assert _run_available(spark, path, ckpt, out) \
        == [(1, 1, "a"), (2, 2, "b"), (3, 1, "c")]

    # no new commits -> nothing new lands (idempotent restart)
    assert _run_available(spark, path, ckpt, out) \
        == [(1, 1, "a"), (2, 2, "b"), (3, 1, "c")]


def test_stream_compact_redelivers_rewritten_partition(registered,
                                                       tmp_path):
    # compact rewrites files: its rows re-arrive (upsert contract)
    spark = registered
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = MuraTable.create(spark, path, _df(spark, [(1, 1, "a")]),
                         partition_cols=["m"])
    assert _run_available(spark, path, ckpt, out) == [(1, 1, "a")]
    t.compact(target_files=1)
    assert _run_available(spark, path, ckpt, out) \
        == [(1, 1, "a"), (1, 1, "a")]  # rewritten rows redelivered


def test_stream_sink_appends_one_commit_per_batch(registered, tmp_path):
    # writeStream.format("mura_table"): executors write files, the
    # driver publishes one stream_append commit per micro-batch
    spark = registered
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    t_src = MuraTable.create(spark, src_path,
                             _df(spark, [(1, 1, "a"), (2, 2, "b")]),
                             partition_cols=["m"])
    MuraTable.create(spark, dst_path, _df(spark, []))

    def run():
        q = (spark.readStream.format("mura_table")
             .option("path", src_path).load()
             .writeStream.format("mura_table").option("path", dst_path)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    dst = MuraTable.load(spark, dst_path)
    assert {(r.k, r.m, r.val) for r in dst.read().collect()} \
        == {(1, 1, "a"), (2, 2, "b")}
    assert dst._manifest()["action"] == "stream_append"
    # second pass with new source data: exactly the delta arrives
    t_src.append(_df(spark, [(3, 1, "c")]))
    run()
    rows = [(r.k, r.m, r.val) for r in dst.read().collect()]
    assert sorted(rows) == [(1, 1, "a"), (2, 2, "b"), (3, 1, "c")]
    # idempotent re-run: no new commit, no duplicate rows
    v_before = dst._manifest()["version"]
    run()
    assert sorted((r.k, r.m, r.val) for r in dst.read().collect()) \
        == [(1, 1, "a"), (2, 2, "b"), (3, 1, "c")]


def test_stream_sink_writes_hive_layout_into_partitioned_target(
        registered, tmp_path):
    # executors split their batches by partition value and write one
    # file per touched partition under p=v/ segments — partition
    # pruning works on stream-landed files immediately
    spark = registered
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    MuraTable.create(spark, src_path,
                     _df(spark, [(1, 1, "a"), (2, 2, "b"), (3, 1, "c"),
                                 (4, None, "d")]))
    MuraTable.create(spark, dst_path, _df(spark, [(0, 0, "z")]),
                     partition_cols=["m"])
    q = (spark.readStream.format("mura_table")
         .option("path", src_path).load()
         .writeStream.format("mura_table").option("path", dst_path)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    dst = MuraTable.load(spark, dst_path)
    got = {(r.k, r.m, r.val) for r in dst.read().collect()}
    assert got == {(0, 0, "z"), (1, 1, "a"), (2, 2, "b"), (3, 1, "c"),
                   (4, None, "d")}
    m = dst._manifest()
    # every stream-landed file sits under a hive partition segment
    new = [f for f in m["files"] if "stream-" in f]
    assert new and all("m=" in f for f in new)
    # NULL partition values land under the hive null sentinel
    assert any("__HIVE_DEFAULT_PARTITION__" in f for f in new)
    # partition pruning applies to the streamed files: every scan in
    # the union plan carries a PartitionFilter on m
    pruned = dst.read().where("m = 2")
    assert pruned.count() == 1
    import re
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    fills = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert fills and all("m" in s for s in fills)


def test_stream_sink_refuses_unsafe_partition_types(registered,
                                                    tmp_path):
    spark = registered
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    MuraTable.create(spark, src_path, _df(spark, [(1, 1, "a")]))
    df = spark.createDataFrame([(1, 0.5, "a")],
                               "k long, x double, val string")
    MuraTable.create(spark, dst_path, df, partition_cols=["x"])
    with pytest.raises(Exception, match="not path-round-trip-safe"):
        (spark.readStream.format("mura_table")
         .option("path", src_path).load()
         .selectExpr("k", "cast(k as double) as x", "val")
         .writeStream.format("mura_table").option("path", dst_path)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start()
         .awaitTermination(60))


def test_stream_sink_maintains_bloom_filters(registered, tmp_path):
    # executors hash the Arrow batches they just wrote (zero extra
    # I/O); the commit message carries only 16 KiB bitmaps, and
    # lookup pruning works on stream-landed files immediately
    spark = registered
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    MuraTable.create(spark, src_path,
                     _df(spark, [(i, i % 3, f"v{i}") for i in range(30)]))
    MuraTable.create(spark, dst_path, _df(spark, []),
                     bloom_cols=["val"])
    q = (spark.readStream.format("mura_table")
         .option("path", src_path).load()
         .writeStream.format("mura_table").option("path", dst_path)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    dst = MuraTable.load(spark, dst_path)
    m = dst._manifest()
    assert m["action"] == "stream_append"
    assert all(f in m.get("blooms", {}) for f in m["files"])
    hit = dst.read(lookup={"val": "v7"})
    assert 0 < len(hit.inputFiles()) < len(m["files"]) or \
        len(m["files"]) == 1
    assert hit.where("val = 'v7'").count() == 1
    assert dst.read(lookup={"val": "nope"}).count() == 0
