"""SQL MERGE INTO routing (MuraSession.sql -> MuraTable.merge):
full-row upsert/delete/insert-only over versioned tables — the last
DML statement the SQL surface lacked after DELETE/UPDATE landed."""

from __future__ import annotations

import pytest

from mura_spark.session import MuraSession
from mura_spark.sources.table_format import MuraTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, m int, val string")


BASE = [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")]


def _setup(spark, tmp_path, name="mrg_t"):
    ms = MuraSession(spark)
    path = str(tmp_path / "t")
    MuraTable.create(spark, path, _df(spark, BASE))
    ms.create_external_table(name, path, file_type="mura")
    return ms, path


def test_merge_upsert(spark, tmp_path):
    ms, path = _setup(spark, tmp_path)
    _df(spark, [(2, 9, "B"), (4, 9, "d")]) \
        .createOrReplaceTempView("mrg_src")
    res = ms.sql(
        "MERGE INTO mrg_t AS t USING mrg_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *").collect()[0]
    assert (res.version, res.rows_updated, res.rows_inserted,
            res.rows_deleted) == (2, 1, 1, 0)
    got = {(r.k, r.m, r.val) for r in ms.table("mrg_t").collect()}
    assert got == {(1, 1, "a"), (2, 9, "B"), (3, 2, "c"), (4, 9, "d")}
    # pre-merge snapshot still time-travel readable
    assert MuraTable.load(spark, path).read(version=1).count() == 3


def test_merge_delete_matched(spark, tmp_path):
    ms, _ = _setup(spark, tmp_path)
    _df(spark, [(1, 0, "x"), (99, 0, "x")]) \
        .createOrReplaceTempView("mrg_src2")
    res = ms.sql(
        "MERGE INTO mrg_t USING mrg_src2 ON mrg_t.k = mrg_src2.k "
        "WHEN MATCHED THEN DELETE").collect()[0]
    assert (res.rows_deleted, res.rows_inserted) == (1, 0)
    assert sorted(r.k for r in ms.table("mrg_t").collect()) == [2, 3]


def test_merge_insert_only_keeps_matched_rows(spark, tmp_path):
    ms, _ = _setup(spark, tmp_path)
    _df(spark, [(1, 9, "CHANGED"), (5, 5, "e")]) \
        .createOrReplaceTempView("mrg_src3")
    res = ms.sql(
        "MERGE INTO mrg_t USING mrg_src3 ON mrg_t.k = mrg_src3.k "
        "WHEN NOT MATCHED THEN INSERT *").collect()[0]
    assert (res.rows_updated, res.rows_inserted) == (0, 1)
    got = {(r.k, r.m, r.val) for r in ms.table("mrg_t").collect()}
    # matched row 1 is UNCHANGED (insert-only merge)
    assert got == {(1, 1, "a"), (2, 1, "b"), (3, 2, "c"), (5, 5, "e")}


def test_merge_parse_and_routing_errors(spark, tmp_path):
    ms, _ = _setup(spark, tmp_path)
    _df(spark, [(9, 9, "z")]).createOrReplaceTempView("mrg_src4")
    with pytest.raises(ValueError, match="different columns"):
        ms.sql("MERGE INTO mrg_t USING mrg_src4 ON mrg_t.k = "
               "mrg_src4.m WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="unknown qualifier"):
        ms.sql("MERGE INTO mrg_t USING mrg_src4 ON x.k = s.k "
               "WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="cannot parse MERGE clause"):
        ms.sql("MERGE INTO mrg_t USING mrg_src4 ON mrg_t.k = mrg_src4.k "
               "WHEN MATCHED THEN UPDATE SET val = 'x'")
    # read-only parquet table refuses
    _df(spark, BASE).write.mode("overwrite") \
        .parquet(str(tmp_path / "plain"))
    ms.create_external_table("mrg_plain", str(tmp_path / "plain"))
    with pytest.raises(ValueError, match="read-only parquet"):
        ms.sql("MERGE INTO mrg_plain USING mrg_src4 ON "
               "mrg_plain.k = mrg_src4.k WHEN MATCHED THEN DELETE")
    # unregistered target falls through to Spark's own error
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        ms.sql("MERGE INTO no_such_t USING mrg_src4 ON "
               "no_such_t.k = mrg_src4.k WHEN MATCHED THEN DELETE")


def test_merge_multi_key_and_alias_free_on(spark, tmp_path):
    ms = MuraSession(spark)
    path = str(tmp_path / "t2")
    MuraTable.create(spark, path, _df(spark, BASE))
    ms.create_external_table("mrg_mk", path, file_type="mura")
    _df(spark, [(1, 1, "A1"), (3, 9, "x")]) \
        .createOrReplaceTempView("mrg_src5")
    res = ms.sql(
        "MERGE INTO mrg_mk USING mrg_src5 ON k = k AND m = m "
        "WHEN MATCHED THEN UPDATE SET *").collect()[0]
    # (3, 9) matches no (k, m) pair and there is no INSERT clause
    assert (res.rows_updated, res.rows_inserted) == (1, 0)
    got = {(r.k, r.m, r.val) for r in ms.table("mrg_mk").collect()}
    assert got == {(1, 1, "A1"), (2, 1, "b"), (3, 2, "c")}


def test_merge_sync_delete_mirrors_source(spark, tmp_path):
    ms, path = _setup(spark, tmp_path, name="sync_t")
    # source: update 1, insert 9; keys 2 and 3 are ABSENT -> dropped
    _df(spark, [(1, 9, "A"), (9, 9, "i")]) \
        .createOrReplaceTempView("sync_src")
    res = ms.sql(
        "MERGE INTO sync_t USING sync_src ON sync_t.k = sync_src.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE").collect()[0]
    assert (res.rows_updated, res.rows_inserted, res.rows_deleted) \
        == (1, 1, 2)
    got = {(r.k, r.m, r.val) for r in ms.table("sync_t").collect()}
    assert got == {(1, 9, "A"), (9, 9, "i")}  # exact mirror
    # pre-merge snapshot still readable
    assert MuraTable.load(spark, path).read(version=1).count() == 3


def test_merge_sync_delete_scans_whole_partitioned_target(spark,
                                                          tmp_path):
    # sync semantics need the WHOLE target: keys in partitions the
    # source never mentions must still be dropped
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")],
        "k long, m int, val string")
    t = MuraTable.create(spark, str(tmp_path / "t"), df,
                         partition_cols=["m"])
    src = spark.createDataFrame([(1, 1, "A")],
                                "k long, m int, val string")
    stats = t.merge(src, key_cols=["k"], sync_delete=True)
    assert (stats.updated, stats.deleted, stats.copied) == (1, 2, 0)
    got = {(r.k, r.m, r.val) for r in t.read().collect()}
    assert got == {(1, 1, "A")}


def test_txn_idempotent_append_and_merge(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, BASE))
    v = t.append(_df(spark, [(10, 1, "x")]), txn=("job", 1))
    assert v == 2 and t.row_count() == 4
    # blind replay of the same app version: no-op, same version back
    v = t.append(_df(spark, [(10, 1, "x")]), txn=("job", 1))
    assert v == 2 and t.row_count() == 4
    # next app version commits
    v = t.append(_df(spark, [(11, 1, "y")]), txn=("job", 2))
    assert v == 3 and t.row_count() == 5
    # stale replay after progress: still skipped
    assert t.append(_df(spark, [(10, 1, "x")]), txn=("job", 1)) == 3
    # independent apps do not interfere
    assert t.append(_df(spark, [(12, 1, "z")]), txn=("other", 1)) == 4
    # merge honors the same guard
    s = t.merge(_df(spark, [(99, 9, "m")]), key_cols=["k"],
                txn=("job", 2))
    assert (s.updated, s.inserted) == (0, 0) and t.row_count() == 6
    s = t.merge(_df(spark, [(99, 9, "m")]), key_cols=["k"],
                txn=("job", 3))
    assert s.inserted == 1 and t.row_count() == 7
    # the high-water mark survives unrelated commits (compact)
    t.compact()
    assert t.append(_df(spark, [(10, 1, "x")]),
                    txn=("job", 3)) == t._manifest()["version"]
    assert t.row_count() == 7
