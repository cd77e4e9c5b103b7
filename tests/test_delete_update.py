"""MuraTable DELETE WHERE / UPDATE WHERE (copy-on-write, file-pruned)
and the manifest-metadata row_count fast path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mura_spark.sources.table_format import MuraTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, m int, val string")


ROWS = [(1, 1, "a"), (2, 1, "b"), (3, 2, "c"), (4, 2, None)]


def test_delete_where_removes_matches_keeps_history(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS),
                         partition_cols=["m"])
    v, n, files = t.delete_where("k >= 3")
    assert (v, n) == (2, 2) and files >= 1
    assert sorted(r.k for r in t.read().collect()) == [1, 2]
    # old snapshot intact; audit trail records the predicate
    assert sorted(r.k for r in t.read(version=1).collect()) == [1, 2, 3, 4]
    last = t.history()[-1]
    assert last["action"] == "delete" and "k >= 3" in last["predicate"]


def test_delete_null_predicate_rows_are_kept(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS))
    # val = 'c' is NULL for k=4 -> that row must survive (ANSI DELETE)
    v, n, _ = t.delete_where("val = 'c'")
    assert n == 1
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 4]


def test_delete_prunes_untouched_partition_files(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS),
                         partition_cols=["m"])
    m1_files = {f for f in t._manifest()["files"] if "/m=1/" in f}
    t.delete_where("k = 3")  # lives in m=2 only
    after = set(t._manifest()["files"])
    assert m1_files <= after, "m=1 files were rewritten"
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 4]


def test_delete_no_match_is_a_noop(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS))
    v, n, files = t.delete_where("k > 100")
    assert (v, n, files) == (1, 0, 0)
    assert t._manifest()["version"] == 1  # no empty commit


def test_update_where_rewrites_only_matches(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS))
    v, n, _ = t.update_where(
        "k <= 2", {"val": "upper(val)", "k": F.col("k") + 100})
    assert (v, n) == (2, 2)
    got = {(r.k, r.val) for r in t.read().collect()}
    assert got == {(101, "A"), (102, "B"), (3, "c"), (4, None)}
    assert t.history()[-1]["action"] == "update"


def test_update_unknown_column_rejected(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS))
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where("k = 1", {"nope": "1"})


def test_update_pins_assignment_types(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS))
    t.update_where("k = 1", {"m": "m + 1"})  # int + 1 stays int
    assert dict(t.read().dtypes)["m"] == "int"
    assert {r.m for r in t.read().where("k = 1").collect()} == {2}


def test_row_count_is_metadata_only_and_tracks_commits(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS),
                         partition_cols=["m"])
    assert t.row_count() == 4
    t.append(_df(spark, [(9, 3, "z")]))
    assert t.row_count() == 5
    t.merge(_df(spark, [(1, 1, "A"), (10, 1, "n")]), key_cols=["k"])
    assert t.row_count() == 6
    t.delete_where("k in (2, 9)")
    assert t.row_count() == 4
    t.compact()
    assert t.row_count() == 4
    # time travel counts too, and all from the manifest
    assert t.row_count(version=1) == 4
    assert t.row_count(version=2) == 5
    m = t._manifest()
    assert all(f in m["rows"] for f in m["files"])
    assert t.row_count() == t.read().count()


def test_row_count_falls_back_for_pre_tracking_manifests(spark, tmp_path):
    import json, os
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS))
    # simulate a manifest written before row tracking existed
    p = os.path.join(t.log_dir, "v00000001.json")
    m = json.load(open(p))
    del m["rows"]
    os.chmod(p, 0o644)
    json.dump(m, open(p, "w"))
    assert t.row_count() == 4  # falls back to a real count


def test_sql_delete_and_update_route_to_mura_tables(spark, tmp_path):
    from mura_spark.session import MuraSession
    ms = MuraSession(spark)
    path = str(tmp_path / "t")
    MuraTable.create(spark, path, _df(spark, ROWS))
    ms.create_external_table("dml_t", path, file_type="mura")
    res = ms.sql("DELETE FROM dml_t WHERE k >= 3").collect()[0]
    assert (res.version, res.rows_affected) == (2, 2)
    assert sorted(r.k for r in ms.table("dml_t").collect()) == [1, 2]
    res = ms.sql(
        "UPDATE dml_t SET val = concat(val, '!'), m = m + 1 "
        "WHERE k = 1").collect()[0]
    assert res.rows_affected == 1
    got = {(r.k, r.m, r.val) for r in ms.table("dml_t").collect()}
    assert got == {(1, 2, "a!"), (2, 1, "b")}
    # DELETE without WHERE empties the table (history stays readable)
    res = ms.sql("DELETE FROM dml_t").collect()[0]
    assert res.rows_affected == 2
    assert ms.table("dml_t").count() == 0
    assert MuraTable.load(spark, path).read(version=1).count() == 4


def test_sql_dml_on_parquet_table_refuses(spark, tmp_path):
    from mura_spark.session import MuraSession
    ms = MuraSession(spark)
    _df(spark, ROWS).write.mode("overwrite") \
        .parquet(str(tmp_path / "plain"))
    ms.create_external_table("plain_t", str(tmp_path / "plain"))
    with pytest.raises(ValueError, match="read-only parquet"):
        ms.sql("DELETE FROM plain_t WHERE k = 1")
    # non-DML statements and unregistered names pass through to Spark
    assert ms.sql("SELECT 1 AS one").collect()[0].one == 1


def test_sql_set_clause_splits_on_top_level_commas_only(spark):
    from mura_spark.session import MuraSession
    got = MuraSession._split_assignments(
        "a = coalesce(x, ',', 1), b = 'w, z', c = 2")
    assert got == {"a": "coalesce(x, ',', 1)", "b": "'w, z'", "c": "2"}


def test_delete_matching_scan_partition_prunes(spark, tmp_path):
    """Scale pin: the scan that locates matching files must carry the
    predicate (partition pruning + footer pushdown apply), so a
    partition-keyed DELETE on a 100 TB table plans a one-partition
    read, not a table scan."""
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS),
                         partition_cols=["m"])
    from pyspark.sql import functions as F
    plan = (t.read().where(F.expr("m = 2"))
             .select(F.input_file_name())
             ._jdf.queryExecution().executedPlan().toString())
    # the union subtree for the m=1 files must be pruned to zero
    # partitions: every surviving scan mentions only m=2 paths
    import re as _re
    scanned = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert scanned, "no file-source partition filters in plan"
    assert any("m" in s for s in scanned), plan


def test_delete_forces_view_full_refresh(spark, tmp_path):
    from mura_spark.sources.incremental_view import IncrementalAggView
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, ROWS))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "v"), t, keys=["m"],
        aggs={"n": ("count", "k")})
    t.delete_where("k = 1")
    r = view.refresh()
    assert r.mode == "full" and "delete" in r.reason
    assert {(x.m, x.n) for x in view.read().collect()} == {(1, 1), (2, 2)}
