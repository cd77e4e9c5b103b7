"""MuraTable CHECK constraints (write-time data-quality gates,
enforced executor-side in the write plan itself) and zero-copy CLONE
(hard-linked dev branch — Delta shallow-clone semantics on a local
filesystem)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mura_spark.sources.table_format import MuraTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, m int, val string")


BASE = [(1, 1, "a"), (2, 1, "b"), (3, 2, None)]


def test_constraint_blocks_bad_append_and_passes_null(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, BASE),
                         constraints={"k_pos": "k > 0"})
    v_before = t._manifest()["version"]
    with pytest.raises(Exception, match=r"\[mura constraint\] CHECK "
                                        r"k_pos"):
        t.append(_df(spark, [(-5, 1, "bad")]))
    # failed job published nothing
    assert t._manifest()["version"] == v_before
    assert t.row_count() == 3
    # NULL predicate passes (SQL CHECK rule): k NULL is not k > 0 FALSE
    t2 = MuraTable.create(spark, str(tmp_path / "t2"),
                          _df(spark, [(None, 1, "x")]),
                          constraints={"k_pos": "k > 0"})
    assert t2.row_count() == 1
    # good rows commit normally and the constraint is carried
    v = t.append(_df(spark, [(9, 9, "ok")]))
    assert v == v_before + 1
    assert t.constraints() == {"k_pos": "k > 0"}


def test_create_with_violating_rows_fails(spark, tmp_path):
    with pytest.raises(Exception, match=r"\[mura constraint\]"):
        MuraTable.create(spark, str(tmp_path / "t"),
                         _df(spark, [(0, 1, "z")]),
                         constraints={"k_pos": "k > 0"})


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, BASE))
    with pytest.raises(ValueError, match="existing row violates"):
        t.add_constraint("val_set", "val IS NOT NULL")
    v = t.add_constraint("k_small", "k < 100")
    assert t._manifest()["action"] == "add_constraint" and v == 2
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("k_small", "k < 10")
    with pytest.raises(Exception, match="k_small"):
        t.append(_df(spark, [(500, 1, "big")]))
    t.drop_constraint("k_small")
    assert t.constraints() == {}
    t.append(_df(spark, [(500, 1, "big")]))  # now allowed
    assert t.row_count() == 4
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("nope")


def test_constraints_enforced_through_update_and_merge(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _df(spark, BASE),
                         constraints={"k_pos": "k > 0"})
    with pytest.raises(Exception, match="k_pos"):
        t.update_where("k = 1", {"k": F.lit(-1)})
    with pytest.raises(Exception, match="k_pos"):
        t.merge(_df(spark, [(-7, 1, "neg")]), key_cols=["k"])
    # violating writes published nothing
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3]
    t.merge(_df(spark, [(7, 1, "ok")]), key_cols=["k"])
    assert t.row_count() == 4


def test_stream_sink_refuses_constrained_table(spark, tmp_path):
    from mura_spark.sources.table_stream import register
    register(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    MuraTable.create(spark, src, _df(spark, BASE))
    MuraTable.create(spark, dst, _df(spark, []),
                     constraints={"k_pos": "k > 0"})
    with pytest.raises(Exception, match="CONSTRAINED"):
        (spark.readStream.format("mura_table").option("path", src)
         .load()
         .writeStream.format("mura_table").option("path", dst)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start().awaitTermination(60))


def test_clone_is_zero_copy_and_independent(spark, tmp_path):
    src = MuraTable.create(spark, str(tmp_path / "src"),
                           _df(spark, BASE), partition_cols=["m"],
                           constraints={"k_pos": "k > 0"})
    src.append(_df(spark, [(4, 2, "d")]))
    clone = src.clone(str(tmp_path / "dev"))
    # same snapshot, zero bytes copied (hard links share inodes)
    assert {(r.k, r.m, r.val) for r in clone.read().collect()} \
        == {(r.k, r.m, r.val) for r in src.read().collect()}
    m = clone._manifest()
    assert m["action"] == "clone" and m["version"] == 1
    for rel in m["files"]:
        s = os.stat(os.path.join(str(tmp_path / "src"), rel))
        d = os.stat(os.path.join(str(tmp_path / "dev"), rel))
        assert s.st_ino == d.st_ino  # shared inode: no data moved
    # constraints travel with the clone
    with pytest.raises(Exception, match="k_pos"):
        clone.append(_df(spark, [(-1, 1, "bad")]))
    # divergence: writes to one side never show on the other
    clone.append(_df(spark, [(100, 1, "clone-only")]))
    assert src.row_count() == 4 and clone.row_count() == 5
    src.delete_where("k = 1")
    assert clone.row_count() == 5
    assert sorted(r.k for r in clone.read().collect()) \
        == [1, 2, 3, 4, 100]


def test_clone_survives_source_vacuum(spark, tmp_path):
    src = MuraTable.create(spark, str(tmp_path / "src"),
                           _df(spark, BASE))
    clone = src.clone(str(tmp_path / "dev"))
    # source rewrites everything, then vacuums its old files away
    src.overwrite(_df(spark, [(9, 9, "new")]))
    src.vacuum(retain_versions=1)
    # the clone's hard links keep the inodes alive
    assert sorted(r.k for r in clone.read().collect()) == [1, 2, 3]
    # and vacuuming the clone can't touch the source's live data
    clone.overwrite(_df(spark, [(8, 8, "c")]))
    clone.vacuum(retain_versions=1)
    assert [r.k for r in src.read().collect()] == [9]


def test_clone_of_version_and_errors(spark, tmp_path):
    src = MuraTable.create(spark, str(tmp_path / "src"),
                           _df(spark, BASE))
    src.append(_df(spark, [(4, 2, "d")]))
    src.tag("golden", 1)
    c1 = src.clone(str(tmp_path / "v1"), version=1)
    assert c1.row_count() == 3
    c2 = src.clone(str(tmp_path / "tagged"), tag="golden")
    assert c2.row_count() == 3
    with pytest.raises(ValueError, match="not both"):
        src.clone(str(tmp_path / "x"), version=1, tag="golden")
    with pytest.raises(FileExistsError):
        src.clone(str(tmp_path / "v1"))
    # blooms/stats carried: lookup pruning works on the clone
    t = MuraTable.create(
        spark, str(tmp_path / "b"),
        spark.createDataFrame([(i, f"doc-{i}") for i in range(40)],
                              "id long, name string")
        .repartition(4, "id"),
        bloom_cols=["name"])
    cb = t.clone(str(tmp_path / "b2"))
    hit = cb.read(lookup={"name": "doc-7"})
    assert len(hit.inputFiles()) <= 2
    assert hit.where("name = 'doc-7'").count() == 1


def test_sql_alter_constraint_routing(spark, tmp_path):
    from mura_spark.session import MuraSession
    ms = MuraSession(spark)
    path = str(tmp_path / "t")
    MuraTable.create(spark, path, _df(spark, BASE))
    ms.create_external_table("cons_t", path, file_type="mura")
    res = ms.sql("ALTER TABLE cons_t ADD CONSTRAINT k_pos "
                 "CHECK (k > 0)").collect()[0]
    assert (res.version, res.constraint) == (2, "k_pos")
    t = MuraTable.load(spark, path)
    assert t.constraints() == {"k_pos": "k > 0"}
    with pytest.raises(Exception, match="k_pos"):
        t.append(_df(spark, [(-1, 1, "bad")]))
    res = ms.sql("ALTER TABLE cons_t DROP CONSTRAINT k_pos") \
            .collect()[0]
    assert res.version == 3 and t.constraints() == {}
    # other ALTERs / unregistered names fall through to Spark
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        ms.sql("ALTER TABLE nope_t ADD CONSTRAINT c CHECK (k > 0)")


def test_sql_optimize_and_vacuum_routing(spark, tmp_path):
    from mura_spark.session import MuraSession
    ms = MuraSession(spark)
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _df(spark, BASE))
    t.append(_df(spark, [(4, 2, "d")]))
    t.append(_df(spark, [(5, 2, "e")]))
    ms.create_external_table("maint_t", path, file_type="mura")
    res = ms.sql("OPTIMIZE maint_t").collect()[0]
    assert res.version == 4 and res.files == 1
    assert ms.table("maint_t").count() == 5
    res = ms.sql("OPTIMIZE maint_t ZORDER BY (k, m)").collect()[0]
    assert res.version == 5
    res = ms.sql("VACUUM maint_t RETAIN 1 VERSIONS").collect()[0]
    assert res.files_deleted > 0
    # history trimmed to the retained version; data intact
    assert ms.table("maint_t").count() == 5
    with pytest.raises(ValueError):
        MuraTable.load(spark, path).read(version=1)
    # read-only tables refuse; unregistered fall through to Spark
    _df(spark, BASE).write.parquet(str(tmp_path / "plain2"))
    ms.create_external_table("maint_plain", str(tmp_path / "plain2"))
    with pytest.raises(ValueError, match="read-only parquet"):
        ms.sql("OPTIMIZE maint_plain")


def test_sql_history_restore_clone_routing(spark, tmp_path):
    from mura_spark.session import MuraSession
    ms = MuraSession(spark)
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _df(spark, BASE))
    t.append(_df(spark, [(4, 2, "d")]))
    t.tag("golden", 1)
    ms.create_external_table("mgmt_t", path, file_type="mura")
    # DESCRIBE HISTORY: one row per commit with action/ts/rows
    hist = ms.sql("DESCRIBE HISTORY mgmt_t").collect()
    assert [(r.version, r.action) for r in hist] == \
        [(1, "create"), (2, "append")]
    assert all(r.ts is not None for r in hist)
    assert hist[1].rows == 4
    # RESTORE TABLE ... TO VERSION AS OF
    res = ms.sql("RESTORE TABLE mgmt_t TO VERSION AS OF 1").collect()[0]
    assert (res.version, res.restored_from) == (3, 1)
    assert ms.table("mgmt_t").count() == 3
    # CREATE TABLE ... CLONE ... LOCATION: registered and readable,
    # version/tag selection honored
    dev = str(tmp_path / "dev")
    res = ms.sql(f"CREATE TABLE mgmt_dev CLONE mgmt_t FOR TAG "
                 f"'golden' LOCATION '{dev}'").collect()[0]
    assert res.rows == 3
    assert ms.table("mgmt_dev").count() == 3
    res = ms.sql(f"CREATE TABLE mgmt_v2 SHALLOW CLONE mgmt_t "
                 f"VERSION AS OF 2 LOCATION '{tmp_path / 'v2'}'") \
        .collect()[0]
    assert ms.table("mgmt_v2").count() == 4
    # writes to the clone leave the source untouched
    ms.sql("DELETE FROM mgmt_dev WHERE k = 1")
    assert ms.table("mgmt_dev").count() == 2
    assert ms.table("mgmt_t").count() == 3
    # unregistered names fall through to Spark's own error
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        ms.sql("DESCRIBE HISTORY nope_t")
