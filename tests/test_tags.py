"""MuraTable named tags: immutable version pins that read(tag=) resolves
and vacuum must honor — the reproducible-training-snapshot anchor."""

from __future__ import annotations

import pytest

from mura_spark.sources.table_format import MuraTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_tag_pins_and_reads_a_version(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"),
                         _df(spark, [(1, "a")]))
    assert t.tag("baseline") == 1
    t.append(_df(spark, [(2, "b")]))
    t.tag("after-ingest")  # defaults to latest
    assert t.tags() == {"baseline": 1, "after-ingest": 2}
    assert [r.k for r in t.read(tag="baseline").collect()] == [1]
    assert sorted(r.k for r in t.read(tag="after-ingest").collect()) \
        == [1, 2]
    with pytest.raises(ValueError, match="not both"):
        t.read(version=1, tag="baseline")
    with pytest.raises(ValueError, match="no tag"):
        t.read(tag="nope")


def test_tags_are_immutable_until_untagged(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"),
                         _df(spark, [(1, "a")]))
    t.tag("x")
    t.append(_df(spark, [(2, "b")]))
    with pytest.raises(ValueError, match="immutable"):
        t.tag("x")
    t.untag("x")
    assert t.tag("x") == 2
    with pytest.raises(ValueError, match="no tag"):
        t.untag("ghost")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("../escape")


def test_session_table_at_resolves_tags(spark, tmp_path):
    from mura_spark.session import MuraSession
    ms = MuraSession(spark)
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _df(spark, [(1, "a")]))
    t.tag("golden")
    t.append(_df(spark, [(2, "b")]))
    ms.create_external_table("tagged_t", path, file_type="mura")
    assert [r.k for r in ms.table_at("tagged_t", "golden").collect()] \
        == [1]
    assert sorted(r.k for r in ms.table_at("tagged_t", 2).collect()) \
        == [1, 2]


def test_sql_version_as_of_and_for_tag(spark, tmp_path):
    from mura_spark.session import MuraSession
    ms = MuraSession(spark)
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _df(spark, [(1, "a")]))
    t.tag("gold")
    t.append(_df(spark, [(2, "b")]))
    ms.create_external_table("tt", path, file_type="mura")
    assert ms.sql("SELECT count(*) AS n FROM tt VERSION AS OF 1") \
        .collect()[0].n == 1
    assert ms.sql("SELECT count(*) AS n FROM tt FOR TAG 'gold'") \
        .collect()[0].n == 1
    assert ms.sql("SELECT count(*) AS n FROM tt").collect()[0].n == 2
    # time travel composes: join the table against its own past
    got = ms.sql(
        "SELECT cur.k FROM tt cur LEFT ANTI JOIN "
        "tt VERSION AS OF 1 old ON cur.k = old.k").collect()
    assert [r.k for r in got] == [2]


def test_vacuum_keeps_tagged_versions_and_their_files(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"),
                         _df(spark, [(1, "a")]))
    t.tag("pinned")
    for i in range(2, 7):
        t.overwrite(_df(spark, [(i, "x")]))  # each version new files
    deleted = t.vacuum(retain_versions=1)
    assert deleted > 0  # untagged middle versions really got GC'd
    # the tagged snapshot survives in full, outside the retention window
    assert [r.k for r in t.read(tag="pinned").collect()] == [1]
    assert [r.k for r in t.read().collect()] == [6]
    # untagged + re-vacuum releases it
    t.untag("pinned")
    t.vacuum(retain_versions=1)
    with pytest.raises(ValueError, match="not in table log"):
        t.read(version=1)
