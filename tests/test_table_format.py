"""MuraTable (sources/table_format.py): snapshot-versioned parquet —
immutable data files + manifest log, time travel, O(touched-partition)
copy-on-write merge, optimistic commit conflicts, vacuum GC. Completes
the lakehouse gap VERDICT r6 noted (the reference itself is read-only:
/root/reference/src/execution/mod.rs registers parquet for SELECT)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from mura_spark.sources.table_format import (CommitConflict, MuraTable,
                                             _partition_values)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, m int, val string")


def _base(spark):
    return _df(spark, [(k, m, f"v{k}") for m in range(1, 4)
                       for k in range(m * 10, m * 10 + 3)])


def _vals(df):
    return {(r.k, r.m, r.val) for r in df.collect()}


def test_create_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _base(spark),
                         partition_cols=["m"])
    assert _vals(t.read()) == _vals(_base(spark))
    t2 = MuraTable.load(spark, path)
    assert _vals(t2.read(version=1)) == _vals(_base(spark))
    with pytest.raises(FileExistsError):
        MuraTable.create(spark, path, _base(spark))


def test_append_and_time_travel(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    v = t.append(_df(spark, [(99, 9, "v99")]))
    assert v == 2
    assert _vals(t.read(version=1)) == _vals(_base(spark))
    assert _vals(t.read()) == _vals(_base(spark)) | {(99, 9, "v99")}
    actions = [m["action"] for m in t.history()]
    assert actions == ["create", "append"]


def test_overwrite_keeps_old_versions_readable(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark))
    t.overwrite(_df(spark, [(1, 1, "only")]))
    assert _vals(t.read()) == {(1, 1, "only")}
    assert _vals(t.read(version=1)) == _vals(_base(spark))


def test_merge_is_cow_and_touches_only_source_partitions(
        spark, tmp_path):
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _base(spark),
                         partition_cols=["m"])
    files_v1 = set(t._manifest(1)["files"])
    # update one row in m=2, insert a new row into m=2
    stats = t.merge(_df(spark, [(20, 2, "UPD"), (77, 2, "NEW")]),
                    key_cols=["k"])
    assert (stats.updated, stats.inserted, stats.deleted,
            stats.copied) == (1, 1, 0, 2)
    want = (_vals(_base(spark)) - {(20, 2, "v20")}) \
        | {(20, 2, "UPD"), (77, 2, "NEW")}
    assert _vals(t.read()) == want
    # snapshot: pre-merge version unchanged
    assert _vals(t.read(version=1)) == _vals(_base(spark))
    # COW bookkeeping: untouched partitions carried by REFERENCE
    files_v2 = set(t._manifest(2)["files"])
    carried = files_v1 & files_v2
    assert carried == {f for f in files_v1
                       if _partition_values(f, ["m"]) != ("2",)}
    # and no original file was modified or deleted on disk
    assert all(glob.glob(f"{path}/{f}") for f in files_v1)


def test_merge_delete_and_empty_source(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    stats = t.merge(_df(spark, []), key_cols=["k"])
    assert (stats.updated, stats.inserted) == (0, 0)
    stats = t.merge(_df(spark, [(10, 1, "x"), (11, 1, "y")]),
                    key_cols=["k"], when_matched="delete",
                    insert_not_matched=False)
    assert (stats.deleted, stats.inserted) == (2, 0)
    assert _vals(t.read()) == {v for v in _vals(_base(spark))
                               if v[0] not in (10, 11)}


def test_merge_ambiguous_source_refused(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    with pytest.raises(ValueError, match="ambiguous"):
        t.merge(_df(spark, [(10, 1, "a"), (10, 1, "b")]),
                key_cols=["k"])


def test_delete_all_rows_then_read_typed_empty(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"),
                         _df(spark, [(1, 1, "a")]))
    t.merge(_df(spark, [(1, 1, "a")]), key_cols=["k"],
            when_matched="delete", insert_not_matched=False)
    out = t.read()
    assert out.count() == 0
    assert out.columns == ["k", "m", "val"]


def test_commit_conflict_raises(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark))
    with pytest.raises(CommitConflict):
        t._commit(1, {"version": 1, "action": "create",
                      "partition_cols": [], "files": []})


def test_vacuum_drops_unreferenced_files_and_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _base(spark),
                         partition_cols=["m"])
    t.overwrite(_df(spark, [(1, 1, "b")]))
    t.overwrite(_df(spark, [(2, 2, "c")]))
    n_files_before = len(glob.glob(f"{path}/_data/*/**/*.parquet",
                                   recursive=True))
    deleted = t.vacuum(retain_versions=1)
    assert deleted > 0
    assert len(glob.glob(f"{path}/_data/*/**/*.parquet",
                         recursive=True)) == n_files_before - deleted
    assert _vals(t.read()) == {(2, 2, "c")}  # latest intact
    with pytest.raises(ValueError, match="not in table log"):
        t.read(version=1)  # vacuumed history is gone, loudly


def test_compact_preserves_rows_and_stays_time_travelable(
        spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    for k in range(5):
        t.append(_df(spark, [(100 + k, 1, f"a{k}")]))
    before = _vals(t.read())
    files_before = len(t._manifest()["files"])
    v = t.compact(target_files=1)
    assert _vals(t.read()) == before
    assert len(t._manifest(v)["files"]) < files_before
    # pre-compact version still resolves the old layout
    assert _vals(t.read(version=v - 1)) == before


def test_filtered_time_travel_read_prunes_partitions(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    t.append(_df(spark, [(55, 2, "x")]))
    plan = (t.read().where(F.col("m") == 2)
             ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan
    # no unpruned subtree: every scan in the union carries the filter
    import re
    fills = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert fills and all("m" in s for s in fills)


def test_catalog_registration_and_session_time_travel(spark, tmp_path):
    # the engine-facade integration: file_type="mura" registers the
    # latest snapshot for SQL; table_at() time-travels
    from mura_spark.session import MuraSession
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _base(spark),
                         partition_cols=["m"])
    t.merge(_df(spark, [(20, 2, "UPD")]), key_cols=["k"])
    ms = MuraSession(spark)
    ms.create_external_table("vt", path, file_type="mura")
    assert ms.sql("SELECT val FROM vt WHERE k = 20").first()[0] == "UPD"
    assert ms.table_at("vt", 1).where("k = 20").first()["val"] == "v20"
    with pytest.raises(ValueError, match="not a registered mura"):
        ms.table_at("nope", 1)


def test_changes_tails_appends_incrementally(spark, tmp_path):
    # incremental consumption: changes(N) reads ONLY post-N files
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    t.append(_df(spark, [(100, 1, "a")]))
    t.append(_df(spark, [(101, 2, "b")]))
    assert _vals(t.changes(1)) == {(100, 1, "a"), (101, 2, "b")}
    assert _vals(t.changes(2)) == {(101, 2, "b")}
    assert _vals(t.changes(1, version=2)) == {(100, 1, "a")}
    empty = t.changes(3)
    assert empty.count() == 0 and empty.columns == ["k", "m", "val"]


def test_changes_after_merge_carries_rewritten_partition(spark, tmp_path):
    # merge commits rewrite whole partitions: the changed frame holds
    # every row of the touched partition (upsert-by-key contract)
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    t.merge(_df(spark, [(20, 2, "UPD")]), key_cols=["k"])
    ch = _vals(t.changes(1))
    assert (20, 2, "UPD") in ch
    assert ch == {(k, m, v) for (k, m, v) in
                  _vals(t.read()) if m == 2}


def test_losing_commit_cleans_up_its_orphaned_files(spark, tmp_path):
    # two writers race version 2 (the window between manifest read and
    # commit): the loser must delete its own data files — nothing
    # references them — and leave the winner intact. Handles are
    # stateless, so the race is reproduced by pinning the version
    # BEFORE the winner lands, exactly what a concurrent process sees.
    path = str(tmp_path / "t")
    t1 = MuraTable.create(spark, path, _base(spark),
                          partition_cols=["m"])
    t2 = MuraTable.load(spark, path)
    v, prev = t2._next_version()  # loser plans version 2...
    t1.append(_df(spark, [(100, 1, "winner")]))  # ...winner takes it
    n_files = len(glob.glob(f"{path}/_data/*/**/*.parquet",
                            recursive=True))
    files = t2._write_data(_df(spark, [(200, 2, "loser")]),
                           prev["partition_cols"] or None)
    with pytest.raises(CommitConflict):
        t2._commit_new(v, {"version": v, "action": "append",
                           "partition_cols": prev["partition_cols"],
                           "schema": prev.get("schema"),
                           "files": prev["files"] + files})
    assert len(glob.glob(f"{path}/_data/*/**/*.parquet",
                         recursive=True)) == n_files
    assert _vals(MuraTable.load(spark, path).read()) \
        == _vals(_base(spark)) | {(100, 1, "winner")}


def test_schema_evolution_add_column(spark, tmp_path):
    t = MuraTable.create(spark, str(tmp_path / "t"), _base(spark),
                         partition_cols=["m"])
    wide = _df(spark, [(200, 2, "w")]).withColumn(
        "score", F.lit(7).cast("int"))
    # refused without opt-in; partial frames refused either way
    with pytest.raises(ValueError, match="merge_schema=True"):
        t.append(wide)
    with pytest.raises(ValueError, match="lacks table columns"):
        t.append(wide.drop("val"), merge_schema=True)
    t.append(wide, merge_schema=True)
    out = t.read()
    assert out.columns == ["k", "m", "val", "score"]
    rows = {(r.k, r.score) for r in out.collect()}
    assert (200, 7) in rows
    assert all(s is None for (k, s) in rows if k != 200)  # typed NULLs
    # pre-evolution version keeps its own (narrow) schema
    assert t.read(version=1).columns == ["k", "m", "val"]
    # type changes stay refused
    bad = _df(spark, [(1, 1, "x")]).withColumn(
        "score", F.lit(1.5))  # double vs int
    with pytest.raises(ValueError, match="type"):
        t.append(bad, merge_schema=True)
    # the plugin batch reader aligns old files the same way
    from mura_spark.sources.table_stream import register
    register(spark)
    via_plugin = (spark.read.format("mura_table")
                  .option("path", str(tmp_path / "t")).load())
    assert via_plugin.columns == ["k", "m", "val", "score"]
    assert via_plugin.where("score IS NULL").count() == 9


# ------------------------------------------------------ model-based

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KEYS = st.integers(0, 9)
_OP = st.one_of(
    st.tuples(st.just("append"), st.lists(_KEYS, min_size=1,
                                          max_size=3)),
    st.tuples(st.just("upsert"), st.lists(_KEYS, min_size=1,
                                          max_size=3, unique=True)),
    st.tuples(st.just("delete"), st.lists(_KEYS, min_size=1,
                                          max_size=3, unique=True)),
    st.tuples(st.just("delete_where"), st.lists(_KEYS, min_size=1,
                                                max_size=3, unique=True)),
    st.tuples(st.just("update_where"), st.lists(_KEYS, min_size=1,
                                                max_size=3, unique=True)),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(_OP, min_size=1, max_size=4),
       probe=st.integers(0, 100))
def test_model_based_random_op_sequences(spark, tmp_path_factory,
                                         ops, probe):
    """Random append/upsert/delete sequences vs a row-list model; the
    final snapshot AND one random historical version must both match.
    Partition m = k % 3 (stable per key — the documented partitioned-
    merge precondition)."""
    tag = [0]

    def rows(keys):
        tag[0] += 1
        return [(k, k % 3, f"t{tag[0]}_{k}") for k in keys]

    path = str(tmp_path_factory.mktemp("mbt") / "t")
    model = rows(range(3))
    t = MuraTable.create(spark, path, _df(spark, model),
                         partition_cols=["m"])
    snapshots = {1: list(model)}
    for op, keys in ops:
        r = rows(keys)
        if op == "append":
            t.append(_df(spark, r))
            model = model + r
        elif op == "upsert":
            t.merge(_df(spark, r), key_cols=["k"])
            by_key = {row[0]: row for row in r}
            model = [by_key.get(row[0], row) for row in model]
            present = {row[0] for row in model}
            model += [row for row in r if row[0] not in present]
        elif op == "delete":
            t.merge(_df(spark, r), key_cols=["k"],
                    when_matched="delete", insert_not_matched=False)
            gone = set(keys)
            model = [row for row in model if row[0] not in gone]
        elif op == "delete_where":  # predicate DML, multiplicity-aware
            t.delete_where(f"k in ({','.join(map(str, keys))})")
            gone = set(keys)
            model = [row for row in model if row[0] not in gone]
        else:  # update_where: transform matching rows in place
            t.update_where(f"k in ({','.join(map(str, keys))})",
                           {"val": "concat(val, '+')"})
            hit = set(keys)
            model = [(k, m, v + "+") if k in hit else (k, m, v)
                     for (k, m, v) in model]
        snapshots[t._manifest()["version"]] = list(model)
        # metadata COUNT(*) must agree with the model after EVERY op
        assert t.row_count() == len(model)

    def as_multiset(rows_):
        from collections import Counter
        return Counter(rows_)

    got = [(r.k, r.m, r.val) for r in t.read().collect()]
    assert as_multiset(got) == as_multiset(model)
    # one random historical version must match its recorded snapshot
    versions = sorted(snapshots)
    v = versions[probe % len(versions)]
    got_v = [(r.k, r.m, r.val) for r in t.read(v).collect()]
    assert as_multiset(got_v) == as_multiset(snapshots[v])


def test_manifest_stats_file_skipping(spark, tmp_path):
    # Delta-style data skipping: range-clustered files + footer min/max
    # in the manifest -> read(skip=...) prunes the file list before
    # Spark ever opens anything
    path = str(tmp_path / "t")
    big = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("m"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))
    t = MuraTable.create(spark, path,
                         big.repartitionByRange(8, "k"))
    m = t._manifest()
    assert m["stats_cols"] == ["k", "m"]  # numeric defaults
    # every non-empty file carries k stats (empty part files carry {})
    assert all("k" in s for s in m["stats"].values() if s)
    full = t.read()
    skipped = t.read(skip={"k": (100, 120)})
    # the pruned manifest keeps fewer files, at least one
    n0 = len(m["files"])
    survivors = [f for f in m["files"]
                 if t._file_survives(m["stats"].get(f), {"k": (100, 120)})
                 and m["stats"].get(f)]
    assert 1 <= len(survivors) < n0
    # skipping is an I/O bound, not a filter: with the real predicate
    # on top, results are identical to the unpruned read
    want = {r.k for r in full.where("k BETWEEN 100 AND 120").collect()}
    got = {r.k for r in skipped.where("k BETWEEN 100 AND 120").collect()}
    assert got == want == set(range(100, 121))
    # open-ended bounds + stats survive an append
    t.append(_df(spark, [(5000, 2, "x")]))
    m2 = t._manifest()
    assert len(m2["stats"]) == len(m2["files"])  # stats track files
    hi = t.read(skip={"k": (2000, None)})
    assert {r.k for r in hi.where("k >= 2000").collect()} == {5000}


def test_compact_zorder_clustering_enables_multi_col_skipping(
        spark, tmp_path):
    # after a Z-order compact, BOTH clustered columns skip files; a
    # linear layout only serves its leading column
    path = str(tmp_path / "t")
    big = spark.range(0, 4096).select(
        F.col("id").alias("k"),
        (F.hash(F.col("id").cast("string")) % 1000).alias("a"),
        (F.hash(F.concat(F.lit("x"), F.col("id").cast("string")))
         % 1000).alias("b"),
        F.lit("v").alias("val"))
    t = MuraTable.create(spark, path, big.repartition(8),
                         stats_cols=["a", "b"])
    before = t._manifest()

    def survivors(m, skip):
        return [f for f in m["files"]
                if t._file_survives(m["stats"].get(f), skip)]

    # random layout: stats cover the whole domain, nothing skips
    assert len(survivors(before, {"a": (0, 50)})) == len(before["files"])
    v = t.compact(target_files=8, cluster_by=["a", "b"])
    after = t._manifest(v)
    n = len(after["files"])
    sa = survivors(after, {"a": (0, 50)})
    sb = survivors(after, {"b": (0, 50)})
    assert len(sa) < n and len(sb) < n  # both dims prune now
    # rows unchanged, and skip+predicate stays exact
    want = {r.k for r in t.read(version=1)
            .where("a BETWEEN 0 AND 50").collect()}
    got = {r.k for r in t.read(skip={"a": (0, 50)})
           .where("a BETWEEN 0 AND 50").collect()}
    assert got == want


def test_restore_rolls_back_by_reference(spark, tmp_path):
    # the bad-merge recovery move: restore(v) re-publishes v's file
    # list as a new commit — zero data rewritten, history intact
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _base(spark),
                         partition_cols=["m"])
    t.merge(_df(spark, [(20, 2, "OOPS")]), key_cols=["k"])
    n_files = len(glob.glob(f"{path}/_data/*/**/*.parquet",
                            recursive=True))
    v = t.restore(1)
    assert v == 3
    assert _vals(t.read()) == _vals(_base(spark))  # rollback
    assert t._manifest()["files"] == t._manifest(1)["files"]  # by ref
    assert len(glob.glob(f"{path}/_data/*/**/*.parquet",
                         recursive=True)) == n_files  # nothing written
    # the bad version stays auditable until vacuum
    assert (20, 2, "OOPS") in _vals(t.read(version=2))
    # and vacuum keeps files the restored HEAD references
    t.vacuum(retain_versions=1)
    assert _vals(t.read()) == _vals(_base(spark))


def test_time_based_vacuum_retention(spark, tmp_path):
    import json as _json
    import os as _os
    path = str(tmp_path / "t")
    t = MuraTable.create(spark, path, _df(spark, [(1, 1, "a")]))
    t.append(_df(spark, [(2, 1, "b")]))
    t.append(_df(spark, [(3, 1, "c")]))
    assert all("ts" in m for m in t.history())
    # age version 2 artificially: its commit looks a day old
    p = _os.path.join(path, "_mura_log", "v00000002.json")
    m = _json.load(open(p))
    m["ts"] -= 86400
    with open(p, "w") as fh:
        _json.dump(m, fh)
    # retain_versions=1 would drop v1+v2, but the time window saves
    # every version committed within the last hour (v1, v3)
    t.vacuum(retain_versions=1, retain_seconds=3600)
    assert t._versions() == [1, 3]
    assert sorted(r.k for r in t.read(version=1).collect()) == [1]
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3]


def test_null_partition_value_roundtrip_and_dml(spark, tmp_path):
    """A NULL partition value must behave like any other partition:
    round-trip as NULL (hive default-partition segment on disk),
    prune-match in DML, and survive appends — the NULL-injection gate
    exempts partition columns (scripts/make_null_data.py), so this is
    the format-level pin for that surface."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "b", 30.0)],
        "k long, p string, v double")
    t = MuraTable.create(spark, path, df, partition_cols=["p"])
    assert sorted((r.k, r.p) for r in t.read().collect()) \
        == [(1, "a"), (2, None), (3, "b")]
    # appending more NULL-partition rows lands in the same segment
    t.append(spark.createDataFrame([(4, None, 40.0)],
                                   "k long, p string, v double"))
    assert t.row_count() == 4
    # update inside the NULL partition only
    v, n_upd, n_files = t.update_where(F.col("p").isNull(),
                                       {"v": "v + 1.0"})
    assert n_upd == 2
    got = {r.k: r.v for r in t.read().collect()}
    assert got[2] == 21.0 and got[4] == 41.0 and got[1] == 10.0
    # COW delete of the NULL partition touches only its files
    v, n_del, _ = t.delete_where(F.col("p").isNull())
    assert n_del == 2
    assert sorted(r.k for r in t.read().collect()) == [1, 3]
    # the pre-delete snapshot still shows the NULL-partition rows
    assert sorted(r.k for r in t.read(version=v - 1).collect()) \
        == [1, 2, 3, 4]
