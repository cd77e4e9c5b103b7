"""Per-file bloom-filter lookup pruning (sources/bloom.py +
MuraTable.read(lookup=...)): equality needle queries on high-NDV
unclustered columns, where min/max stats cannot prune (every file's
range spans the domain). Soundness bar: a bloom may keep a file it
doesn't need (I/O cost) but must NEVER drop a file that holds the
value — the property test hammers exactly that."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mura_spark.sources.bloom import (DEFAULT_BITS, DEFAULT_K, bitmap_of,
                                      might_contain)
from mura_spark.sources.table_format import MuraTable


def _df(spark, ids):
    # hash-spread ids across 4 files: every file's [min, max] spans
    # nearly the whole domain, so min/max stats CANNOT prune an
    # equality lookup — any pruning observed is the bloom's
    return (spark.range(0, 0).sparkSession.createDataFrame(
        [(i, f"doc-{i}", i * 10) for i in ids],
        "id long, name string, score long").repartition(4, "id"))


def _table(spark, tmp_path, ids=range(100), **kw):
    return MuraTable.create(spark, str(tmp_path / "t"),
                            _df(spark, ids),
                            bloom_cols=["id", "name"], **kw)


def test_lookup_prunes_files_and_keeps_correctness(spark, tmp_path):
    t = _table(spark, tmp_path)
    full = t.read()
    assert len(full.inputFiles()) == 4
    hit = t.read(lookup={"name": "doc-42"})
    # the needle lives in one file; blooms must drop most of the rest
    # (16 KiB bloom at 25 keys -> fpp ~ 0, but allow one false positive)
    assert len(hit.inputFiles()) <= 2
    got = hit.where(F.col("name") == "doc-42").collect()
    assert [(r.id, r.score) for r in got] == [(42, 420)]


def test_lookup_never_false_negative(spark, tmp_path):
    t = _table(spark, tmp_path, ids=range(60))
    for i in range(60):  # EVERY value must survive its own lookup
        rows = (t.read(lookup={"id": i, "name": f"doc-{i}"})
                 .where(F.col("id") == i).collect())
        assert len(rows) == 1 and rows[0].name == f"doc-{i}"


def test_absent_value_prunes_everything(spark, tmp_path):
    t = _table(spark, tmp_path, ids=range(50))
    gone = t.read(lookup={"name": "doc-99999"})
    assert gone.inputFiles() == []
    assert gone.count() == 0


def test_append_maintains_blooms(spark, tmp_path):
    t = _table(spark, tmp_path, ids=range(40))
    t.append(_df(spark, [1000]))
    m = t._manifest()
    assert all(f in m["blooms"] for f in m["files"])
    hit = t.read(lookup={"id": 1000})
    assert len(hit.inputFiles()) <= 2  # not the 5+ files of a full scan
    assert hit.where(F.col("id") == 1000).count() == 1
    # old values still reachable after the append
    assert (t.read(lookup={"name": "doc-7"})
             .where(F.col("name") == "doc-7").count() == 1)


def test_update_where_recomputes_blooms_for_rewritten_files(
        spark, tmp_path):
    t = _table(spark, tmp_path, ids=range(40))
    before = t._manifest()["blooms"]
    t.update_where("id = 3", {"name": F.lit("doc-renamed")})
    m = t._manifest()
    assert all(f in m["blooms"] for f in m["files"])
    # untouched files carry their EXACT bloom entries by reference
    carried = [f for f in m["files"] if f in before]
    assert carried and all(m["blooms"][f] == before[f] for f in carried)
    # the old name no longer exists; the new one is findable
    assert (t.read(lookup={"name": "doc-renamed"})
             .where(F.col("name") == "doc-renamed").count() == 1)
    found = t.read(lookup={"name": "doc-3"}) \
             .where(F.col("name") == "doc-3").count()
    assert found == 0


def test_compact_and_restore_keep_lookup_working(spark, tmp_path):
    t = _table(spark, tmp_path, ids=range(30))
    t.append(_df(spark, range(100, 130)))
    t.compact(target_files=2)
    m = t._manifest()
    assert set(m["blooms"]) == set(m["files"])
    assert (t.read(lookup={"id": 105})
             .where(F.col("id") == 105).count() == 1)
    t.restore(1)
    assert (t.read(lookup={"name": "doc-5"})
             .where(F.col("name") == "doc-5").count() == 1)
    # restored manifest carries version 1's bloom metadata
    assert set(t._manifest()["blooms"]) == set(t._manifest()["files"])


def test_merge_carries_untouched_blooms(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 2, f"doc-{i}") for i in range(40)],
        "id long, p int, name string")
    t = MuraTable.create(spark, str(tmp_path / "t"), df,
                         partition_cols=["p"], bloom_cols=["name"])
    before = t._manifest()["blooms"]
    src = spark.createDataFrame([(3, 1, "doc-merged")],
                                "id long, p int, name string")
    t.merge(src, key_cols=["id"])
    m = t._manifest()
    assert all(f in m["blooms"] for f in m["files"])
    carried = [f for f in m["files"] if f in before]
    assert carried and all(m["blooms"][f] == before[f] for f in carried)
    assert (t.read(lookup={"name": "doc-merged"})
             .where(F.col("name") == "doc-merged").count() == 1)


def test_lookup_combines_with_minmax_stats(spark, tmp_path):
    # range-clustered layout: id stats prune AND blooms prune; both
    # metadata kinds must agree to keep a file
    df = (spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(100)], "id long, name string")
        .repartitionByRange(4, "id"))
    t = MuraTable.create(spark, str(tmp_path / "t"), df,
                         stats_cols=["id"], bloom_cols=["name"])
    hit = t.read(lookup={"id": 55})
    assert len(hit.inputFiles()) == 1  # stats alone pin the file
    assert hit.where(F.col("id") == 55).count() == 1


def test_validation_errors(spark, tmp_path):
    df = spark.createDataFrame([(1, 0.5, "a", 2)],
                               "id long, x double, s string, p int")
    with pytest.raises(ValueError, match="type double"):
        MuraTable.create(spark, str(tmp_path / "t1"), df,
                         bloom_cols=["x"])
    with pytest.raises(ValueError, match="not in schema"):
        MuraTable.create(spark, str(tmp_path / "t2"), df,
                         bloom_cols=["nope"])
    with pytest.raises(ValueError, match="partition column"):
        MuraTable.create(spark, str(tmp_path / "t3"), df,
                         partition_cols=["p"], bloom_cols=["p"])
    t = MuraTable.create(spark, str(tmp_path / "t4"), df,
                         bloom_cols=["id"])
    with pytest.raises(ValueError, match="IS NULL"):
        t.read(lookup={"id": None})


def test_file_without_bloom_entry_is_kept(spark, tmp_path):
    t = _table(spark, tmp_path, ids=range(20))
    m = t._manifest()
    # simulate a file committed before bloom tracking: drop its entry
    some_file = m["files"][0]
    m["blooms"].pop(some_file)
    assert t._file_survives_lookup(m, some_file, {"name": "doc-x"})


def test_bitmap_unit_properties():
    bm = bitmap_of([1, 2, "a", b"raw"], 1 << 10, 5)
    import base64
    b64 = base64.b64encode(bm.tobytes()).decode()
    for v in (1, 2, "a", b"raw"):
        assert might_contain(b64, v, 1 << 10, 5)
    assert not might_contain(b64, 3, 1 << 10, 5)
    assert not might_contain(b64, "1", 1 << 10, 5)  # typed: int 1 != "1"
    with pytest.raises(TypeError):
        bitmap_of([True], 1 << 10, 5)
    with pytest.raises(TypeError):
        bitmap_of([1.5], 1 << 10, 5)
    assert DEFAULT_BITS % 8 == 0 and DEFAULT_K >= 1


def test_set_bloom_cols_retrofits_existing_table(spark, tmp_path):
    t = MuraTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(i, f"doc-{i}") for i in range(80)],
                              "id long, name string")
        .repartition(4, "id"))
    assert "blooms" not in t._manifest()
    # lookup without blooms: conservative, nothing prunable by name
    assert len(t.read(lookup={"name": "doc-9"}).inputFiles()) == 4
    v = t.set_bloom_cols(["name"])
    m = t._manifest()
    assert m["action"] == "set_bloom_cols" and v == 2
    assert set(m["blooms"]) == set(m["files"])
    hit = t.read(lookup={"name": "doc-9"})
    assert len(hit.inputFiles()) <= 2
    assert hit.where("name = 'doc-9'").count() == 1
    # subsequent commits maintain them
    t.append(spark.createDataFrame([(999, "doc-999")],
                                   "id long, name string"))
    m = t._manifest()
    assert set(m["blooms"]) == set(m["files"])
    # and [] drops tracking
    t.set_bloom_cols([])
    assert "blooms" not in t._manifest()
    assert len(t.read(lookup={"name": "doc-9"}).inputFiles()) >= 4


def test_in_list_lookup_prunes_to_union_of_needles(spark, tmp_path):
    t = _table(spark, tmp_path, ids=range(100))
    full = len(t.read().inputFiles())
    # batch fetch: three ids -> at most the union of their files
    hit = t.read(lookup={"name": ["doc-3", "doc-47", "doc-91"]})
    assert 0 < len(hit.inputFiles()) <= full
    got = sorted(r.id for r in hit.where(
        F.col("name").isin("doc-3", "doc-47", "doc-91")).collect())
    assert got == [3, 47, 91]
    # all-absent IN-list prunes everything
    assert t.read(lookup={"name": ["nope-1", "nope-2"]}) \
            .inputFiles() == []
    # None inside a list refuses like a scalar None
    with pytest.raises(ValueError, match="IS NULL"):
        t.read(lookup={"name": ["doc-3", None]})
    with pytest.raises(ValueError, match="empty"):
        t.read(lookup={"name": []})


def test_bloom_manifest_encoding_is_compressed_with_raw_fallback():
    import base64

    from mura_spark.sources.bloom import _pack, _unpack
    bm = bitmap_of(range(50), DEFAULT_BITS, DEFAULT_K)
    packed = _pack(bm)
    # a 50-key bloom in a 16 KiB table is almost all zeros: the
    # manifest string must be tiny, not ~21 KB of base64
    assert len(packed) < 2000
    assert (_unpack(packed) == bm).all()
    # pre-compression manifests stored raw base64: still readable
    raw = base64.b64encode(bm.tobytes()).decode()
    assert (_unpack(raw) == bm).all()


def test_custom_bloom_bits(spark, tmp_path):
    df = spark.createDataFrame([(i, f"doc-{i}") for i in range(60)],
                               "id long, name string").repartition(4, "id")
    t = MuraTable.create(spark, str(tmp_path / "t"), df,
                         bloom_cols=["name"], bloom_bits=1 << 12)
    m = t._manifest()
    assert m["bloom_bits"] == 4096
    hit = t.read(lookup={"name": "doc-9"})
    assert hit.where("name = 'doc-9'").count() == 1
    # maintained at the custom size through appends
    t.append(spark.createDataFrame([(99, "doc-99x")],
                                   "id long, name string"))
    assert (t.read(lookup={"name": "doc-99x"})
             .where("name = 'doc-99x'").count() == 1)
    with pytest.raises(ValueError, match="power of two"):
        MuraTable.create(spark, str(tmp_path / "t2"), df,
                         bloom_cols=["name"], bloom_bits=3000)
    # retrofit honors the knob too
    t3 = MuraTable.create(spark, str(tmp_path / "t3"), df)
    t3.set_bloom_cols(["name"], bloom_bits=1 << 14)
    assert t3._manifest()["bloom_bits"] == 1 << 14
    assert (t3.read(lookup={"name": "doc-5"})
              .where("name = 'doc-5'").count() == 1)
