"""Upsert / keep-latest merge semantics."""

from pyspark.sql import functions as F

from mura_spark.operators.upsert import scd2_history, upsert_latest


def test_scd2_intervals_partition_the_timeline(spark):
    """Per key: intervals are ordered and adjacent (next valid_from ==
    previous valid_to), exactly one open (NULL valid_to) current row, and
    an as-of filter at any version boundary returns exactly one row."""
    rows = [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "x")]
    updates = spark.createDataFrame(rows, ["k", "v", "payload"])
    hist = scd2_history(updates, ["k"], "v").collect()
    by_key = {}
    for r in sorted(hist, key=lambda r: (r.k, r.valid_from)):
        by_key.setdefault(r.k, []).append(r)
    assert [r.payload for r in by_key[1]] == ["a", "b", "c"]
    for spans in by_key.values():
        assert spans[-1].valid_to is None
        for cur, nxt in zip(spans, spans[1:]):
            assert cur.valid_to == nxt.valid_from and cur.valid_from < cur.valid_to
    # as-of T=25 → key 1 sees "b", key 2 sees "x"
    asof = {r.k: r.payload for r in hist
            if r.valid_from <= 25 and (r.valid_to is None or r.valid_to > 25)}
    assert asof == {1: "b", 2: "x"}


def test_upsert_newest_version_wins(spark):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")], ["k", "v", "payload"])
    updates = spark.createDataFrame(
        [(2, 20, "b2"), (4, 5, "d")], ["k", "v", "payload"])
    got = {r.k: (r.v, r.payload)
           for r in upsert_latest(base, updates, ["k"], "v").collect()}
    assert got == {1: (10, "a"), 2: (20, "b2"), 3: (10, "c"), 4: (5, "d")}


def test_upsert_version_tie_updates_side_wins(spark):
    base = spark.createDataFrame([(1, 10, "old")], ["k", "v", "payload"])
    updates = spark.createDataFrame([(1, 10, "redelivered")],
                                    ["k", "v", "payload"])
    got = upsert_latest(base, updates, ["k"], "v").collect()
    assert len(got) == 1 and got[0].payload == "redelivered"


def test_upsert_deterministic_under_repartition(spark):
    rows = [(i % 25, i, f"p{i}") for i in range(200)]
    base = spark.createDataFrame(rows, ["k", "v", "payload"])
    updates = spark.createDataFrame(
        [(i % 25, i + 100, f"u{i}") for i in range(0, 200, 3)],
        ["k", "v", "payload"])
    a = {tuple(r) for r in upsert_latest(base, updates, ["k"], "v",
                                         tiebreak="payload").collect()}
    b = {tuple(r) for r in upsert_latest(base.repartition(7),
                                         updates.repartition(3),
                                         ["k"], "v",
                                         tiebreak="payload").collect()}
    assert a == b and len(a) == 25
