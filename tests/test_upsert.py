"""Upsert / keep-latest merge semantics."""

from pyspark.sql import functions as F

from mura_spark.operators.upsert import upsert_latest


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
