"""As-of / range join tests: brute-force equivalence plus edge semantics
(equal timestamps, tiebreaks, no-match rows, bucket boundaries)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mura_spark.operators.asof import asof_join, range_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(10), 100.0),
         (2, "A", _ts(20), 101.0),
         (3, "B", _ts(5), 50.0),   # before any quote → no match
         (4, "B", _ts(30), 51.0)],
        ["event_id", "sym", "ts", "price"])
    quotes = spark.createDataFrame(
        [(101, "A", _ts(10), 99.5),   # same ts as trade 1 → matches (<=)
         (102, "A", _ts(10), 99.7),   # same ts, larger id → tie winner
         (103, "A", _ts(15), 99.9),
         (104, "B", _ts(29), 49.9)],
        ["event_id", "sym", "ts", "quote"])
    return trades, quotes


def test_asof_backward_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = {r.event_id: r for r in
           asof_join(trades, quotes, on="ts", by="sym",
                     tiebreak="event_id", value_cols=["quote"]).collect()}
    assert len(out) == 4                      # left-outer: all trades kept
    assert out[1].event_id_matched == 102     # equal-ts match, max-id tie win
    assert out[1].quote_matched == 99.7
    assert out[2].event_id_matched == 103     # latest quote ≤ ts
    assert out[3].event_id_matched is None    # nothing at or before
    assert out[3].quote_matched is None
    assert out[4].event_id_matched == 104


def test_asof_plan_is_single_shuffle_window(trades_quotes):
    """The as-of join must plan as union + window — one Exchange on the key,
    no nested-loop join."""
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, on="ts", by="sym", tiebreak="event_id",
                     value_cols=["quote"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Window" in plan


def test_asof_null_value_in_matched_row_stays_null(spark):
    """A NULL value column in the matched right row must surface as NULL —
    not be backfilled from an older right row (whole-row semantics)."""
    left = spark.createDataFrame([(1, "A", _ts(30))], ["event_id", "sym", "ts"])
    right = spark.createDataFrame(
        [(101, "A", _ts(10), 5.0), (102, "A", _ts(20), None)],
        ["event_id", "sym", "ts", "value"])
    r = asof_join(left, right, on="ts", by="sym", tiebreak="event_id",
                  value_cols=["value"]).first()
    assert r.event_id_matched == 102
    assert r.value_matched is None  # from row 102, not stale 5.0


def test_range_join_subsecond_timestamps_exact(spark):
    """The interval filter must compare real timestamps: sub-second
    differences decide membership even though buckets are whole-second."""
    l0 = dt.datetime(2024, 1, 1, 0, 0, 0, 500000)
    r_before = dt.datetime(2024, 1, 1, 0, 0, 0, 400000)   # 0.1s BEFORE left
    r_edge = dt.datetime(2024, 1, 1, 0, 10, 0, 500000)    # exactly +600s
    r_late = dt.datetime(2024, 1, 1, 0, 10, 0, 600001)    # +600.000001s
    left = spark.createDataFrame([(1, 1, l0)], ["lid", "k", "ts"])
    right = spark.createDataFrame(
        [(10, 1, r_before), (11, 1, r_edge), (12, 1, r_late)],
        ["rid", "k", "ts"])
    got = {r.rid_r for r in
           range_join(left, right, on="ts", by="k", lower=0, upper=600,
                      bucket_width_seconds=600).collect()}
    assert got == {11}


def test_range_join_matches_bruteforce(spark):
    rows_l = [(i, i % 3, _ts(i)) for i in range(30)]
    rows_r = [(100 + i, i % 3, _ts((i * 7) % 45)) for i in range(30)]
    left = spark.createDataFrame(rows_l, ["lid", "k", "ts"])
    right = spark.createDataFrame(rows_r, ["rid", "k", "ts"])
    got = {(r.lid, r.rid_r) for r in
           range_join(left, right, on="ts", by="k", lower=-120, upper=300,
                      bucket_width_seconds=180).collect()}
    lo, hi = -120, 300
    brute = {
        (lid, rid)
        for (lid, lk, lts) in rows_l for (rid, rk, rts) in rows_r
        if lk == rk and lo <= (rts - lts).total_seconds() <= hi}
    assert got == brute
    assert len(got) > 0


def test_range_join_rejects_bad_bounds(spark):
    df = spark.createDataFrame([(1, 1, _ts(0))], ["i", "k", "ts"])
    with pytest.raises(ValueError):
        range_join(df, df, on="ts", by="k", lower=10, upper=5,
                   bucket_width_seconds=60)


def test_interval_overlap_join_matches_naive(spark):
    """Bucketed decomposition == naive theta join, each pair exactly once
    (intervals spanning many buckets must not duplicate)."""
    import datetime as dt
    from mura_spark.operators.asof import interval_overlap_join

    base = dt.datetime(2024, 1, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)
    left = [(i, mins(s), mins(e)) for i, (s, e) in enumerate(
        [(0, 30), (45, 300), (400, 410), (500, 500), (600, 900)])]
    right = [(j, mins(s), mins(e)) for j, (s, e) in enumerate(
        [(10, 20), (25, 50), (290, 460), (500, 500), (1000, 1100)])]
    ldf = spark.createDataFrame(left, ["lid", "ls", "le"])
    rdf = spark.createDataFrame(right, ["rid", "rs", "re"])
    got = {(r.lid, r.rid) for r in interval_overlap_join(
        ldf, rdf, "ls", "le", "rs", "re", bucket="1 hour").collect()}
    rows = interval_overlap_join(
        ldf, rdf, "ls", "le", "rs", "re", bucket="1 hour").collect()
    assert len(rows) == len(got), "duplicate pair emitted"
    want = {(i, j) for i, ls, le in left for j, rs, re in right
            if ls <= re and rs <= le}
    assert got == want
    # sanity: the fixture covers sub-bucket, multi-bucket and exact-touch
    assert (1, 2) in want and (3, 3) in want
