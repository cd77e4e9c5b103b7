"""Funnel / cohort-retention operator tests on a hand-built event log."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mura_spark.operators.funnel import (funnel_counts, funnel_steps,
                                         retention_cohorts)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture()
def log(spark):
    rows = [
        # u1 completes view(d1) -> click(d2) -> buy(d3)
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "buy"),
        # u2: click BEFORE view — strict order means no click credit
        (2, _ts(2), "click"), (2, _ts(3), "view"),
        # u3: view then click, no buy; extra noise event
        (3, _ts(1), "view"), (3, _ts(1, 5), "click"), (3, _ts(2), "other"),
        # u4: all three but buy 20 days after view (span tests)
        (4, _ts(1), "view"), (4, _ts(2), "click"), (4, _ts(21), "buy"),
        # u5 never views
        (5, _ts(1), "buy"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_funnel_strict_order_and_depth(spark, log):
    per_user = {r.user_id: r for r in funnel_steps(
        log, "user_id", "event_type", "ts", ["view", "click", "buy"])
        .collect()}
    assert per_user[1].depth == 3 and per_user[1].t_3 == _ts(3)
    assert per_user[2].depth == 1 and per_user[2].t_2 is None  # strict order
    assert per_user[3].depth == 2
    assert per_user[4].depth == 3
    assert 5 not in per_user                                   # never entered
    counts = {r.step: r.n_users for r in funnel_counts(
        log, "user_id", "event_type", "ts", ["view", "click", "buy"])
        .collect()}
    assert counts == {1: 4, 2: 3, 3: 2}


def test_funnel_max_span_cuts_slow_users(spark, log):
    counts = {r.step: r.n_users for r in funnel_counts(
        log, "user_id", "event_type", "ts", ["view", "click", "buy"],
        max_span_seconds=7 * 86400).collect()}
    assert counts == {1: 4, 2: 3, 3: 1}   # u4's day-21 buy falls outside


def test_funnel_rejects_single_step(spark, log):
    with pytest.raises(ValueError):
        funnel_steps(log, "user_id", "event_type", "ts", ["view"])


def test_retention_offset0_equals_cohort_size(spark):
    rows = [
        # two users sign up week of Jan 1 (Mon), one active 2 weeks later
        (1, dt.datetime(2024, 1, 2), "signup"),
        (2, dt.datetime(2024, 1, 3), "signup"),
        (1, dt.datetime(2024, 1, 16), "click"),
        # one signs up the following week; event earlier than signup ignored
        (3, dt.datetime(2024, 1, 10), "signup"),
        (3, dt.datetime(2024, 1, 4), "click"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {(r.cohort_week.date(), r.week_offset): r.n_users
           for r in retention_cohorts(ev, "user_id", "ts", "event_type",
                                      "signup").collect()}
    w1, w2 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    assert got[(w1, 0)] == 2 and got[(w1, 2)] == 1
    assert got[(w2, 0)] == 1
    assert (w1, 1) not in got
    # pre-signup activity never produces a negative offset
    assert all(off >= 0 for (_, off) in got)


def test_funnel_matches_bruteforce_on_random_logs(spark):
    """Property: funnel_steps equals a per-user brute-force simulation
    (greedy earliest-completion scan) on randomized event logs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    steps = ["a", "b", "c"]
    EV = st.tuples(st.integers(1, 5),                    # user
                   st.integers(0, 50),                   # hour offset
                   st.sampled_from(["a", "b", "c", "x"]))

    def brute(events):
        out = {}
        by_user = {}
        for u, h, t in events:
            by_user.setdefault(u, []).append((dt.datetime(2024, 1, 1)
                                              + dt.timedelta(hours=h), t))
        for u, evs in by_user.items():
            evs.sort()
            times, last = [], None
            for s in steps:
                cand = [ts for ts, t in evs if t == s
                        and (last is None or ts > last)]
                if not cand:
                    break
                last = min(cand)
                times.append(last)
            if times:
                out[u] = times
        return out

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(events=st.lists(EV, min_size=1, max_size=40))
    def run(events):
        rows = [(u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), t)
                for u, h, t in events]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {r.user_id: [x for x in (r.t_1, r.t_2, r.t_3) if x is not None]
               for r in funnel_steps(df, "user_id", "event_type", "ts",
                                     steps).collect()}
        assert got == brute(events)

    run()


def test_funnel_plan_shuffles_users_not_events(spark, log):
    """Every aggregation keys on user_id and events are filtered by type
    before any join — no per-user sort or collect_list in the plan."""
    plan = funnel_steps(log, "user_id", "event_type", "ts",
                        ["view", "click", "buy"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "collect_list" not in plan and "Window" not in plan


def test_transition_matrix_counts_and_rows_sum_to_one(spark):
    import datetime as dt
    from mura_spark.operators.funnel import transition_matrix
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [  # user 1: a->b->a ; user 2: a->b
        (1, 1, t(0), "a"), (2, 1, t(1), "b"), (3, 1, t(2), "a"),
        (4, 2, t(0), "a"), (5, 2, t(1), "b")]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts",
                                      "event_type"])
    got = {(r.src_type, r.dst_type): (r.n_trans, r.prob)
           for r in transition_matrix(df, "user_id", "event_type",
                                      "ts", "event_id").collect()}
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transition_matrix_never_crosses_users(spark):
    import datetime as dt
    from mura_spark.operators.funnel import transition_matrix
    rows = [(1, 1, dt.datetime(2024, 1, 1), "x"),
            (2, 2, dt.datetime(2024, 1, 2), "y")]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts",
                                      "event_type"])
    assert transition_matrix(df, "user_id", "event_type", "ts",
                             "event_id").count() == 0
