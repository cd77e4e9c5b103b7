"""Funnel + cohort-retention analytics over an event stream.

North-star extension surface (the reference has no aggregation at all —
its Aggregate IR variant is rejected at planning, logicalplan.rs:72-80 /
queryplanner.rs:88); these are the two canonical product-analytics shapes
an events table exists for.

Scale design. Both operators reduce the raw event stream to per-user
scalars BEFORE any join: every shuffle moves |users| rows, never |events|
rows, and each funnel step's events are filtered by type at the scan
(pushed filter). Nothing collects per-user event lists, so a hot user
(millions of events) costs map-side aggregation only — no unbounded
`collect_list` state, which is what kills naive funnel queries at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_steps(events: DataFrame, user_col: str, type_col: str,
                 ts_col: str, steps: list[str],
                 max_span_seconds: int | None = None) -> DataFrame:
    """Per-user strict-order funnel: earliest time each step was completed
    AFTER the previous step (nulls once a user drops out), plus ``depth``
    (number of steps completed). ``max_span_seconds`` additionally requires
    every step to land within that many seconds of step 1.

    ``max_span_seconds`` is FIRST-TOUCH ANCHORED: the window opens at
    the user's globally earliest step-1 event and never re-anchors, so
    a user whose first step-1 was a stray visit long before the real
    sequence does NOT convert even if a later step-1 starts a
    qualifying in-window run. That is the deliberate convention here
    (one scalar per step per user — no per-user event scan); the
    any-anchor alternative ("converts if ANY step-1 occurrence starts
    an in-window sequence") needs a sequential per-user pass — see
    streaming/stateful.py's CEP operator for that shape.

    Plan: one ``groupBy(user)`` per step over events pre-filtered to that
    step's type, each joined to the survivors of the previous step — k
    small user-keyed shuffles, never a per-user event sort or list.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    reached = [(events.filter(F.col(type_col) == steps[0])
                .groupBy(user_col).agg(F.min(ts_col).alias("t_1")))]
    for i in range(2, len(steps) + 1):
        prev = reached[-1]
        cand = (events.filter(F.col(type_col) == steps[i - 1])
                .select(user_col, F.col(ts_col).alias("__ts"))
                .join(prev, user_col)
                .filter(F.col("__ts") > F.col(f"t_{i - 1}")))
        if max_span_seconds is not None:
            cand = cand.filter(
                F.col("__ts").cast("long")
                <= F.col("t_1").cast("long") + F.lit(max_span_seconds))
        reached.append(
            cand.groupBy(user_col)
                .agg(*[F.min(f"t_{j}").alias(f"t_{j}")
                       for j in range(1, i)],
                     F.min("__ts").alias(f"t_{i}")))
    out = reduce(
        lambda acc, nxt: acc.join(
            nxt[1].select(user_col, f"t_{nxt[0]}"), user_col, "left"),
        enumerate(reached[1:], start=2), reached[0])
    depth = reduce(lambda a, b: a + b,
                   [F.col(f"t_{i}").isNotNull().cast("int")
                    for i in range(1, len(steps) + 1)])
    return out.withColumn("depth", depth)


def funnel_counts(events: DataFrame, user_col: str, type_col: str,
                  ts_col: str, steps: list[str],
                  max_span_seconds: int | None = None) -> DataFrame:
    """Funnel summary: (step, step_name, n_users) — users whose depth
    reaches each step, in step order."""
    per_user = funnel_steps(events, user_col, type_col, ts_col, steps,
                            max_span_seconds)
    counts = per_user.agg(*[
        F.sum(F.col(f"t_{i}").isNotNull().cast("long")).alias(f"n_{i}")
        for i in range(1, len(steps) + 1)])
    stack = ", ".join(f"{i}, '{s}', n_{i}"
                      for i, s in enumerate(steps, start=1))
    return counts.select(F.expr(
        f"stack({len(steps)}, {stack}) AS (step, step_name, n_users)"))


def retention_cohorts(events: DataFrame, user_col: str, ts_col: str,
                      type_col: str, cohort_event: str) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_users) — users
    whose first ``cohort_event`` fell in cohort_week and who had ANY event
    during cohort_week + offset. Offset 0 rows equal the cohort sizes.

    Two user-keyed aggregations (cohort assignment, distinct active weeks)
    and one count — the activity frame is pre-deduplicated to (user, week)
    map-side, so the join back to cohorts moves |users × active weeks|
    rows, not raw events."""
    cohort = (events.filter(F.col(type_col) == cohort_event)
              .groupBy(user_col)
              .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week")))
    active = (events
              .select(user_col,
                      F.date_trunc("week", F.col(ts_col)).alias("act_week"))
              .distinct())
    joined = (active.join(cohort, user_col)
              .filter(F.col("act_week") >= F.col("cohort_week")))
    offset = (F.datediff(F.col("act_week").cast("date"),
                         F.col("cohort_week").cast("date")) / 7).cast("int")
    return (joined.groupBy("cohort_week", offset.alias("week_offset"))
            .agg(F.count_distinct(F.col(user_col)).alias("n_users")))


def transition_matrix(events: DataFrame, user_col: str, type_col: str,
                      ts_col: str, tiebreak: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (src_type, dst_type, n_trans, prob) where ``prob`` is the
    row-normalized transition probability out of ``src_type``.

    One window shuffle on the user key for the lag, one groupBy on the
    (src, dst) pair, and the row normalizer is a window over src_type —
    aggregate-sized input, so the normalization never touches raw events
    again. Counts are exact integers; ``prob`` is a single int/int double
    division (deterministic, oracle-hashable). ``tiebreak`` (a unique
    event id) makes the sequence order total. The standard user-behavior
    / session-modeling primitive.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    trans = (events.select(F.lag(type_col).over(w).alias("src_type"),
                           F.col(type_col).alias("dst_type"))
                   .filter(F.col("src_type").isNotNull()))
    counts = (trans.groupBy("src_type", "dst_type")
                   .agg(F.count(F.lit(1)).alias("n_trans")))
    total = F.sum("n_trans").over(Window.partitionBy("src_type"))
    return counts.select(
        "src_type", "dst_type", "n_trans",
        (F.col("n_trans").cast("double") / total).alias("prob"))


def path_ngrams(df, part_col: str, order_cols: list[str], item_col: str,
                n: int = 3, k: int = 20):
    """Top-``k`` most frequent length-``n`` consecutive item paths
    (user journeys): ``(path, n_paths)``, path rendered as
    ``a>b>c``. The sequence-mining sibling of the funnel/retention
    operators — which n-step flows dominate the product.

    Each partition's events order by ``order_cols`` (callers must
    include a unique tiebreak column so the sequence — and therefore the
    result — is deterministic); ``lead`` windows build the n-grams
    in-partition (one shuffle on ``part_col``, no self-joins), a
    map-side-combined groupBy counts paths, and the top-k runs as
    ORDER BY ... LIMIT (TakeOrderedAndProject — distributed partial
    top-k, ties broken by path ascending, never a single-partition
    window over the full path table).

    Windows whose items include a NULL are dropped entirely (a NULL
    anywhere — not just at the partition tail — would otherwise be
    silently skipped by concat_ws, conflating an n-gram with a shorter
    one). Item values must not contain the ``>`` separator; callers with
    free-form items should pre-escape (the rendered path would otherwise
    be ambiguous).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    steps = [F.col(item_col)] + [F.lead(item_col, i).over(w)
                                 for i in range(1, n)]
    all_present = steps[0].isNotNull()
    for s in steps[1:]:
        all_present = all_present & s.isNotNull()
    grams = (df.select(F.concat_ws(">", *steps).alias("path"),
                       all_present.alias("__full"))
               .filter(F.col("__full")))
    return (grams.groupBy("path").agg(F.count(F.lit(1)).alias("n_paths"))
                 .orderBy(F.col("n_paths").desc(), F.col("path").asc())
                 .limit(k))
