"""Sketch-aggregate accuracy bounds (approximate operators are rows-only in
the oracle sweep; their error envelopes are pinned here)."""

from pyspark.sql import functions as F

from mura_spark.suite.common import table


def test_hll_distinct_within_rsd(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type")
               .agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r.event_type: r.a for r in
              ev.groupBy("event_type")
                .agg(F.approx_count_distinct("user_id", rsd=0.02)
                     .alias("a")).collect()}
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(3, 0.06 * n)  # 3×rsd envelope


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    exact = li.agg(F.expr("percentile(l_quantity, 0.5)")).first()[0]
    approx = li.agg(F.percentile_approx("l_quantity", 0.5, 1000)).first()[0]
    assert abs(approx - exact) <= 1.0  # quantities are 1..50 integers


def test_value_percentile_sketch_envelope(spark, sf_dir):
    """The suite's sketch_value_percentiles query: percentile_approx
    guarantees *rank* error (≤ 1/accuracy), not value error — heavy-tailed
    values can sit far apart at adjacent ranks — so the pin is on the rank
    of each returned value within its type's distribution."""
    from mura_spark.suite import SPARK_QUERIES
    ev = table(spark, sf_dir, "events")
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    got = {r.event_type: (r.p50, r.p90, r.p99) for r in
           SPARK_QUERIES["sketch_value_percentiles"](spark, sf_dir).collect()}
    assert set(got) == set(vals)
    for t, approx in got.items():
        xs = sorted(vals[t])
        n = len(xs)
        for a, q in zip(approx, (0.5, 0.9, 0.99)):
            rank = sum(1 for x in xs if x <= a) / n
            assert abs(rank - q) <= 1.0 / 1000 + 1.0 / n + 1e-9, (t, q, rank)
