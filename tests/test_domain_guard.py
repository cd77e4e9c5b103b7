"""NDV/row-budget guards for the bounded-domain statistics family.

The KS/MWU/AUC/Spearman/Theil-Sen operators reduce rows to a value
domain (or assert a reduced input) and then run a single-partition
ordered pass; these tests pin that feeding a CONTINUOUS double column
(domain fails to reduce) trips the ``[mura domain-budget]`` guard
loudly instead of silently funneling n rows through one task — and
that under-budget inputs are value-identical to the unguarded path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

GUARD = "mura domain-budget"


def _continuous(spark, n=1000):
    """n rows with n distinct 'continuous' doubles, two groups, labels."""
    return spark.range(n).select(
        (F.col("id").cast("double") + F.lit(0.123456)
         / (F.col("id").cast("double") + F.lit(1.0))).alias("v"),
        F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise(F.lit("b"))
         .alias("g"),
        (F.col("id") % 3 == 0).alias("label"),
        F.col("id").alias("x"))


def _raises_guard(df):
    with pytest.raises(Exception, match=GUARD):
        df.collect()


def test_ks_2sample_guard_trips_on_continuous_domain(spark):
    from mura_spark.operators.stats import ks_2sample
    d = _continuous(spark)
    _raises_guard(ks_2sample(d, "v", "g", "a", "b", domain_budget=500))
    # same data under budget: identical to the unguarded path
    got = ks_2sample(d, "v", "g", "a", "b", domain_budget=5000).first()
    ref = ks_2sample(d, "v", "g", "a", "b", domain_budget=None).first()
    assert got == ref and got.na == 500


def test_mannwhitney_guard_trips_on_continuous_domain(spark):
    from mura_spark.operators.stats import mannwhitney_u
    d = _continuous(spark)
    _raises_guard(mannwhitney_u(d, "v", "g", "a", "b", domain_budget=500))
    got = mannwhitney_u(d, "v", "g", "a", "b", domain_budget=5000).first()
    ref = mannwhitney_u(d, "v", "g", "a", "b", domain_budget=None).first()
    assert got == ref


def test_ks_by_group_guard_trips_on_continuous_domain(spark):
    from mura_spark.operators.stats import ks_by_group
    d = _continuous(spark)
    _raises_guard(ks_by_group(d, "g", "v", domain_budget=500))
    got = sorted(r.asDict().items() for r in
                 ks_by_group(d, "g", "v", domain_budget=5000).collect())
    ref = sorted(r.asDict().items() for r in
                 ks_by_group(d, "g", "v", domain_budget=None).collect())
    assert got == ref


def test_rank_auc_guard_trips_on_continuous_score(spark):
    from mura_spark.operators.features import rank_auc
    d = _continuous(spark)
    _raises_guard(rank_auc(d, "v", "label", domain_budget=500))
    got = rank_auc(d, "v", "label", domain_budget=5000).first()
    ref = rank_auc(d, "v", "label").first()  # guard off by default
    assert got == ref


def test_spearman_row_budget_trips(spark):
    from mura_spark.operators.stats import spearman_corr
    d = _continuous(spark).select("x", "v")
    _raises_guard(spearman_corr(d, "x", "v", row_budget=500))
    got = spearman_corr(d, "x", "v", row_budget=5000).first()
    ref = spearman_corr(d, "x", "v", row_budget=None).first()
    assert got == ref and got.n == 1000


def test_theil_sen_max_points_trips_before_pair_join(spark):
    from mura_spark.operators.stats import theil_sen_slope
    d = spark.range(200).select(F.col("id").alias("x"),
                                (F.col("id") * 3 + 1).alias("y"))
    _raises_guard(theil_sen_slope(d, "x", "y", max_points=100))
    got = theil_sen_slope(d, "x", "y", max_points=500).first()
    assert got.n_points == 200 and got.slope == 3.0


def test_default_budgets_are_documented_scale():
    from mura_spark.operators.guards import (DEFAULT_DOMAIN_BUDGET,
                                             DEFAULT_ROW_BUDGET)
    assert DEFAULT_DOMAIN_BUDGET == 1_000_000
    assert DEFAULT_ROW_BUDGET == 100_000_000
