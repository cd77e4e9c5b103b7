"""z-score anomaly detector semantics (operators/anomaly.py)."""

from __future__ import annotations

import math

import pytest


def test_group_zscores_match_reference(spark):
    from mura_spark.operators.anomaly import group_zscores
    vals = [3, 5, 7, 9, 100]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    got = {r.v: r.z for r in group_zscores(df, ["grp"], "v").collect()}
    n = len(vals)
    mean = sum(vals) / n
    std = math.sqrt((n * sum(v * v for v in vals) - sum(vals) ** 2)) / n
    for v in vals:
        assert got[v] == pytest.approx((v - mean) / std, rel=1e-12)


def test_zero_variance_and_singleton_groups_never_flag(spark):
    from mura_spark.operators.anomaly import zscore_outliers
    rows = ([("const", 7)] * 5) + [("single", 42)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    assert zscore_outliers(df, ["grp"], "v", 0.0).count() == 0


def test_outlier_threshold_filters(spark):
    from mura_spark.operators.anomaly import zscore_outliers
    rows = [("g", v) for v in [10, 10, 10, 10, 10, 10, 10, 10, 10, 50]]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = zscore_outliers(df, ["grp"], "v", 2.0).collect()
    assert [r.v for r in out] == [50]
    assert out[0].z > 2.0
