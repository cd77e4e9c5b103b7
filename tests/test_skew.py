"""Salted-join equivalence and hot-key distribution tests."""

import pytest
from pyspark.sql import functions as F

from mura_spark.operators.skew import salted_agg_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of the big side on one hot key
    rows = [(i, 1 if i % 10 else (i % 7) + 2, f"v{i}") for i in range(2000)]
    big = spark.createDataFrame(rows, ["rid", "k", "payload"])
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 10)], ["k", "dim"])
    return big, small


def test_salted_join_equals_plain_join(skewed):
    big, small = skewed
    plain = {(r.rid, r.dim) for r in big.join(small, "k").collect()}
    salted = {(r.rid, r.dim)
              for r in salted_join(big, small, "k", n_salts=8).collect()}
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 1), (2, 99)], ["rid", "k"])
    small = spark.createDataFrame([(1, "a")], ["k", "dim"])
    out = {r.rid: r.dim
           for r in salted_join(big, small, "k", how="left").collect()}
    assert out == {1: "a", 2: None}


def test_salt_spreads_hot_key(skewed):
    big, _ = skewed
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(8))
    dist = (big.filter(F.col("k") == 1).withColumn("s", salt)
            .groupBy("s").count().collect())
    assert len(dist) == 8                      # hot key hits every salt
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)       # roughly uniform


def test_salted_agg_count(skewed):
    big, _ = skewed
    got = {r.k: r.n for r in salted_agg_count(big, "k").collect()}
    want = {r.k: r["count"] for r in big.groupBy("k").count().collect()}
    assert got == want
