#!/usr/bin/env python
"""Interleaved A/B: PPJoin positional filter in the jaccard candidate miner.

Lossless by the PPJoin positional-filter theorem (Xiao et al., WWW'08):
for a true pair (J >= t), its FIRST common prefix shingle under the global
rare-first order has positions (pa, pb) with
    inter <= 1 + min(n_a - pa, n_b - pb)
and J >= t  <=>  inter >= t/(1+t) * (n_a + n_b), so an occurrence-level
filter  (1 + min(n_a-pa, n_b-pb)) * (1+t) >= t*(n_a+n_b) - eps  keeps the
first common occurrence of every true pair; filter-then-distinct therefore
keeps every true pair. False keeps are harmless (exact verify follows).

Measures candidate volume + wall for t=0.5 and t=0.8.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mura_spark.session import get_spark  # noqa: E402
from mura_spark.suite.common import table  # noqa: E402
from mura_spark.operators.dedup import (  # noqa: E402
    _explode_sets, _length_compatible, _verify_jaccard, shingle_sets)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pipeline(d, threshold, positional):
    sets = shingle_sets(d, "doc_id", "text", 3)
    ex = _explode_sets(sets, "doc_id")
    from pyspark.sql.window import Window
    dfreq2 = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
              .filter(F.col("__df") >= 2))
    w = Window.partitionBy("doc_id").orderBy("__df", "shingle")
    prefix_len = (F.col("n_shingles")
                  - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1)
    probe = (ex.join(dfreq2, "shingle")
             .withColumn("__pos", F.row_number().over(w))
             .filter(F.col("__pos") <= prefix_len)
             .select("doc_id", "n_shingles", "__pos", "shingle"))
    a = probe.select(F.col("doc_id").alias("id_a"),
                     F.col("n_shingles").alias("n_a"),
                     F.col("__pos").alias("p_a"), "shingle")
    b = probe.select(F.col("doc_id").alias("id_b"),
                     F.col("n_shingles").alias("n_b"),
                     F.col("__pos").alias("p_b"), "shingle")
    cond = (F.col("id_a") < F.col("id_b")) & _length_compatible(threshold)
    if positional:
        ubound = 1 + F.least(F.col("n_a") - F.col("p_a"),
                             F.col("n_b") - F.col("p_b"))
        cond = cond & (ubound.cast("double") * F.lit(1.0 + threshold)
                       >= F.lit(threshold)
                       * (F.col("n_a") + F.col("n_b")).cast("double")
                       - F.lit(1e-9))
    cand = (a.join(b, "shingle").filter(cond)
            .select("id_a", "id_b").distinct())
    pairs = (_verify_jaccard(sets, "doc_id", cand)
             .filter(F.col("jaccard") >= threshold))
    return cand, pairs


def main():
    spark = get_spark("ppjoin-positional-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, SF, "documents")
    d.count()

    for threshold in (0.5, 0.8):
        c0, _ = pipeline(d, threshold, False)
        c1, _ = pipeline(d, threshold, True)
        print(f"t={threshold}: candidates base {c0.count()} "
              f"-> positional {c1.count()}")

        res = {}
        for trial in range(4):
            for mode in (False, True):
                _, pairs = pipeline(d, threshold, mode)
                spark.sparkContext.setJobDescription(
                    f"t{threshold} pos={mode} trial{trial}")
                t0 = time.time()
                pairs.write.mode("overwrite").format("noop").save()
                res.setdefault(mode, []).append(time.time() - t0)
        for mode, ts in res.items():
            ts_s = sorted(ts)
            print(f"  t={threshold} positional={mode}: "
                  + " ".join(f"{t:5.2f}" for t in ts)
                  + f"  median {ts_s[len(ts)//2]:5.2f} min {min(ts):5.2f}")

        r0 = sorted((r.id_a, r.id_b, round(r.jaccard, 12))
                    for r in pipeline(d, threshold, False)[1].collect())
        r1 = sorted((r.id_a, r.id_b, round(r.jaccard, 12))
                    for r in pipeline(d, threshold, True)[1].collect())
        print(f"  t={threshold} results identical: {r0 == r1} "
              f"(n={len(r0)})")


if __name__ == "__main__":
    main()
