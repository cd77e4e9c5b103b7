#!/usr/bin/env python
"""Interleaved A/B: container-side positional filter for containment_pairs.

Current (lib) shape: contained side windowed (prefix + positional),
container side probes with its full df>=2 list, NO window. Variant:
both sides flow through the position window, adding the container bound
    1 + m_o - p_o >= t * n_c   (intersection elements rank after the
globally-first common shingle in the container's pruned order too).
Lossless by the same witness argument. Costs two extra exchanges of the
exploded table (window on id, re-shuffle on shingle) on the container
path. Measures candidate volume and wall, proves result equality.
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
    _explode_sets, shingle_sets)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
T = 0.9


def build(d, container_pos):
    from pyspark.sql.window import Window
    sets = shingle_sets(d, "doc_id", "text", 3)
    ex = _explode_sets(sets, "doc_id")
    dfreq2 = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
              .filter(F.col("__df") >= 2))
    ex2 = ex.join(dfreq2, "shingle")
    w = Window.partitionBy("doc_id").orderBy("__df", "shingle")
    wcnt = Window.partitionBy("doc_id")
    prefix_len = (F.col("n_shingles")
                  - F.ceil(F.lit(T) * F.col("n_shingles")) + 1)
    pos = (ex2.withColumn("__pos", F.row_number().over(w))
              .withColumn("__m", F.count(F.lit(1)).over(wcnt)))
    contained = (pos.filter(F.col("__pos") <= prefix_len)
                 .select(F.col("doc_id").alias("contained_id"),
                         F.col("n_shingles").alias("__nc"),
                         F.col("__pos").alias("__pc"),
                         F.col("__m").alias("__mc"), "shingle"))
    pos_ok = ((1 + F.col("__mc") - F.col("__pc")).cast("double")
              >= F.lit(T) * F.col("__nc").cast("double") - F.lit(1e-9))
    if container_pos:
        container = pos.select(F.col("doc_id").alias("container_id"),
                               F.col("__pos").alias("__po"),
                               F.col("__m").alias("__mo"), "shingle")
        pos_ok = pos_ok & (
            (1 + F.col("__mo") - F.col("__po")).cast("double")
            >= F.lit(T) * F.col("__nc").cast("double") - F.lit(1e-9))
    else:
        container = ex2.select(F.col("doc_id").alias("container_id"),
                               "shingle")
    cand = (contained.join(container, "shingle")
            .filter((F.col("contained_id") != F.col("container_id"))
                    & pos_ok)
            .select("contained_id", "container_id").distinct())
    a = sets.select(F.col("doc_id").alias("contained_id"),
                    F.col("shset").alias("__sc"))
    b = sets.select(F.col("doc_id").alias("container_id"),
                    F.col("shset").alias("__so"))
    inter = F.size(F.array_intersect("__sc", "__so"))
    pairs = (cand.join(a.hint("shuffle_hash"), "contained_id")
             .join(b.hint("shuffle_hash"), "container_id")
             .select("contained_id", "container_id",
                     (inter.cast("double") / F.size("__sc"))
                     .alias("containment"))
             .filter(F.col("containment") >= T))
    return cand, pairs


def main():
    spark = get_spark("containment-pos-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, SF, "documents")
    d.count()

    c0, _ = build(d, False)
    c1, _ = build(d, True)
    print("candidates: lib", c0.count(), "-> container_pos", c1.count())

    res = {}
    for trial in range(4):
        # alternate which arm goes first per trial to cancel warming
        order = ((False, True) if trial % 2 == 0 else (True, False))
        for mode in order:
            _, pairs = build(d, mode)
            spark.sparkContext.setJobDescription(f"cpos={mode} t{trial}")
            t0 = time.time()
            pairs.write.mode("overwrite").format("noop").save()
            res.setdefault(mode, []).append(time.time() - t0)
    for mode, ts in res.items():
        s = sorted(ts)
        print(f"container_pos={mode}: "
              + " ".join(f"{t:5.2f}" for t in ts)
              + f"  median {s[len(s)//2]:5.2f} min {min(ts):5.2f}")

    r0 = sorted((r.contained_id, r.container_id, round(r.containment, 12))
                for r in build(d, False)[1].collect())
    r1 = sorted((r.contained_id, r.container_id, round(r.containment, 12))
                for r in build(d, True)[1].collect())
    print("identical:", r0 == r1, " n:", len(r0))


if __name__ == "__main__":
    main()
