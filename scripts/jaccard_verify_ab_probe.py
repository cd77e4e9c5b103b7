#!/usr/bin/env python
"""Interleaved A/B of jaccard_dup_pairs verify-join shapes (round 10 opt).

Variants (same candidate miner; only the verification join differs):
  base    — current: cand ⋈ sets(shuffle_hash) ⋈ sets(shuffle_hash)
  bc_sets — sets localCheckpoint'd once, then BOTH verify joins broadcast
            the sets side (cand streams, zero verify exchanges)
  nohint  — no hints, planner/AQE picks

Also prints candidate / pair counts so we know the join cardinalities.
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
    _explode_sets, _length_compatible, shingle_sets)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = float(os.environ.get("T", "0.5"))


def build_cand(d):
    sets = shingle_sets(d, "doc_id", "text", 3)
    ex = _explode_sets(sets, "doc_id")
    from pyspark.sql.window import Window
    dfreq2 = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
              .filter(F.col("__df") >= 2))
    w = Window.partitionBy("doc_id").orderBy("__df", "shingle")
    prefix_len = (F.col("n_shingles")
                  - F.ceil(F.lit(THRESHOLD) * F.col("n_shingles")) + 1)
    probe = (ex.join(dfreq2, "shingle")
             .withColumn("__pos", F.row_number().over(w))
             .filter(F.col("__pos") <= prefix_len)
             .select("doc_id", "n_shingles", "shingle"))
    a = probe.select(F.col("doc_id").alias("id_a"),
                     F.col("n_shingles").alias("n_a"), "shingle")
    b = probe.select(F.col("doc_id").alias("id_b"),
                     F.col("n_shingles").alias("n_b"), "shingle")
    cand = (a.join(b, "shingle")
            .filter((F.col("id_a") < F.col("id_b"))
                    & _length_compatible(THRESHOLD))
            .select("id_a", "id_b").distinct())
    return sets, cand


def verify(sets, cand, mode):
    a = sets.select(F.col("doc_id").alias("id_a"),
                    F.col("shset").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("id_b"),
                    F.col("shset").alias("sh_b"))
    if mode == "base":
        paired = (cand.join(a.hint("shuffle_hash"), "id_a")
                      .join(b.hint("shuffle_hash"), "id_b"))
    elif mode == "bc_sets":
        paired = (cand.join(F.broadcast(a), "id_a")
                      .join(F.broadcast(b), "id_b"))
    else:
        paired = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (paired.select("id_a", "id_b",
                          (inter.cast("double") / union).alias("jaccard"))
            .filter(F.col("jaccard") >= THRESHOLD))


def main():
    spark = get_spark("jaccard-verify-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, SF, "documents")
    d.count()

    sets0, cand0 = build_cand(d)
    n_cand = cand0.count()
    print("candidate pairs:", n_cand)

    res = {}
    for trial in range(4):
        for mode in ("base", "bc_sets", "nohint"):
            sets, cand = build_cand(d)
            if mode == "bc_sets":
                sets = sets.localCheckpoint(eager=True)
            pairs = verify(sets, cand, mode)
            spark.sparkContext.setJobDescription(f"{mode} t{trial}")
            t0 = time.time()
            pairs.write.mode("overwrite").format("noop").save()
            res.setdefault(mode, []).append(time.time() - t0)

    for mode, ts in res.items():
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(f"{mode:8s} trials " + " ".join(f"{t:6.2f}" for t in ts)
              + f"   median {med:6.2f}  min {min(ts):6.2f}")

    # result equivalence: sorted collect of all three
    rows = {}
    for mode in ("base", "bc_sets", "nohint"):
        sets, cand = build_cand(d)
        if mode == "bc_sets":
            sets = sets.localCheckpoint(eager=True)
        rows[mode] = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 12))
            for r in verify(sets, cand, mode).collect())
    print("bc_sets == base:", rows["bc_sets"] == rows["base"],
          " nohint == base:", rows["nohint"] == rows["base"],
          " n_pairs:", len(rows["base"]))


if __name__ == "__main__":
    main()
