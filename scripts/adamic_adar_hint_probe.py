#!/usr/bin/env python
"""Interleaved A/B: join-strategy hints on graph_adamic_adar's
|E|-sized join inputs (two-hop join's e2, anti-join's adj, final zok).

The edge list derives from the basket-local explode whose carried size
under-estimate makes Catalyst broadcast |E|-sized sides (the change
#6/#10/#11 mechanism, here without a checkpoint in between).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mura_spark.session import get_spark  # noqa: E402
from mura_spark.suite.common import table  # noqa: E402
from mura_spark.operators import graph  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, variant):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    e = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    deg = e.groupBy(F.col("src").alias("z")).agg(
        F.count(F.lit(1)).alias("d"))
    zok = deg.where(F.col("d") <= 64)
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("z"))
    e2 = e.select(F.col("src").alias("z"), F.col("dst").alias("v"))
    adj = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if variant == "hinted":
        e2 = e2.hint("shuffle_hash")
        adj = adj.hint("shuffle_hash")
    cand = (e1.join(zok.select("z"), "z").join(e2, "z")
            .where(F.col("u") < F.col("v")))
    nonadj = cand.join(adj, ["u", "v"], "left_anti")
    term = F.floor(F.lit(1.0) / F.log(F.col("d").cast("double"))
                   * F.lit(1000000000.0) + F.lit(0.5)).cast("bigint")
    scored = (nonadj.join(zok, "z")
              .groupBy("u", "v")
              .agg(F.count(F.lit(1)).alias("n_common"),
                   F.sum(term).cast("bigint").alias("aa_nano")))
    return (scored.orderBy(F.col("aa_nano").desc(), F.col("u").asc(),
                           F.col("v").asc())
            .limit(20))


def main():
    spark = get_spark("aa-hint-ab")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, SF, "lineitem").count()

    res = {}
    for trial in range(5):
        for variant in ("base", "hinted"):
            df = build(spark, variant)
            spark.sparkContext.setJobDescription(f"{variant} t{trial}")
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            res.setdefault(variant, []).append(time.time() - t0)
    for v, ts in res.items():
        s = sorted(ts)
        print(f"{v:7s} " + " ".join(f"{t:5.2f}" for t in ts)
              + f"  median {s[len(s)//2]:5.2f} min {min(ts):5.2f}")
    r0 = [tuple(r) for r in build(spark, "base").collect()]
    r1 = [tuple(r) for r in build(spark, "hinted").collect()]
    print("results identical:", r0 == r1, " n:", len(r0))


if __name__ == "__main__":
    main()
