#!/usr/bin/env python
"""Interleaved A/B: shuffle_hash hints on the |E|-sized join sides of
triangle_counts (wedge join e2, closing join) and graph_rich_club's
edge⋈rich joins. Same mechanism as the pagerank/BFS/adamic-adar fixes.
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


def edges(spark):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    return graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")


def triangles(spark, hinted):
    e = edges(spark)
    und = (e.select(F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionByName(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    keyed = und.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("__da"), F.col("a")) < F.struct(F.col("__db"),
                                                         F.col("b"))
    oriented = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("__db")).otherwise(F.col("__da")).alias("__dv"))
    e1 = oriented.select("u", F.col("v"), F.col("__dv"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w"),
                         F.col("__dv").alias("__dw"))
    closing = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    if hinted:
        e2 = e2.hint("shuffle_hash")
        closing = closing.hint("shuffle_hash")
    wedges = (e1.join(e2, "u")
              .filter(F.struct(F.col("__dv"), F.col("v"))
                      < F.struct(F.col("__dw"), F.col("w"))))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    corners = tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
    return (corners.groupBy("node")
            .agg(F.count(F.lit(1)).alias("n_triangles")))


def rich_club(spark, hinted):
    from pyspark.sql import Window
    e = edges(spark)
    deg = (e.groupBy(F.col("src").alias("node"))
           .agg(F.count(F.lit(1)).alias("d")))
    dc = deg.groupBy("d").agg(F.count(F.lit(1)).alias("k"))
    dn = dc.agg(F.sum("k").alias("n"))
    dcum = dc.select(
        "d", F.sum("k").over(Window.orderBy("d")
                             .rowsBetween(Window.unboundedPreceding, 0))
        .alias("gc"))
    kt = (dcum.crossJoin(F.broadcast(dn))
          .filter(F.col("gc") >= F.expr("(n + 1) div 2"))
          .agg(F.min("d").alias("kstar")))
    rich = (deg.crossJoin(F.broadcast(kt))
            .filter(F.col("d") > F.col("kstar"))
            .select("node"))
    ra = rich.withColumnRenamed("node", "src")
    rb = rich.withColumnRenamed("node", "dst")
    if hinted:
        ra = ra.hint("shuffle_hash")
        rb = rb.hint("shuffle_hash")
    re_ = (e.join(ra, "src").join(rb, "dst")
           .agg(F.count(F.lit(1)).alias("m")))
    rn = rich.agg(F.count(F.lit(1)).alias("nr"))
    phi = (F.floor(F.col("m").cast("double")
                   / (F.col("nr").cast("double")
                      * (F.col("nr") - F.lit(1)).cast("double"))
                   * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    return (re_.crossJoin(F.broadcast(rn)).crossJoin(F.broadcast(kt))
            .select(F.col("kstar").cast("bigint").alias("k_threshold"),
                    F.col("nr").alias("n_rich"),
                    F.col("m").alias("n_edges_rich"),
                    F.when(F.col("nr") > 1, phi).alias("phi_micro")))


def main():
    spark = get_spark("tri-hint-ab")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, SF, "lineitem").count()

    for label, builder in (("triangles", triangles),
                           ("rich_club", rich_club)):
        res = {}
        for trial in range(5):
            for hinted in (False, True):
                df = builder(spark, hinted)
                spark.sparkContext.setJobDescription(
                    f"{label} hinted={hinted} t{trial}")
                t0 = time.time()
                df.write.mode("overwrite").format("noop").save()
                res.setdefault(hinted, []).append(time.time() - t0)
        for h, ts in res.items():
            s = sorted(ts)
            print(f"{label} hinted={h}: "
                  + " ".join(f"{t:5.2f}" for t in ts)
                  + f"  median {s[len(s)//2]:5.2f} min {min(ts):5.2f}")
        r0 = sorted(map(tuple, builder(spark, False).collect()))
        r1 = sorted(map(tuple, builder(spark, True).collect()))
        print(f"{label} identical: {r0 == r1} n={len(r0)}")


if __name__ == "__main__":
    main()
