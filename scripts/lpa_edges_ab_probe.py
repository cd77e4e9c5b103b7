#!/usr/bin/env python
"""Interleaved A/B: does the basket-local co-occurrence edge derivation
change the end-to-end time of the ITERATIVE consumers (LPA, modularity's
LPA prefix)? The old self-join shape is inlined here; the new shape is
the library's. Edges are localCheckpointed in both arms exactly as the
queries do, so any difference is the derivation, not the rounds.
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

from mura_spark.operators import graph
from mura_spark.session import get_spark
from mura_spark.suite.common import table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("TRIALS", "3"))
spark = get_spark("lpa-edges-ab")
spark.sparkContext.setLogLevel("ERROR")


def old_cooccurrence_edges(df, group_col, item_col):
    a = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("src"))
    b = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("dst"))
    return (a.join(b, "__g")
             .filter(F.col("src") != F.col("dst"))
             .select("src", "dst").distinct())


def lpa(edge_fn):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    base = edge_fn(li, "l_orderkey", "l_partkey")
    edges = (base.union(base.select("src").distinct()
                            .select("src", F.col("src").alias("dst")))
                 .localCheckpoint(eager=True))
    labels = edges.select(F.col("src").alias("node")).distinct() \
                  .select("node", F.col("node").alias("lbl"))
    for _ in range(2):
        votes = (edges.join(labels.withColumnRenamed("node", "dst"), "dst")
                      .groupBy(F.col("src").alias("node"), "lbl")
                      .agg(F.count(F.lit(1)).alias("__n")))
        w = (Window.partitionBy("node")
                   .orderBy(F.col("__n").desc(), F.col("lbl").asc()))
        labels = (votes.withColumn("__rnk", F.row_number().over(w))
                       .filter(F.col("__rnk") == 1)
                       .select("node", "lbl"))
    return (labels.groupBy(F.col("lbl").alias("community"))
                  .agg(F.count(F.lit(1)).alias("n_nodes")))


def run(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


olds, news = [], []
run(lpa(graph.cooccurrence_edges))   # warm both arms
run(lpa(old_cooccurrence_edges))
for _ in range(N):
    olds.append(run(lpa(old_cooccurrence_edges)))
    news.append(run(lpa(graph.cooccurrence_edges)))
print(f"lpa: old median {statistics.median(olds):.2f}s "
      f"{sorted(round(x, 2) for x in olds)} | "
      f"new median {statistics.median(news):.2f}s "
      f"{sorted(round(x, 2) for x in news)}")
spark.stop()
