#!/usr/bin/env python
"""Interleaved A/B: ann_ivf_recall_at10 — separate exact/IVF passes vs a
single shared scored frame.

The committed shape scores cosine twice (full cross-join for the exact
truth, candidate-only join chain for the IVF side), ranks in two Window
passes, and joins the two top-k sets to count hits. The shared shape
scores the broadcast cross-join ONCE, flags candidate pairs with a
broadcast left join, computes both ranks in one Window operator
(row_number for the exact rank; a running sum of the flag for the IVF
rank — identical because (sim, nid) is a total order within each qid
partition, so the rank of a candidate row among candidate rows in the
shared ordering equals its rank in the candidates-only window), and
counts hits in-frame (exact_rnk<=K AND flagged AND ivf_rnk<=K) instead
of re-joining.

Result identity is asserted with collect() before timing.
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F

from mura_spark.functions.vectors import cosine
from mura_spark.operators.clustering import kmeans_assign
from mura_spark.session import get_spark
from mura_spark.suite.common import table
from mura_spark.suite.similarity_q import _K, _NQ, ann_ivf_recall_at10

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("TRIALS", "5"))

spark = get_spark("ivf-recall-shared-ab")
spark.sparkContext.setLogLevel("ERROR")


def shared_shape(spark, sf):
    e = table(spark, sf, "embeddings")
    assign = kmeans_assign(e, "vec_id", "embedding",
                           k=8, iterations=2).select("vec_id", "cluster")
    qa = (assign.filter(F.col("vec_id") < _NQ)
                .select(F.col("vec_id").alias("qid"), "cluster"))
    ivp = (qa.join(assign.select(F.col("vec_id").alias("nid"),
                                 "cluster"), "cluster")
             .select("qid", "nid"))
    qs = (e.filter(F.col("vec_id") < _NQ)
           .select(F.col("vec_id").alias("qid"),
                   F.col("embedding").alias("qe")))
    scored = (e.select(F.col("vec_id").alias("nid"),
                       F.col("embedding").alias("ce"))
               .crossJoin(F.broadcast(qs))
               .select("qid", "nid",
                       cosine(F.col("qe"), F.col("ce")).alias("sim")))
    flagged = scored.join(
        F.broadcast(ivp.withColumn("__in", F.lit(1))),
        ["qid", "nid"], "left")
    wq = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    ranked = flagged.select(
        "qid", "nid", "__in",
        F.row_number().over(wq).alias("exact_rnk"),
        F.sum("__in").over(
            wq.rowsBetween(Window.unboundedPreceding,
                           Window.currentRow)).alias("ivf_rnk"))
    h = (ranked.filter(F.col("exact_rnk") <= _K)
               .groupBy(F.col("qid").alias("query_id"))
               .agg(F.count(F.when((F.col("__in") == 1)
                                   & (F.col("ivf_rnk") <= _K), 1))
                     .alias("n_hits")))
    nc = ivp.groupBy("qid").agg(F.count(F.lit(1)).alias("n_candidates"))
    rec = (F.floor(F.col("n_hits").cast("double") / F.lit(float(_K))
                   * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    return (h.join(nc.withColumnRenamed("qid", "query_id"), "query_id")
             .select("query_id", "n_candidates", "n_hits",
                     rec.alias("recall_micro")))


VARIANTS = {"old": ann_ivf_recall_at10, "shared": shared_shape}

old_rows = sorted(map(tuple, VARIANTS["old"](spark, SF).collect()))
new_rows = sorted(map(tuple, VARIANTS["shared"](spark, SF).collect()))
print("IDENTICAL:", old_rows == new_rows, flush=True)
if old_rows != new_rows:
    print("old:", old_rows)
    print("new:", new_rows)
    sys.exit(1)


def run(variant):
    spark.sparkContext.setJobDescription(f"ivf_recall[{variant}]")
    t0 = time.time()
    VARIANTS[variant](spark, SF).write.format("noop") \
        .mode("overwrite").save()
    return time.time() - t0


run("old"), run("shared")  # warm
times = {"old": [], "shared": []}
for _ in range(N):
    for v in ("old", "shared"):
        times[v].append(run(v))
b, a = (statistics.median(times[v]) for v in ("old", "shared"))
print(f"ann_ivf_recall_at10: old={b:.2f}s shared={a:.2f}s "
      f"ratio={a / b:.2f}  "
      f"raw_old={[f'{t:.2f}' for t in times['old']]} "
      f"raw_shared={[f'{t:.2f}' for t in times['shared']]}")
