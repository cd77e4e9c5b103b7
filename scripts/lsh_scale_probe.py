#!/usr/bin/env python
"""Does the proxy-candidate LSH shape win once the corpus is large?

Replicates the sf0.1 embeddings corpus REP times (offset ids, jittered
vectors so LSH buckets stay realistic) and interleaves old vs new shapes.
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from mura_spark.session import get_spark
from mura_spark.suite.common import table
from mura_spark.functions.vectors import cosine, dot, norm
from mura_spark.operators import similarity as S
from scripts.lsh_ab_probe import old_dup_pairs, old_topk_lsh

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "32"))
N = int(os.environ.get("TRIALS", "3"))
spark = get_spark("lsh-scale-ab")

e = table(spark, SF, "embeddings")
reps = spark.range(REP).select(F.col("id").alias("rep"))
big = (e.crossJoin(F.broadcast(reps))
        .select((F.col("vec_id") + F.col("rep") * 1000000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + ((F.col("rep") * 7 + i) % 13 - 6.0)
                    * 0.03).alias("embedding"))
        .localCheckpoint(eager=True))
print("corpus rows:", big.count())
queries = (big.filter(F.col("vec_id") < 100)
              .select(F.col("vec_id").alias("query_id"), "embedding"))
nrows = big.count()


def run(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def bench(label, make_old, make_new):
    olds, news = [], []
    run(make_new())
    run(make_old())
    for _ in range(N):
        olds.append(run(make_old()))
        news.append(run(make_new()))
    print(f"{label}: old median {statistics.median(olds):.2f}s "
          f"{sorted(round(x,2) for x in olds)} | "
          f"new median {statistics.median(news):.2f}s "
          f"{sorted(round(x,2) for x in news)}")


bench(f"dedup_pairs_lsh x{REP}",
      lambda: old_dup_pairs(big, 0.9),
      lambda: S.embedding_dup_pairs(big, threshold=0.9, method="lsh",
                                    corpus_rows=nrows))
bench(f"topk_lsh x{REP}",
      lambda: old_topk_lsh(queries, big, 10),
      lambda: S.topk_lsh(queries, big, 10, corpus_rows=nrows))
spark.stop()
