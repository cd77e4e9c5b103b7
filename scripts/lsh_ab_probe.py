#!/usr/bin/env python
"""Interleaved A/B: old (payload-through-band-join) vs new (proxy
candidates) LSH shapes, same session, noop sink, median of N trials."""
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

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("TRIALS", "5"))
spark = get_spark("lsh-ab")


def old_dup_pairs(df, threshold):
    df = S._drop_null_vectors(df, "embedding")
    df = S.ensure_min_partitions(df)
    a = df.select(F.col("vec_id").alias("id_a"),
                  F.col("embedding").alias("__va"),
                  norm(F.col("embedding")).alias("__na"))
    b = df.select(F.col("vec_id").alias("id_b"),
                  F.col("embedding").alias("__vb"),
                  norm(F.col("embedding")).alias("__nb"))
    first = df.select("embedding").first()
    band_bits = S._auto_band_bits(S.approx_row_count(df))
    planes = S._hyperplanes(len(first[0]), S.LSH_BANDS * band_bits)
    banded = S._with_bands(df.select("vec_id", "embedding"), "embedding",
                           planes)
    ea = banded.select(F.col("vec_id").alias("id_a"),
                       F.col("embedding").alias("__va"),
                       norm(F.col("embedding")).alias("__na"),
                       F.explode("__bands").alias("bk"))
    eb = banded.select(F.col("vec_id").alias("id_b"),
                       F.col("embedding").alias("__vb"),
                       norm(F.col("embedding")).alias("__nb"),
                       F.explode("__bands").alias("bk"))
    pairs = (ea.join(eb, "bk").filter(F.col("id_a") < F.col("id_b"))
               .select("id_a", "id_b", "__va", "__vb", "__na", "__nb")
               .distinct())
    return (pairs.select("id_a", "id_b",
                         S._paired_cosine(dot(F.col("__va"), F.col("__vb")),
                                          F.col("__na"), F.col("__nb"))
                         .alias("sim"))
                 .filter(F.col("sim") >= threshold))


def old_topk_lsh(queries, corpus, k):
    queries = S._drop_null_vectors(queries, "embedding")
    corpus = S._drop_null_vectors(corpus, "embedding")
    first = queries.select("embedding").first()
    dim = len(first[0])
    band_bits = S._auto_band_bits(S.approx_row_count(corpus))
    planes = S._hyperplanes(dim, S.LSH_BANDS * band_bits, 42)
    q = (S._with_bands(queries.select(F.col("query_id").alias("__qid"),
                                      F.col("embedding").alias("__qvec")),
                       "__qvec", planes, S.LSH_BANDS)
         .select("__qid", "__qvec", F.explode("__bands").alias("band_key")))
    c = (S._with_bands(corpus.select(F.col("vec_id").alias("neighbor_id"),
                                     F.col("embedding").alias("__cvec")),
                       "__cvec", planes, S.LSH_BANDS)
         .select("neighbor_id", "__cvec",
                 F.explode("__bands").alias("band_key")))
    cand = (q.join(c, "band_key")
             .select("__qid", "__qvec", "neighbor_id", "__cvec")
             .distinct())
    scored = cand.select(
        F.col("__qid").alias("query_id"), "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("sim"))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("query_id")
               .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "sim"))


def run(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def bench(label, make_old, make_new):
    olds, news = [], []
    run(make_new())  # warm both once
    run(make_old())
    for _ in range(N):
        olds.append(run(make_old()))
        news.append(run(make_new()))
    print(f"{label}: old median {statistics.median(olds):.2f}s "
          f"{sorted(round(x,2) for x in olds)} | "
          f"new median {statistics.median(news):.2f}s "
          f"{sorted(round(x,2) for x in news)}")


e = table(spark, SF, "embeddings")
queries = (e.filter(F.col("vec_id") < 100)
            .select(F.col("vec_id").alias("query_id"), "embedding"))

bench("dedup_embedding_pairs_lsh",
      lambda: old_dup_pairs(e, 0.4),
      lambda: S.embedding_dup_pairs(e, threshold=0.4, method="lsh"))
bench("ann_topk_lsh",
      lambda: old_topk_lsh(queries, e, 10),
      lambda: S.topk_lsh(queries, e, 10))
spark.stop()
