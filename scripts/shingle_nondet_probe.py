#!/usr/bin/env python
"""Interleaved A/B: deterministic vs asNondeterministic() shingle kernel.

The explain plans of every shingle consumer show the guide-4.4 duplicate-
UDF pattern: the explode's implied `size(shset) > 0 AND isnotnull(shset)`
filter is pushed below the widening repartition, inserting a second
ArrowEvalPython — every document pays the shingle kernel twice per chain.
Marking the kernel non-deterministic (pure function; values unchanged)
stops the optimizer duplicating it.

Variant toggled per trial by monkeypatching dedup.shingle_sets (resolved
from module globals at call time), same session, noop sink, median of N
trials per (query, variant).
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from mura_spark.functions import text as TX
from mura_spark.operators import dedup
from mura_spark.session import get_spark
from mura_spark.sources.parquet import ensure_min_partitions

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("TRIALS", "4"))
QUERIES = sys.argv[1:] or ["dedup_minhash_calibration", "dedup_jaccard_pairs",
                           "dedup_containment_pairs"]

spark = get_spark("shingle-nondet-ab")
spark.sparkContext.setLogLevel("ERROR")

_orig_shingle_sets = dedup.shingle_sets


def _nondet_shingle_sets(df, id_col, text_col, n=3):
    kernel = TX.shingle_text_udf(n).asNondeterministic()
    sh = ensure_min_partitions(df).select(
        F.col(id_col), kernel(F.col(text_col)).alias("shset"))
    return sh.withColumn("n_shingles", F.size("shset"))


from mura_spark.suite import SPARK_QUERIES  # noqa: E402


def run(name, variant):
    dedup.shingle_sets = (_nondet_shingle_sets if variant == "nondet"
                          else _orig_shingle_sets)
    spark.sparkContext.setJobDescription(f"{name}[{variant}]")
    t0 = time.time()
    SPARK_QUERIES[name](spark, SF).write.format("noop") \
        .mode("overwrite").save()
    return time.time() - t0


for name in QUERIES:
    # warm both variants once (JIT/schema caches), then interleave
    run(name, "before"), run(name, "nondet")
    times = {"before": [], "nondet": []}
    for _ in range(N):
        for v in ("before", "nondet"):
            times[v].append(run(name, v))
    b, a = (statistics.median(times[v]) for v in ("before", "nondet"))
    print(f"{name}: before={b:.2f}s nondet={a:.2f}s ratio={a / b:.2f}  "
          f"raw_before={[f'{t:.2f}' for t in times['before']]} "
          f"raw_nondet={[f'{t:.2f}' for t in times['nondet']]}")
dedup.shingle_sets = _orig_shingle_sets
