#!/usr/bin/env python
"""Manifest-bounded scaling probe for MuraTable bloom-lookup pruning.

The structural claim (pinned by tests/test_bloom_skip.py and the
``table_bloom_lookup_skipping`` driver row) is that an equality-needle
read opens ONLY the files whose bloom filter might contain the needle.
This probe pins the TIMING corollary: as the table grows K x in bytes
AND files, a needle probe through ``read(lookup=...)`` stays flat —
its cost is a function of the files that truly hold the needle (plus
deterministic bloom false positives), never of the table — while the
same probe WITHOUT pruning (full scan + filter) grows with K.

Method: replicate the sf0.1 orders table K times (orderkey and custkey
shifted per replica so every custkey is unique to its replica), one
commit per replica, each commit written as FILES_PER_COMMIT files,
bloom tracked on o_custkey. The needle is a custkey from replica 0, so
its true home is at most FILES_PER_COMMIT files regardless of K. At
each K the probe times the lookup-pruned read and the unpruned read of
the identical aggregate, and records the manifest-level pruned
fraction. A K=1 warmup pipeline runs first so JVM warmup doesn't land
in the first measured point. Prints one JSON line:

    {"probe": "bloom_scale", "ks": [...], "lookup_s": {...},
     "scan_s": {...}, "pruned_frac": {...}, "survivors": {...},
     "lookup_growth": x, "scan_growth": y, "flat_law_ok": bool}

The law is FLATNESS: lookup(K_max) <= 1.5 x lookup(K_min) while the
table grows K_max x and the unpruned scan grows with it. At 100 TB
this is the difference between a point read answered from driver-side
manifest metadata (open a handful of files) and a cluster-wide scan.

Usage::

    python scripts/bloom_scale_probe.py [out_root]

Default out_root=/tmp/mura_bloom_scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
SCALES = [1, 4, 16]
FILES_PER_COMMIT = 8
KEY_SHIFT = 10_000_000


def build_table(spark, path, k):
    from pyspark.sql import functions as F

    from mura_spark.sources.table_format import MuraTable
    shutil.rmtree(path, ignore_errors=True)
    base = (spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
            .select("o_orderkey", "o_custkey", "o_totalprice"))

    def replica(i):
        return (base
                .withColumn("o_orderkey",
                            F.col("o_orderkey") + F.lit(i * KEY_SHIFT))
                .withColumn("o_custkey",
                            F.col("o_custkey") + F.lit(i * KEY_SHIFT))
                .repartition(FILES_PER_COMMIT))

    t = MuraTable.create(spark, path, replica(0),
                         bloom_cols=["o_custkey"])
    for i in range(1, k):
        t.append(replica(i))
    return t


def pick_needle(spark):
    """Mid-range custkey from replica 0 — same deterministic shape as
    the table_bloom_lookup_skipping driver row's needle."""
    from pyspark.sql import functions as F
    base = spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
    row = base.agg(
        F.floor((F.min("o_custkey") + F.max("o_custkey")) / 2)
         .alias("m")).collect()[0]
    mid = row["m"]
    return (base.filter(F.col("o_custkey") <= mid)
                .agg(F.max("o_custkey").alias("k")).collect()[0]["k"])


def probe(t, needle):
    from pyspark.sql import functions as F

    def run(df):
        t0 = time.time()
        df.filter(F.col("o_custkey") == needle).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s")).collect()
        return round(time.time() - t0, 3)

    m = t._manifest()
    files = m["files"]
    survivors = [f for f in files if t._file_survives_lookup(
        m, f, {"o_custkey": needle})]
    lookup_s = run(t.read(lookup={"o_custkey": needle}))
    scan_s = run(t.read())
    return lookup_s, scan_s, len(files), len(survivors)


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mura_bloom_scale"
    from mura_spark import get_spark
    spark = get_spark()
    needle = pick_needle(spark)

    # warmup: full K=1 pipeline so JVM/codegen warmup stays out of the
    # first measured point
    warm = build_table(spark, os.path.join(out_root, "warm"), 1)
    probe(warm, needle)

    lookup_s, scan_s, pruned_frac, survivors = {}, {}, {}, {}
    for k in SCALES:
        t = build_table(spark, os.path.join(out_root, f"k{k}"), k)
        ls, ss, n_files, n_surv = probe(t, needle)
        lookup_s[str(k)] = ls
        scan_s[str(k)] = ss
        survivors[str(k)] = n_surv
        pruned_frac[str(k)] = round(1 - n_surv / n_files, 4)

    k_min, k_max = str(SCALES[0]), str(SCALES[-1])
    lookup_growth = round(lookup_s[k_max] / max(lookup_s[k_min], 1e-9), 3)
    scan_growth = round(scan_s[k_max] / max(scan_s[k_min], 1e-9), 3)
    out = {"probe": "bloom_scale", "ks": SCALES,
           "needle": int(needle),
           "files_per_commit": FILES_PER_COMMIT,
           "lookup_s": lookup_s, "scan_s": scan_s,
           "survivors": survivors, "pruned_frac": pruned_frac,
           "lookup_growth": lookup_growth, "scan_growth": scan_growth,
           "flat_law_ok": lookup_growth <= 1.5}
    print(json.dumps(out))
    shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
