#!/usr/bin/env python
"""100× output-bound scaling probe for the pair-mining dedup family.

The 10×/30× replication runs (BASELINE.md) support the claim that
`dedup_jaccard_pairs` / `dedup_incremental_near` are *output-bound*:
candidate generation is near-linear, so runtime tracks the true-duplicate-
pair count (which grows ~K² per clone group under K× replication), not the
input size. This probe pins that law with a third point — K=100 — on a
TRIMMED corpus (the first ``BASE_DOCS`` documents of sf0.1) so the K=100
pair output (~C(100,2) per clone group) stays tractable on one machine.

Replication matches scripts/scale_check.py: replica i shifts doc_id by
i * (max_id + 1), giving every document K-1 exact clones — the worst case
for pair mining. Prints one JSON line: per-K runtimes (min-of-2, noop
sink), true output-pair counts, and seconds-per-million-pairs; the law
holds if sec/Mpair is flat-to-falling as K grows while runtime itself
grows ~K².

Usage::

    python scripts/scale100_probe.py [base_docs] [out_root]

Defaults: base_docs=500, out_root=/tmp/mura_s100.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
SCALES = [1, 10, 100]
QUERIES = ["dedup_jaccard_pairs", "dedup_incremental_near"]


def build(spark, base_docs: int, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from mura_spark.suite.common import table

    docs = (table(spark, BASE_SF, "documents")
            .orderBy("doc_id").limit(base_docs).cache())
    base = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = (docs.crossJoin(spark.range(k).select(F.col("id").alias("__rep")))
           .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * base)
           .drop("__rep"))
    rep.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    docs.unpersist()


def main() -> None:
    base_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mura_s100"

    from mura_spark.session import get_spark
    from mura_spark.suite import SPARK_QUERIES

    spark = get_spark("scale100-probe")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"base_docs": base_docs, "scales": {}}
    for k in SCALES:
        sf_dir = f"{out_root}/k{k}"
        t0 = time.time()
        build(spark, base_docs, k, sf_dir)
        print(f"# built k={k} ({base_docs * k} docs) "
              f"in {time.time() - t0:.0f}s", file=sys.stderr)
        entry: dict = {"n_docs": base_docs * k, "queries": {}}
        for name in QUERIES:
            pairs = SPARK_QUERIES[name](spark, sf_dir).count()
            best = None
            for _ in range(2):
                t0 = time.time()
                (SPARK_QUERIES[name](spark, sf_dir)
                 .write.mode("overwrite").format("noop").save())
                el = time.time() - t0
                best = el if best is None else min(best, el)
            entry["queries"][name] = {
                "sec": round(best, 2), "pairs": pairs,
                "sec_per_mpair": (round(best / (pairs / 1e6), 2)
                                  if pairs else None)}
            print(f"# k={k} {name}: {best:.2f}s, {pairs} pairs",
                  file=sys.stderr)
        result["scales"][k] = entry
    print(json.dumps(result))


if __name__ == "__main__":
    main()
