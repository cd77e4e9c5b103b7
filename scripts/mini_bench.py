#!/usr/bin/env python
"""Bench a named subset of suite queries exactly like bench.py (noop sink,
min-of-2 rounds). Usage: python scripts/mini_bench.py q1 q2 ...

Same-session replica of the bench methodology for before/after probes of
a query subset without paying for the full 334-query table.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mura_spark.session import get_spark
    from mura_spark.suite import SPARK_QUERIES

    spark = get_spark("mura-mini-bench")
    spark.sparkContext.setLogLevel("ERROR")
    SPARK_QUERIES["scan_region"](spark, sf_dir).count()

    timings = {}
    for rnd in range(2):
        for name in names:
            fn = SPARK_QUERIES[name]
            spark.sparkContext.setJobDescription(f"{name} r{rnd}")
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            el = round(time.time() - t0, 3)
            timings[name] = min(el, timings.get(name, el))
    print(json.dumps(timings, indent=1))
    print("total", round(sum(timings.values()), 3))


if __name__ == "__main__":
    main()
