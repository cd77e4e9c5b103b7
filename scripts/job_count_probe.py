#!/usr/bin/env python
"""Count Spark JOBS (actions) a suite query launches, plus wall time.

Job count is the structural instrument for fixture-style queries whose
cost is many small driver actions (table-format DML, incremental view
refresh): unlike wall-clock it is deterministic, so a before/after pair
proves an action-count reduction the way a plan diff proves a shuffle
removal. Usage::

    python scripts/job_count_probe.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import __spark_entry__ as entrymod
    from mura_spark.session import get_spark

    spark = get_spark("job-count-probe")
    sc = spark.sparkContext
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup(f"done_{name}", name)
        n = len(sc.statusTracker().getJobIdsForGroup(group))
        print(f"{name}: jobs={n} wall={dt:.2f}s")


if __name__ == "__main__":
    main()
