#!/usr/bin/env python
"""Per-JOB callsite breakdown for a suite query: which driver action
launched each Spark job, via statusTracker stage names (callsites).

Extends scripts/job_count_probe.py when the question moves from "how
many jobs" to "WHICH jobs remain" — the instrument for cutting a
fixture's per-commit action floor. Usage::

    python scripts/job_callsite_probe.py [sf_dir] query [query ...]
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

    spark = get_spark("job-callsite-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    st = sc.statusTracker()
    qs = entrymod.queries()
    for name in names:
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup(f"done_{name}", name)
        jobs = sorted(st.getJobIdsForGroup(group))
        print(f"== {name}: jobs={len(jobs)} wall={dt:.2f}s")
        for j in jobs:
            info = st.getJobInfo(j)
            if info is None:
                print(f"  job {j}: <expired>")
                continue
            # the job's terminal stage name is the action callsite
            stages = [st.getStageInfo(s) for s in info.stageIds]
            names_ = [s.name for s in stages if s is not None]
            tail = names_[-1] if names_ else "?"
            print(f"  job {j}: stages={len(info.stageIds)} {tail}")


if __name__ == "__main__":
    main()
