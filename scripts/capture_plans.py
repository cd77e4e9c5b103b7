#!/usr/bin/env python
"""Dump .explain("formatted") for named suite queries to files.

Usage::

    python scripts/capture_plans.py OUTDIR SUFFIX [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` per query (the judge's plan
artifact: plans/r10/<query>_before.txt / _after.txt). Defaults to the
bench's slowest-25 set when no queries are named. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) without executing the query (explain
is driver-side; AQE shows the initial plan, which is the shape the
optimization claims are about: Exchange count, join strategy,
PushedFilters, ReadSchema, Python-eval nodes).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mura_spark.session import get_spark
    from mura_spark.suite import SPARK_QUERIES

    spark = get_spark("mura-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = SPARK_QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record the failure verbatim
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
