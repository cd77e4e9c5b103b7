#!/usr/bin/env python
"""Scale-validation experiment: replicate the sf0.1 test data K× with
consistent key offsets and re-run the headline bench, printing per-query
time ratios.

Each replica i shifts every key column by ``i * (max_key + 1)`` of its key
domain, so joins stay internally consistent per replica and every document/
embedding gains K-1 exact clones — the worst case for pair-mining dedup
(true duplicate-pair output grows ~K² per clone group) and a realistic
stress for everything else. Usage::

    python scripts/scale_check.py [K] [out_dir]

Defaults: K=10, out_dir=/tmp/mura_scale{K}. The verdict to look for:
relational shapes sub-linear, pair-mining bounded by its output growth, no
plan changes (plan-shape pytest still covers those).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"

#: key column → key domain, per table; domains size from the owning table
TABLE_KEYS: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "region")],
    "nation": [("n_nationkey", "nation"), ("n_regionkey", "region")],
    "customer": [("c_custkey", "customer"), ("c_nationkey", "nation")],
    "supplier": [("s_suppkey", "supplier"), ("s_nationkey", "nation")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [("l_orderkey", "orders"), ("l_partkey", "part"),
                 ("l_suppkey", "supplier")],
    "events": [("event_id", "events"), ("user_id", "user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

DOMAIN_OWNER = {
    "region": ("region", "r_regionkey"),
    "nation": ("nation", "n_nationkey"),
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def build(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from mura_spark.suite.common import table

    bases = {}
    for domain, (tbl, col) in DOMAIN_OWNER.items():
        bases[domain] = table(spark, BASE_SF, tbl).agg(
            F.max(col)).first()[0] + 1
    for tbl, keys in TABLE_KEYS.items():
        df = table(spark, BASE_SF, tbl)
        rep = df.crossJoin(
            spark.range(k).select(F.col("id").alias("__rep")))
        for col, domain in keys:
            rep = rep.withColumn(
                col, F.col(col) + F.col("__rep") * bases[domain])
        (rep.drop("__rep")
            .write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet"))


def run_bench(spark, sf_dir: str) -> dict[str, float]:
    from bench import BENCH_QUERIES, N_ROUNDS

    from mura_spark.suite import SPARK_QUERIES

    SPARK_QUERIES["scan_region"](spark, sf_dir).count()  # warm
    timings: dict[str, float] = {}
    for _ in range(N_ROUNDS):
        for name in BENCH_QUERIES:
            t0 = time.time()
            (SPARK_QUERIES[name](spark, sf_dir)
             .write.mode("overwrite").format("noop").save())
            el = round(time.time() - t0, 3)
            timings[name] = min(el, timings.get(name, el))
    return timings


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/mura_scale{k}"

    from mura_spark.session import get_spark

    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    build(spark, k, out_dir)
    print(f"# built {k}x data in {time.time() - t0:.0f}s -> {out_dir}",
          file=sys.stderr)

    base = run_bench(spark, BASE_SF)
    scaled = run_bench(spark, out_dir)
    ratios = {n: round(scaled[n] / base[n], 2) if base[n] > 0 else None
              for n in base}
    print(json.dumps({
        "k": k,
        "base_total_sec": round(sum(base.values()), 1),
        "scaled_total_sec": round(sum(scaled.values()), 1),
        "total_ratio": round(sum(scaled.values()) / sum(base.values()), 2),
        "base": base, "scaled": scaled, "ratios": ratios,
    }))


if __name__ == "__main__":
    main()
