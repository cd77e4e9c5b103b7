#!/usr/bin/env python
"""Interleaved A/B: join-strategy hints inside graph_bfs_reach's
recursive member.

The recursive join (`walk w JOIN edges e ON e.src = w.node`) is
replanned per iteration against the localCheckpoint'd edge list, whose
carried size estimate is the under-estimating basket-local explode
shape (the same mechanism that made LPA's per-round join regress —
change #6). Candidate fixes are semantics-free SQL hints on the
recursive member: SHUFFLE_HASH(e) (hash the edges, never broadcast
them) or BROADCAST(w) (ship the small frontier instead).

Results compared with collect() first; hints cannot change semantics
but the check is cheap.
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mura_spark.operators import graph
from mura_spark.session import get_spark
from mura_spark.suite.common import table
from mura_spark.suite.graph_q import _BFS_SQL

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("TRIALS", "5"))

spark = get_spark("bfs-hint-ab")
spark.sparkContext.setLogLevel("ERROR")

HINTS = {
    "none": "SELECT DISTINCT e.dst",
    "shuffle_hash_e": "SELECT /*+ SHUFFLE_HASH(e) */ DISTINCT e.dst",
    "broadcast_w": "SELECT /*+ BROADCAST(w) */ DISTINCT e.dst",
}


def run(variant, action="noop"):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    edges = (graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
                  .localCheckpoint(eager=True))
    edges.createOrReplaceTempView("__mura_bfs_edges_ab")
    sql = (_BFS_SQL.replace("SELECT DISTINCT e.dst", HINTS[variant])
                   .format(edges="__mura_bfs_edges_ab"))
    spark.sparkContext.setJobDescription(f"bfs[{variant}]")
    t0 = time.time()
    df = spark.sql(sql)
    if action == "collect":
        rows = sorted(map(tuple, df.collect()))
        return time.time() - t0, rows
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0, None


_, base_rows = run("none", "collect")
for v in ("shuffle_hash_e", "broadcast_w"):
    _, rows = run(v, "collect")
    print(f"IDENTICAL[{v}]:", rows == base_rows, flush=True)
    assert rows == base_rows

for v in HINTS:
    run(v)  # warm
times = {v: [] for v in HINTS}
for _ in range(N):
    for v in HINTS:
        times[v].append(run(v)[0])
for v, ts in times.items():
    print(f"{v}: median={statistics.median(ts):.2f}s "
          f"raw={[f'{t:.2f}' for t in ts]}")
