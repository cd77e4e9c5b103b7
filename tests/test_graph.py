"""Graph-analytics operator semantics (operators/graph.py): edge
derivation, degrees, and PageRank pinned against an independent
pure-Python power iteration with the identical fixed-point truncation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _py_pagerank(edges, iterations=3, damping=0.85):
    """Independent reference: dict-based power iteration with the same
    1e-14 fixed-point contribution truncation as the operator."""
    import math
    nodes = sorted({s for s, _ in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        acc = {n: 0 for n in nodes}
        for s, d in edges:
            if d in acc:
                acc[d] += math.floor(rank[s] / out[s] * 1e14)
        rank = {n: (1.0 - damping) + damping * (float(acc[n]) / 1e14)
                for n in nodes}
    return rank


def test_cooccurrence_edges_and_degrees(spark):
    from mura_spark.operators.graph import cooccurrence_edges, degrees
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "x")]
    df = spark.createDataFrame(rows, ["order_id", "item"])
    edges = cooccurrence_edges(df, "order_id", "item")
    got = {(r.src, r.dst) for r in edges.collect()}
    # both directions, dedup'd across orders 1 and 2, singleton order 3
    # contributes nothing
    assert got == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
                   ("b", "c"), ("c", "b")}
    deg = {r.node: r.out_degree for r in degrees(edges).collect()}
    assert deg == {"a": 2, "b": 2, "c": 2}


def test_pagerank_matches_reference_power_iteration(spark):
    from mura_spark.operators.graph import pagerank
    # star + chain: hub 0 <-> leaves 1..3, chain 3 -> 4 (4 is a sink that
    # never sources an edge, so it is NOT a node — mirrors the
    # distinct-src node definition)
    e = [(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0), (3, 4)]
    edges = spark.createDataFrame(e, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(edges, iterations=4).collect()}
    want = _py_pagerank(e, iterations=4)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12), n
    # hub receives from three leaves -> strictly highest rank
    assert got[0] == max(got.values())


def test_pagerank_isolated_source_keeps_base_plus_damped_self(spark):
    from mura_spark.operators.graph import pagerank
    # 5 -> 6 only: node 5 sources but never receives -> rank = 1-d
    edges = spark.createDataFrame([(5, 6)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}
    assert set(got) == {5}
    assert got[5] == pytest.approx(0.15, abs=1e-12)


def test_association_rules_match_hand_computation(spark):
    from mura_spark.operators.graph import association_rules
    # baskets: {a,b,c}, {a,b}, {a,c}, {b,c}, {a,b}
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "a"), (3, "c"), (4, "b"), (4, "c"), (5, "a"), (5, "b")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {(r.item_a, r.item_b): (r.supp_pair, round(r.confidence, 10),
                                  round(r.lift, 10))
           for r in association_rules(df, "basket", "item",
                                      min_support=3).collect()}
    # supp: a=4, b=4, c=3, total=5; pair ab=3 (baskets 1,2,5)
    assert got[("a", "b")] == (3, round(3 / 4, 10), round(3 * 5 / 16, 10))
    assert got[("b", "a")] == (3, round(3 / 4, 10), round(3 * 5 / 16, 10))
    assert ("a", "c") not in got  # supp 2 < min_support 3


def test_pq_codes_partition_invariant_and_complete(spark, embeddings):
    from mura_spark.operators.clustering import pq_codes
    a = {(r.vec_id, r.code_0, r.code_1, r.qdist) for r in
         pq_codes(embeddings).collect()}
    b = {(r.vec_id, r.code_0, r.code_1, r.qdist) for r in
         pq_codes(embeddings.repartition(5)).collect()}
    assert a == b
    assert len(a) == embeddings.count()
    assert all(0 <= c0 < 8 and 0 <= c1 < 8 for _, c0, c1, _ in a)


# --------------------------------------------------- recursive BFS (5u)

def test_bfs_reach_chain_depths(spark, tmp_path):
    """Chain co-purchase graph A-B-C-D (via shared orders): min-depth
    from the lowest part must be exactly the chain distance, capped at
    3 hops."""
    rows = [(1, 10), (1, 20), (2, 20), (2, 30), (3, 30), (3, 40),
            (4, 40), (4, 50)]  # part 50 is 4 hops out -> excluded
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = str(tmp_path / "bfs")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet")
    from mura_spark.suite import SPARK_QUERIES
    got = {r["node"]: r["depth"] for r in
           SPARK_QUERIES["graph_bfs_reach"](spark, out).collect()}
    assert got == {10: 0, 20: 1, 30: 2, 40: 3}


def test_label_propagation_two_cliques(spark, tmp_path):
    """Two disjoint co-purchase cliques: every node must adopt its
    clique's smallest id within two deterministic rounds."""
    rows = ([(1, p) for p in (10, 11, 12)]       # order 1: clique A
            + [(2, p) for p in (10, 11, 12)]     # reinforce A
            + [(3, p) for p in (20, 21)])        # order 3: clique B
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = str(tmp_path / "lpa")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet")
    from mura_spark.suite import SPARK_QUERIES
    got = {r.community: r.n_nodes for r in
           SPARK_QUERIES["graph_label_propagation"](spark, out).collect()}
    assert got == {10: 3, 20: 2}


def test_bitmap_distinct_edge_ids(spark, tmp_path):
    """Bitmap distinct must equal COUNT DISTINCT including user_id 0
    and ids far beyond one 32k-bit bucket (bucket-number branch
    coverage)."""
    import datetime as dt
    base = dt.datetime(2024, 10, 1)
    ids = [0, 1, 2, 2, 32767, 32768, 32769, 10_000_000, 10_000_000]
    rows = [(i, base + dt.timedelta(minutes=i), uid, "view", 1.0, "{}")
            for i, uid in enumerate(ids)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = str(tmp_path / "bm")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/events.parquet")
    from mura_spark.suite import SPARK_QUERIES
    got = {r.event_type: r.n_users for r in
           SPARK_QUERIES["agg_bitmap_distinct"](spark, out).collect()}
    assert got == {"view": 7}
