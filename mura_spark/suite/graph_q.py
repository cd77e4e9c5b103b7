"""Graph-analytics queries over a part co-purchase graph derived from
lineitem (north-star extension): edge derivation, degree statistics, and
an oracle-hashable deterministic PageRank.

The co-purchase graph is the standard recommendation/centrality substrate:
nodes are parts, with an edge between two parts whenever some order
contains both. Both queries run on the same derived edge list so the
oracle pins the edge derivation too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mura_spark.operators import graph
from mura_spark.suite.common import table

SPARK_QUERIES = {}
ORACLE_SQL = {}


def q(name, oracle=None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


_EDGES_CTE = ("edges AS (SELECT DISTINCT a.l_partkey AS src, "
              "b.l_partkey AS dst FROM lineitem a JOIN lineitem b "
              "ON a.l_orderkey = b.l_orderkey "
              "AND a.l_partkey <> b.l_partkey)")


def _copurchase_edges(spark, sf):
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")


@q("graph_copurchase_degree",
   f"WITH {_EDGES_CTE} "
   "SELECT src AS node, COUNT(*) AS out_degree FROM edges GROUP BY 1")
def graph_copurchase_degree(spark, sf):
    """Degree of every part in the co-purchase graph — one self-join on
    the order key to derive edges, one map-side-combined groupBy."""
    return graph.degrees(_copurchase_edges(spark, sf))


@q("graph_pagerank_parts", graph.sql_pagerank(f"{_EDGES_CTE}", 3))
def graph_pagerank_parts(spark, sf):
    """PageRank centrality (3 power iterations, d=0.85) over the part
    co-purchase graph. Deterministic across engines and partition orders:
    contributions round once to DECIMAL(38,18) before the exact decimal
    sum (operators.graph). Per iteration: one join + one groupBy, both
    keyed on node id — the scalable Pregel shuffle pattern with no
    driver-side state."""
    return graph.pagerank(_copurchase_edges(spark, sf), iterations=3)
