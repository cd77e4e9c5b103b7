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


@q("graph_assoc_rules",
   "WITH base AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i "
   "FROM lineitem), "
   "supp AS (SELECT i, COUNT(*) AS s FROM base GROUP BY 1), "
   "pairs AS (SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS supp_pair "
   "FROM base a JOIN base b ON a.g = b.g AND a.i <> b.i "
   "GROUP BY 1, 2 HAVING COUNT(*) >= 3), "
   "tot AS (SELECT COUNT(DISTINCT g) AS total FROM base) "
   "SELECT item_a, item_b, supp_pair, "
   "CAST(supp_pair AS DOUBLE) / sa.s AS confidence, "
   "CAST(supp_pair AS DOUBLE) * tot.total / sa.s / sb.s AS lift "
   "FROM pairs, tot "
   "JOIN supp sa ON pairs.item_a = sa.i "
   "JOIN supp sb ON pairs.item_b = sb.i")
def graph_assoc_rules(spark, sf):
    """Market-basket association rules (confidence + lift) over order
    baskets, min pair-support 3 (operators.graph.association_rules) —
    bounded-fanout basket self-join, broadcast item supports, exact
    integer counts with deterministic ratio arithmetic."""
    from mura_spark.operators.graph import association_rules
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return (association_rules(li, "l_orderkey", "l_partkey", min_support=3)
            .withColumnRenamed("item_a", "item_a"))
