"""Similarity-search queries over the embeddings table (north-star
extension): brute-force cosine top-k with a DuckDB oracle; the LSH ANN path
is approximate by design and is recall-tested in pytest instead (the driver
records it as a rows-only check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mura_spark.operators import similarity
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


_K = 10
_NQ = 10  # query vectors: vec_id < 10

_COS = ("list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
        "CAST(c.embedding AS DOUBLE[]))")


@q("ann_topk_bruteforce",
   f"SELECT query_id, neighbor_id, rnk AS rank, sim FROM ("
   f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS sim, "
   f"ROW_NUMBER() OVER (PARTITION BY q.vec_id "
   f"ORDER BY {_COS} DESC, c.vec_id ASC) AS rnk "
   f"FROM embeddings q JOIN embeddings c ON q.vec_id < {_NQ}) "
   f"WHERE rnk <= {_K}")
def ann_topk_bruteforce(spark, sf):
    """Exact cosine top-10 for 10 probe vectors against the full corpus.
    Broadcast probe side; corpus streamed once."""
    e = table(spark, sf, "embeddings")
    queries = (e.filter(F.col("vec_id") < _NQ)
                .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.topk_bruteforce(queries, e, _K)


@q("ann_topk_lsh")  # approximate — rows-only check; recall pinned in pytest
def ann_topk_lsh(spark, sf):
    e = table(spark, sf, "embeddings")
    queries = (e.filter(F.col("vec_id") < _NQ)
                .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.topk_lsh(queries, e, _K)


@q("ann_topk_ivf")  # approximate — rows-only check; recall pinned in pytest
def ann_topk_ivf(spark, sf):
    e = table(spark, sf, "embeddings")
    queries = (e.filter(F.col("vec_id") < _NQ)
                .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.topk_ivf(queries, e, _K)
