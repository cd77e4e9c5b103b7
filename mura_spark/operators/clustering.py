"""Distributed k-means over embedding columns, plus SemDeDup-style
cluster-blocked near-dup pruning (north-star extension; no counterpart in
the reference, which executes nothing —
/root/reference/src/planner/queryplanner.rs:88).

**Why integer k-means**: the suite's correctness gate hash-compares
results across Spark and DuckDB, and float k-means is doubly
non-deterministic (summation order inside distance folds, and argmin on
near-tie distances). This implementation quantizes components once to
1e-6 fixed point (``floor(x·1e6)`` — double multiply + floor is
IEEE-identical everywhere) and then runs ENTIRELY in integer arithmetic:
distances are exact BIGINT sums of squared diffs (max 64·(2e6)² ≈ 2.6e14,
no overflow), argmin ties break on centroid id, and centroid updates take
``floor(sum/count)`` back to the integer grid (the division runs in
double on the exact integer sum — identical rounding both engines). Every
iteration is a pure function of the previous one: bit-identical across
engines, partition orders, and retries, which is what lets an ITERATIVE
CLUSTERING algorithm sit in the driver's hash-checked window. The 1e-6
quantization error is far below embedding noise for cluster assignment.

Scale shape per iteration: the centroid table is k rows — it broadcasts
to the assignment join (never shuffling the corpus), and the update is
one (cluster, dimension)-keyed groupBy whose input is corpus×1 rows after
posexplode (corpus×dim component rows, the same explode the centroid/
IVF operators use). Initialization is the k lowest-id vectors (KMeans#
is deliberately NOT random — reproducibility is the feature; callers
wanting k-means++ should pass pre-chosen ``init`` ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: fixed-point grid for vector components (1e-6 resolution)
SCALE = 1_000_000.0


def quantize_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, v: array<bigint>) — components on the 1e-6 integer grid."""
    return df.select(
        F.col(id_col).alias("__vid"),
        F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * F.lit(SCALE)))
         .alias("__v"))


def _sqdist(a, b):
    """Exact integer squared L2 distance between two array<bigint>."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("bigint"), lambda acc, d: acc + d)


def kmeans_assign(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding", k: int = 8,
                  iterations: int = 2) -> DataFrame:
    """Deterministic k-means: assignments after ``iterations`` rounds of
    Lloyd's algorithm from the k-lowest-id initialization.
    Output: (id_col, cluster: int, dist: bigint — squared fixed-point L2
    to the final centroid). Clusters that lose all members simply drop
    out of later rounds (both engines agree: the assignment is an inner
    join against the surviving centroid set).
    """
    q = quantize_vectors(df, id_col, vec_col)
    centroids = (q.orderBy("__vid").limit(k)
                  .select(F.row_number().over(Window.orderBy("__vid"))
                          .alias("__rn"), "__v")
                  .select((F.col("__rn") - 1).cast("int").alias("cluster"),
                          F.col("__v").alias("__c")))
    for it in range(iterations):
        scored = (q.join(F.broadcast(centroids))
                    .select("__vid", "cluster",
                            _sqdist(F.col("__v"), F.col("__c"))
                            .alias("__d")))
        assign = (scored.groupBy("__vid")
                        .agg(F.min(F.struct("__d", "cluster"))
                              .alias("__best"))
                        .select("__vid",
                                F.col("__best.cluster").alias("cluster"),
                                F.col("__best.__d").alias("dist")))
        if it == iterations - 1:
            return assign.select(F.col("__vid").alias(id_col),
                                 "cluster", "dist")
        comp = (assign.join(q, "__vid")
                      .select("cluster", F.posexplode("__v")
                              .alias("pos", "x")))
        upd = (comp.groupBy("cluster", "pos")
                   .agg(F.floor(F.sum("x").cast("double")
                                / F.count(F.lit(1))).alias("c")))
        centroids = (upd.groupBy("cluster")
                        .agg(F.transform(
                                F.array_sort(F.collect_list(
                                    F.struct("pos", "c"))),
                                lambda s: s["c"]).alias("__c")))
    raise AssertionError("unreachable")  # pragma: no cover


def sql_kmeans(k: int = 8, iterations: int = 2,
               table: str = "embeddings", id_col: str = "vec_id",
               vec_col: str = "embedding") -> str:
    """DuckDB rendering of :func:`kmeans_assign`, iterations unrolled as
    chained CTEs — keep in lockstep with the Spark form."""
    dist = ("CAST(list_sum(list_transform(list_zip(q.v, c.v), "
            "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)")
    parts = [
        f"q AS (SELECT {id_col} AS vid, "
        f"list_transform(CAST({vec_col} AS DOUBLE[]), "
        f"x -> CAST(floor(x * {SCALE}) AS BIGINT)) AS v FROM {table})",
        f"c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS INT) "
        f"AS cluster, v FROM (SELECT vid, v FROM q ORDER BY vid "
        f"LIMIT {k}))",
    ]
    prev = "c0"
    for i in range(1, iterations + 1):
        parts.append(
            f"s{i} AS (SELECT q.vid, c.cluster, {dist} AS d "
            f"FROM q CROSS JOIN {prev} c)")
        parts.append(
            f"a{i} AS (SELECT vid, cluster, d FROM (SELECT vid, cluster, "
            f"d, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d, cluster) "
            f"AS rn FROM s{i}) WHERE rn = 1)")
        if i == iterations:
            break
        parts.append(
            f"e{i} AS (SELECT a.cluster, "
            f"unnest(list_zip(q.v, range(0, len(q.v)))) AS z "
            f"FROM a{i} a JOIN q ON a.vid = q.vid)")
        parts.append(
            f"u{i} AS (SELECT cluster, CAST(z[2] AS INT) AS pos, "
            f"CAST(floor(CAST(SUM(z[1]) AS DOUBLE) / COUNT(*)) AS BIGINT) "
            f"AS c FROM e{i} GROUP BY 1, 2)")
        parts.append(
            f"c{i} AS (SELECT cluster, list(c ORDER BY pos) AS v "
            f"FROM u{i} GROUP BY cluster)")
        prev = f"c{i}"
    return ("WITH " + ", ".join(parts)
            + f" SELECT vid AS {id_col}, cluster, d AS dist "
            f"FROM a{iterations}")


def semantic_blocked_pairs(df: DataFrame, id_col: str, vec_col: str,
                           threshold: float, k: int = 8,
                           iterations: int = 2) -> DataFrame:
    """SemDeDup-style near-dup mining: k-means-cluster the corpus, then
    run the exact cosine pair join ONLY within clusters — near-dups
    almost always co-cluster, so the quadratic verify shrinks from n² to
    Σ|cluster|². Approximate by construction (cross-cluster pairs are
    unseen); recall against the exact join is pinned in pytest, not
    oracle-hashed. Output: (id_a, id_b, sim).
    """
    from mura_spark.functions.vectors import cosine
    assign = kmeans_assign(df, id_col, vec_col, k, iterations)
    tagged = df.join(assign.select(F.col(id_col), "cluster"), id_col)
    a = tagged.select(F.col("cluster"),
                      F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("__va"))
    b = tagged.select(F.col("cluster"),
                      F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("__vb"))
    return (a.join(b, "cluster")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     cosine(F.col("__va"), F.col("__vb")).alias("sim"))
             .filter(F.col("sim") >= threshold))
