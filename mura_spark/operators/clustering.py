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
    """(id, v: array<bigint>) — components on the 1e-6 integer grid.

    NULL vectors are dropped at this ingress: a null embedding has no
    geometry to cluster or score, and letting it through would seat it
    in the codebook (k-lowest-id init) or rank its NULL distances at
    engine-dependent window positions (Spark orders NULLS FIRST asc,
    DuckDB NULLS LAST). Mirrored by the WHERE in sql_kmeans_ctes."""
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__vid"),
        F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * F.lit(SCALE)))
         .alias("__v"))


def _sqdist(a, b):
    """Exact integer squared L2 distance between two array<bigint>."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("bigint"), lambda acc, d: acc + d)


def kmeans_scored(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding", k: int = 8,
                  iterations: int = 2,
                  centroids: DataFrame | None = None) -> DataFrame:
    """The final-round point×centroid distance frame ``(__vid,
    cluster, __d)`` — every surviving centroid's exact fixed-point
    squared L2 per vector (k rows per point). :func:`kmeans_assign` is
    its per-point argmin; silhouette-style diagnostics need the full
    frame (nearest AND second-nearest). Mirrors the ``s{N}`` CTE of
    :func:`sql_kmeans_ctes`.

    Pass ``centroids`` (a :func:`kmeans_centroids` table) to score
    against an already-trained codebook instead of re-running Lloyd —
    the PQ encoder needs both the assignment and the codebook, and
    k-means being deterministic makes the reuse exact, not approximate.
    """
    q = quantize_vectors(df, id_col, vec_col)
    if centroids is None:
        centroids = kmeans_centroids(df, id_col, vec_col, k, iterations)
    return (q.join(F.broadcast(centroids))
             .select("__vid", "cluster",
                     _sqdist(F.col("__v"), F.col("__c")).alias("__d")))


def kmeans_centroids(df: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding", k: int = 8,
                     iterations: int = 2) -> DataFrame:
    """The centroid table the FINAL scoring round of
    :func:`kmeans_assign` uses — ``(cluster, __c: array<bigint>)`` on
    the 1e-6 integer grid (mirrors the ``c{N-1}`` CTE of
    :func:`sql_kmeans_ctes`). Needed by codebook consumers
    (PQ asymmetric-distance scoring) that must reproduce assignment
    distances exactly."""
    q = quantize_vectors(df, id_col, vec_col)
    centroids = (q.orderBy("__vid").limit(k)
                  .select(F.row_number().over(Window.orderBy("__vid"))
                          .alias("__rn"), "__v")
                  .select((F.col("__rn") - 1).cast("int").alias("cluster"),
                          F.col("__v").alias("__c")))
    for it in range(iterations - 1):
        scored = (q.join(F.broadcast(centroids))
                    .select("__vid", "cluster",
                            _sqdist(F.col("__v"), F.col("__c"))
                            .alias("__d")))
        assign = (scored.groupBy("__vid")
                        .agg(F.min(F.struct("__d", "cluster"))
                              .alias("__best"))
                        .select("__vid",
                                F.col("__best.cluster").alias("cluster")))
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
    return centroids


def kmeans_assign(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding", k: int = 8,
                  iterations: int = 2,
                  centroids: DataFrame | None = None) -> DataFrame:
    """Deterministic k-means: assignments after ``iterations`` rounds of
    Lloyd's algorithm from the k-lowest-id initialization.
    Output: (id_col, cluster: int, dist: bigint — squared fixed-point L2
    to the final centroid). Clusters that lose all members simply drop
    out of later rounds (both engines agree: the assignment is an inner
    join against the surviving centroid set). ``centroids`` as in
    :func:`kmeans_scored` — assign against a pre-trained codebook.
    """
    scored = kmeans_scored(df, id_col, vec_col, k, iterations, centroids)
    return (scored.groupBy("__vid")
                  .agg(F.min(F.struct("__d", "cluster")).alias("__best"))
                  .select(F.col("__vid").alias(id_col),
                          F.col("__best.cluster").alias("cluster"),
                          F.col("__best.__d").alias("dist")))


def kmeans_silhouette(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", k: int = 8,
                      iterations: int = 2) -> DataFrame:
    """Per-cluster simplified (centroid-based) silhouette: s_i =
    (b−a)/max(a,b) with a = Euclidean distance to the OWN final
    centroid and b = distance to the nearest OTHER centroid — the
    O(n·k) clustering-quality score (the classic O(n²) silhouette's
    standard large-scale surrogate). Output: ``(cluster, n_points,
    mean_silhouette_micro)``.

    Deterministic: distances are exact integer squared-L2 on the 1e-6
    grid; sqrt and the (b−a)/max(a,b) ratio are one per-row
    correctly-rounded double expression, micro-floored BEFORE the mean
    (an exact integer sum, one terminal division per cluster).
    """
    scored = kmeans_scored(df, id_col, vec_col, k, iterations)
    wv = Window.partitionBy("__vid").orderBy("__d", "cluster")
    a = (scored.withColumn("__rn", F.row_number().over(wv))
               .filter(F.col("__rn") == 1)
               .select("__vid", F.col("cluster").alias("__ca"),
                       F.col("__d").alias("__da")))
    b = (scored.join(a, "__vid")
               .filter(F.col("cluster") != F.col("__ca"))
               .groupBy("__vid").agg(F.min("__d").alias("__db")))
    da = F.sqrt(F.col("__da").cast("double"))
    db = F.sqrt(F.col("__db").cast("double"))
    mx = F.greatest(da, db)
    sm = (F.when(mx > 0,
                 F.floor((db - da) / mx * F.lit(1000000.0) + F.lit(0.5))
                  .cast("bigint"))
           .otherwise(F.lit(0).cast("bigint")))
    return (a.join(b, "__vid")
             .select(F.col("__ca").alias("cluster"), sm.alias("__sm"))
             .groupBy("cluster")
             .agg(F.count(F.lit(1)).alias("n_points"),
                  F.floor(F.sum("__sm").cast("double")
                          / F.count(F.lit(1)) + F.lit(0.5))
                   .cast("bigint").alias("mean_silhouette_micro")))


def sql_kmeans_ctes(k: int = 8, iterations: int = 2,
                    table: str = "embeddings", id_col: str = "vec_id",
                    vec_expr: str = "embedding",
                    prefix: str = "") -> tuple[list[str], str]:
    """CTE blocks for one DuckDB k-means run over ``vec_expr`` (any
    list-typed SQL expression over ``table``). Returns (cte_list,
    final_assignment_relation) — the final relation has columns
    (vid, cluster, d). ``prefix`` namespaces the CTEs so several runs
    (e.g. product-quantization sub-spaces) compose in one query."""
    p = prefix
    dist = ("CAST(list_sum(list_transform(list_zip(q.v, c.v), "
            "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)")
    parts = [
        f"{p}q AS (SELECT {id_col} AS vid, "
        f"list_transform(CAST({vec_expr} AS DOUBLE[]), "
        f"x -> CAST(floor(x * {SCALE}) AS BIGINT)) AS v FROM {table} "
        f"WHERE {vec_expr} IS NOT NULL)",
        f"{p}c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 "
        f"AS INT) AS cluster, v FROM (SELECT vid, v FROM {p}q "
        f"ORDER BY vid LIMIT {k}))",
    ]
    prev = f"{p}c0"
    for i in range(1, iterations + 1):
        parts.append(
            f"{p}s{i} AS (SELECT q.vid, c.cluster, {dist} AS d "
            f"FROM {p}q q CROSS JOIN {prev} c)")
        parts.append(
            f"{p}a{i} AS (SELECT vid, cluster, d FROM (SELECT vid, "
            f"cluster, d, ROW_NUMBER() OVER (PARTITION BY vid "
            f"ORDER BY d, cluster) AS rn FROM {p}s{i}) WHERE rn = 1)")
        if i == iterations:
            break
        parts.append(
            f"{p}e{i} AS (SELECT a.cluster, "
            f"unnest(list_zip(q.v, range(0, len(q.v)))) AS z "
            f"FROM {p}a{i} a JOIN {p}q q ON a.vid = q.vid)")
        parts.append(
            f"{p}u{i} AS (SELECT cluster, CAST(z[2] AS INT) AS pos, "
            f"CAST(floor(CAST(SUM(z[1]) AS DOUBLE) / COUNT(*)) AS BIGINT) "
            f"AS c FROM {p}e{i} GROUP BY 1, 2)")
        parts.append(
            f"{p}c{i} AS (SELECT cluster, list(c ORDER BY pos) AS v "
            f"FROM {p}u{i} GROUP BY cluster)")
        prev = f"{p}c{i}"
    return parts, f"{p}a{iterations}"


def sql_kmeans(k: int = 8, iterations: int = 2,
               table: str = "embeddings", id_col: str = "vec_id",
               vec_col: str = "embedding") -> str:
    """DuckDB rendering of :func:`kmeans_assign`, iterations unrolled as
    chained CTEs — keep in lockstep with the Spark form."""
    parts, final = sql_kmeans_ctes(k, iterations, table, id_col, vec_col)
    return ("WITH " + ", ".join(parts)
            + f" SELECT vid AS {id_col}, cluster, d AS dist FROM {final}")


def pq_codes(df: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", n_subspaces: int = 2,
             dim: int = 64, k: int = 8,
             iterations: int = 2) -> DataFrame:
    """Product-quantization encoding: split each vector into
    ``n_subspaces`` contiguous sub-vectors, train an independent
    deterministic k-means codebook per sub-space (:func:`kmeans_assign`),
    and emit each vector's code word per sub-space plus the total
    quantization distortion. Output:
    (id, code_0..code_{m-1}: int, qdist: bigint).

    PQ is the standard memory-compression layer under large-scale ANN
    (Jégou et al., TPAMI'11 — public literature): m codes of log2(k)
    bits replace the full vector in the index. Because the codebooks
    come from the integer k-means, the whole encoder is deterministic
    and oracle-hashable — unusual for PQ, and exactly what a
    reproducible data pipeline wants. Each sub-space trains
    independently: m broadcast-join pipelines over the same scan,
    joined back on the id at the end (m is tiny; the joins are
    id-keyed hash joins on assignment-sized tables).
    """
    if dim % n_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces}")
    width = dim // n_subspaces
    out = None
    dist_total = None
    for s in range(n_subspaces):
        sliced = df.select(F.col(id_col),
                           F.slice(F.col(vec_col), s * width + 1, width)
                            .alias("__sub"))
        assign = (kmeans_assign(sliced, id_col, "__sub", k, iterations)
                  .select(F.col(id_col),
                          F.col("cluster").alias(f"code_{s}"),
                          F.col("dist").alias(f"__d{s}")))
        out = assign if out is None else out.join(assign, id_col)
        d = F.col(f"__d{s}")
        dist_total = d if dist_total is None else dist_total + d
    return out.select(id_col, *[f"code_{s}" for s in range(n_subspaces)],
                      dist_total.alias("qdist"))


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


def pq_topk_adc(queries: DataFrame, corpus: DataFrame, k: int,
                query_id: str = "query_id", corpus_id: str = "vec_id",
                vec_col: str = "embedding", n_subspaces: int = 2,
                dim: int = 64, n_codes: int = 8,
                iterations: int = 2) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC):
    corpus vectors are represented ONLY by their PQ codes; each query
    scores a corpus row as the sum over sub-spaces of the exact distance
    from the query sub-vector to the row's assigned centroid.
    Output: (query_id, neighbor_id, rank, adist) — approximate by
    construction (recall vs exact top-k pinned in pytest).

    The scale shape is what makes PQ the standard billion-vector layer:
    after encoding, the corpus never ships vectors again. The per-query
    lookup table (queries × sub-spaces × codes partial distances — tiny:
    |Q|·m·k rows) broadcasts, corpus codes stream through m equi-joins
    on (subspace, code), and the ranking reuses the per-partition
    partial-top-k reduction so the window shuffle moves O(partitions·k)
    rows. Codebooks come from the deterministic k-means, so the whole
    index is reproducible build-to-build.
    """
    if dim % n_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces}")
    width = dim // n_subspaces

    # --- train codebooks + encode the corpus (per sub-space) ---
    luts = []     # per-subspace: (code, centroid array) for LUT build
    codes = None  # corpus: (corpus_id, subspace, code)
    for s in range(n_subspaces):
        sliced = corpus.select(F.col(corpus_id),
                               F.slice(F.col(vec_col), s * width + 1, width)
                                .alias("__sub"))
        # the LUT must hold the c_{N-1} CODEBOOK the assignment scores
        # against — NOT the mean of the final assignment's members,
        # which is one extra Lloyd update: a row's code is the argmin
        # under c_{N-1}, so measuring adist to c_N would score rows
        # against centroids they were never assigned to. Training runs
        # ONCE per sub-space; the assignment reuses the codebook.
        codebook = kmeans_centroids(sliced, corpus_id, "__sub", n_codes,
                                    iterations)
        assign = kmeans_assign(sliced, corpus_id, "__sub", n_codes,
                               iterations, centroids=codebook)
        part = assign.select(F.col(corpus_id).alias("neighbor_id"),
                             F.lit(s).alias("__ss"),
                             F.col("cluster").alias("__code"))
        codes = part if codes is None else codes.unionAll(part)
        luts.append(codebook.select(F.lit(s).alias("__ss"), "cluster",
                                    F.col("__c").alias("__cvec")))
    centroids = luts[0]
    for more in luts[1:]:
        centroids = centroids.unionAll(more)

    # --- per-query LUT: partial distance to every (subspace, code) ---
    qslices = None
    for s in range(n_subspaces):
        qs = quantize_vectors(
            queries.select(F.col(query_id),
                           F.slice(F.col(vec_col), s * width + 1, width)
                            .alias("__sub")),
            query_id, "__sub").select(F.col("__vid").alias(query_id),
                                      F.lit(s).alias("__ss"),
                                      F.col("__v").alias("__qv"))
        qslices = qs if qslices is None else qslices.unionAll(qs)
    lut = (qslices.join(F.broadcast(centroids), "__ss")
                  .select(query_id, "__ss",
                          F.col("cluster").alias("__code"),
                          _sqdist(F.col("__qv"), F.col("__cvec"))
                          .alias("__pd")))

    # --- score: corpus codes × broadcast LUT, sum partials, rank ---
    # (the groupBy's map-side combine is the pre-reduction here; an
    # ascending analogue of similarity._partial_topk below the window is
    # the next win if the query batch ever grows large)
    scored = (codes.join(F.broadcast(lut), ["__ss", "__code"])
                   .groupBy(query_id, "neighbor_id")
                   .agg(F.sum("__pd").alias("adist")))
    w = Window.partitionBy(query_id).orderBy(F.col("adist").asc(),
                                             F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id, "neighbor_id", "rank", "adist"))
