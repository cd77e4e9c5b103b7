"""Similarity-search tests: exactness of brute force, recall of LSH, and
vector-function semantics."""

import math

import pytest
from pyspark.sql import functions as F

from mura_spark.functions import vectors as V
from mura_spark.operators import similarity


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [3.0, 4.0]), ([1.0, 0.0], [0.0, 2.0])], ["a", "b"])
    out = df.select(V.dot(F.col("a"), F.col("b")).alias("d"),
                    V.norm(F.col("a")).alias("na"),
                    V.cosine(F.col("a"), F.col("b")).alias("c"),
                    V.l2_distance(F.col("a"), F.col("b")).alias("l2")).collect()
    assert out[0].d == 25.0 and out[0].na == 5.0 and out[0].c == 1.0
    assert out[1].c == 0.0 and out[1].l2 == math.sqrt(5)


def test_cosine_clamped_and_zero_safe(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert df.select(V.cosine(F.col("a"), F.col("b")).alias("c")).first().c == 0.0


def test_bruteforce_topk_self_first(embeddings):
    q = (embeddings.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = similarity.topk_bruteforce(q, embeddings, 5)
    rows = out.collect()
    assert len(rows) == 15
    for r in rows:
        if r.rank == 1:
            assert r.neighbor_id == r.query_id and r.sim == 1.0
        assert 1 <= r.rank <= 5


def test_bruteforce_prereduces_before_global_window(embeddings):
    """The scale guard: the plan must contain the narrow per-partition
    top-k pre-reduction (MapInPandas) so the global per-query window never
    receives the full scored corpus."""
    q = (embeddings.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = similarity.topk_bruteforce(q, embeddings, 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert plan.index("MapInPandas") > plan.index("Window")  # child = below


def test_partial_topk_preserves_global_topk(spark):
    """Partition-local top-k then global window == plain global window,
    including sim ties (broken by ascending neighbor id), across an
    arbitrary partitioning of the scored rows."""
    from pyspark.sql.window import Window
    rows = [(qid, nid, float(sim))
            for qid in (1, 2)
            for nid, sim in [(7, 0.9), (3, 0.9), (5, 0.8), (1, 0.8),
                             (9, 0.7), (2, 0.6), (8, 0.5), (4, 0.5)]]
    scored = (spark.createDataFrame(rows, ["query_id", "neighbor_id", "sim"])
              .repartition(5))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))

    def ranked(df):
        return sorted((r.query_id, r.neighbor_id, r.rank, r.sim)
                      for r in df.withColumn("rank", F.row_number().over(w))
                                 .filter(F.col("rank") <= 3).collect())

    plain = ranked(scored)
    prereduced = ranked(similarity._partial_topk(scored, 3, "query_id"))
    assert prereduced == plain


def test_lsh_empty_queries_schema_matches_bruteforce(spark):
    """topk_lsh on an empty query set must return the same schema as
    topk_bruteforce would — including the corpus id type (string here)."""
    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], ["vec_id", "embedding"])
    queries = corpus.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), "embedding")
    empty = similarity.topk_lsh(queries, corpus, 3)
    assert empty.count() == 0
    nonempty = similarity.topk_bruteforce(
        corpus.limit(1).select(F.col("vec_id").alias("query_id"),
                               "embedding"), corpus, 3)
    assert [(f.name, f.dataType) for f in empty.schema.fields] == \
        [(f.name, f.dataType) for f in nonempty.schema.fields]


def test_lsh_recall_floor(embeddings):
    """Hyperplane LSH with 4 multi-probe bands must recover a decent share
    of the true top-5 (random 64-dim data is the hard case; planted-dup data
    does far better)."""
    q = (embeddings.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    bf = {(r.query_id, r.neighbor_id)
          for r in similarity.topk_bruteforce(q, embeddings, 5).collect()}
    ls = {(r.query_id, r.neighbor_id)
          for r in similarity.topk_lsh(q, embeddings, 5).collect()}
    assert len(bf & ls) / len(bf) >= 0.5
    # self-match always survives LSH (identical signature)
    assert all((i, i) in ls for i in range(10))


def test_embedding_dup_methods_agree_on_high_threshold(spark):
    """With planted exact/near duplicates, the LSH-blocked method finds the
    same pairs as the exact method (identical vectors share all bands)."""
    import random
    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, list(v)) for i, v in enumerate(base[:5])]  # exact dups
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r.id_a, r.id_b)
             for r in similarity.embedding_dup_pairs(df, 0.99,
                                                     method="exact").collect()}
    lsh = {(r.id_a, r.id_b)
           for r in similarity.embedding_dup_pairs(df, 0.99,
                                                   method="lsh").collect()}
    assert exact == {(i, 100 + i) for i in range(5)}
    assert lsh == exact


def test_lsh_proxy_shape_bit_identical_to_direct(spark):
    """embedding_dup_pairs switches to a proxy candidate-mining shape
    (ids+bands shuffled, vectors re-attached by id) above
    _PAIRS_PROXY_MIN_N. Same band_bits + flipped corpus_rows must give
    bit-identical pairs and sims — only the shuffle payload may differ."""
    import random
    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(30)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, list(v)) for i, v in enumerate(base[:8])]  # exact dups
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kw = dict(method="lsh", band_bits=4)
    direct = {(r.id_a, r.id_b): r.sim
              for r in similarity.embedding_dup_pairs(
                  df, 0.5, corpus_rows=len(rows), **kw).collect()}
    proxy = {(r.id_a, r.id_b): r.sim
             for r in similarity.embedding_dup_pairs(
                 df, 0.5,
                 corpus_rows=similarity._PAIRS_PROXY_MIN_N + 1,
                 **kw).collect()}
    assert len(direct) >= 8
    assert proxy == direct


def test_blocked_pairs_bit_identical_to_exact(embeddings):
    """The blocked applyInPandas path must reproduce the HOF 'exact' path
    bit-for-bit (same pairs, same sim doubles) — the property the oracle
    comparison relies on."""
    exact = {(r.id_a, r.id_b): r.sim
             for r in similarity.embedding_dup_pairs(
                 embeddings, 0.4, method="exact").collect()}
    blocked = {(r.id_a, r.id_b): r.sim
               for r in similarity.embedding_dup_pairs(
                   embeddings, 0.4, method="blocked").collect()}
    assert len(exact) > 0
    assert blocked == exact


def test_ivf_recall_floor(embeddings):
    """IVF with 16 lists / 4 probes must recover a decent share of the true
    top-5 and always find the self-match (it lives in the probed list)."""
    q = (embeddings.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    bf = {(r.query_id, r.neighbor_id)
          for r in similarity.topk_bruteforce(q, embeddings, 5).collect()}
    ivf = {(r.query_id, r.neighbor_id)
           for r in similarity.topk_ivf(q, embeddings, 5).collect()}
    assert len(bf & ivf) / len(bf) >= 0.5
    assert all((i, i) in ivf for i in range(10))


def test_ivf_lloyd_refinement_recall_and_degenerate_seed(spark, embeddings):
    """Lloyd-refined centroids keep the recall floor, and refinement
    survives empty clusters (identical seed vectors collapse every row
    into one cluster; the rest keep their previous centroid)."""
    q = (embeddings.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    bf = {(r.query_id, r.neighbor_id)
          for r in similarity.topk_bruteforce(q, embeddings, 5).collect()}
    ivf = {(r.query_id, r.neighbor_id)
           for r in similarity.topk_ivf(q, embeddings, 5,
                                        refine_iters=2).collect()}
    assert len(bf & ivf) / len(bf) >= 0.5
    # degenerate corpus: all vectors identical → one live cluster
    same = spark.createDataFrame([(i, [1.0, 0.0]) for i in range(6)],
                                 ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    qq = same.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.topk_ivf(qq, same, 3, n_centroids=4,
                              refine_iters=2).collect()
    assert len(out) == 3 and all(r.sim == 1.0 for r in out)


def test_label_centroids_exact_mean(spark):
    from mura_spark.operators.similarity import label_centroids
    rows = [(1, [1.0, 3.0], 0), (2, [3.0, 5.0], 0), (3, [10.0, -2.0], 1)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {(r.label, r.pos): (r.centroid, r.n)
           for r in label_centroids(df).collect()}
    assert got == {(0, 0): (2.0, 2), (0, 1): (4.0, 2),
                   (1, 0): (10.0, 1), (1, 1): (-2.0, 1)}


def test_knn_classify_majority_and_tiebreak(spark):
    from mura_spark.operators.similarity import knn_classify
    # train: two tight clusters on orthogonal axes
    train = [(10, [1.0, 0.0], 0), (11, [0.9, 0.1], 0), (12, [1.0, 0.05], 0),
             (13, [0.0, 1.0], 1), (14, [0.1, 0.9], 1)]
    test = [(1, [0.95, 0.02], 0), (2, [0.05, 1.0], 1)]
    tr = spark.createDataFrame(train, ["vec_id", "embedding", "label"])
    te = spark.createDataFrame(test, ["vec_id", "embedding", "label"])
    got = {r.query_id: (r.true_label, r.pred_label, r.votes)
           for r in knn_classify(te, tr, 3).collect()}
    assert got[1] == (0, 0, 3)
    assert got[2] == (1, 1, 2)  # 2 of the 3 nearest are cluster 1


# ------------------------------------------------- top principal component

def test_top_pc_aligns_with_eigensolver(spark):
    """3-round quantized power iteration must align with numpy's exact
    top eigenvector on data with a strong eigengap (cos > 0.999)."""
    import numpy as np
    from mura_spark.operators.pca import top_principal_component
    rng = np.random.RandomState(7)
    direction = np.array([0.8, -0.5, 0.3, 0.1])
    direction /= np.linalg.norm(direction)
    x = (rng.randn(400, 1) * 3.0) @ direction[None, :] \
        + rng.randn(400, 4) * 0.2
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>")
    out = top_principal_component(df, "embedding", dim=4, iterations=3)
    v = np.array([r["loading_micro"] for r in
                  out.orderBy("dim").collect()], dtype=np.float64) / 1e6
    # unit norm (micro-rounded) and sign convention: max-|loading| dim > 0
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    assert v[np.argmax(np.abs(v))] > 0
    xc = np.asarray(x, dtype=np.float64)
    cov = np.cov(xc, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    assert abs(float(np.dot(v, top)) / np.linalg.norm(v)) > 0.999


def test_top_pc_ignores_null_vectors(spark):
    import numpy as np
    from mura_spark.operators.pca import top_principal_component
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [2.0, 0.0]),
            (3, None), (4, [-2.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["dim"]: r["loading_micro"] for r in
           top_principal_component(df, "embedding", dim=2,
                                   iterations=3).collect()}
    # all variance on dim 0: loading = (1, 0) exactly, sign positive
    assert out[0] == 1000000
    assert out[1] == 0


def test_explained_variance_matches_eigensolver(spark):
    """EVR from the quantized Rayleigh quotient must track numpy's
    λ1/trace on strong-eigengap data (micro-level agreement is pinned
    cross-engine by the oracle; here we pin the statistics)."""
    import numpy as np
    from mura_spark.operators.pca import explained_variance
    rng = np.random.RandomState(11)
    direction = np.array([0.6, 0.64, -0.48, 0.0])
    x = (rng.randn(300, 1) * 4.0) @ direction[None, :] \
        + rng.randn(300, 4) * 0.3
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>")
    row = explained_variance(df, "embedding", dim=4,
                             iterations=3).collect()[0]
    cov = np.cov(np.asarray(x, np.float64), rowvar=False, bias=True)
    w, _ = np.linalg.eigh(cov)
    assert abs(row["lambda1_micro"] / 1e6 - w[-1]) < 0.01 * w[-1]
    assert abs(row["trace_micro"] / 1e6 - np.trace(cov)) < 1e-3
    want_evr = w[-1] / np.trace(cov)
    assert abs(row["evr_micro"] / 1e6 - want_evr) < 0.005


def test_pca_projection_recovers_generating_coefficient(spark):
    """Projection scores must correlate ~1 with the 1-D factor that
    generated the data (up to sign, which the convention pins)."""
    import numpy as np
    from mura_spark.operators.pca import project_top_pc
    rng = np.random.RandomState(3)
    direction = np.array([0.5, -0.5, 0.5, 0.5])
    coef = rng.randn(200) * 5.0
    x = coef[:, None] @ direction[None, :] + rng.randn(200, 4) * 0.1
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["pc1_micro"] / 1e6 for r in
           project_top_pc(df, "vec_id", "embedding", dim=4,
                          iterations=3).collect()}
    scores = np.array([got[i] for i in range(200)])
    centered = coef - coef.mean()
    corr = np.corrcoef(scores, centered)[0, 1]
    assert abs(corr) > 0.999
    # scores are mean-centered by construction
    assert abs(scores.mean()) < 0.01


def test_pca_family_degenerate_zero_variance(spark):
    """Zero-variance corpus: NULL loadings / NULL lambda with a valid
    zero trace / NULL projections — never a NaN-cast abort."""
    from mura_spark.operators.pca import (explained_variance,
                                          project_top_pc,
                                          top_principal_component)
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(5)]  # identical vectors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    load = top_principal_component(df, "embedding", dim=3,
                                   iterations=3).collect()
    assert len(load) == 3 and all(r.loading_micro is None for r in load)
    ev = explained_variance(df, "embedding", dim=3,
                            iterations=3).collect()[0]
    assert ev.lambda1_micro is None and ev.evr_micro is None
    assert ev.trace_micro == 0
    proj = project_top_pc(df, "vec_id", "embedding", dim=3,
                          iterations=3).collect()
    assert len(proj) == 5 and all(r.pc1_micro is None for r in proj)


def test_pca_empty_input(spark):
    from mura_spark.operators.pca import top_principal_component
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert top_principal_component(df, "embedding", dim=3,
                                   iterations=3).count() == 0


def test_abtt_residual_pythagoras_and_dominance(spark):
    """Vectors lying exactly on the dominant axis must have ~zero
    residual; off-axis vectors keep their perpendicular energy."""
    import numpy as np
    from mura_spark.operators.pca import abtt_residual
    rng = np.random.RandomState(5)
    on_axis = [(i, [float(c), 0.0, 0.0, 0.0])
               for i, c in enumerate(rng.randn(50) * 3.0)]
    off = [(100, [0.0, 2.0, 0.0, 0.0]), (101, [0.0, 0.0, -2.0, 0.0])]
    df = spark.createDataFrame(on_axis + off,
                               "vec_id long, embedding array<float>")
    got = {r.vec_id: r.resid2_micro / 1e6 for r in
           abtt_residual(df, "vec_id", "embedding", dim=4,
                         iterations=3).collect()}
    for i, _ in on_axis:
        assert got[i] < 0.2  # on the common axis: residual ~ mean-offset only
    # off-axis vectors keep ~ (2 - mean)^2 + ... > on-axis residuals
    assert got[100] > 3.0 and got[101] > 3.0
    assert all(v >= -1e-6 for v in got.values())  # PSD: never negative
