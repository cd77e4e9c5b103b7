"""Semantic tests for the round-5g analytics operators (BM25, RRF,
triangle counting, exact-moment correlation, diversity/divergence) on
hand-built inputs with independently computable answers. Cross-engine
value equality is pinned separately by the oracle sweep."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ BM25

def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Sequential BM25 (id -> score_micro) mirroring the operator's
    quantize-then-sum contract."""
    toks = {i: t.lower().split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    out = {}
    for i, t in toks.items():
        s = 0
        for q in sorted(set(terms)):
            tf = t.count(q)
            if not tf or not df[q]:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            val = (idf * tf * (k1 + 1.0)
                   / (tf + k1 * ((1.0 - b) + b * len(t) / avgdl)))
            s += math.floor(val * 1e6 + 0.5)
        if s:
            out[i] = s
    return out


def test_bm25_matches_sequential_reference(spark):
    from mura_spark.operators.search import bm25_topk
    docs = {
        1: "spark shuffle join hash join",
        2: "join once",
        3: "hash hash hash hash hash table",
        4: "nothing relevant here at all",
        5: "join hash join hash",
    }
    df = spark.createDataFrame([(i, t) for i, t in docs.items()],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["score_micro"]
           for r in bm25_topk(df, "doc_id", "text",
                              ["join", "hash"], k=10).collect()}
    assert got == _bm25_ref(docs, ["join", "hash"])


def test_bm25_rank_is_dense_and_tiebroken(spark):
    from mura_spark.operators.search import bm25_topk
    df = spark.createDataFrame(
        [(i, "same words every time") for i in range(8)],
        "doc_id long, text string")
    rows = bm25_topk(df, "doc_id", "text", ["same"], k=5).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # identical scores -> id ascending decides
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 4]


def test_bm25_rejects_bad_args(spark):
    from mura_spark.operators.search import bm25_topk
    df = spark.range(1).select(F.col("id").alias("doc_id"),
                               F.lit("x").alias("text"))
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [], k=3)
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ["x"], k=0)


# ------------------------------------------------------------------- RRF

def test_rrf_rewards_agreement(spark):
    from mura_spark.operators.search import rrf_fuse
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (10, 2), (99, 3)],
                              "doc_id long, rank int")
    rows = rrf_fuse([a, b], "doc_id", k=4).collect()
    got = {r["doc_id"]: (r["rrf_micro"], r["rank"]) for r in rows}
    c = lambda rk: math.floor(1e6 / (60.0 + rk) + 0.5)  # noqa: E731
    assert got[10][0] == c(1) + c(2)
    assert got[20][0] == c(2) + c(1)
    assert got[30][0] == c(3)  # absent from b contributes nothing
    # 10 and 20 tie exactly -> id tiebreak; both above single-list docs
    assert got[10][1] == 1 and got[20][1] == 2


# ------------------------------------------------------- triangle counting

def _tri(spark, edges):
    from mura_spark.operators.graph import triangle_counts
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["n_triangles"]
            for r in triangle_counts(df).collect()}


def test_triangles_k4_and_square(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert _tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert _tri(spark, square) == {}


def test_triangles_hub_star_plus_one_closure(spark):
    # star around 0 (no triangles) + one closing edge 1-2 (one triangle)
    star = [(0, i) for i in range(1, 30)]
    assert _tri(spark, star + [(1, 2)]) == {0: 1, 1: 1, 2: 1}


def test_triangles_direction_and_duplicate_invariant(spark):
    # same triangle presented with mixed directions and duplicates
    e = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (0, 2)]
    assert _tri(spark, e) == {0: 1, 1: 1, 2: 1}


# ------------------------------------------------------------- correlation

def test_corr_pairs_matches_numpy(spark):
    import numpy as np
    from mura_spark.operators.profile import corr_pairs
    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(0, 100, 500), 2)
    y = np.round(x * 0.5 + rng.uniform(0, 10, 500), 2)
    z = np.round(rng.uniform(0, 100, 500), 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    got = {(r["col_x"], r["col_y"]): r["corr_micro"]
           for r in corr_pairs(df, ["x", "y", "z"]).collect()}
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    for (a, b), micro in got.items():
        ref = np.corrcoef({"x": x, "y": y, "z": z}[a],
                          {"x": x, "y": y, "z": z}[b])[0, 1]
        assert abs(micro / 1e6 - ref) < 2e-6, (a, b)
    assert got[("x", "y")] > 900_000  # strongly correlated by construction


def test_corr_pairs_perfect_and_anti(spark):
    from mura_spark.operators.profile import corr_pairs
    rows = [(float(i), float(2 * i), float(-3 * i)) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r["col_x"], r["col_y"]): r["corr_micro"]
           for r in corr_pairs(df, ["a", "b", "c"]).collect()}
    assert got[("a", "b")] == 1_000_000
    assert got[("a", "c")] == -1_000_000


# ------------------------------------------------------ diversity / TVD

def test_simpson_extremes(spark):
    from mura_spark.operators.corpus import simpson_diversity
    df = spark.createDataFrame(
        [("mono", "aaa aaa aaa aaa"),
         ("uni", "a b c d")],
        "grp string, text string")
    got = {r["grp"]: (r["n_tokens"], r["simpson_micro"])
           for r in simpson_diversity(df, "grp", "text").collect()}
    assert got["mono"] == (4, 0)           # one token type -> diversity 0
    assert got["uni"] == (4, 750_000)      # 1 - 4*(1/4)^2 = 0.75


def test_tvd_identical_and_disjoint(spark):
    from mura_spark.operators.corpus import total_variation
    # two groups with identical distributions -> each at TVD 0 from corpus
    df = spark.createDataFrame(
        [("g1", "a a b"), ("g2", "a a b")], "grp string, text string")
    got = {r["grp"]: r["tvd_micro"]
           for r in total_variation(df, "grp", "text").collect()}
    assert got == {"g1": 0, "g2": 0}
    # disjoint vocabularies, equal sizes: p_g puts 1 on own half, corpus
    # splits 1/2 each -> TVD = 1/2
    df2 = spark.createDataFrame(
        [("g1", "a a a a"), ("g2", "b b b b")], "grp string, text string")
    got2 = {r["grp"]: r["tvd_micro"]
            for r in total_variation(df2, "grp", "text").collect()}
    assert got2 == {"g1": 500_000, "g2": 500_000}


# ------------------------------------------------------------ grouped OLS

def test_group_ols_exact_line_and_degenerate(spark):
    from mura_spark.operators.stats import group_ols
    rows = ([("lin", x, 3.0 * x + 2.0) for x in range(10)]
            + [("flat", 5, float(v)) for v in (1, 2, 3)])
    df = spark.createDataFrame(rows, "g string, x int, y double")
    got = {r["g"]: (r["n"], r["slope_micro"], r["intercept_micro"])
           for r in group_ols(df, ["g"], "x", "y").collect()}
    assert got["lin"] == (10, 3_000_000, 2_000_000)
    # zero x-variance -> NULL slope/intercept, not a division blowup
    assert got["flat"] == (3, None, None)


def test_group_ols_matches_numpy(spark):
    import numpy as np
    from mura_spark.operators.stats import group_ols
    rng = np.random.RandomState(3)
    x = rng.randint(0, 24, 400)
    y = 1.7 * x + rng.uniform(-5, 5, 400)
    df = spark.createDataFrame(
        [("g", int(a), float(b)) for a, b in zip(x, y)],
        "g string, x int, y double")
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(r["slope_micro"] / 1e6 - slope) < 1e-4
    assert abs(r["intercept_micro"] / 1e6 - intercept) < 1e-4


# ------------------------------------------------------------- chi-square

def test_chi2_hand_computed_2x2(spark):
    from mura_spark.operators.stats import chi2_contingency
    # contingency: a/x=30 a/y=10, b/x=20 b/y=40 (N=100)
    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 20 + [("b", "y")] * 40)
    df = spark.createDataFrame(rows, "r string, c string")
    got = {(r["r"], r["c"]): (r["observed"], r["expected_micro"],
                              r["chi2_micro"])
           for r in chi2_contingency(df, "r", "c").collect()}
    # E(a,x) = 40*50/100 = 20; contrib = (30-20)^2/20 = 5
    assert got[("a", "x")] == (30, 20_000_000, 5_000_000)
    assert got[("b", "y")][0] == 40
    # grand statistic: sum of contribs = 5+5+3.333..+3.333..
    grand = sum(v[2] for v in got.values())
    assert abs(grand / 1e6 - (5 + 5 + 10 / 3 + 10 / 3)) < 1e-5


# -------------------------------------------------------- centroid cosine

def test_centroid_cosine_aligned_and_orthogonal(spark):
    from mura_spark.operators.similarity import centroid_cosine
    rows = [(1, 0, [1.0, 0.0]), (2, 0, [2.0, 0.0]),   # label 0 -> (1.5, 0)
            (3, 1, [3.0, 0.0]),                        # label 1 -> (3, 0)
            (4, 2, [0.0, 4.0])]                        # label 2 -> (0, 4)
    df = spark.createDataFrame(rows,
                               "vec_id long, label int, embedding array<double>")
    got = {(r["label_a"], r["label_b"]): r["cos_micro"]
           for r in centroid_cosine(df).collect()}
    assert got[(0, 1)] == 1_000_000   # parallel centroids
    assert got[(0, 2)] == 0           # orthogonal
    assert got[(1, 2)] == 0


# ------------------------------------------------------------ path mining

def test_path_ngrams_counts_and_bounds(spark):
    from mura_spark.operators.funnel import path_ngrams
    import pytest as _pt
    seq = ["a", "b", "c", "a", "b", "c", "a"]
    rows = [(1, i, seq[i]) for i in range(len(seq))]
    df = spark.createDataFrame(rows, "u long, t long, e string")
    got = {r["path"]: r["n_paths"]
           for r in path_ngrams(df, "u", ["t"], "e", n=3, k=10).collect()}
    assert got == {"a>b>c": 2, "b>c>a": 2, "c>a>b": 1}
    with _pt.raises(ValueError):
        path_ngrams(df, "u", ["t"], "e", n=1)


def test_path_ngrams_never_crosses_users(spark):
    from mura_spark.operators.funnel import path_ngrams
    rows = [(1, 0, "a"), (1, 1, "b"), (2, 2, "c"), (2, 3, "d")]
    df = spark.createDataFrame(rows, "u long, t long, e string")
    got = path_ngrams(df, "u", ["t"], "e", n=2, k=10).collect()
    assert {r["path"] for r in got} == {"a>b", "c>d"}


# ----------------------------------------------------- quantile normalize

def test_quantile_normalize_ranks(spark):
    from mura_spark.operators.profile import quantile_normalize
    rows = [(1, "s", 10.0), (2, "s", 20.0), (3, "s", 30.0),
            (4, "t", 5.0)]
    df = spark.createDataFrame(rows, "id long, src string, v double")
    got = {r["id"]: r["pr_micro"]
           for r in quantile_normalize(df, "src", "v", "id").collect()}
    assert got == {1: 0, 2: 500_000, 3: 1_000_000, 4: 0}


# ----------------------------------------------------------- plan shapes

def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_round5gh_plan_shapes(spark, sf_dir):
    """Physical-plan discipline for the retrieval/stats additions:
    distributed top-k (never a full-data single-partition window), one
    scan for the correlation moments, pruned ReadSchemas, broadcast
    marginals for chi-square."""
    from mura_spark.suite import SPARK_QUERIES

    bm = _plan(SPARK_QUERIES["search_bm25_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in bm
    # only the id and text columns are read from the corpus
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in bm

    # the formatted plan shows each node twice (tree + details): count
    # scans in the tree section only
    tree = lambda p: p.split("\n\n")[0]  # noqa: E731

    corr = _plan(SPARK_QUERIES["stats_corr_lineitem"](spark, sf_dir))
    assert tree(corr).count("Scan parquet") == 1  # all moments in ONE pass
    assert ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
            "l_discount:double,l_tax:double>" in corr)

    ols = _plan(SPARK_QUERIES["stats_ols_value_by_hour"](spark, sf_dir))
    assert tree(ols).count("Scan parquet") == 1
    assert tree(ols).count("Exchange") <= 2  # partial + final agg

    chi = _plan(SPARK_QUERIES["stats_chi2_lang_source"](spark, sf_dir))
    assert "BroadcastHashJoin" in chi
    assert "SortMergeJoin" not in chi  # marginals must never sort-merge

    paths = _plan(SPARK_QUERIES["events_path_trigrams"](spark, sf_dir))
    assert "TakeOrderedAndProject" in paths
    # exactly one wide shuffle for the per-user window; the count groupBy
    # pre-aggregates map-side
    assert paths.count("hashpartitioning(user_id") == 1

    qn = _plan(SPARK_QUERIES["text_quality_qnorm"](spark, sf_dir))
    assert qn.count("hashpartitioning(") == 1  # the per-source window only


# ------------------------------------------------------ referential audit

def test_referential_audit_counts(spark):
    from mura_spark.operators.profile import referential_audit
    child = spark.createDataFrame([(1,), (1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_audit(
        [("rel", child, "fk", parent, "pk")]).collect()[0]
    assert (row["relationship"], row["n_child"], row["n_orphan"],
            row["n_unreferenced"]) == ("rel", 4, 1, 1)


# ---------------------------------------------------------- snapshot diff

def test_snapshot_diff_all_change_kinds(spark):
    from mura_spark.operators.upsert import snapshot_diff
    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 40)], "k long, v int")
    new = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 30), (5, 50)], "k long, v int")
    got = {r["k"]: r["change"]
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # 1 unchanged (omitted), 2 changed, 3 NULL->30 changed (null-safe),
    # 4 removed, 5 added
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


# --------------------------------------------------------------- k-core

def test_kcore_prune_peels_tail(spark):
    from mura_spark.operators.graph import kcore_prune
    # triangle 0-1-2 (3-core needs deg>=2... use k=2) plus a tail 2-3-4
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["degree"]
           for r in kcore_prune(df, k=2, rounds=3).collect()}
    # tail nodes 4 then 3 peel off over rounds; triangle survives at deg 2
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_prune_empty_when_overpruned(spark):
    from mura_spark.operators.graph import kcore_prune
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    assert kcore_prune(df, k=2, rounds=2).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        kcore_prune(df, k=0, rounds=1)


# ------------------------------------------------------ vocab / logloss

def test_vocab_coverage_hand_counts(spark):
    from mura_spark.operators.corpus import vocab_coverage
    df = spark.createDataFrame(
        [("a a a a b b c",)], "text string")  # a:4 b:2 c:1, total 7
    got = {r["k"]: (r["n_covered"], r["coverage_micro"])
           for r in vocab_coverage(df, "text", [1, 2, 3]).collect()}
    import math
    assert got[1] == (4, math.floor(4 / 7 * 1e6 + 0.5))
    assert got[2] == (6, math.floor(6 / 7 * 1e6 + 0.5))
    assert got[3] == (7, 1_000_000)
    import pytest as _pt
    with _pt.raises(ValueError):
        vocab_coverage(df, "text", [])


def test_unigram_logloss_uniform_corpus(spark):
    import math
    from mura_spark.operators.corpus import unigram_logloss
    # 4 tokens each appearing twice in an 8-token corpus: every token's
    # surprisal is ln(8/2) -> every doc scores the same quantized mean
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
    rows = unigram_logloss(df, "doc_id", "text").collect()
    want = math.floor(math.log(4.0) * 1e6 + 0.5)
    assert {(r["doc_id"], r["n_tokens"], r["logloss_micro"])
            for r in rows} == {(1, 4, want), (2, 4, want)}


# -------------------------------------------------- growth / decay curves

def test_cumulative_users_first_touch_only(spark):
    import datetime as dt
    from mura_spark.operators.rolling import cumulative_users
    t = lambda d, h=0: dt.datetime(2026, 1, d, h)  # noqa: E731
    rows = [(1, t(1)), (1, t(2)), (2, t(2)), (3, t(2)), (1, t(3))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["bucket_start"].day: (r["n_new"], r["cum_total"])
           for r in cumulative_users(df, "user_id", "ts").collect()}
    # day1: user1 new; day2: users 2+3 new (user1's repeat ignored)
    assert got == {1: (1, 1), 2: (2, 3)}


def test_decayed_value_halving(spark):
    import datetime as dt
    from mura_spark.operators.rolling import decayed_value
    base = dt.datetime(2026, 1, 8)
    week_ago = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(1, base, 100.0), (2, week_ago, 100.0)],
        "user_id long, ts timestamp, value double")
    got = {r["user_id"]: r["decayed_micro"]
           for r in decayed_value(df, "user_id", "ts", "value",
                                  half_life_hours=168.0).collect()}
    assert got[1] == 100_000_000          # age 0: full value
    assert abs(got[2] - 50_000_000) <= 1  # exactly one half-life old


# ------------------------------------------------------- confusion matrix

def test_confusion_matrix_shares(spark):
    from mura_spark.operators.similarity import confusion_matrix
    pred = spark.createDataFrame(
        [(0, 0), (0, 0), (0, 1), (1, 1)],
        "true_label int, pred_label int")
    got = {(r["true_label"], r["pred_label"]): (r["n"], r["recall_micro"])
           for r in confusion_matrix(pred).collect()}
    assert got[(0, 0)] == (2, 666_667)
    assert got[(0, 1)] == (1, 333_333)
    assert got[(1, 1)] == (1, 1_000_000)


# ------------------------------------------------------------- Benford

def test_benford_audit_uniform_is_flagged(spark):
    import math
    from mura_spark.operators.profile import benford_audit
    # exactly uniform first digits 1-9, 10 values each
    rows = [(float(d) * 10 + i,) for d in range(1, 10) for i in range(10)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: (r["observed"], r["expected_micro"])
           for r in benford_audit(df, "v").collect()}
    assert all(got[d][0] == 10 for d in range(1, 10))
    e1 = 90 * math.log10(2.0)  # Benford expectation for digit 1
    assert abs(got[1][1] / 1e6 - e1) < 1e-5
    # digit 9 heavily over-represented vs Benford's ~4.6%
    assert got[9][0] > 90 * math.log10(1 + 1.0 / 9)


# ----------------------------------------------- review-hardening fixes

def test_corr_pairs_constant_column_is_null_not_crash(spark):
    from mura_spark.operators.profile import corr_pairs
    df = spark.createDataFrame([(float(i), 7.0) for i in range(20)],
                               "x double, y double")
    got = {(r["col_x"], r["col_y"]): r["corr_micro"]
           for r in corr_pairs(df, ["x", "y"]).collect()}
    assert got == {("x", "y"): None}  # undefined, not DIVIDE_BY_ZERO


def test_centroid_cosine_zero_norm_is_null(spark):
    from mura_spark.operators.similarity import centroid_cosine
    rows = [(1, 0, [1.0, 0.0]),
            (2, 1, [0.0, 0.0])]  # label 1 centroid has zero norm
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    got = {(r["label_a"], r["label_b"]): r["cos_micro"]
           for r in centroid_cosine(df).collect()}
    assert got == {(0, 1): None}


def test_benford_reports_absent_digits(spark):
    from mura_spark.operators.profile import benford_audit
    # every value starts with 1 or 2 -> digits 3-9 absent but must
    # still surface with observed=0 and chi2 = E
    rows = [(float(v),) for v in [10, 11, 12, 20, 21, 22, 23, 24]]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: (r["observed"], r["chi2_micro"])
           for r in benford_audit(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    for d in range(3, 10):
        assert got[d][0] == 0
        assert got[d][1] > 0  # absent digit contributes its full E


def test_snapshot_diff_presence_only(spark):
    from mura_spark.operators.upsert import snapshot_diff
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r["k"]: r["change"]
           for r in snapshot_diff(old, new, ["k"], []).collect()}
    assert got == {1: "removed", 3: "added"}


def test_path_ngrams_null_items_drop_window(spark):
    from mura_spark.operators.funnel import path_ngrams
    rows = [(1, 0, "a"), (1, 1, None), (1, 2, "c"), (1, 3, "d")]
    df = spark.createDataFrame(rows, "u long, t long, e string")
    got = {r["path"]: r["n_paths"]
           for r in path_ngrams(df, "u", ["t"], "e", n=2, k=10).collect()}
    # windows touching the NULL are dropped, never conflated
    assert got == {"c>d": 1}


# ------------------------------------------------ centroid outlier screen

def test_centroid_outliers_flags_far_vector(spark):
    from mura_spark.operators.similarity import centroid_outliers
    # 20 tight vectors near (1,0) + one far outlier at (10,10)
    rows = [(i, 0, [1.0 + i * 0.001, 0.0]) for i in range(20)]
    rows.append((99, 0, [10.0, 10.0]))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    got = [r["vec_id"]
           for r in centroid_outliers(df, p=0.95).collect()]
    assert 99 in got
    assert len(got) <= 2  # only the extreme tail passes p95


def test_funnel_span_bound_is_enforced(spark):
    import datetime as dt
    from mura_spark.operators.funnel import funnel_counts
    t = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, "view", t(0)), (1, "click", t(10)), (1, "purchase", t(20)),
        (2, "view", t(0)), (2, "click", t(60 - 1)),  # in-window click...
        (2, "purchase", dt.datetime(2026, 1, 1, 2, 0)),  # ...late purchase
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "ts timestamp")
    got = {r["step_name"]: r["n_users"]
           for r in funnel_counts(df, "user_id", "event_type", "ts",
                                  ["view", "click", "purchase"],
                                  max_span_seconds=3600).collect()}
    assert got == {"view": 2, "click": 2, "purchase": 1}


# ----------------------------------------------------------- A/B z-test

def test_ab_ztest_degenerate_pool_is_null(spark, sf_dir):
    """100% (or 0%) conversion pools make the z denominator 0 — the
    query must surface NULL, not an ANSI DIVIDE_BY_ZERO abort. Driven
    through the real suite query with a conversion threshold the tiny
    fixture cannot reach is equivalent; here we pin the guard directly
    on the registry query at sf0.001 (which has both variants)."""
    from mura_spark.suite import SPARK_QUERIES
    row = SPARK_QUERIES["stats_ab_ztest"](spark, sf_dir).collect()[0]
    # with any non-degenerate pool z is finite; with degenerate it is
    # NULL — either way the query returns exactly one well-formed row
    assert row["na"] + row["nb"] > 0
    assert row["z_micro"] is None or isinstance(row["z_micro"], int)


# ---------------------------------------------- two-sample rank tests (5r)

def _ks_ref(xs, ys):
    """Sequential two-sample KS D over all distinct combined values."""
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    return max(abs(sum(1 for x in xs if x <= v) / na
                   - sum(1 for y in ys if y <= v) / nb) for v in vals)


def _mwu_ref(xs, ys):
    """Sequential Mann-Whitney: (2U_a, AUC, tie-corrected z)."""
    ua = sum(1.0 if x > y else 0.5 if x == y else 0.0
             for x in xs for y in ys)
    na, nb, n = len(xs), len(ys), len(xs) + len(ys)
    ties = {}
    for v in xs + ys:
        ties[v] = ties.get(v, 0) + 1
    ts = sum(t ** 3 - t for t in ties.values())
    var = na * nb / 12.0 * ((n + 1.0) - ts / (n * (n - 1.0)))
    z = (2.0 * ua - na * nb) / (2.0 * math.sqrt(var)) if var > 0 else None
    return 2.0 * ua, ua / (na * nb), z


def _two_sample_df(spark, xs, ys):
    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    return spark.createDataFrame(rows, "grp string, value double")


def test_ks_2sample_matches_sequential_reference(spark):
    from mura_spark.operators.stats import ks_2sample
    xs = [1.0, 2.0, 2.0, 3.5, 7.25, 9.0, 9.0, 12.0]
    ys = [2.0, 2.0, 4.5, 4.5, 6.0, 9.0, 15.0]
    row = ks_2sample(_two_sample_df(spark, xs, ys),
                     "value", "grp", "a", "b").collect()[0]
    assert (row["na"], row["nb"]) == (len(xs), len(ys))
    assert row["ks_micro"] == math.floor(_ks_ref(xs, ys) * 1e6 + 0.5)


def test_ks_2sample_identical_samples_is_zero(spark):
    from mura_spark.operators.stats import ks_2sample
    xs = [1.0, 2.0, 3.0, 3.0, 8.0]
    row = ks_2sample(_two_sample_df(spark, xs, xs),
                     "value", "grp", "a", "b").collect()[0]
    assert row["ks_micro"] == 0


def test_mannwhitney_matches_sequential_reference(spark):
    from mura_spark.operators.stats import mannwhitney_u
    xs = [1.0, 2.0, 2.0, 3.5, 7.25, 9.0, 9.0, 12.0]
    ys = [2.0, 2.0, 4.5, 4.5, 6.0, 9.0, 15.0]
    u2, auc, z = _mwu_ref(xs, ys)
    row = mannwhitney_u(_two_sample_df(spark, xs, ys),
                        "value", "grp", "a", "b").collect()[0]
    assert row["u2"] == int(u2)
    assert row["auc_micro"] == math.floor(auc * 1e6 + 0.5)
    assert row["z_micro"] == math.floor(z * 1e6 + 0.5)


def test_mannwhitney_degenerate_all_tied_z_null(spark):
    from mura_spark.operators.stats import mannwhitney_u
    row = mannwhitney_u(_two_sample_df(spark, [5.0] * 4, [5.0] * 3),
                        "value", "grp", "a", "b").collect()[0]
    # every comparison is a tie: AUC = 1/2 exactly, z undefined -> NULL
    assert row["auc_micro"] == 500000
    assert row["z_micro"] is None
    assert row["u2"] == 4 * 3  # 2U = 2 * (na*nb/2)


# ------------------------------------------- RFM + autocorrelation (5s)

def _mini_events(spark, tmp_path, rows):
    """Write a minimal events table (same column set as the fixture) and
    return its directory for suite-query consumption."""
    df = spark.createDataFrame(
        [(i, ts, uid, et, float(v), "{}") for i, (ts, uid, et, v)
         in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = str(tmp_path / "mini")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def _q7(vals, p):
    """Type-7 (linear) interpolated quantile, the percentile/
    quantile_cont definition."""
    v = sorted(vals)
    pos = (len(v) - 1) * p
    lo = math.floor(pos)
    f = pos - lo
    hi = v[lo + 1] if f > 0 else v[lo]
    return v[lo] + (hi - v[lo]) * f


def test_rfm_segments_match_sequential_reference(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows, per_user = [], {}
    # 6 users with distinct recency (last event), frequency, monetary
    for uid in range(6):
        n_ev = uid + 1
        for k in range(n_ev):
            ts = base + dt.timedelta(hours=uid * 3 + k)
            rows.append((ts, uid, "click", 10.0 * (uid + 1)))
        per_user[uid] = (ts, n_ev, 10.0 * (uid + 1) * n_ev)
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    out = {(r["r_bin"], r["f_bin"], r["m_bin"]):
           (r["n_users"], r["monetary_total"])
           for r in SPARK_QUERIES["events_rfm_segments"](spark, sf).collect()}
    ref_ts = max(t for t, _, _ in per_user.values())
    feats = {u: (math.floor((ref_ts - t).total_seconds() / 3600.0), n, m)
             for u, (t, n, m) in per_user.items()}
    bnds = [[_q7([f[i] for f in feats.values()], p / 5)
             for p in range(1, 5)] for i in range(3)]
    expect = {}
    for rec, fr, mon in feats.values():
        key = tuple(sum(1 for b in bnds[i] if v > b)
                    for i, v in enumerate((rec, fr, mon)))
        n, tot = expect.get(key, (0, 0.0))
        expect[key] = (n + 1, tot + mon)
    assert out == {k: (n, pytest.approx(tot)) for k, (n, tot)
                   in expect.items()}


def test_hourly_autocorr_zero_fills_gaps(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 3, 1)
    counts = [2, 0, 3, 1, 4, 0, 2]  # hour 1 and 5 are EMPTY (gap hours)
    rows = []
    for h, c in enumerate(counts):
        for k in range(c):
            rows.append((base + dt.timedelta(hours=h, minutes=k),
                         100 + k, "view", 1.0))
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    row = SPARK_QUERIES["events_hourly_autocorr"](spark, sf).collect()[0]
    xs, ys = counts[:-1], counts[1:]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    r = ((n * sxy - sx * sy)
         / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    assert row["n_pairs"] == n
    assert row["r_micro"] == math.floor(r * 1e6 + 0.5)


def test_hourly_autocorr_constant_series_null(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(hours=h), 1, "view", 1.0)
            for h in range(4)]  # one event every hour: zero variance
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    row = SPARK_QUERIES["events_hourly_autocorr"](spark, sf).collect()[0]
    assert row["n_pairs"] == 3
    assert row["r_micro"] is None


# ----------------------------------------- EWMA + LOCF carry-forward (5w)

def test_ewma_daily_matches_sequential_recurrence(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 5, 1)
    daily = [10.0, 20.0, 5.0, 40.0]
    rows = []
    for d, total in enumerate(daily):
        rows.append((base + dt.timedelta(days=d, hours=3), 1, "view",
                     total - 1.0))
        rows.append((base + dt.timedelta(days=d, hours=9), 2, "view", 1.0))
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    got = {r["day"].day: (r["daily_value"], r["ewma_micro"]) for r in
           SPARK_QUERIES["events_ewma_daily"](spark, sf).collect()}
    level = daily[0]
    expect = {1: (daily[0], math.floor(level * 1e6 + 0.5))}
    for d, x in enumerate(daily[1:], start=2):
        level = 0.3 * x + 0.7 * level
        expect[d] = (x, math.floor(level * 1e6 + 0.5))
    assert got == expect


def test_locf_carries_last_purchase_forward(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 5, 1)
    rows = [
        (base + dt.timedelta(minutes=0), 1, "view", 9.0),      # before: NULL
        (base + dt.timedelta(minutes=1), 1, "purchase", 5.0),
        (base + dt.timedelta(minutes=2), 1, "view", 7.0),      # carries 5.0
        (base + dt.timedelta(minutes=3), 1, "purchase", 8.0),
        (base + dt.timedelta(minutes=4), 1, "error", 1.0),     # carries 8.0
        (base + dt.timedelta(minutes=5), 2, "view", 3.0),      # other user: NULL
    ]
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    got = {r["event_id"]: r["last_purchase_value"] for r in
           SPARK_QUERIES["events_locf_purchase"](spark, sf).collect()}
    assert got == {0: None, 1: 5.0, 2: 5.0, 3: 8.0, 4: 8.0, 5: None}


# ------------------------------------------- last-touch attribution (5x)

def test_attribution_last_touch_semantics(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 6, 1)
    rows = [
        (base, 1, "click", 1.0),
        (base + dt.timedelta(minutes=30), 1, "purchase", 10.0),  # click
        (base + dt.timedelta(hours=3), 1, "purchase", 20.0),     # stale -> none
        (base + dt.timedelta(hours=4), 2, "view", 1.0),
        (base + dt.timedelta(hours=4, minutes=5), 2, "signup", 1.0),
        (base + dt.timedelta(hours=4, minutes=10), 2, "purchase", 5.0),  # signup (last touch)
        (base + dt.timedelta(hours=6), 3, "purchase", 7.0),      # cold -> none
    ]
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    got = {r["channel"]: (r["n_purchases"], r["attributed_value"])
           for r in SPARK_QUERIES["events_attribution_last_touch"](
               spark, sf).collect()}
    assert got == {"click": (1, 10.0), "signup": (1, 5.0),
                   "none": (2, 27.0)}


# ------------------------------ trigram search + cohort LTV (5z)

def test_trigram_search_is_lossless_vs_like(spark, sf_dir):
    """Candidate generation + verify must return EXACTLY the LIKE scan
    set (the prune is a superset filter; the verify closes it)."""
    from mura_spark.suite import SPARK_QUERIES
    got = {r.p_partkey for r in
           SPARK_QUERIES["search_substring_trigram"](spark,
                                                     sf_dir).collect()}
    from mura_spark.suite.common import table
    want = {r.p_partkey for r in
            table(spark, sf_dir, "part")
            .filter(F.lower("p_name").contains("gear")).collect()}
    assert got == want and len(want) > 0


def test_cohort_ltv_conservation(spark, sf_dir):
    """Every order lands in exactly one (cohort, offset) cell: the
    matrix total must equal total revenue; offset 0 must contain every
    cohort's first order; offsets are non-negative."""
    from mura_spark.suite import SPARK_QUERIES
    from mura_spark.suite.common import table
    rows = SPARK_QUERIES["orders_cohort_ltv"](spark, sf_dir).collect()
    assert all(r.month_offset >= 0 for r in rows)
    total = sum(r.revenue for r in rows)
    o = table(spark, sf_dir, "orders")
    want = o.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double")).first()[0]
    assert abs(total - want) < 1e-2
    cohorts = {r.cohort_month for r in rows}
    zero_offset = {r.cohort_month for r in rows if r.month_offset == 0}
    assert cohorts == zero_offset


# ------------------------------------ capped sessionization (5aa)

def test_sessionize_capped_splits_long_sessions(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 7, 1)
    # one user pinging every 20 min for 5 hours: ONE gap-session,
    # split into 2h parts -> sub_sessions 0,1,2
    rows = [(base + dt.timedelta(minutes=20 * i), 1, "view", 1.0)
            for i in range(16)]  # 0..300 min
    # plus a genuine gap -> new gap_session
    rows.append((base + dt.timedelta(hours=8), 1, "view", 1.0))
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    got = sorted((r.gap_session, r.sub_session, r.n_events) for r in
                 SPARK_QUERIES["events_sessionize_capped"](
                     spark, sf).collect())
    # minutes 0..100 -> sub 0 (6 events at 0,20,..,100? floor(100/120)=0);
    # 120..220 -> sub 1; 240..300 -> sub 2; then the gapped session
    assert got == [(1, 0, 6), (1, 1, 6), (1, 2, 4), (2, 0, 1)]


def test_matryoshka_agreement_bounds(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["emb_matryoshka_agreement"](spark,
                                                  sf_dir).collect()[0]
    assert r.n_queries > 0
    assert 0 <= r.n_agree <= r.n_queries
    # identical prefixes would give 1.0; random would give ~0 — the
    # synthetic embeddings should land strictly between
    assert 0 < r.agree_micro <= 1000000


# ------------------------------------------ IQR fence + bot screen (5cc)

def test_iqr_fence_flags_planted_outliers(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 8, 1)
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0]
    rows = [(base + dt.timedelta(minutes=i), 1, "view", v)
            for i, v in enumerate(vals)]
    rows.append((base + dt.timedelta(hours=2), 2, "view", 1000.0))  # high
    rows.append((base + dt.timedelta(hours=3), 3, "view", -500.0))  # low
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    r = {x.event_type: x for x in
         SPARK_QUERIES["events_outlier_iqr"](spark, sf).collect()}["view"]
    assert (r.n, r.n_out_low, r.n_out_high) == (10, 1, 1)
    # fences must bracket the inlier band
    assert r.lo_bound_2micro < 2 * 10_000_000 <= 2 * 17_000_000 \
        < r.hi_bound_2micro


# -------------------------------------- SRM + temporal split (5dd)

def test_srm_check_balanced_and_skewed(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 9, 1)
    # real events fixture: the MD5 split should NOT flag (balanced)
    rows = [(base + dt.timedelta(minutes=i), uid, "view", 1.0)
            for i, uid in enumerate(range(400))]
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_ab_srm_check"](spark, sf).collect()[0]
    assert r.na + r.nb == 400
    # chi2 of the hash split over 400 users should be far under 3.841
    assert not r.srm_flag


def test_temporal_split_is_ordered_and_partitions(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 9, 1)
    rows = [(base + dt.timedelta(hours=i), i % 7, "view", 1.0)
            for i in range(90)]
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.split: r for r in
           SPARK_QUERIES["sample_split_temporal"](spark, sf).collect()}
    assert set(got) == {"train", "val", "test"}
    assert sum(r.n for r in got.values()) == 90
    # strict time ordering: max(train) < min(val) <= max(val) < min(test)
    assert got["train"].max_ts < got["val"].min_ts
    assert got["val"].max_ts < got["test"].min_ts
    # terciles of 90 evenly spaced rows: 30/30/30
    assert (got["train"].n, got["val"].n, got["test"].n) == (30, 30, 30)


def test_srm_check_flags_engineered_skew(spark, tmp_path):
    """The skewed path: pick user ids that the MD5 bucket assignment
    sends overwhelmingly to variant 0 — chi2 must exceed the p<0.05
    critical value and raise the flag, with the exact closed form."""
    import datetime as dt
    import hashlib
    import math as m

    def variant(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:12],
                   16) % 1000 % 2

    zeros = [u for u in range(4000) if variant(u) == 0][:60]
    ones = [u for u in range(4000) if variant(u) == 1][:5]
    base = dt.datetime(2024, 9, 2)
    rows = [(base + dt.timedelta(minutes=i), uid, "view", 1.0)
            for i, uid in enumerate(zeros + ones)]
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_ab_srm_check"](spark, sf).collect()[0]
    assert (r.na, r.nb) == (60, 5)
    e = 65 / 2.0
    chi2 = (60 - e) * (60 - e) / e * 2.0
    assert chi2 > 3.841
    assert r.srm_flag
    assert r.chi2_micro == m.floor(chi2 * 1e6 + 0.5)


def test_iqr_oracle_agrees_on_null_values(spark, tmp_path):
    """Regression for the review finding: with NULL values present, the
    oracle must quartile over the SAME NULL-filtered rows as Spark
    (an unfiltered rank shifts every (n-1)p position)."""
    import datetime as dt
    import duckdb
    base = dt.datetime(2024, 9, 3)
    vals = [10.0, 11.0, 12.0, 13.0, None, None, 14.0, 15.0, 500.0]
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i), 1, "view", v, "{}")
         for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = str(tmp_path / "nulls")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/events.parquet")
    from mura_spark.suite import ORACLE_SQL, SPARK_QUERIES
    srow = SPARK_QUERIES["events_outlier_iqr"](spark, out).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{out}/events.parquet/*.parquet'")
    ocols = con.execute(ORACLE_SQL["events_outlier_iqr"]).fetchall()[0]
    odesc = [d[0] for d in con.description]
    orow = dict(zip(odesc, ocols))
    assert srow.n == orow["n"] == 7  # NULLs excluded from the count
    assert srow.n_out_high == orow["n_out_high"] == 1  # the 500.0
    assert srow.lo_bound_2micro == orow["lo_bound_2micro"]
    assert srow.hi_bound_2micro == orow["hi_bound_2micro"]


def test_ks_mwu_degenerate_one_empty_side(spark):
    """One group entirely absent: NULL statistics, never an ANSI abort."""
    from mura_spark.operators.stats import ks_2sample, mannwhitney_u
    df = _two_sample_df(spark, [1.0, 2.0, 3.0], [])
    k = ks_2sample(df, "value", "grp", "a", "b").collect()[0]
    assert (k.na, k.nb, k.ks_micro) == (3, 0, None)
    m = mannwhitney_u(df, "value", "grp", "a", "b").collect()[0]
    assert (m.na, m.nb) == (3, 0)
    assert m.auc_micro is None and m.z_micro is None
