"""Vector quantization + TF-IDF operator tests (extension surface)."""

import math

import pytest
from pyspark.sql import functions as F

from mura_spark.functions import vectors as V


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, ["id", "v"]).select(
        "id", F.col("v").cast("array<float>").alias("v"))


def test_int8_quantize_roundtrip_error_bound(spark):
    """Reconstruction error is bounded by scale/2 per element; codes stay
    in [-127, 127]; zero vectors quantize to all-zero with scale 0."""
    rows = [(1, [0.5, -1.25, 3.0, -3.0]), (2, [0.001, 0.002, -0.003, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0])]
    df = _vec_df(spark, rows)
    scale = V.quantize_scale(F.col("v"))
    q = V.int8_quantize(F.col("v"), scale)
    err = F.zip_with(V.dequantize(q, scale), F.col("v"),
                     lambda x, y: F.abs(x - y.cast("double")))
    out = {r.id: r for r in df.select(
        "id", scale.alias("s"), q.alias("q"),
        F.aggregate(err, F.lit(0.0),
                    lambda a, b: F.greatest(a, b)).alias("max_err")).collect()}
    for r in out.values():
        assert all(-127 <= c <= 127 for c in r.q)
        assert r.max_err <= r.s / 2 + 1e-12
    assert out[3].s == 0.0 and out[3].q == [0, 0, 0, 0]
    # extreme element maps to ±127 exactly
    assert out[1].q[2] == 127 and out[1].q[3] == -127


def test_quantize_kernel_bit_identical_to_hof(spark, sf_dir):
    """The Arrow round-trip kernel must equal the HOF-expression form
    bit-for-bit on real embedding data (every op is IEEE-exact and
    order-independent)."""
    from mura_spark.suite.common import table
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    scale = V.quantize_scale(emb)
    q = V.int8_quantize(emb, scale)
    err = F.zip_with(V.dequantize(q, scale), emb,
                     lambda x, y: F.abs(x - y.cast("double")))
    hof = {r.vec_id: (r.scale, r.q_l1, r.max_err) for r in e.select(
        "vec_id", scale.alias("scale"),
        F.aggregate(q, F.lit(0).cast("bigint"),
                    lambda acc, v: acc + F.abs(v)).alias("q_l1"),
        F.aggregate(err, F.lit(0.0),
                    lambda acc, v: F.greatest(acc, v)).alias("max_err"))
        .collect()}
    kern = {r.vec_id: (r.scale, r.q_l1, r.max_err) for r in
            V.quantize_roundtrip_stats(e, "vec_id", "embedding").collect()}
    assert kern == hof   # exact equality, doubles included


def test_quantize_roundtrip_zero_length_vectors(spark):
    """A batch of non-null ZERO-LENGTH vectors must yield scale=0 /
    q_l1=0 / max_err=0 rows (not a zero-size-reduction ValueError),
    and NULL vectors still propagate NULL stats alongside them."""
    df = spark.createDataFrame([(1, []), (2, None), (3, [])],
                               "id int, v array<float>")
    out = {r.id: (r.scale, r.q_l1, r.max_err) for r in
           V.quantize_roundtrip_stats(df, "id", "v").collect()}
    assert out[1] == (0.0, 0, 0.0)
    assert out[2] == (None, None, None)
    assert out[3] == (0.0, 0, 0.0)


def test_normalize_unit_norm(spark):
    df = _vec_df(spark, [(1, [3.0, 4.0]), (2, [0.0, 0.0])])
    out = {r.id: r for r in df.select(
        "id", V.norm(F.col("v")).alias("n"),
        V.norm(V.normalize_unit(F.col("v"))).alias("un")).collect()}
    assert out[1].n == pytest.approx(5.0)
    assert out[1].un == pytest.approx(1.0, abs=1e-12)
    assert out[2].n == 0.0 and out[2].un == 0.0


def test_tfidf_top_terms_known_corpus(spark):
    """Hand-checked tiny corpus: corpus-wide terms score 0-ish, rare terms
    rank first; k and tiebreak honored; micro mode ranks identically."""
    from mura_spark.operators.tfidf import tfidf_top_terms
    rows = [(1, "common common rare"), (2, "common boring"),
            (3, "common boring filler")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_top_terms(docs, "doc_id", "text", k=2)
    got = [(r.doc_id, r.term) for r in
           out.orderBy("doc_id", F.col("score").desc(), "term").collect()]
    # idf: common df=3 → ln(4/4)=0; rare df=1 → ln(2); boring df=2 → ln(4/3)
    assert got[0] == (1, "rare") and got[1] == (1, "common")
    assert got[2] == (2, "boring") and got[3] == (2, "common")
    d1 = {r.term: r.score for r in out.filter(F.col("doc_id") == 1).collect()}
    assert d1["rare"] == pytest.approx(math.log(2.0))
    assert d1["common"] == pytest.approx(0.0)
    micro = tfidf_top_terms(docs, "doc_id", "text", k=2, micro=True)
    got_m = {(r.doc_id, r.term) for r in micro.collect()}
    assert got_m == set(got)
    assert micro.columns == ["doc_id", "term", "score_micro"]
    with pytest.raises(ValueError):
        tfidf_top_terms(docs, "doc_id", "text", k=0)


def test_tfidf_plan_no_cartesian_blowup(spark):
    """The single-row corpus-size frame joins by broadcast nested loop (1
    row), never a CartesianProduct over data-sized inputs."""
    from mura_spark.operators.tfidf import tfidf_top_terms
    docs = spark.createDataFrame([(1, "a b"), (2, "b c")],
                                 ["doc_id", "text"])
    plan = tfidf_top_terms(docs, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
