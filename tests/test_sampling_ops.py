"""Round-5b operator contracts: mixture planning/enforcement, equi-depth
binning, winsorize, PMI collocations. Value-level cross-engine equality is
pinned by the suite oracles; these tests pin the operator-level invariants
the oracles can't see (determinism under repartitioning, bin balance,
plan-feasibility math, approx-path agreement)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

WEIGHTS = {"en": 0.4, "zh": 0.2, "de": 0.15, "fr": 0.15, "es": 0.1}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from mura_spark.suite.common import table
    return table(spark, sf_dir, "documents").cache()


def test_mixture_plan_math(docs):
    """The binding stratum keeps 100%; every kept count w_s·T is feasible
    (≤ n_s); realized mixture equals the target weights exactly (up to
    rounding of w_s·T)."""
    from mura_spark.operators.sampling import mixture_plan
    rows = {r["lang"]: r for r in mixture_plan(docs, "lang",
                                               WEIGHTS).collect()}
    assert set(rows) == set(WEIGHTS)
    t = min(r["n_total"] / WEIGHTS[lang] for lang, r in rows.items())
    binding = [lang for lang, r in rows.items()
               if abs(r["n_total"] / WEIGHTS[lang] - t) < 1e-9]
    assert rows[binding[0]]["keep_rate"] == pytest.approx(1.0)
    for lang, r in rows.items():
        assert r["n_expected"] <= r["n_total"]
        assert r["n_expected"] == int(math.floor(WEIGHTS[lang] * t + 0.5))
        assert r["keep_rate"] == pytest.approx(
            WEIGHTS[lang] * t / r["n_total"])


def test_mixture_plan_rejects_bad_weight(docs):
    from mura_spark.operators.sampling import mixture_plan
    with pytest.raises(ValueError):
        mixture_plan(docs, "lang", {"en": 0.0})


def test_apply_mixture_deterministic_and_weightless_dropped(docs):
    """Membership is a pure row function: identical kept sets under a
    different partitioning; strata without weights vanish."""
    from mura_spark.operators.sampling import apply_mixture
    d = docs.select("doc_id", "lang")
    kept = apply_mixture(d, "lang", "doc_id", WEIGHTS)
    again = apply_mixture(d.repartition(13), "lang", "doc_id", WEIGHTS)
    assert sorted(r["doc_id"] for r in kept.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    partial = apply_mixture(d, "lang", "doc_id", {"en": 1.0})
    assert [r["lang"] for r in partial.select("lang").distinct().collect()] \
        == ["en"]


def test_quantile_bins_balanced_and_pure(docs):
    """Equi-depth property: each decile holds n/10 ± (ties slack) rows;
    equal values always share a bin; repartitioning never moves a row."""
    from mura_spark.operators.sampling import quantile_bins
    d = docs.select("doc_id", "n_chars")
    binned = quantile_bins(d, "n_chars", 10)
    n = d.count()
    sizes = {r["bin"]: r["cnt"] for r in
             binned.groupBy("bin").agg(F.count("*").alias("cnt")).collect()}
    assert set(sizes) <= set(range(10))
    for b, c in sizes.items():
        assert c <= n * 0.25, f"bin {b} holds {c}/{n} rows"
    by_val = (binned.groupBy("n_chars")
              .agg(F.count_distinct("bin").alias("nb")).collect())
    assert all(r["nb"] == 1 for r in by_val)
    again = quantile_bins(d.repartition(7), "n_chars", 10)
    assert sorted(map(tuple, binned.collect())) == \
        sorted(map(tuple, again.collect()))


def test_quantile_bins_approx_path_close(docs):
    """The 100 TB approx_percentile path agrees with the exact path on
    all but boundary-adjacent rows."""
    from mura_spark.operators.sampling import quantile_bins
    d = docs.select("doc_id", "n_chars")
    exact = {r["doc_id"]: r["bin"]
             for r in quantile_bins(d, "n_chars", 10, exact=True).collect()}
    approx = {r["doc_id"]: r["bin"]
              for r in quantile_bins(d, "n_chars", 10,
                                     exact=False).collect()}
    moved = sum(1 for k in exact if exact[k] != approx[k])
    assert moved <= len(exact) * 0.05


def test_winsorize_clips_only_tails(spark, sf_dir):
    from mura_spark.operators.sampling import winsorize
    from mura_spark.suite.common import table
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    out = winsorize(ev, "value", 0.10, 0.90).cache()
    lo, hi = out.agg(F.min("value_clip"), F.max("value_clip")).first()
    stats = out.agg(
        F.count(F.when(F.col("value") < lo, 1)).alias("below"),
        F.count(F.when(F.col("value") > hi, 1)).alias("above"),
        F.count(F.when((F.col("value") >= lo) & (F.col("value") <= hi) &
                       (F.col("value") != F.col("value_clip")), 1))
         .alias("interior_changed"),
        F.count("*").alias("n")).first()
    assert stats["interior_changed"] == 0
    # each tail clamps ~10% of rows (interpolated boundary → ±2% slack)
    assert stats["below"] <= stats["n"] * 0.12
    assert stats["above"] <= stats["n"] * 0.12
    out.unpersist()


def test_pmi_bigrams_matches_sequential_reference(docs):
    """Exact PMI reference computed sequentially in Python over the same
    corpus: identical pair counts and micro-scores for the selected set
    (the suite oracle pins this cross-engine; this pins it against an
    independent non-SQL implementation)."""
    from collections import Counter

    from mura_spark.operators.cooccur import pmi_bigrams
    texts = [r["text"] for r in docs.select("text").collect()]
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = " ".join(t.lower().split()).split(" ")
        uni.update(toks)
        bi.update((a, b) for a, b in zip(toks, toks[1:]))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    want = []
    for (a, b), c in bi.items():
        if c < 5:
            continue
        score = math.floor(
            math.log((float(c) * n_uni * n_uni)
                     / (float(n_bi) * uni[a] * uni[b])) * 1e6 + 0.5)
        want.append((f"{a} {b}", c, score))
    want.sort(key=lambda r: (-r[2], r[0]))
    got = [(r["bigram"], r["n_pair"], r["score_micro"])
           for r in pmi_bigrams(docs, "text", min_count=5, k=20).collect()]
    assert got == want[:20]


def test_split_by_cluster_never_splits_a_cluster(docs, spark):
    """Every member of a dup cluster lands in the same split, and the
    split assignment agrees with split_by_hash on the cluster key."""
    from mura_spark.operators import dedup
    from mura_spark.operators.sampling import split_by_cluster, split_by_hash

    pairs = dedup.jaccard_dup_pairs(docs, "doc_id", "text", threshold=0.8)
    clusters = dedup.dup_clusters(pairs).cache()
    out = split_by_cluster(docs.select("doc_id"), "doc_id", clusters,
                           {"train": 0.9, "val": 0.1}).cache()
    per_cluster = (out.groupBy("cluster_key")
                   .agg(F.count_distinct("split").alias("ns")).collect())
    assert all(r["ns"] == 1 for r in per_cluster)
    # at least one real multi-member cluster exercises the property
    sizes = out.groupBy("cluster_key").count()
    assert sizes.filter(F.col("count") > 1).count() > 0
    # agreement with the dict-form splitter on the cluster key
    keyed = out.select(F.col("cluster_key").alias("k"), "split").distinct()
    want_train = {r["k"] for r in
                  split_by_hash(keyed.select("k"), "k",
                                {"train": 0.9, "val": 0.1})["train"]
                  .collect()}
    got_train = {r["k"] for r in
                 keyed.filter(F.col("split") == "train").collect()}
    assert got_train == want_train
    out.unpersist(); clusters.unpersist()


def test_incremental_state_merge_equals_full_recompute(spark, sf_dir):
    """Monoid identity: merging per-batch partial states (any batch
    boundary, any merge arity) finalizes to the full-recompute answer."""
    from mura_spark.operators.incremental import (finalize, merge_states,
                                                  partial_state)
    from mura_spark.suite.common import table
    ev = table(spark, sf_dir, "events").select("ts", "event_type", "value")
    thirds = [ev.filter(F.dayofmonth("ts") % 3 == i) for i in range(3)]
    states = [partial_state(t, ["event_type"], "value") for t in thirds]
    got = finalize(merge_states(states, ["event_type"]),
                   ["event_type"]).collect()
    want = finalize(partial_state(ev, ["event_type"], "value"),
                    ["event_type"]).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_profile_table_exact_and_approx(docs, spark):
    """Exact profile: NDV/null/min-max facts hold; approx mode keeps the
    schema and lands within HLL tolerance of the exact NDVs."""
    from mura_spark.operators.profile import profile_table
    d = docs.select("doc_id", "lang", "source", "n_chars")
    n = d.count()
    exact = {r["col_name"]: r for r in profile_table(d).collect()}
    assert set(exact) == {"doc_id", "lang", "source", "n_chars"}
    assert exact["doc_id"]["n_distinct"] == n  # key uniqueness
    assert all(r["n_rows"] == n and r["n_nonnull"] == n
               for r in exact.values())
    assert int(exact["doc_id"]["min_str"]) <= int(exact["doc_id"]["max_str"])
    approx = {r["col_name"]: r
              for r in profile_table(d, exact=False).collect()}
    for c, r in exact.items():
        assert approx[c]["n_distinct"] == pytest.approx(r["n_distinct"],
                                                        rel=0.1)
        assert (approx[c]["min_str"], approx[c]["max_str"]) == \
            (r["min_str"], r["max_str"])


def test_temperature_plan_flattens_and_is_feasible(docs):
    """α = 0: uniform weights; α = 1: natural proportions (every rate 1 —
    the natural mixture is always feasible); α = 0.5 sits between, rare
    strata gaining share; expected counts never exceed observed."""
    from mura_spark.operators.sampling import apply_rates, temperature_plan
    nat = {r["lang"]: r["n_total"]
           for r in docs.groupBy("lang").count()
           .withColumnRenamed("count", "n_total").collect()}
    n = sum(nat.values())
    for alpha in (0.0, 0.5, 1.0):
        rows = {r["lang"]: r
                for r in temperature_plan(docs, "lang", alpha).collect()}
        assert set(rows) == set(nat)
        for lang, r in rows.items():
            assert 0 < r["n_expected"] <= r["n_total"]
    one = {k: v for k, v in
           ((r["lang"], r) for r in
            temperature_plan(docs, "lang", 1.0).collect())}
    for lang, r in one.items():
        assert r["keep_rate"] == pytest.approx(1.0)
        assert r["n_expected"] == nat[lang]
    uni = {r["lang"]: r["n_expected"]
           for r in temperature_plan(docs, "lang", 0.0).collect()}
    assert max(uni.values()) - min(uni.values()) <= 1  # uniform
    half = {r["lang"]: r["n_expected"] / n
            for r in temperature_plan(docs, "lang", 0.5).collect()}
    rare = min(nat, key=nat.get)
    # α=0.5 gives the rarest stratum a larger share than natural
    kept_total = sum(r["n_expected"] for r in
                     temperature_plan(docs, "lang", 0.5).collect())
    assert half[rare] * n / kept_total > nat[rare] / n
    # enforcement: kept counts match the plan within hash resolution
    kept = apply_rates(docs.select("doc_id", "lang"), "lang", "doc_id",
                       temperature_plan(docs, "lang", 0.5))
    got = {r["lang"]: r["count"] for r in kept.groupBy("lang").count()
           .collect()}
    plan = {r["lang"]: r["n_expected"]
            for r in temperature_plan(docs, "lang", 0.5).collect()}
    for lang in plan:
        assert abs(got.get(lang, 0) - plan[lang]) <= \
            max(10, 0.15 * plan[lang])


def test_winsorize_and_bins_never_shuffle_the_data(docs, spark):
    """Plan-shape pin for the percentile-broadcast family: the only
    exchange is the SinglePartition merge of percentile partials; the
    data rows reach the output without any hashpartitioning exchange
    (at scale this is the whole point of the design)."""
    from mura_spark.operators.sampling import quantile_bins, winsorize
    d = docs.select("doc_id", "n_chars")
    for out in (quantile_bins(d, "n_chars", 10),
                winsorize(d, "n_chars", 0.01, 0.99)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert plan.count("Exchange SinglePartition") == 1
        assert "BroadcastExchange" in plan


def test_apply_mixture_is_pure_scan_side_filter(docs, spark):
    """Plan-shape pin: the solved mixture compiles to a CASE predicate at
    the scan — the corpus plan carries NO join, NO exchange, NO broadcast
    (the dimension-sized solve happened at plan-build time)."""
    from mura_spark.operators.sampling import apply_mixture
    out = apply_mixture(docs.select("doc_id", "lang"), "lang", "doc_id",
                        WEIGHTS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("Join", "Exchange", "Broadcast"):
        assert op not in plan, plan[:1500]
    assert "Filter" in plan


def test_null_handling_in_percentile_family(spark):
    """NULL metric/difficulty rows stay NULL through winsorize and
    quantile_bins — neither fabricates a lo-percentile value nor files
    unmeasured rows into bin 0."""
    from mura_spark.operators.sampling import quantile_bins, winsorize
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)] + [(0, None)],
        "id int, v double")
    w = {r["id"]: r["v_clip"] for r in winsorize(df, "v", 0.1, 0.9).collect()}
    assert w[0] is None
    assert w[50] == 50.0
    b = {r["id"]: r["bin"] for r in quantile_bins(df, "v", 4).collect()}
    assert b[0] is None
    assert b[1] == 0 and b[100] == 3


def test_mixture_plan_missing_stratum_is_infeasible_not_renormalized(docs):
    """A weighted stratum absent from the data forces T=0: every rate and
    expected count is 0 (the target mixture is infeasible by
    downsampling), never a silently renormalized plan."""
    from mura_spark.operators.sampling import apply_mixture, mixture_plan
    w = {"en": 0.5, "xx": 0.5}  # 'xx' does not exist in the corpus
    rows = {r["lang"]: r for r in mixture_plan(docs, "lang", w).collect()}
    assert set(rows) == {"en", "xx"}
    assert rows["xx"]["n_total"] == 0
    for r in rows.values():
        assert r["keep_rate"] == 0.0
        assert r["bucket_threshold"] == 0
        assert r["n_expected"] == 0
    assert apply_mixture(docs.select("doc_id", "lang"), "lang", "doc_id",
                         w).count() == 0


def test_profile_table_survives_hostile_column_names(spark):
    """Profiling arbitrary ingest tables: names with spaces, quotes, and
    backticks must neither crash the stack() expression nor corrupt the
    reported col_name."""
    from mura_spark.operators.profile import profile_table
    df = (spark.range(5)
          .withColumnRenamed("id", "order count")
          .withColumn("it's", F.lit("x"))
          .withColumn("a`b", F.lit(2)))
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"order count", "it's", "a`b"}
    assert rows["order count"]["n_distinct"] == 5
    assert rows["it's"]["n_distinct"] == 1


def test_winsorize_by_group_uses_group_boundaries(spark, sf_dir):
    """Each group clips to its own percentile band (groups with different
    scales get different boundaries); NULLs stay NULL; the join side
    broadcasts (data rows never shuffle)."""
    from mura_spark.operators.sampling import winsorize_by_group
    rows = ([("a", float(i)) for i in range(1, 101)]
            + [("b", float(i * 100)) for i in range(1, 101)]
            + [("b", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize_by_group(df, "g", "v", 0.10, 0.90).cache()
    a_max = out.filter(F.col("g") == "a").agg(
        F.max("v_clip")).first()[0]
    b_max = out.filter(F.col("g") == "b").agg(
        F.max("v_clip")).first()[0]
    assert a_max < 100 and b_max > 1000  # per-group scales respected
    assert out.filter(F.col("v").isNull()
                      & F.col("v_clip").isNull()).count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    out.unpersist()


def test_group_kfold_is_leakage_safe_and_stable(spark):
    from mura_spark.operators.sampling import group_kfold
    rows = [(i, f"site{i % 17}") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = df.withColumn("fold", group_kfold(df, "source", 5))
    per_group = (out.groupBy("source")
                    .agg(F.countDistinct("fold").alias("nf")).collect())
    assert all(r.nf == 1 for r in per_group), "a group straddles folds"
    folds = {r.fold for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(5)) and len(folds) > 1
    again = {(r.doc_id, r.fold) for r in
             df.withColumn("fold", group_kfold(df, "source", 5)).collect()}
    assert again == {(r.doc_id, r.fold) for r in out.collect()}


def test_group_kfold_rejects_degenerate_k(spark):
    import pytest
    from mura_spark.operators.sampling import group_kfold
    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        group_kfold(df, "source", 1)
