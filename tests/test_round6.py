"""Semantic tests for the round-6 additions (skyline, NTILE /
ratio-to-report / CUME_DIST windows, union-by-name, Gopher rules,
char entropy, Zipf slope, linear interpolation, Poisson bootstrap,
token-budget sampling, boolean aggregates) on hand-built inputs with
independently computed answers. Cross-engine value equality is pinned
separately by the oracle sweep."""

import math
import random

from pyspark.sql import functions as F


def _micro(x):
    return math.floor(x * 1e6 + 0.5)


# ------------------------------------------------------------- helpers

def _write(spark, tmp_path, name, rows, schema):
    out = str(tmp_path / "mini")
    (spark.createDataFrame(rows, schema)
          .coalesce(1).write.mode("append").parquet(f"{out}/{name}.parquet"))
    return out


def _mini_orders(spark, tmp_path, rows):
    """(o_orderkey, o_custkey, o_totalprice, o_orderpriority)"""
    return _write(
        spark, tmp_path, "orders",
        [(k, c, float(p), pr) for k, c, p, pr in rows],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderpriority string")


def _mini_customer(spark, tmp_path, rows):
    """(c_custkey, c_mktsegment, c_acctbal)"""
    return _write(
        spark, tmp_path, "customer",
        [(k, s, float(b)) for k, s, b in rows],
        "c_custkey long, c_mktsegment string, c_acctbal double")


def _mini_docs(spark, tmp_path, rows):
    """(doc_id, text, lang, source)"""
    return _write(
        spark, tmp_path, "documents",
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in
         enumerate(rows)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


# ------------------------------------------------------------- skyline

def _brute_skyline(pts):
    """Reference dominance filter over distinct (x, y) cells."""
    cells = sorted(set(pts))
    return sorted(
        c for c in cells
        if not any(d != c and d[0] <= c[0] and d[1] >= c[1]
                   for d in cells))


def test_skyline_matches_bruteforce_random(spark):
    from mura_spark.operators.skyline import skyline_min_max
    rng = random.Random(7)
    pts = [(rng.randint(0, 40) / 4.0, rng.randint(0, 30))
           for _ in range(300)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x double, y long")
    got = sorted((r.x, r.y) for r in
                 skyline_min_max(df, "x", "y").collect())
    assert got == _brute_skyline(pts)


def test_skyline_counts_and_representative(spark):
    from mura_spark.operators.skyline import skyline_min_max
    rows = [(1, 1.0, 10), (2, 1.0, 10), (3, 2.0, 5), (4, 0.5, 3),
            (5, 3.0, 12)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    got = {(r.x, r.y): (r.n_rows, r.rep_key) for r in
           skyline_min_max(df, "x", "y", rep_col="id").collect()}
    # (2.0, 5) dominated by (1.0, 10); (0.5, 3) survives (cheapest);
    # (3.0, 12) survives (largest); (1.0, 10) survives.
    assert got == {(1.0, 10): (2, 1), (0.5, 3): (1, 4), (3.0, 12): (1, 5)}


def test_parts_skyline_is_pareto_frontier(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    rows = SPARK_QUERIES["parts_skyline"](spark, sf_dir).collect()
    pts = [(r.p_retailprice, r.p_size) for r in rows]
    # no survivor dominates another survivor
    assert not any(
        a != b and a[0] <= b[0] and a[1] >= b[1]
        for a in pts for b in pts)
    # spot-check: every non-survivor cell is dominated by some survivor
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .groupBy("p_retailprice", "p_size").count().collect())
    surv = set(pts)
    for r in part:
        c = (r.p_retailprice, r.p_size)
        if c in surv:
            continue
        assert any(s[0] <= c[0] and s[1] >= c[1] and s != c
                   for s in pts), c


# ----------------------------------------------------- ranking windows

def test_window_ntile_balanced_and_ordered(spark, tmp_path):
    sf = _mini_customer(
        spark, tmp_path,
        [(i, "SEG", 100.0 * i) for i in range(10)])  # 10 rows, 4 tiles
    from mura_spark.suite import SPARK_QUERIES
    got = {r.quartile: r for r in
           SPARK_QUERIES["window_ntile"](spark, sf).collect()}
    # NTILE(4) over 10 rows: sizes 3,3,2,2 (first buckets take the extra)
    assert [got[q].n for q in (1, 2, 3, 4)] == [3, 3, 2, 2]
    # contiguous, ordered buckets
    for q in (1, 2, 3):
        assert got[q].bal_hi < got[q + 1].bal_lo


def test_window_ratio_to_report_shares(spark, tmp_path):
    sf = _mini_orders(spark, tmp_path,
                      [(1, 10, 100.0, "p"), (2, 10, 300.0, "p"),
                       (3, 20, 50.0, "p")])
    from mura_spark.suite import SPARK_QUERIES
    got = {r.o_orderkey: r.share for r in
           SPARK_QUERIES["window_ratio_to_report"](spark, sf).collect()}
    assert got == {1: 0.25, 2: 0.75, 3: 1.0}


def test_window_cume_dist_tie_semantics(spark, tmp_path):
    sf = _mini_orders(spark, tmp_path,
                      [(1, 1, 100.0, "p"), (2, 1, 100.0, "p"),
                       (3, 1, 200.0, "p"), (4, 1, 300.0, "p")])
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["window_cume_dist"](spark, sf).collect()[0]
    # cume_dist: ties share rows-<=-value/n: .5, .5, .75, 1.0
    assert r.n == 4
    assert r.sum_cd_micro == _micro(.5) + _micro(.5) + _micro(.75) + _micro(1.0)
    assert r.n_below_half == 2


# ------------------------------------------- union-by-name + booleans

def test_setop_union_byname_nullfills(spark, tmp_path):
    sf = _mini_orders(spark, tmp_path,
                      [(3, 1, 10.0, "P1"), (6, 1, 20.0, "P1"),
                       (1, 1, 5.0, "P2"), (2, 1, 7.0, "P3")])
    from mura_spark.suite import SPARK_QUERIES
    got = {r.priority: (r.n, r.revenue) for r in
           SPARK_QUERIES["setop_union_byname"](spark, sf).collect()}
    # keys 3 and 6 go to the legacy (no-priority) side
    assert got == {"<missing>": (2, 30.0), "P2": (1, 5.0), "P3": (1, 7.0)}


def test_agg_boolean_profile_semantics(spark, tmp_path):
    sf = _mini_orders(spark, tmp_path,
                      [(1, 1, 1000.0, "a"), (2, 1, 200000.0, "a"),
                       (3, 1, 500.0, "b"), (4, 1, 450000.0, "b")])
    from mura_spark.suite import SPARK_QUERIES
    got = {r.o_orderpriority: r for r in
           SPARK_QUERIES["agg_boolean_profile"](spark, sf).collect()}
    assert (got["a"].n_big, got["a"].all_above_floor,
            got["a"].any_huge) == (1, True, False)
    assert (got["b"].n_big, got["b"].all_above_floor,
            got["b"].any_huge) == (1, False, True)


# ------------------------------------------------------- text quality

def _gopher_flags(text):
    toks = text.lower().split()
    n = len(toks)
    sum_chars = sum(len(t) for t in toks)
    n_stop = sum(1 for t in toks if t in ("the", "a", "of", "and", "to"))
    return (int(30 <= n <= 80),
            int(3 * n <= sum_chars and 5 * sum_chars <= 21 * n),
            int(n_stop >= 2))


def test_gopher_rules_on_engineered_docs(spark, tmp_path):
    docs = [
        # passes all three: 30 words, mean len in band, 2 stopwords
        ("the cat and " + " ".join(["word"] * 27), "en", "s1"),
        # too short
        ("the of tiny", "en", "s1"),
        # no stopword evidence
        (" ".join(["spark"] * 40), "en", "s1"),
        # mean word length too long
        ("the of " + " ".join(["preposterously"] * 38), "en", "s1"),
    ]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["text_gopher_rules"](spark, sf).collect()[0]
    exp = [_gopher_flags(t) for t, _, _ in docs]
    assert r.n_docs == 4
    assert r.pass_word_count == sum(e[0] for e in exp)
    assert r.pass_mean_word_len == sum(e[1] for e in exp)
    assert r.pass_stopwords == sum(e[2] for e in exp)
    assert r.pass_all == sum(e[0] * e[1] * e[2] for e in exp)
    assert r.pass_all == 1  # only the engineered-good doc


def test_char_entropy_exact_single_doc(spark, tmp_path):
    sf = _mini_docs(spark, tmp_path, [("aab", "en", "s1")])
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["text_char_entropy"](spark, sf).collect()[0]
    exp = (math.floor(-(2 / 3) * math.log2(2 / 3) * 1e9 + 0.5)
           + math.floor(-(1 / 3) * math.log2(1 / 3) * 1e9 + 0.5))
    assert (r.n_docs, r.sum_entropy_nano) == (1, exp)


def test_zipf_slope_engineered_power_law(spark, tmp_path):
    # corpus with token freqs exactly f(r) = 2^(8-r): ln f = C - r·ln 2,
    # but the regression is on ln r, so just mirror the quantized OLS.
    freqs = {f"t{r:02d}": 2 ** (8 - r) for r in range(1, 9)}
    text = " ".join(" ".join([t] * f) for t, f in sorted(freqs.items()))
    sf = _mini_docs(spark, tmp_path, [(text, "en", "s1")])
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["text_zipf_slope"](spark, sf).collect()[0]
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [(_micro(math.log(i + 1)), _micro(math.log(f)))
           for i, (_, f) in enumerate(ranked)]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r.n_ranks == n
    assert abs(r.slope_micro - _micro(slope)) <= 5  # libm last-ulp slack
    assert r.slope_micro < 0  # decreasing rank-frequency curve


# --------------------------------------------- interpolation resample

def test_interpolate_linear_exact_interior_and_edges(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 9, 1)
    rows = [(0, base, 1, "purchase", 1.0, "{}"),
            (1, base + dt.timedelta(hours=4), 1, "purchase", 5.0, "{}")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.hr.hour: (r.filled, r.v_interp) for r in
           SPARK_QUERIES["events_interpolate_linear"](spark, out)
           .collect()}
    # known endpoints kept, interior hours at exact thirds of the gap
    assert got[0] == (False, _micro(1.0))
    assert got[4] == (False, _micro(5.0))
    assert got[1] == (True, _micro(1.0) + round((_micro(5.0) - _micro(1.0)) * 0.25))
    assert got[2] == (True, _micro(1.0) + round((_micro(5.0) - _micro(1.0)) * 0.5))
    assert got[3] == (True, _micro(1.0) + round((_micro(5.0) - _micro(1.0)) * 0.75))


# --------------------------------------------------- Poisson bootstrap

def test_bootstrap_ci_envelope(spark, sf_dir):
    import duckdb
    from mura_spark.suite import SPARK_QUERIES
    rows = SPARK_QUERIES["stats_bootstrap_ci"](spark, sf_dir).collect()
    assert len(rows) == 100
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' "
        "WHERE event_type = 'purchase'").fetchone()[0]
    mean_micro = duckdb.sql(
        f"SELECT SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) "
        f"/ COUNT(*) FROM '{sf_dir}/events.parquet' "
        "WHERE event_type = 'purchase'").fetchone()[0]
    # effective sizes concentrate around n (Poisson(1) weight sum)
    for r in rows:
        assert abs(r.n_eff - n) < 5 * math.sqrt(n) + 1
    # the 2.5%..97.5% replicate-mean envelope brackets the true mean
    means = sorted(r.mean_micro for r in rows)
    assert means[2] <= mean_micro <= means[97]


# ------------------------------------------------- token-budget sample

def test_token_budget_greedy_funnel(spark, tmp_path):
    # doc lengths (tokens): 500, 250, 200, 100 — in (n_chars desc,
    # doc_id) order the running total hits 500, 750, 950, 1050; the
    # 800-token budget keeps exactly the first two.
    docs = [(" ".join(["tok"] * k), "en", "s1")
            for k in (500, 250, 200, 100)]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["sample_token_budget"](spark, sf).collect()[0]
    assert (r.n_docs_total, r.n_docs_kept, r.tokens_kept) == (4, 2, 750)


# ----------------------------------------------------- round-6d batch

def _mini_events(spark, tmp_path, rows):
    """(ts, user_id, event_type, value) -> events table dir."""
    df = spark.createDataFrame(
        [(i, ts, uid, et, float(v), "{}") for i, (ts, uid, et, v)
         in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = str(tmp_path / "mini")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def test_trending_topk_engineered_growth(spark, tmp_path):
    import datetime as dt
    d1 = dt.datetime(2024, 9, 1, 12)
    d2 = d1 + dt.timedelta(days=1)
    rows = ([(d1, 1, "a", 1.0)] * 10 + [(d2, 1, "a", 1.0)] * 20
            + [(d1, 1, "b", 1.0)] * 10 + [(d2, 1, "b", 1.0)] * 5
            + [(d2, 1, "c", 1.0)] * 99)  # no day-1 baseline -> excluded
    sf = _mini_events(spark, tmp_path,
                      [(ts, u, et, v) for ts, u, et, v in rows])
    from mura_spark.suite import SPARK_QUERIES
    got = {(r.day.day, r.event_type): (r.growth_micro, r.rk) for r in
           SPARK_QUERIES["events_trending_topk"](spark, sf).collect()}
    assert (2, "c") not in got  # first-seen type has no baseline
    assert got[(2, "a")] == (_micro(1.0), 1)   # +100 %
    assert got[(2, "b")] == (_micro(-0.5), 2)  # -50 %
    assert (1, "a") not in got  # day 1 has no previous day at all


def test_langid_confusion_consistent_with_pointwise(spark, sf_dir):
    from collections import Counter
    from mura_spark.suite import SPARK_QUERIES
    point = Counter(
        (r.lang_declared, r.lang_pred) for r in
        SPARK_QUERIES["text_langid"](spark, sf_dir).collect())
    mat = {(r.lang_declared, r.lang_pred): r.n for r in
           SPARK_QUERIES["text_langid_confusion"](spark, sf_dir).collect()}
    assert mat == dict(point)


def test_quality_calibration_partitions_corpus(spark, sf_dir):
    import duckdb
    from mura_spark.suite import SPARK_QUERIES
    rows = SPARK_QUERIES["text_quality_calibration"](spark, sf_dir).collect()
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'").fetchone()[0]
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0 <= r.n_pass <= r.n
        assert abs(r.pass_rate - r.n_pass / r.n) < 1e-12


def test_pair_cosine_histogram_identical_and_orthogonal(spark, tmp_path):
    vecs = [(0, [1.0, 0.0], 0), (1, [2.0, 0.0], 0),   # pair (0,1): cos 1
            (10, [1.0, 0.0], 0), (11, [0.0, 3.0], 0)]  # pair (10,11): 0
    out = str(tmp_path / "mini")
    (spark.createDataFrame(vecs,
                           "vec_id long, embedding array<float>, label int")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.bin: r.n_pairs for r in
           SPARK_QUERIES["emb_pair_cosine_histogram"](spark, out).collect()}
    assert got == {10: 1, 0: 1}  # cos 1.0 -> bin 10, cos 0.0 -> bin 0


def test_ship_latency_exact_days(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(1995, 3, 1)
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        [(1, 1, 10.0, "p", base), (2, 1, 10.0, "p", base)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderpriority string, o_orderdate timestamp")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/orders.parquet"))
    (spark.createDataFrame(
        [(1, base + dt.timedelta(days=10)),
         (1, base + dt.timedelta(days=61, hours=12)),
         (2, base + dt.timedelta(days=90))],
        "l_orderkey long, l_shipdate timestamp")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["orders_ship_latency"](spark, out).collect()[0]
    assert (r.n_lines, r.sum_days, r.min_days, r.max_days, r.n_late) == \
        (3, 10 + 61 + 90, 10, 90, 2)


def test_dup_spans_engineered_shared_run(spark, tmp_path):
    shared = "alpha bravo charlie delta echo foxtrot"  # 6 shared tokens
    docs = [
        (" ".join(f"a{i}" for i in range(10)) + " " + shared + " "
         + " ".join(f"b{i}" for i in range(10)), "en", "s1"),
        (" ".join(f"c{i}" for i in range(5)) + " " + shared + " "
         + " ".join(f"d{i}" for i in range(5)), "en", "s1"),
        (" ".join(f"e{i}" for i in range(20)), "en", "s2"),
    ]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.source: r for r in
           SPARK_QUERIES["text_dup_spans"](spark, sf).collect()}
    # the 6-token shared run = two overlapping 5-gram windows per doc,
    # merged into ONE 6-token span in each of the two docs
    assert (got["s1"].docs_with_dups, got["s1"].n_spans,
            got["s1"].dup_tokens) == (2, 2, 12)
    assert (got["s2"].docs_with_dups, got["s2"].n_spans,
            got["s2"].dup_tokens) == (0, 0, 0)
    assert got["s1"].total_tokens == 26 + 16
    assert got["s2"].total_tokens == 20


def test_token_fertility_exact_counts(spark, tmp_path):
    sf = _mini_docs(spark, tmp_path, [("ab cd, ef", "en", "s1"),
                                      ("xy 12", "de", "s1")])
    from mura_spark.suite import SPARK_QUERIES
    got = {r.lang: r for r in
           SPARK_QUERIES["text_token_fertility"](spark, sf).collect()}
    # "ab cd, ef": 3 ws tokens; bpe-ish pieces: ab / cd / , / ef = 4
    assert (got["en"].ws_tokens, got["en"].bpe_ish_tokens,
            got["en"].total_chars) == (3, 4, 9)
    assert got["en"].fertility_micro == _micro(4 / 3)
    assert got["en"].bytes_per_token == 9 / 4
    # "xy 12": 2 ws tokens; pieces: xy / 12 = 2
    assert (got["de"].ws_tokens, got["de"].bpe_ish_tokens) == (2, 2)


def test_pattern_regex_engineered_sequence(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 9, 1)
    seq = ["view", "view", "view", "purchase", "click", "signup",
           "purchase", "view", "purchase"]
    rows = [(base + dt.timedelta(minutes=i), 7, et, 1.0)
            for i, et in enumerate(seq)]  # symbols: vvvpcspvp
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_pattern_regex"](spark, sf).collect()[0]
    assert r.n_events == 9
    assert r.n_view_then_buy == 2    # 'vp' at positions 3 and 8
    assert r.n_signup_then_buy == 1  # 'sp'
    assert r.max_view_streak == 3    # leading 'vvv'


def test_not_in_trap_and_not_exists(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["subquery_not_in"](spark, sf_dir).collect()[0]
    # the engineered NULL makes NOT IN satisfy nothing; NOT EXISTS keeps
    # its anti-join answer
    assert r.n_not_in == 0
    assert r.n_not_exists > 0


def test_offset_page_is_rows_201_to_300(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    page = SPARK_QUERIES["sort_offset_page"](spark, sf_dir).collect()
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
         .limit(300).collect())
    assert [(r.o_orderkey, r.o_totalprice) for r in page] == \
        [(r.o_orderkey, r.o_totalprice) for r in o[200:300]]


def test_mad_engineered_values(spark, tmp_path):
    import datetime as dt
    base = dt.datetime(2024, 9, 1)
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]  # median 3, |dev| = 2,1,0,1,97
    rows = [(base + dt.timedelta(minutes=i), 1, "view", v)
            for i, v in enumerate(vals)]
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_mad_by_type"](spark, sf).collect()[0]
    assert r.med_micro == _micro(3.0)
    assert r.mad_micro == _micro(1.0)  # median of sorted devs 0,1,1,2,97
    # the outlier moved the MAD not at all — that's the point
    vals2 = vals[:-1] + [1000000.0]
    sf2 = _mini_events(spark, tmp_path / "b", [(base + dt.timedelta(
        minutes=i), 1, "view", v) for i, v in enumerate(vals2)])
    r2 = SPARK_QUERIES["events_mad_by_type"](spark, sf2).collect()[0]
    assert r2.mad_micro == r.mad_micro


def test_gini_known_distributions(spark, tmp_path):
    # perfectly equal spend -> G = 0 exactly under the (n+1) finite form
    sf = _mini_orders(spark, tmp_path,
                      [(i, i, 100.0, "p") for i in range(1, 6)])
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["orders_gini_spend"](spark, sf).collect()[0]
    assert (r.n_customers, r.total_spend, r.gini_micro) == (5, 500.0, 0)
    # one customer owns everything: G = (n-1)/n = 0.8
    sf2 = _mini_orders(spark, tmp_path / "b",
                       [(1, 1, 0.0, "p"), (2, 2, 0.0, "p"),
                        (3, 3, 0.0, "p"), (4, 4, 0.0, "p"),
                        (5, 5, 500.0, "p")])
    r2 = SPARK_QUERIES["orders_gini_spend"](spark, sf2).collect()[0]
    assert r2.gini_micro == _micro(4 / 5)


# ------------------------------------------------------- plan pinning

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_offset_page_plan_is_take_ordered_with_offset(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["sort_offset_page"](spark, sf_dir))
    assert "TakeOrderedAndProject(limit=300, offset=200" in p
    assert "Sort " not in p  # never a global sort


def test_not_in_plan_is_null_aware_anti_join(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["subquery_not_in"](spark, sf_dir))
    # the NOT IN side carries the isNullAware flag (trailing `true`);
    # the NOT EXISTS twin plans a plain LeftAnti (trailing `false`)
    assert "LeftAnti, BuildRight, true" in p
    assert "LeftAnti, BuildRight, false" in p


def test_zipf_topk_plan_uses_window_group_limit(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["text_zipf_slope"](spark, sf_dir))
    assert "WindowGroupLimit" in p  # top-200/lang pre-reduced per task


def test_bootstrap_plan_broadcasts_replicates(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["stats_bootstrap_ci"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p  # the 10-row side must never shuffle


def test_join_strategy_hints_control_physical_plan(spark, sf_dir):
    """All three equi-join physical strategies are reachable by hint —
    the knob that matters when the optimizer's size estimates are wrong
    at 100 TB (broadcast a dim it thinks is big, or force shuffle-hash
    to avoid sorting a huge-but-uniform side)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    on = o["o_custkey"] == c["c_custkey"]
    plans = {h: _plan(o.join(c.hint(h), on))
             for h in ("broadcast", "shuffle_hash", "merge")}
    assert "BroadcastHashJoin" in plans["broadcast"]
    assert "ShuffledHashJoin" in plans["shuffle_hash"]
    assert "SortMergeJoin" in plans["merge"]


def test_count_distinct_rollup_semantics(spark, tmp_path):
    import datetime as dt
    d1 = dt.datetime(2024, 9, 1, 10)
    d2 = d1 + dt.timedelta(days=1)
    rows = [(d1, 1, "view", 1.0), (d1, 1, "view", 1.0), (d1, 2, "view", 1.0),
            (d2, 1, "view", 1.0), (d2, 3, "view", 1.0)]
    sf = _mini_events(spark, tmp_path, rows)
    from mura_spark.suite import SPARK_QUERIES
    rows_out = SPARK_QUERIES["events_count_distinct_rollup"](spark, sf).collect()
    by_day = {(r.day.day if r.day else None): r for r in rows_out}
    assert (by_day[1].n_events, by_day[1].n_users, by_day[1].gid) == (3, 2, 0)
    assert (by_day[2].n_events, by_day[2].n_users, by_day[2].gid) == (2, 2, 0)
    # grand total: 3 distinct users over 5 events, flagged by grouping()
    assert (by_day[None].n_events, by_day[None].n_users,
            by_day[None].gid) == (5, 3, 1)


def test_try_functions_null_not_abort(spark, tmp_path):
    # ANSI mode is ON: the same expressions WITHOUT try_ would abort.
    sf = _write(spark, tmp_path, "lineitem",
                [(1, "N", 5.0, 100.0), (2, "N", 10.0, 100.0)],
                "l_orderkey long, l_returnflag string, l_quantity double, "
                "l_extendedprice double")
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["scalar_try_functions"](spark, sf).collect()[0]
    # row 1 divides by (5-5)=0 -> NULL; row 2 -> 100/5 = 20
    assert (r.n, r.n_div_by_zero, r.n_bad_cast) == (2, 1, 2)
    assert r.sum_div_micro == _micro(20.0)


def test_hard_negatives_engineered(spark):
    from mura_spark.operators.similarity import hard_negatives
    # probe [1,0] label 0; corpus: same-label twin (cos 1.0, must be
    # skipped), wrong-label near (cos ~0.98), wrong-label far (cos 0)
    rows = [(0, [1.0, 0.0], 0),
            (100, [2.0, 0.0], 0),      # same label -> ineligible
            (101, [0.9, 0.2], 1),      # nearest wrong label
            (102, [0.0, 1.0], 2)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>, "
                               "label int")
    out = hard_negatives(df.filter(F.col("vec_id") < 50),
                         df.filter(F.col("vec_id") >= 50)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.query_id, r.true_label, r.neg_id, r.neg_label) == (0, 0, 101, 1)


def test_priority_mix_drift_engineered_shift(spark, tmp_path):
    import datetime as dt
    m1 = dt.datetime(1995, 1, 15)
    m2 = dt.datetime(1995, 2, 15)
    rows = ([(i, 1, 10.0, "A", m1) for i in range(3)]        # Jan: A=3
            + [(3, 1, 10.0, "B", m1)]                        #      B=1
            + [(4, 1, 10.0, "A", m2)]                        # Feb: A=1
            + [(5 + i, 1, 10.0, "B", m2) for i in range(3)])  #     B=3
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, "
              "o_orderpriority string, o_orderdate timestamp")
        .coalesce(1).write.mode("overwrite").parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.mon.month: r.tvd_micro for r in
           SPARK_QUERIES["orders_priority_mix_drift"](spark, out).collect()}
    # Jan has no predecessor; Feb's mix flip (3:1 -> 1:3) is TVD = 0.5
    assert got == {2: _micro(0.5)}


def test_adamic_adar_engineered_triad(spark, tmp_path):
    # orders: {1: parts 1,2}, {2: parts 1,3} -> edges 1-2, 1-3 (sym).
    # Non-adjacent pair (2,3) shares neighbor 1 (deg 2): AA = 1/ln 2.
    rows = [(1, 1), (1, 2), (2, 1), (2, 3)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet"))
    import math
    from mura_spark.suite import SPARK_QUERIES
    got = SPARK_QUERIES["graph_adamic_adar"](spark, out).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.u, r.v, r.n_common) == (2, 3, 1)
    assert r.aa_nano == math.floor(1 / math.log(2) * 1e9 + 0.5)


def test_js_divergence_identical_and_disjoint(spark, tmp_path):
    import math
    docs = [("x x y", "en", "s"), ("x x y", "de", "s"),  # identical dists
            ("a a a", "fr", "s")]                        # disjoint vocab
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {(r.lang_a, r.lang_b): r for r in
           SPARK_QUERIES["text_js_divergence"](spark, sf).collect()}
    assert got[("de", "en")].jsd_nano == 0          # identical -> 0
    ln2 = math.floor(math.log(2.0) * 2.0 * 1e9 + 0.5)  # both remainders
    assert got[("en", "fr")].jsd_nano == math.floor(ln2 / 2.0 + 0.5)
    assert got[("en", "fr")].n_shared == 0          # pair still reported
    assert len(got) == 3


def test_ahash64_known_pattern_and_single_bit_flip(spark):
    import numpy as np
    from mura_spark.multimodal.binary_ops import ahash64, encode_ppm
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    a[:, 4:, :] = 255                      # right half bright
    b = a.copy()
    b[0, 0, :] = 255                       # one dark pixel flipped
    df = spark.createDataFrame(
        [(0, bytearray(encode_ppm(a))), (1, bytearray(encode_ppm(b)))],
        "id long, content binary")
    got = {r.id: (r.lo, r.hi) for r in ahash64(df).collect()}

    def expect(arr):
        s = arr.astype("int64").sum(axis=2).reshape(-1)
        t = int(s.sum())
        bits = (64 * s > t)
        return (sum(1 << j for j in range(32) if bits[j]),
                sum(1 << j for j in range(32) if bits[32 + j]))

    assert got[0] == expect(a)
    assert got[1] == expect(b)
    ham = (bin(got[0][0] ^ got[1][0]).count("1")
           + bin(got[0][1] ^ got[1][1]).count("1"))
    assert ham == 1  # exactly the flipped pixel's bit


def test_ahash64_downsamples_non_8x8_images(spark):
    # aHash canonicalizes to the 8x8 grid: a 16x16 2x-upscale of an
    # 8x8 image hashes identically (nearest-neighbor picks the
    # top-left of each 2x2 block), and an odd 13x9 image hashes
    # without error instead of raising IndexError
    import numpy as np
    from mura_spark.multimodal.binary_ops import ahash64, encode_ppm
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    a[:, 4:, :] = 255
    big = np.repeat(np.repeat(a, 2, axis=0), 2, axis=1)   # 16x16
    odd = np.zeros((13, 9, 3), dtype=np.uint8)
    odd[:, 5:, :] = 200
    df = spark.createDataFrame(
        [(0, bytearray(encode_ppm(a))), (1, bytearray(encode_ppm(big))),
         (2, bytearray(encode_ppm(odd)))],
        "id long, content binary")
    got = {r.id: (r.lo, r.hi) for r in ahash64(df).collect()}
    assert got[0] == got[1]          # upscale is hash-invariant
    n_set = (bin(got[2][0]).count("1") + bin(got[2][1]).count("1"))
    assert 0 < n_set < 64            # odd size decodes to a real hash


def test_phash_pairs_identical_docs_match(spark, tmp_path):
    text = "".join("abcdefgh"[(i * 7) % 8] for i in range(192))
    docs = [(text, "en", "s"), (text, "en", "s"),
            ("".join("zyxwvuts"[(i * 5) % 8] for i in range(200)), "en", "s")]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {(r.id_a, r.id_b): r.hamming for r in
           SPARK_QUERIES["mm_phash_pairs"](spark, sf).collect()}
    assert got.get((0, 1)) == 0  # identical pixels -> hamming 0


def test_audio_fingerprint_known_chain_and_local_edit(spark):
    import numpy as np
    from mura_spark.multimodal.binary_ops import (audio_fingerprint31,
                                                  encode_wav)
    # strictly increasing energies -> all 31 bits set
    a = np.repeat(np.arange(1, 33, dtype=np.int16) * 100, 2)
    # one frame's energy collapsed -> exactly two chain bits flip
    b = a.copy()
    b[20] = 0
    b[21] = 0  # frame 10 energy -> 0: bits 9 (10>9) and 10 (11>10) change
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(a.reshape(-1, 1), 8000))),
         (1, bytearray(encode_wav(b.reshape(-1, 1), 8000)))],
        "id long, content binary")
    got = {r.id: r.fp for r in audio_fingerprint31(df).collect()}
    assert got[0] == (1 << 31) - 1
    assert bin(got[0] ^ got[1]).count("1") == 1  # bit 9 only: 0 > e9 False flips it; bit 10: e11 > 0 stays True


def test_mm_dedup_report_counts_exact_clones(spark, tmp_path):
    text = "".join("qwertyui"[(i * 3) % 8] for i in range(192))
    other = "".join("asdfghjk"[(i * 5) % 8] for i in range(192))
    docs = [(text, "en", "s1"), (text, "en", "s1"), (other, "en", "s1"),
            (other, "en", "s2")]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.source: r for r in
           SPARK_QUERIES["pipeline_mm_dedup_report"](spark, sf).collect()}
    assert (got["s1"].n_images, got["s1"].n_unique_hashes,
            got["s1"].n_perceptual_dups) == (3, 2, 1)
    assert got["s1"].keep_rate_micro == _micro(2 / 3)
    assert (got["s2"].n_images, got["s2"].n_perceptual_dups) == (1, 0)


def test_k_anonymity_bands_engineered(spark):
    from mura_spark.operators.profile import k_anonymity_bands
    # QI groups: a (1 row), b (3 rows), c (6 rows), d (25 rows)
    rows = ([("a",)] * 1 + [("b",)] * 3 + [("c",)] * 6 + [("d",)] * 25)
    df = spark.createDataFrame(rows, "qi string")
    got = {r.k_band: r for r in
           k_anonymity_bands(df, ["qi"]).collect()}
    assert (got["1_unique"].qi_groups, got["1_unique"].n_rows) == (1, 1)
    assert (got["2_lt5"].qi_groups, got["2_lt5"].n_rows) == (1, 3)
    assert (got["3_lt20"].qi_groups, got["3_lt20"].n_rows) == (1, 6)
    assert (got["4_ge20"].qi_groups, got["4_ge20"].n_rows) == (1, 25)
    assert got["2_lt5"].pct_rows_micro == _micro(3 / 35)


def test_join_cardinality_matches_real_join(spark):
    from mura_spark.operators.profile import join_cardinality_report
    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 3, 9]], "k long")
    right = spark.createDataFrame(
        [(k,) for k in [1, 1, 2, 2, 2, 4]], "k long")
    rep = join_cardinality_report(
        [("lr", left, "k", right, "k")]).collect()[0]
    true_rows = left.join(right, "k").count()
    assert rep.est_rows == true_rows == 3 * 2 + 1 * 3
    assert rep.matched_keys == 2
    assert rep.max_key_rows == 6
    assert (rep.n_left, rep.n_right) == (6, 6)
    assert rep.skew_micro == _micro(6 / 9)


def test_join_cardinality_disjoint_keys_zero(spark):
    from mura_spark.operators.profile import join_cardinality_report
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(3,)], "k long")
    rep = join_cardinality_report(
        [("none", left, "k", right, "k")]).collect()[0]
    assert (rep.matched_keys, rep.est_rows,
            rep.max_key_rows, rep.skew_micro) == (0, 0, 0, 0)


def test_cusum_series_engineered_shift(spark):
    from mura_spark.operators.anomaly import cusum_series
    rows = [(d, float(v)) for d, vals in
            [(1, [4, 6]), (2, [10]), (3, [10]), (4, [20]), (5, [20])]
            for v in vals]
    df = spark.createDataFrame(rows, "bucket int, value double")
    got = {r.bucket: r for r in
           cusum_series(df, "bucket", "value").collect()}
    # totals [10,10,10,20,20], T=70, n=5; cusum_scaled = (5*P_i - i*70)*100
    assert [got[b].cusum_scaled for b in range(1, 6)] == [
        -2000, -4000, -6000, -3000, 0]
    assert [got[b].is_peak for b in range(1, 6)] == [
        False, False, True, False, False]
    assert got[4].total == 20.0


def test_peak_concurrency_sweep_and_tie_rule(spark):
    from mura_spark.operators.intervals import peak_concurrency
    iv = spark.createDataFrame(
        [("d1", 1, 5), ("d1", 2, 3), ("d1", 4, 6), ("d1", 7, 8),
         # d2: touching intervals — closed semantics count both at t=2
         ("d2", 1, 2), ("d2", 2, 3)],
        "g string, st long, en long")
    got = {r.g: r for r in
           peak_concurrency(iv, "g", "st", "en").collect()}
    assert (got["d1"].n_sessions, got["d1"].peak_concurrent,
            got["d1"].peak_at) == (4, 2, 2)
    assert (got["d2"].n_sessions, got["d2"].peak_concurrent,
            got["d2"].peak_at) == (2, 2, 2)


def test_target_encode_loo_engineered(spark):
    from mura_spark.operators.features import target_encode_loo
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 7)], "g string, x long")
    got = {(r.g, r.x): r.loo for r in
           target_encode_loo(df, ["g"], "x", "loo").collect()}
    assert got[("a", 10)] == 25.0   # (20+30)/2
    assert got[("a", 20)] == 20.0   # (10+30)/2
    assert got[("a", 30)] == 15.0
    assert got[("b", 7)] is None    # singleton group -> NULL


def test_rank_auc_engineered(spark):
    from mura_spark.operators.features import rank_auc
    # pos scores {3, 4}, neg scores {1, 2}: perfect separation
    df = spark.createDataFrame(
        [(3, True), (4, True), (1, False), (2, False)],
        "s long, y boolean")
    assert rank_auc(df, "s", "y").first().auc_micro == 1000000
    # pos {1,2}, neg {1,2}: symmetric with ties -> 0.5
    df2 = spark.createDataFrame(
        [(1, True), (2, True), (1, False), (2, False)],
        "s long, y boolean")
    assert rank_auc(df2, "s", "y").first().auc_micro == 500000
    # pos {2}, neg {1,3}: one win one loss -> 0.5; and all-pos -> NULL
    df3 = spark.createDataFrame(
        [(2, True), (1, False), (3, False)], "s long, y boolean")
    assert rank_auc(df3, "s", "y").first().auc_micro == 500000
    df4 = spark.createDataFrame([(2, True)], "s long, y boolean")
    assert rank_auc(df4, "s", "y").first().auc_micro is None


def test_theil_sen_engineered_outlier_resistance(spark):
    from mura_spark.operators.stats import theil_sen_slope
    # y = 2x exactly except one wild outlier at x=5
    pts = [(x, 2 * x) for x in range(5)] + [(5, 1000)]
    df = spark.createDataFrame(pts, "x long, y long")
    r = theil_sen_slope(df, "x", "y").first()
    assert (r.n_points, r.n_pairs) == (6, 15)
    assert r.slope == 2.0          # OLS would be dragged far above 2
    # even pair count: median averages the two central slopes
    df2 = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 4), (3, 9)], "x long, y long")
    # slopes: 1,2,3, 3,4, 5 -> sorted [1,2,3,3,4,5] -> median 3
    assert theil_sen_slope(df2, "x", "y").first().slope == 3.0


def test_seasonal_naive_mae_engineered(spark):
    from mura_spark.suite import SPARK_QUERIES, ORACLE_SQL
    import duckdb
    # weekly-periodic series with noise: seasonal-naive must beat naive
    con = duckdb.connect()
    # reuse the real sf0.001 data for a cheap end-to-end equality check
    sfd = "/root/testdata/sf0.001"
    got = SPARK_QUERIES["events_seasonal_naive_mae"](spark, sfd).first()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sfd}/events.parquet'")
    exp = con.execute(ORACLE_SQL["events_seasonal_naive_mae"]).fetchone()
    assert (got.n_scored, got.mae7_cents, got.mae1_cents,
            got.seasonal_wins) == exp


def test_mean_pairwise_cosine_engineered(spark):
    from mura_spark.operators.similarity import mean_pairwise_cosine
    # two identical + one orthogonal: pairs (1,2)=1, (1,3)=0, (2,3)=0
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 5.0]),
         (4, [0.0, 0.0])],                      # zero vector excluded
        "vec_id long, embedding array<double>")
    r = mean_pairwise_cosine(df, "embedding", dim=2).first()
    assert r.n_vecs == 3
    assert abs(r.mean_cosine - 1.0 / 3.0) < 1e-9
    # all identical -> mean 1
    df2 = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(5)],
        "vec_id long, embedding array<double>")
    assert abs(mean_pairwise_cosine(df2, "embedding", dim=2).first()
               .mean_cosine - 1.0) < 1e-9
    # singleton -> NULL
    df3 = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    assert mean_pairwise_cosine(df3, "embedding", dim=2).first(
        ).mean_cosine is None


def test_bigram_logloss_orders_context(spark, tmp_path):
    import math
    from mura_spark.operators.cooccur import bigram_logloss
    # corpus where "a b" is the only bigram after "a": P(b|a) high
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c d"), (3, "d c b a")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           bigram_logloss(docs, "doc_id", "text").collect()}
    assert got[1].n_scored == 5 and got[2].n_scored == 3
    # doc 1 repeats the corpus's dominant bigram -> lowest surprisal;
    # doc 2 carries the two rarest bigrams (bc, cd) -> highest
    assert (got[1].logloss_micro < got[3].logloss_micro
            < got[2].logloss_micro)
    # hand-check doc 1: bigrams = 3×"a b" + 2×"b a";
    # P(b|a) = .7·c(ab)/c(a) + .3·c(b)/T = .7·(4/5) + .3·(5/14)
    s_ab = math.floor(
        math.log(1.0 / (0.7 * (4 / 5) + 0.3 * (5 / 14))) * 1e6 + 0.5)
    s_ba = math.floor(
        math.log(1.0 / (0.7 * (3 / 5) + 0.3 * (5 / 14))) * 1e6 + 0.5)
    assert got[1].logloss_micro == math.floor((3 * s_ab + 2 * s_ba) / 5)


def test_python_datasource_stripes_and_values(spark):
    from mura_spark.sources import pyds
    pyds.register(spark)
    df = (spark.read.format("mura_synth")
               .option("n", 100).option("shards", 4).load())
    rows = df.collect()
    assert len(rows) == 100
    assert df.rdd.getNumPartitions() == 4          # one per stripe
    by_id = {r.id: r for r in rows}
    assert sorted(by_id) == list(range(100))
    for r in rows:
        assert r.shard == r.id % 4
        assert r.value == pyds.synth_value(r.id)
    # re-registration is idempotent
    pyds.register(spark)


def test_file_lineage_reconciles_partitioned_write(spark, tmp_path):
    docs = [("x " * 5, lang, f"s{i % 2}") for i, lang in
            enumerate(["en"] * 4 + ["de"] * 2)]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.lang: (r.n_rows, r.n_sources) for r in
           SPARK_QUERIES["source_file_lineage"](spark, sf).collect()}
    assert got == {"en": (4, 2), "de": (2, 2)}


def test_session_new_query_plan_shapes(spark, sf_dir):
    """Plan pins for the round-6p..6u additions: broadcast totals stay
    broadcast, reductions precede joins, no global sort sneaks in."""
    from mura_spark.suite import SPARK_QUERIES
    # k-anonymity: the grand total must ride as a broadcast, the QI
    # groupBy is the only row-scale exchange
    p = _plan(SPARK_QUERIES["audit_k_anonymity"](spark, sf_dir))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    # join-cardinality estimator: the estimated join NEVER executes -
    # both sides reduce to per-key counts first (no SortMergeJoin of
    # the raw fact tables against each other)
    p = _plan(SPARK_QUERIES["profile_join_cardinality"](spark, sf_dir))
    assert "HashAggregate" in p
    # diversity metric: single pass, no join at all in the plan
    p = _plan(SPARK_QUERIES["emb_diversity_mean_cosine"](spark, sf_dir))
    assert "Join" not in p.replace("BroadcastNestedLoopJoin", "")
    # LOO encoding: one window exchange, no join-back
    p = _plan(SPARK_QUERIES["feature_target_encode_loo"](spark, sf_dir))
    assert "Window" in p and "Join" not in p


def test_mutual_information_engineered(spark):
    import math
    from mura_spark.operators.stats import mutual_information
    # perfectly dependent: A determines B -> MI = H(A) = ln 2
    df = spark.createDataFrame(
        [("a", "x")] * 4 + [("b", "y")] * 4, "u string, v string")
    r = mutual_information(df, "u", "v").first()
    assert (r.n, r.n_cells) == (8, 2)
    assert r.mi_micro == 2 * math.floor(
        0.5 * math.log((4.0 * 8.0) / (4.0 * 4.0)) * 1e6 + 0.5)
    # independent uniform 2x2 -> every cell term ln(1)=0
    df2 = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
        "u string, v string")
    assert mutual_information(df2, "u", "v").first().mi_micro == 0


def test_sequence_gaps_engineered(spark):
    from mura_spark.operators.profile import sequence_gaps
    # ids 10..20 with {13, 14, 17} missing: 2 gap runs, 3 missing
    present = [i for i in range(10, 21) if i not in (13, 14, 17)]
    df = spark.createDataFrame([(i,) for i in present * 2], "k long")
    r = sequence_gaps(df, "k").first()
    assert (r.n_ids, r.span_min, r.span_max) == (8, 10, 20)
    assert (r.n_missing, r.n_gap_runs, r.first_missing) == (3, 2, 13)
    # dense sequence: zero gaps, NULL first_missing
    d2 = spark.createDataFrame([(i,) for i in range(5)], "k long")
    r2 = sequence_gaps(d2, "k").first()
    assert (r2.n_missing, r2.n_gap_runs, r2.first_missing) == (0, 0, None)


def test_weighted_median_engineered(spark):
    from mura_spark.operators.stats import group_weighted_median
    # values 1..4 weights 1,1,1,10 -> half of W=13 is 6.5, reached at 4
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 10),
         # h: symmetric weights -> lower median 10
         ("h", 10, 5), ("h", 20, 5)],
        "g string, v long, w long")
    got = {r.g: r for r in
           group_weighted_median(df, ["g"], "v", "w").collect()}
    assert (got["g"].w_total, got["g"].median_value) == (13, 4)
    assert (got["h"].w_total, got["h"].median_value) == (10, 10)
    # unit weights reduce to the plain lower median
    df2 = spark.createDataFrame(
        [("u", v, 1) for v in (5, 1, 9, 7, 3)], "g string, v long, w long")
    assert group_weighted_median(
        df2, ["g"], "v", "w").first().median_value == 5


def test_activity_streaks_engineered(spark):
    from mura_spark.operators.rolling import activity_streaks
    rows = ([(1, d) for d in (1, 2, 3, 7, 8)]       # streaks 3, 2
            + [(2, d) for d in (4,)]                # streak 1
            + [(3, d) for d in (1, 2, 3, 4, 5)])    # streak 5
    df = spark.createDataFrame(rows * 2, "u long, d long")  # dup events
    got = {r.u: r for r in activity_streaks(df, "u", "d").collect()}
    assert (got[1].n_active_days, got[1].max_streak) == (5, 3)
    assert (got[2].n_active_days, got[2].max_streak) == (1, 1)
    assert (got[3].n_active_days, got[3].max_streak) == (5, 5)


def test_mutual_nn_engineered(spark):
    from mura_spark.operators.similarity import mutual_nearest_neighbors
    # 1<->2 mutual (nearly parallel); 3's best is 1 but 1's best is 2;
    # 4 orthogonal-ish pairs with 5
    vecs = [(1, [1.0, 0.0, 0.0]), (2, [0.99, 0.14, 0.0]),
            (3, [0.9, -0.44, 0.0]), (4, [0.0, 0.0, 1.0]),
            (5, [0.1, 0.0, 0.995])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in
           mutual_nearest_neighbors(df, n_blocks=3).collect()}
    assert got == {(1, 2), (4, 5)}
    # exact duplicates: tie broken to smallest id, pair (1,2) mutual
    df2 = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>")
    got2 = sorted((r.id_a, r.id_b) for r in
                  mutual_nearest_neighbors(df2, n_blocks=2).collect())
    # best(1)=2, best(2)=1, best(3)=1 -> only (1,2) reciprocal
    assert got2 == [(1, 2)]


def test_hapax_rate_engineered(spark, tmp_path):
    docs = [("apple banana apple cherry", "en", "s1"),
            ("banana banana dragon", "en", "s1"),
            ("x y", "en", "s2")]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.source: r for r in
           SPARK_QUERIES["text_hapax_rate"](spark, sf).collect()}
    # s1: counts apple=2 banana=3 cherry=1 dragon=1 -> hapax 2/4
    assert (got["s1"].n_tokens, got["s1"].n_distinct,
            got["s1"].n_hapax) == (7, 4, 2)
    assert got["s1"].hapax_rate_micro == 500000
    assert (got["s2"].n_hapax, got["s2"].n_distinct) == (2, 2)


def test_group_entropy_engineered(spark):
    import math
    from mura_spark.operators.stats import group_entropy
    rows = ([("u1", "a")] * 4                       # single type -> 0
            + [("u2", "a"), ("u2", "b")] * 2        # uniform 2 -> ln 2
            + [("u3", "a")] * 3 + [("u3", "b")])    # skewed
    df = spark.createDataFrame(rows, "u string, t string")
    got = {r.u: r for r in group_entropy(df, ["u"], "t").collect()}
    assert (got["u1"].n_rows, got["u1"].n_cats,
            got["u1"].entropy_micro) == (4, 1, 0)
    assert got["u2"].entropy_micro == 2 * math.floor(
        -(0.5) * math.log(0.5) * 1e6 + 0.5)
    exp3 = (math.floor(-(3 / 4) * math.log(3 / 4) * 1e6 + 0.5)
            + math.floor(-(1 / 4) * math.log(1 / 4) * 1e6 + 0.5))
    assert got["u3"].entropy_micro == exp3


def test_clustering_coefficients_engineered(spark):
    from mura_spark.operators.graph import clustering_coefficients
    # triangle 1-2-3 plus pendant 3-4: cc(1)=cc(2)=1, cc(3)=1/3,
    # 4 excluded (degree 1)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long")
    got = {r.node: r for r in
           clustering_coefficients(edges).collect()}
    assert 4 not in got
    assert (got[1].degree, got[1].n_triangles, got[1].cc_micro) == (
        2, 1, 1000000)
    assert (got[3].degree, got[3].n_triangles, got[3].cc_micro) == (
        3, 1, 333333)
    # square 5-6-7-8 (no diagonals): all cc 0, degree 2
    sq = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 8), (8, 5)], "src long, dst long")
    got2 = clustering_coefficients(sq).collect()
    assert len(got2) == 4
    assert all(r.cc_micro == 0 and r.n_triangles == 0 for r in got2)


def test_ols2_recovers_planted_coefficients(spark):
    # y = 7 + 3*x1 - 2*x2 exactly -> b0=7, b1=3, b2=-2, R^2=1
    rows = [((7 + 3 * a - 2 * b) / 100.0, float(a), b / 100.0)
            for a in range(1, 7) for b in range(1, 5)]
    df = spark.createDataFrame(
        rows, "l_extendedprice double, l_quantity double, "
              "l_discount double")
    df.createOrReplaceTempView("mura_ols2_test")
    from mura_spark.suite.stats_q import _ols2_sql
    r = spark.sql(_ols2_sql("mura_ols2_test")).first()
    assert r.n_rows == 24
    assert (r.b0_micro, r.b1_micro, r.b2_micro) == (
        7000000, 3000000, -2000000)
    assert r.r2_micro == 1000000


def test_quartile_migration_engineered(spark):
    from mura_spark.operators.features import quartile_migration
    # year 1: keys 1..8 with increasing value (tiles 1,1,2,2,3,3,4,4);
    # year 2: reversed values -> each key flips to the mirror tile
    rows = ([(k, 1, k * 10) for k in range(1, 9)]
            + [(k, 2, (9 - k) * 10) for k in range(1, 9)])
    df = spark.createDataFrame(rows, "k long, yr int, v long")
    got = {(r.tile_from, r.tile_to): r.n_moves for r in
           quartile_migration(df, "k", "yr", "v").collect()}
    assert got == {(1, 4): 2, (2, 3): 2, (3, 2): 2, (4, 1): 2}


def test_scene_changes_engineered_cut(spark):
    from mura_spark.multimodal.binary_ops import encode_ppm, scene_changes
    import numpy as np
    # build a 3-frame 4x4 Cmono clip: two identical dark frames then a
    # bright frame -> exactly one cut at frame 2
    dark = bytes([10] * 16)
    bright = bytes([200] * 16)
    clip = (b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 Cmono\n"
            + b"FRAME\n" + dark + b"FRAME\n" + dark
            + b"FRAME\n" + bright)
    df = spark.createDataFrame([(1, bytearray(clip)),
                                (2, bytearray(b"garbage"))],
                               "id long, content binary")
    got = {r.id: r for r in
           scene_changes(df, threshold_sad=500).collect()}
    assert (got[1].n_frames, got[1].n_cuts, got[1].first_cut) == (3, 1, 2)
    assert got[1].max_sad == 16 * 190
    # quarantine row for the undecodable payload
    assert got[2].n_frames is None and got[2].n_cuts is None


def test_rake_keywords_engineered(spark):
    from mura_spark.operators.keywords import rake_keywords
    # classic RAKE toy: "red apple" phrase repeated, split by stopwords
    docs = [(1, "red apple and the green pear"),
            (2, "red apple of doom"),
            (3, "the pear")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    stop = ["the", "a", "of", "and", "to"]
    got = {r.phrase: r for r in
           rake_keywords(df, "doc_id", "text", stop, k=10).collect()}
    # freq: red=2 apple=2 green=1 pear=2 doom=1
    # deg:  red: 2+2, apple: 2+2, green: 2, pear: 2+1, doom: 1
    # score: red=2 apple=2 green=2 pear=1.5 doom=1
    assert got["red apple"].n_occ == 2
    assert got["red apple"].score_micro == 4000000
    assert got["green pear"].score_micro == 2000000 + 1500000
    assert got["doom"].score_micro == 1000000
    assert got["pear"].n_occ == 1       # standalone occurrence (doc 3)


def test_wilson_interval_engineered(spark, tmp_path):
    import math
    # one day, 100 events, 10 errors: hand-compute the Wilson bounds
    rows = []
    for i in range(100):
        t = "error" if i < 10 else "view"
        rows.append((i, f"2024-01-05T10:{i % 60:02d}:00", 1, t, 1.0, "{}"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_wilson_error_rate"](spark, out).first()
    assert (r.n, r.e) == (100, 10)
    p, n, z = 0.1, 100.0, 1.96
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    den = 1 + z * z / n
    assert r.lo_micro == math.floor((center - half) / den * 1e6 + 0.5)
    assert r.hi_micro == math.floor((center + half) / den * 1e6 + 0.5)
    assert r.lo_micro < 100000 < r.hi_micro


def test_sequence_entropy_rate_deterministic_chain(spark, tmp_path):
    import math
    # user cycles a->b->a->b: transitions ab, ba, ab deterministic
    # -> entropy rate 0; add user with a->a, a->b mix for nonzero
    rows = [(i, f"2024-01-01T00:00:{i:02d}", 1, t, 1.0, "{}")
            for i, t in enumerate(["a", "b", "a", "b"])]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_sequence_entropy_rate"](spark, out).first()
    # every observed transition is deterministic: ln(1) terms -> 0
    assert (r.n_transitions, r.n_states, r.entropy_rate_micro) == (3, 2, 0)


def test_cuped_reduces_variance_and_preserves_means(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rows = SPARK_QUERIES["events_ab_cuped"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 2
    by_v = {r.variant: r for r in rows}
    assert set(by_v) == {0, 1}
    for r in rows:
        # adjusted mean stays within the plausible range of the raw
        assert r.var_reduction_micro >= 0
        assert r.n_users > 0


def test_modularity_two_cliques(spark):
    from mura_spark.operators.graph import modularity
    # two disjoint triangles, perfect 2-community split:
    # per community: e_c=3, d_c=6, m=6 -> Q_c = 3/6 - (6/12)^2 = .25
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "src long, dst long")
    labels = spark.createDataFrame(
        [(n, 1 if n <= 3 else 4) for n in range(1, 7)],
        "node long, lbl long")
    got = {r.community: r for r in modularity(edges, labels).collect()}
    for c in (1, 4):
        assert (got[c].n_nodes, got[c].e_in, got[c].d_tot) == (3, 3, 6)
        assert got[c].q_micro == 250000
    # everything in ONE community: Q = m/m - (2m/2m)^2 = 0
    one = spark.createDataFrame([(n, 0) for n in range(1, 7)],
                                "node long, lbl long")
    assert all(r.q_micro == 0 and r.e_in == 6
               for r in modularity(edges, one).collect())


def test_oneway_anova_engineered(spark):
    import math
    from mura_spark.operators.stats import oneway_anova
    # identical group means -> SSB 0 -> F 0
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 10), ("b", 20)], "g string, v long")
    r = oneway_anova(df, "g", "v").first()
    assert (r.k, r.n, r.f_micro, r.eta2_micro) == (2, 4, 0, 0)
    # hand-computed: a={0,0}, b={10,10} -> SSB=100, SSW=0 -> undefined
    df2 = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 10), ("b", 10)], "g string, v long")
    r2 = oneway_anova(df2, "g", "v").first()
    assert r2.f_micro is None            # zero within-variance guard
    # textbook case: a={1,2,3}, b={4,5,6}: SSB=13.5, SSW=4, F=13.5/2
    df3 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)],
        "g string, v long")
    r3 = oneway_anova(df3, "g", "v").first()
    # quantized terms: A=floor(36/3+.5)+floor(225/3+.5)=12+75=87,
    # B=floor(441/6+.5)=74 -> ssb=13, ssw=91-87=4, F=13/(4/4)=3.25
    assert r3.f_micro == math.floor(13.0 / (4.0 / 4.0) * 1e6 + 0.5)
    assert r3.eta2_micro == math.floor(13.0 / 17.0 * 1e6 + 0.5)


def test_survival_km_engineered(spark, tmp_path):
    import math
    # 4 users: durations 0,0,1,2 (all observed; censor window empty
    # because last events are far from corpus max... build explicitly)
    # users: u1 day0 only (dur 0), u2 days 0-1 (dur 1), u3 days 0-2
    # (dur 2), u4 day 0 only (dur 0); corpus max day = day 10 via u5
    rows, eid = [], 0
    def ev(u, day):
        nonlocal eid
        eid += 1
        return (eid, f"2024-01-{day + 1:02d}T00:00:00", u, "view",
                1.0, "{}")
    for u, days in [(1, [0]), (2, [0, 1]), (3, [0, 1, 2]), (4, [0]),
                    (5, [0, 10])]:
        rows += [ev(u, d) for d in days]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.t_days: r for r in
           SPARK_QUERIES["events_survival_km"](spark, out).collect()}
    # u5 is censored (active at day 10 >= max-3); risk sets:
    # t=0: n=5, d=2 -> ln(3/5); t=1: n=3, d=1 -> +ln(2/3);
    # t=2: n=2, d=1 -> +ln(1/2); t=10: d=0<n=1 row with d=0
    assert (got[0].n_risk, got[0].n_deaths, got[0].n_censored) == (5, 2, 0)
    assert got[0].km_ln_micro == math.floor(math.log(0.6) * 1e6 + 0.5)
    exp1 = (math.floor(math.log(0.6) * 1e6 + 0.5)
            + math.floor(math.log(2 / 3) * 1e6 + 0.5))
    assert got[1].km_ln_micro == exp1
    assert got[2].km_ln_micro == exp1 + math.floor(
        math.log(0.5) * 1e6 + 0.5)
    assert got[10].n_censored == 1 and got[10].n_deaths == 0


def test_term_burstiness_engineered(spark, tmp_path):
    # "zzz" clumps in one doc (bursty); "aa" spread evenly (flat);
    # "bb" discriminates the Fano factor (q/s - s/D) from the squared
    # coefficient of variation (q*D/s^2 - 1) the query once computed
    docs = [("aa zzz zzz zzz zzz bb", "en", "s"), ("aa x bb", "en", "s"),
            ("aa y", "en", "s"), ("aa w", "en", "s")]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.term: r for r in
           SPARK_QUERIES["text_term_burstiness"](spark, sf).collect()}
    # aa: c=1 in 4 docs -> q=4, s=4, D=4 -> Fano = 4/4 - 4/4 = 0
    assert got["aa"].burst_micro == 0 and got["aa"].df == 4
    # zzz: c=4 in 1 doc -> q=16, s=4, D=4 -> 16/4 - 4/4 = 3
    assert got["zzz"].burst_micro == 3000000 and got["zzz"].df == 1
    # bb: c=1 in 2 of 4 docs -> q=2, s=2 -> 2/2 - 2/4 = 0.5 (the CV^2
    # form would report 1.0 here — scale-dependent and wrong)
    assert got["bb"].burst_micro == 500000 and got["bb"].df == 2


def test_xml_roundtrip_preserves_types(spark, tmp_path):
    from mura_spark.sources import text_formats as TF
    src = spark.createDataFrame(
        [(1, "Supplier#1", 123.45), (2, "S <&> weird", -0.125)],
        "s_suppkey long, s_name string, s_acctbal double")
    path = str(tmp_path / "xml")
    TF.write_xml(src, path, mode="overwrite")
    back = TF.scan_xml(spark, path,
                       schema="s_suppkey bigint, s_name string, "
                              "s_acctbal double")
    got = sorted((r.s_suppkey, r.s_name, r.s_acctbal)
                 for r in back.collect())
    # XML entity escaping round-trips the <&> payload; doubles exact
    assert got == [(1, "Supplier#1", 123.45), (2, "S <&> weird", -0.125)]


def test_mojibake_audit_engineered(spark, tmp_path):
    docs = [("clean text here", "en", "s1"),
            ("broken Ã© name", "en", "s1"),           # mojibake
            ("lost � char", "en", "s1"),         # replacement
            ("ctrl \x07 bell", "en", "s2")]           # control byte
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.source: r for r in
           SPARK_QUERIES["text_mojibake_audit"](spark, sf).collect()}
    assert (got["s1"].n_docs, got["s1"].n_mojibake,
            got["s1"].n_replacement, got["s1"].n_control) == (3, 1, 1, 0)
    assert (got["s2"].n_control, got["s2"].n_mojibake) == (1, 0)


def test_spearman_engineered(spark):
    from mura_spark.operators.stats import spearman_corr
    # perfect monotone (nonlinear) relation -> rho = 1
    df = spark.createDataFrame(
        [(x, x * x * x) for x in range(1, 8)], "x long, y long")
    assert spearman_corr(df, "x", "y").first().rho_micro == 1000000
    # perfect inverse -> -1
    df2 = spark.createDataFrame(
        [(x, -x) for x in range(1, 8)], "x long, y long")
    assert spearman_corr(df2, "x", "y").first().rho_micro == -1000000
    # ties handled via average ranks: x=[1,1,2], y=[10,10,20] -> 1
    df3 = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20)], "x long, y long")
    assert spearman_corr(df3, "x", "y").first().rho_micro == 1000000
    # constant column -> NULL (zero denominator)
    df4 = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "x long, y long")
    assert spearman_corr(df4, "x", "y").first().rho_micro is None


def test_dim_variance_engineered(spark, tmp_path):
    out = str(tmp_path / "mini")
    rows = [(1, [1.0, 0.5, 2.0], 0), (2, [1.0, -0.5, 2.0], 0),
            (3, [1.0, 0.5, 2.0], 1), (4, [1.0, -0.5, 2.0], 1)]
    (spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
        .coalesce(1).write.parquet(f"{out}/embeddings.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.dim: r for r in
           SPARK_QUERIES["emb_dim_variance"](spark, out).collect()}
    # dim 1: constant 1.0 -> std 0, mean 1e6 (dead dimension)
    assert (got[1].mean_micro, got[1].std_micro) == (1000000, 0)
    # dim 2: ±0.5 -> mean 0, std 0.5e6
    assert (got[2].mean_micro, got[2].std_micro) == (0, 500000)
    assert got[3].std_micro == 0 and got[3].mean_micro == 2000000


def test_debounce_engineered(spark, tmp_path):
    rows = [
        # user 1 'click': t=0, t=3 (debounced), t=10 (kept)
        (1, "2024-01-01T00:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01T00:00:03", 1, "click", 2.0, "{}"),
        (3, "2024-01-01T00:00:10", 1, "click", 4.0, "{}"),
        # different type same instant: never debounced against click
        (4, "2024-01-01T00:00:03", 1, "view", 8.0, "{}"),
        # user 2: single event kept
        (5, "2024-01-01T00:00:01", 2, "click", 16.0, "{}"),
    ]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.event_type: r for r in
           SPARK_QUERIES["events_debounce"](spark, out).collect()}
    assert (got["click"].n_kept, got["click"].n_debounced) == (3, 1)
    assert got["click"].kept_value == 1.0 + 4.0 + 16.0
    assert (got["view"].n_kept, got["view"].n_debounced) == (1, 0)


def test_trailing_windows_engineered(spark, tmp_path):
    rows = [
        # cutoff = max ts = day 30
        (1, "2024-01-30T12:00:00", 1, "view", 10.0, "{}"),   # in 1d
        (2, "2024-01-28T12:00:00", 1, "view", 5.0, "{}"),    # in 7d
        (3, "2024-01-05T12:00:00", 1, "view", 2.5, "{}"),    # in 30d
        (4, "2024-01-30T12:00:00", 2, "view", 1.0, "{}"),    # cutoff row
    ]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.user_id: r for r in
           SPARK_QUERIES["feature_trailing_windows"](spark, out)
           .collect()}
    r1 = got[1]
    assert (r1.n_1d, r1.v_1d_cents) == (1, 1000)
    assert (r1.n_7d, r1.v_7d_cents) == (2, 1500)
    assert r1.n_30d == 3
    assert r1.secs_since_last == 0
    assert (got[2].n_1d, got[2].secs_since_last) == (1, 0)


def test_triplet_accuracy_engineered(spark, tmp_path):
    out = str(tmp_path / "mini")
    # two tight clusters: label 0 near e1, label 1 near e2 -> acc 1.0
    rows = [(0, [1.0, 0.0], 0), (1, [0.99, 0.1], 0), (2, [0.98, 0.2], 0),
            (3, [0.0, 1.0], 1), (4, [0.1, 0.99], 1), (5, [0.2, 0.98], 1)]
    (spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
        .coalesce(1).write.parquet(f"{out}/embeddings.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["emb_triplet_accuracy"](spark, out).first()
    # anchors with a same-label successor: 2 per label -> 4 triplets
    assert r.n_triplets == 4
    assert r.acc_micro == 1000000


def test_velocity_screen_engineered(spark, tmp_path):
    rows = [
        # user 1: 3 events in 30s -> peak 3
        (1, "2024-01-01T00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01T00:00:20", 1, "view", 1.0, "{}"),
        (3, "2024-01-01T00:00:40", 1, "view", 1.0, "{}"),
        # user 2: events 2 min apart -> peak 1, not flagged
        (4, "2024-01-01T00:00:00", 2, "view", 1.0, "{}"),
        (5, "2024-01-01T00:02:30", 2, "view", 1.0, "{}"),
        # user 3: exactly 60s apart -> inclusive window counts both
        (6, "2024-01-01T00:00:00", 3, "view", 1.0, "{}"),
        (7, "2024-01-01T00:01:00", 3, "view", 1.0, "{}"),
    ]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.user_id: r for r in
           SPARK_QUERIES["events_velocity_screen"](spark, out).collect()}
    assert got[1].peak_60s == 3
    assert 2 not in got
    assert got[3].peak_60s == 2      # RANGE frame is inclusive


def test_script_mismatch_engineered(spark, tmp_path):
    docs = [("hello latin text", "en", "s"),     # clean en
            ("这是中文文本", "zh", "s"),             # clean zh
            ("no cjk here at all", "zh", "s"),   # zh label, no CJK
            ("mixed 中文 inside", "en", "s")]      # en label with CJK
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    got = {r.lang: r for r in
           SPARK_QUERIES["text_script_mismatch"](spark, sf).collect()}
    assert (got["zh"].n_docs, got["zh"].n_cjk, got["zh"].n_mismatch) \
        == (2, 1, 1)
    assert (got["en"].n_docs, got["en"].n_cjk, got["en"].n_mismatch) \
        == (2, 1, 1)


def test_power_analysis_hand_computed(spark, tmp_path):
    # the randomization unit is the USER: users 1..4 each total
    # 10/12/8/10 dollars across a DIFFERENT number of events, so a
    # per-event computation would see 6 rows and a smaller variance
    import math
    per_user = {1: [10.0], 2: [6.0, 6.0], 3: [8.0], 4: [4.0, 6.0]}
    rows = [(eid, "2024-01-01T00:00:00", uid, "view", v, "{}")
            for eid, (uid, v) in enumerate(
                (u, v) for u, vs in per_user.items() for v in vs)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_power_analysis"](spark, out).first()
    # user cents: 1000,1200,800,1000 -> mean 1000, var=(40000+0+40000)/3
    assert (r.n, r.mean_cents) == (4, 1000)
    var = 80000 / 3
    z2 = (1.959964 + 0.841621) ** 2
    exp = math.ceil(2 * z2 * var / ((0.02 * 1000.0) * (0.02 * 1000.0)))
    assert r.n_per_arm_mde2pct == exp
    # 5% MDE needs (5/2)^2 = 6.25x fewer samples (ceil-rounded)
    assert r.n_per_arm_mde5pct == math.ceil(
        2 * z2 * var / ((0.05 * 1000.0) * (0.05 * 1000.0)))


def test_error_budget_burn_engineered(spark, tmp_path):
    rows, eid = [], 0
    # day 1: 50% errors (burn 2.0); days 2-3: 0% (7d burn dilutes)
    for day, n_err, n_ok in [(1, 5, 5), (2, 0, 10), (3, 0, 10)]:
        for i in range(n_err + n_ok):
            eid += 1
            rows.append((eid, f"2024-01-0{day}T00:{i:02d}:00", 1,
                         "error" if i < n_err else "view", 1.0, "{}"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.day.day: r for r in
           SPARK_QUERIES["events_error_budget_burn"](spark, out)
           .collect()}
    assert got[1].burn_1d_micro == 2000000 and got[1].alert
    # day 2: 1d burn 0, 7d burn = 5/20/.25 = 1.0 -> no alert either way
    assert got[2].burn_1d_micro == 0 and not got[2].alert
    assert got[2].burn_7d_micro == 1000000
    assert got[3].burn_7d_micro < 1000000


def test_feature_hashing_deterministic_and_folds(spark, tmp_path):
    docs = [("alpha beta alpha", "en", "s"), ("beta", "en", "s")]
    sf = _mini_docs(spark, tmp_path, docs)
    from mura_spark.suite import SPARK_QUERIES
    rows = SPARK_QUERIES["text_feature_hashing"](spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.dim] = r.weight
    # same token always lands in the same signed dimension
    from mura_spark.functions.hashing import md5_hash48
    import hashlib
    def h48(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:12], 16)
    d_alpha, d_beta = h48("alpha") % 16, h48("beta") % 16
    s_alpha = 1 if h48("s|alpha") % 2 == 0 else -1
    s_beta = 1 if h48("s|beta") % 2 == 0 else -1
    exp0 = {}
    exp0[d_alpha] = exp0.get(d_alpha, 0) + 2 * s_alpha
    exp0[d_beta] = exp0.get(d_beta, 0) + s_beta
    exp0 = {k: v for k, v in exp0.items() if v != 0}
    assert by_doc[0] == exp0
    assert by_doc[1] == {d_beta: s_beta}


def test_late_session_query_plan_shapes(spark, sf_dir):
    """Plan pins for the round-6v..6ll additions."""
    from mura_spark.suite import SPARK_QUERIES
    # sequence-gaps: successor test is an equi anti join on a computed
    # key, never a sort of the id sequence
    p = _plan(SPARK_QUERIES["audit_sequence_gaps"](spark, sf_dir))
    assert "LeftAnti" in p
    # trailing-window features: ONE aggregate, no self-joins of events
    p = _plan(SPARK_QUERIES["feature_trailing_windows"](spark, sf_dir))
    assert p.count("HashAggregate") <= 4      # partial+final, no extra
    assert "SortMergeJoin" not in p
    # velocity screen: a RANGE window frame, not a pair self-join
    p = _plan(SPARK_QUERIES["events_velocity_screen"](spark, sf_dir))
    assert "RANGE BETWEEN" in p.upper() or "specifiedwindowframe" in p.lower() or "Window" in p
    assert "CartesianProduct" not in p
    # ANOVA: moments reduce before anything else; no window, no join
    p = _plan(SPARK_QUERIES["stats_anova_value_by_type"](spark, sf_dir))
    assert "Window" not in p and "SortMergeJoin" not in p
    # feature hashing: scan-side projection + one aggregate, no join
    p = _plan(SPARK_QUERIES["text_feature_hashing"](spark, sf_dir))
    assert "Join" not in p


def test_duplicate_invoice_screen_engineered(spark, tmp_path):
    out = str(tmp_path / "mini")
    rows = [
        (1, 10, "F", 500.00, "1995-01-01", "P"),
        (2, 10, "F", 500.00, "1995-01-05", "P"),   # dup within 7d
        (3, 10, "F", 500.00, "1995-02-01", "P"),   # same amt, too late
        (4, 10, "F", 123.45, "1995-01-01", "P"),   # different amount
        (5, 20, "F", 500.00, "1995-01-02", "P"),   # other customer
    ]
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = [(r.o1, r.o2, r.amount_cents, r.days_apart) for r in
           SPARK_QUERIES["orders_duplicate_invoice_screen"](
               spark, out).collect()]
    assert got == [(1, 2, 50000, 4)]


def test_vad_segments_engineered(spark):
    from mura_spark.multimodal.binary_ops import (encode_wav,
                                                  vad_segments)
    import numpy as np
    # 12 samples, frames of 4: [loud, quiet, loud] -> 2 segments
    samples = np.array([9000] * 4 + [10] * 4 + [9000] * 4,
                       dtype=np.int16).reshape(-1, 1)
    wav = encode_wav(samples, 8000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"junk"))],
        "id long, content binary")
    got = {r.id: r for r in
           vad_segments(df, frame_samples=4,
                        threshold=20000).collect()}
    assert (got[1].n_frames, got[1].n_active,
            got[1].n_segments, got[1].max_segment) == (3, 2, 2, 1)
    assert got[2].n_frames is None
    # one long run: all loud -> single segment of 3
    wav2 = encode_wav(np.array([9000] * 12, dtype=np.int16)
                      .reshape(-1, 1), 8000)
    df2 = spark.createDataFrame([(3, bytearray(wav2))],
                                "id long, content binary")
    r3 = vad_segments(df2, 4, 20000).first()
    assert (r3.n_segments, r3.max_segment, r3.n_active) == (1, 3, 3)


def test_scripting_loop_semantics(spark):
    # the procedural surface itself: WHILE/SET/DECLARE fixed point
    r = spark.sql("""
BEGIN
  DECLARE acc BIGINT DEFAULT 1;
  DECLARE i INT DEFAULT 0;
  WHILE i < 5 DO
    SET acc = acc * 2;
    SET i = i + 1;
  END WHILE;
  SELECT acc AS v, i AS iters;
END
""").first()
    assert (r.v, r.iters) == (32, 5)


def test_holt_forecast_matches_reference_loop(spark, tmp_path):
    # daily cents: [1000, 1200, 1100, 1500] over 4 days
    vals = [10.0, 12.0, 11.0, 15.0]
    rows = [(i, f"2024-01-{i + 1:02d}T00:00:00", 1, "view", v, "{}")
            for i, v in enumerate(vals)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.horizon: r.forecast_cents for r in
           SPARK_QUERIES["events_holt_forecast"](spark, out).collect()}
    # reference fixed-point Holt with alpha=beta=1/2
    import math
    y = [1000, 1200, 1100, 1500]
    l, b = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        l_new = math.floor((y[t] + l + b) / 2)
        b = math.floor((l_new - l + b) / 2)
        l = l_new
    assert got == {k: l + k * b for k in range(8)}


def test_seasonal_index_engineered(spark, tmp_path):
    out = str(tmp_path / "mini")
    rows = [(1, 1, "F", 200.0, "1995-01-15", "P"),
            (2, 1, "F", 100.0, "1995-02-15", "P"),
            (3, 1, "F", 100.0, "1996-02-15", "P")]
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.mon: r.index_micro for r in
           SPARK_QUERIES["orders_seasonal_index"](spark, out).collect()}
    # overall mean 400/3; Jan mean 200 -> 1.5x; Feb mean 100 -> 0.75x
    assert got[1] == 1500000
    assert got[2] == 750000


def test_markov_baseline_engineered(spark, tmp_path):
    # chain a->b, a->b, a->c: best guess after 'a' is b -> 2/3
    rows = [(i, f"2024-01-01T00:0{i}:00", u, t, 1.0, "{}")
            for i, (u, t) in enumerate(
                [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
                 (3, "a"), (3, "c")])]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_markov_baseline_acc"](spark, out).first()
    assert (r.n_transitions, r.n_correct) == (3, 2)
    assert r.acc_micro == 666667


def test_ks_by_group_engineered(spark, tmp_path):
    # group A = {1,2}, group B = {3,4}: ECDFs never overlap -> D = 1
    # for both one-vs-rest tests; group C identical to the pooled rest
    # is exercised at suite level (sf0.01 oracle row).
    rows = [(1, "t", "A", "s", 1), (2, "t", "A", "s", 2),
            (3, "t", "B", "s", 3), (4, "t", "B", "s", 4)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.operators.stats import ks_by_group
    d = spark.read.parquet(f"{out}/documents.parquet")
    got = {r.lang: (r.n_group, r.n_rest, r.ks_micro)
           for r in ks_by_group(d, "lang", "n_chars").collect()}
    assert got == {"A": (2, 2, 1000000), "B": (2, 2, 1000000)}


def test_simpson_screen_engineered(spark):
    # Inside each stratum treated < control, but the pooled means flip
    # because stratum s2 (high values, mostly treated) dominates the
    # treated pool: the textbook reversal -> is_reversed = 1.
    rows = ([("s1", 1, 10)] * 1 + [("s1", 0, 20)] * 9
            + [("s2", 1, 90)] * 9 + [("s2", 0, 100)] * 1)
    df = spark.createDataFrame(rows, "source string, t int, v long")
    from pyspark.sql import functions as SF
    from mura_spark.operators.stats import simpson_screen
    got = {r.source: r for r in
           simpson_screen(df, "source", SF.col("t") == 1, "v").collect()}
    assert got["s1"].stratum_sign == -1 and got["s2"].stratum_sign == -1
    assert got["s1"].overall_sign == 1
    assert got["s1"].is_reversed == 1 and got["s2"].is_reversed == 1
    assert (got["s1"].n_treat, got["s1"].n_ctrl) == (1, 9)


def test_blocking_quality_engineered(spark, tmp_path):
    # 4 docs: 1 & 2 identical (SNM-adjacent AND Jaccard 1.0),
    # 3 & 4 unrelated -> truth = {(1,2)}, candidates include (1,2),
    # completeness = 1.0; with only 4 ranks and window 3 every pair is
    # a candidate, so reduction is exactly 0 (the degenerate floor).
    rows = [(1, "alpha beta gamma delta epsilon", "en", "s", 29),
            (2, "alpha beta gamma delta epsilon", "en", "s", 29),
            (3, "one two three four five six", "en", "s", 27),
            (4, "zed yank xray wolf victor up", "en", "s", 28)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["dedup_blocking_quality"](spark, out).first()
    assert r.n_docs == 4 and r.n_true == 1 and r.n_caught == 1
    assert r.completeness_micro == 1000000
    assert r.n_cand == 6 and r.reduction_micro == 0


def test_twap_engineered(spark, tmp_path):
    # user 1: value 10 held 3s, value 20 held 1s (last event unweighted)
    # -> TWAP = (10*3 + 20*1) / 4 = 12.5
    rows = [(1, "2024-01-01T00:00:00", 1, "a", 10.0, "{}"),
            (2, "2024-01-01T00:00:03", 1, "a", 20.0, "{}"),
            (3, "2024-01-01T00:00:04", 1, "a", 99.0, "{}")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_twap_value"](spark, out).first()
    assert (r.n_intervals, r.total_dur_us) == (2, 4000000)
    assert r.twap_micro == 12500000


def test_revenue_bridge_engineered(spark, tmp_path):
    # prev year: 2 orders x $100; curr year: 3 orders x $120.
    # volume = (3-2)*100 = $100; price = 3*(120-100) = $60;
    # change = $160 = volume + price exactly.
    rows = [(1, 1, "F", 100.0, "1999-03-01", "P"),
            (2, 1, "F", 100.0, "1999-06-01", "P"),
            (3, 1, "F", 120.0, "2000-01-01", "P"),
            (4, 1, "F", 120.0, "2000-05-01", "P"),
            (5, 1, "F", 120.0, "2000-09-01", "P")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["orders_revenue_bridge"](spark, out).first()
    assert (r.n_prev, r.n_curr) == (2, 3)
    assert r.change_cents == 16000
    assert r.volume_effect_micro == 100000000
    assert r.price_effect_micro == 60000000


def test_xcorr_lag_engineered(spark, tmp_path):
    # purchases = clicks shifted by +1 day (purchase day d+1 count ==
    # click day d count): r at lag +1 is exactly 1.0; lag 0 pairs the
    # unshifted (anti-correlated) counts.
    clicks = [(i, f"2024-01-0{d}T00:00:00", 1, "click", 1.0, "{}")
              for i, d in enumerate([1]*1 + [2]*2 + [3]*3 + [4]*1)]
    buys = [(100 + i, f"2024-01-0{d}T00:00:00", 1, "purchase", 1.0, "{}")
            for i, d in enumerate([2]*1 + [3]*2 + [4]*3 + [5]*1)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        clicks + buys,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.lag: (r.n_days, r.r_micro) for r in
           SPARK_QUERIES["events_xcorr_lag"](spark, out).collect()}
    assert got[1] == (4, 1000000)


def test_cmh_engineered(spark, tmp_path):
    # Two strata, each with a within-stratum weekend purchase odds
    # ratio of exactly 4 -> CMH pooled OR = 4. Stratum = hour (0, 1).
    # Sat 2024-01-06 (weekend), Wed 2024-01-03 (weekday).
    def mk(i, day, hour, typ):
        return (i, f"2024-01-0{day}T0{hour}:00:00", 1, typ, 1.0, "{}")
    rows, i = [], 0
    for hour in (0, 1):
        for day, n_p, n_o in ((6, 4, 1), (3, 1, 1)):
            for _ in range(n_p):
                rows.append(mk(i, day, hour, "purchase")); i += 1
            for _ in range(n_o):
                rows.append(mk(i, day, hour, "click")); i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_cmh_odds"](spark, out).first()
    # per stratum: a=4, b=1, c=1, d=1, n=7 -> ad/n=4/7, bc/n=1/7
    assert r.n_strata == 2
    assert r.sum_ad_micro == 2 * 571429 and r.sum_bc_micro == 2 * 142857
    assert r.or_micro == 4000007  # floor(1142858/285714*1e6+0.5)


def test_silhouette_engineered(spark, tmp_path):
    # Two tight 2-point clusters far apart (k=2, ids 1..4): every
    # point sits on its own centroid's grid cell after one update.
    rows = [(1, [0.0, 0.0]), (2, [0.2, 0.0]),
            (3, [10.0, 0.0]), (4, [10.2, 0.0])]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .coalesce(1).write.parquet(f"{out}/embeddings.parquet"))
    from mura_spark.operators.clustering import kmeans_silhouette
    e = spark.read.parquet(f"{out}/embeddings.parquet")
    got = {r.cluster: r for r in
           kmeans_silhouette(e, "vec_id", "embedding",
                             k=2, iterations=3).collect()}
    # a = 0.1 (to own centroid at the pair midpoint), b = 10.0-ish:
    # s = (b-a)/b ~ 0.99 for all four points, mean well above 0.9
    assert set(got) == {0, 1}
    for r in got.values():
        assert r.n_points == 2
        assert r.mean_silhouette_micro > 900000


def test_cluster_cohesion_engineered(spark, tmp_path):
    # 3 identical docs -> one 3-clique cluster: density exactly 1.0
    # (3 direct pairs / C(3,2)).
    rows = [(i, "alpha beta gamma delta epsilon zeta", "en", "s", 35)
            for i in (1, 2, 3)] + \
           [(9, "one two three four five six seven", "en", "s", 33)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["dedup_cluster_cohesion"](spark, out).collect()
    assert len(r) == 1
    assert (r[0].cluster_id, r[0].n_members, r[0].n_direct) == (1, 3, 3)
    assert r[0].density_micro == 1000000


def test_psi_engineered(spark, tmp_path):
    # reference week: values 1..100 (uniform); comparison week: values
    # 91..100 only -> all comparison mass lands in the top decile.
    rows = [(i, "2024-01-02T00:00:00", 1, "click", float(i), "{}")
            for i in range(1, 101)]
    rows += [(200 + i, "2024-01-25T00:00:00", 1, "click",
              float(90 + i), "{}") for i in range(1, 11)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.bin: r for r in
           SPARK_QUERIES["events_psi_drift"](spark, out).collect()}
    assert all(got[b].n_ref == 10 for b in range(10))
    assert got[9].n_cmp == 10 and all(
        got[b].n_cmp == 0 for b in range(9))
    # bin 9: p=.1, q=1.0 -> (p-q)*ln(p/q) = .9*ln(10) = 2.0723...
    assert got[9].psi_contrib_micro == 2072327
    assert got[0].psi_contrib_micro is None


def test_gains_engineered(spark, tmp_path):
    # perfectly separating scorer (long docs = en): top deciles capture
    # all positives; lift in the top decile = tn/tp
    rows = []
    for i in range(100):
        if i < 20:
            # en docs: long, stopword-rich -> high score
            rows.append((i, "the cat and the dog of the house "
                         "went to the big market " * 4, "en", "s", 100))
        else:
            rows.append((i, f"x{i} y{i}", "de", "s", 8))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.decile: r for r in
           SPARK_QUERIES["text_quality_gains"](spark, out).collect()}
    total_pos = sum(r.n_pos for r in got.values())
    assert total_pos == 20
    top = got[max(got)]
    assert top.n_pos == top.n_docs  # purest top bucket
    assert top.capture_micro == round(top.n_pos / 20 * 1e6)
    # reading ALL deciles captures everything at lift 1.0
    bottom = got[min(got)]
    assert bottom.capture_micro == 1000000
    assert bottom.lift_micro == 1000000


def test_conformal_engineered(spark, tmp_path):
    # identical docs -> every nonconformity equal: threshold == that
    # value, coverage = 1.0 on the test half
    rows = [(i, "the cat and the dog of the mouse", "en", "s", 32)
            for i in range(40)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["text_conformal_threshold"](spark, out).first()
    assert r.n_cal + r.n_test == 40
    assert r.q_rank == (r.n_cal + 1) * 9 // 10 + (
        1 if ((r.n_cal + 1) * 9) % 10 else 0)
    assert r.coverage_micro == 1000000


def test_minhash_calibration_engineered(spark, tmp_path):
    # two identical docs (J = 1.0 -> bucket 10, estimator exact) plus a
    # moderately-overlapping pair: its bucket's mean estimate must sit
    # within ~3 sigma (32 perms -> sigma < 0.09) of the true J.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    half = "alpha beta gamma delta epsilon zeta mu nu xi omicron"
    rows = [(1, base, "en", "s", len(base)),
            (2, base, "en", "s", len(base)),
            (3, half, "en", "s", len(half)),
            (4, base.replace("kappa", "lambda"), "en", "s", 60)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.bucket: r for r in
           SPARK_QUERIES["dedup_minhash_calibration"](spark, out)
           .collect()}
    assert got[10].mean_true_micro == 1000000
    assert got[10].mean_est_micro == 1000000
    mid = [r for b, r in got.items() if b < 10]
    assert mid  # the engineered partial-overlap pairs exist
    for r in mid:
        assert abs(r.mean_est_micro - r.mean_true_micro) < 300000


def test_runs_test_engineered(spark, tmp_path):
    # daily sums 1,3,2,4,3,5 -> diffs +,-,+,-,+: n_up=3, n_down=2,
    # 5 runs (every step alternates)
    import math
    vals = [1.0, 3.0, 2.0, 4.0, 3.0, 5.0]
    rows = [(i, f"2024-01-0{i+1}T00:00:00", 1, "click", v, "{}")
            for i, v in enumerate(vals)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_runs_test_daily"](spark, out).first()
    assert (r.n_up, r.n_down, r.n_runs) == (3, 2, 5)
    # runs-up-and-down null over m = 5 difference signs (NOT the
    # dichotomous Wald-Wolfowitz moments: consecutive diff signs of an
    # i.i.d. series agree w.p. 1/3, so E[R] = (2m+1)/3)
    mu = (2 * 5 + 1) / 3
    var = (16 * 5 - 13) / 90
    z = (5 - mu) / math.sqrt(var)
    assert r.z_micro == math.floor(z * 1e6 + 0.5)
    assert r.z_micro > 0  # strict alternation = mean reversion


def test_runs_test_white_noise_calibrated(spark, tmp_path):
    """An i.i.d. random series must NOT flag: the pre-fix dichotomous
    null had mu ~ m/2 + 1 instead of (2m+1)/3, biasing z by ~ +3.5 at
    ~120 diffs on pure noise."""
    import numpy as np
    rng = np.random.RandomState(11)
    vals = rng.uniform(1.0, 9.0, 128)
    rows = [(i, f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}T00:00:00",
             1, "click", float(v), "{}") for i, v in enumerate(vals)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_runs_test_daily"](spark, out).first()
    assert r.n_up + r.n_down > 100
    assert abs(r.z_micro) < 2_500_000  # |z| < 2.5 on noise


def test_order_totals_engineered(spark, tmp_path):
    # order 1 matches its lines exactly, order 2 is off by 50 cents,
    # order 3 has no lines
    orows = [(1, 1, "F", 30.0, "1999-01-01", "P"),
             (2, 1, "F", 20.0, "1999-01-02", "P"),
             (3, 1, "F", 10.0, "1999-01-03", "P")]
    lrows = [(1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "1999-01-05"),
             (1, 1, 1, 2, 1.0, 20.0, 0.0, 0.0, "N", "O", "1999-01-05"),
             (2, 1, 1, 1, 1.0, 19.5, 0.0, 0.0, "N", "O", "1999-01-05")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        orows, "o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate string, "
               "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    (spark.createDataFrame(
        lrows, "l_orderkey long, l_partkey long, l_suppkey long, "
               "l_linenumber int, l_quantity double, "
               "l_extendedprice double, l_discount double, l_tax double, "
               "l_returnflag string, l_linestatus string, "
               "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["audit_order_totals"](spark, out).first()
    assert (r.n_orders, r.n_no_lines, r.n_matched, r.n_mismatched) \
        == (3, 1, 1, 1)
    assert r.max_abs_diff_cents == 50
    assert r.total_abs_diff_cents == 50


def test_centroid_drift_engineered(spark, tmp_path):
    # even half along +x, odd half along +y -> centroid cosine 0;
    # then odd half also along +x -> cosine 1
    for vecs, want in ([([1.0, 0.0], [0.0, 1.0]), 0],
                       [([1.0, 0.0], [2.0, 0.0]), 1000000]):
        rows = [(0, vecs[0], 0), (2, vecs[0], 0),
                (1, vecs[1], 0), (3, vecs[1], 0)]
        out = str(tmp_path / f"mini{want}")
        (spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
            .coalesce(1).write.parquet(f"{out}/embeddings.parquet"))
        from mura_spark.suite import SPARK_QUERIES
        r = SPARK_QUERIES["emb_centroid_drift"](spark, out).first()
        assert (r.n_a, r.n_b) == (2, 2)
        assert r.cos_micro == want


def test_eb_shrinkage_engineered(spark, tmp_path):
    # source A: 1/2 en (tiny, extreme rate), B..E: 100 docs each at
    # ~20% en. A's shrunk rate must move toward the prior; the large
    # sources barely move.
    rows, i = [], 0
    for lang in ("en", "de"):
        rows.append((i, "t", lang, "A", 1)); i += 1
    for src in ("B", "C", "D", "E"):
        for j in range(100):
            rows.append((i, "t", "en" if j < 20 else "de", src, 1))
            i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.source: r for r in
           SPARK_QUERIES["stats_eb_shrinkage"](spark, out).collect()}
    assert got["A"].raw_micro == 500000
    # A shrinks strictly toward the ~26% prior mean
    assert got["A"].shrunk_micro < got["A"].raw_micro
    assert got["A"].shrunk_micro > 260000
    for s in "BCDE":
        assert abs(got[s].shrunk_micro - got[s].raw_micro) < 30000


def test_importance_weights_engineered(spark, tmp_path):
    # 90/10 split over two sources, uniform target 50%: weights
    # 0.5/0.9 and 0.5/0.1 -> 555556 and 5000000 micro
    rows = [(i, "t", "en", "big" if i < 90 else "small", 1)
            for i in range(100)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.source: r for r in
           SPARK_QUERIES["sample_importance_weights"](spark, out)
           .collect()}
    assert got["big"].weight_micro == 555556
    assert got["small"].weight_micro == 5000000
    assert got["small"].target_micro == 500000


def test_adf_engineered(spark, tmp_path):
    # strongly mean-reverting series (alternating high/low): ADF must
    # reject the unit root decisively (adf << -2.86, is_stationary=1);
    # statsmodels-free closed-form cross-check via numpy lstsq.
    import numpy as np
    vals = []
    for i in range(15):
        vals += [100.0 + (i % 3), 10.0 + (i % 2)]
    rows = [(i, f"2024-01-{i+1:02d}T00:00:00", 1, "click", v, "{}")
            for i, v in enumerate(vals)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_adf_value_daily"](spark, out).first()
    y = np.array([round(v * 100) for v in vals], dtype=float)
    dy, yl = np.diff(y), y[:-1]
    yv, x1, x2 = dy[1:], yl[1:], dy[:-1]
    X = np.column_stack([np.ones_like(x1), x1, x2])
    b, res, *_ = np.linalg.lstsq(X, yv, rcond=None)
    rss = float(((yv - X @ b) ** 2).sum())
    cov = rss / (len(yv) - 3) * np.linalg.inv(X.T @ X)[1, 1]
    adf = b[1] / np.sqrt(cov)
    assert r.n_obs == len(yv)
    assert r.is_stationary == 1 and r.adf_micro < -2860000
    assert abs(r.adf_micro - adf * 1e6) < 10  # closed form == lstsq


def test_backlog_aging_engineered(spark, tmp_path):
    rows = [(1, 1, "O", 10.0, "2024-01-10", "P"),   # 0d  -> 0-30d
            (2, 1, "O", 20.0, "2023-12-01", "P"),   # 40d -> 31-90d
            (3, 1, "P", 30.0, "2022-01-01", "P"),   # >365d
            (4, 1, "F", 99.0, "2024-01-01", "P")]   # finalized: excluded
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {(r.o_orderstatus, r.age_bucket): r for r in
           SPARK_QUERIES["orders_backlog_aging"](spark, out).collect()}
    assert got[("O", "0-30d")].backlog_cents == 1000
    assert got[("O", "31-90d")].backlog_cents == 2000
    assert got[("P", ">365d")].backlog_cents == 3000
    assert len(got) == 3


def test_pk_audit_engineered(spark):
    from mura_spark.suite import SPARK_QUERIES
    got = {r.tbl: r for r in
           SPARK_QUERIES["audit_primary_keys"](
               spark, "/root/testdata/sf0.001").collect()}
    assert set(got) == {"region", "nation", "customer", "supplier",
                        "part", "orders", "lineitem", "events",
                        "documents", "embeddings"}
    # single-key tables honor their contracts; the synthetic lineitem
    # genuinely violates (l_orderkey, l_linenumber) uniqueness — the
    # audit's whole purpose is to surface that
    for t, r in got.items():
        if t == "lineitem":
            assert r.n_dup_pk > 0
        else:
            assert r.n_dup_pk == 0 and r.n_rows == r.n_distinct_pk


def test_wilson_lcb_engineered(spark, tmp_path):
    # supplier 1: 2/4 returns (tiny n -> LCB far below 0.5);
    # supplier 2: 500/1000 (LCB close to 0.5). Ranking by LCB must
    # put the well-measured supplier above the noisy one.
    rows = ([(i, 1, 1, i, 1.0, 10.0, 0.0, 0.0,
              "R" if i < 2 else "N", "O", "1999-01-01")
             for i in range(4)]
            + [(100 + i, 1, 2, i, 1.0, 10.0, 0.0, 0.0,
                "R" if i < 500 else "N", "O", "1999-01-01")
               for i in range(1000)])
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.s_suppkey: r for r in
           SPARK_QUERIES["supplier_return_rate_lcb"](spark, out)
           .collect()}
    assert got[1].rate_micro == got[2].rate_micro == 500000
    assert got[1].lcb_micro < got[2].lcb_micro < 500000
    # closed-form spot value: Wilson LCB for 500/1000 at z=1.959964
    import math
    p, n, z = 0.5, 1000.0, 1.959964
    lcb = ((p + z * z / (2 * n)
            - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
           / (1 + z * z / n))
    assert got[2].lcb_micro == math.floor(lcb * 1e6 + 0.5)


# ------------------------- plan pinning: round-6qq..6aaa additions

def test_ks_drift_plan_broadcasts_grid(spark, sf_dir):
    # the sources x NDV grid must come from a broadcast of the tiny
    # group table, never a shuffle of the cells
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["text_ks_drift_by_source"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_twap_plan_reuses_user_partitioning(spark, sf_dir):
    # the window shuffle on user_id must be the ONLY exchange of the
    # events rows: the groupBy reuses the same hash partitioning
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["events_twap_value"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning(user_id") == 1


def test_revenue_bridge_plan_pushes_year_filter(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["orders_revenue_bridge"](spark, sf_dir))
    # year() wraps the column, so the scan keeps a residual filter but
    # must still prune to the two needed columns + date
    assert "o_orderkey" not in p.split("ReadSchema")[-1]
    assert "CartesianProduct" not in p


def test_psi_plan_no_cartesian_and_broadcast_bounds(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["events_psi_drift"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_blocking_quality_plan_single_mining(spark, sf_dir):
    # the mined truth pairs are eagerly materialized: both their uses
    # (count + intersect) must read the checkpoint (ExistingRDD), so
    # the expensive Jaccard mining can never re-execute
    from mura_spark.suite import SPARK_QUERIES
    df = SPARK_QUERIES["dedup_blocking_quality"](spark, sf_dir)
    p = _plan(df)
    assert p.count("ExistingRDD") >= 1
    assert "CartesianProduct" not in p


def test_cmh_plan_single_rollup(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["stats_cmh_odds"](spark, sf_dir))
    # one scan of events feeds the 24-stratum rollup
    assert p.count("events.parquet") == 1


def test_silhouette_plan_broadcasts_centroids(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["emb_silhouette"](spark, sf_dir))
    assert "BroadcastExchange" in p  # k-row centroid table broadcast
    assert "CartesianProduct" not in p


def test_adf_plan_single_scan(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["stats_adf_value_daily"](spark, sf_dir))
    assert p.count("events.parquet") == 1


def test_lcb_plan_pruned_scan(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["supplier_return_rate_lcb"](spark, sf_dir))
    # only the two needed columns reach the scan
    tail = p.split("ReadSchema")[-1]
    assert "l_suppkey" in tail and "l_returnflag" in tail
    assert "l_extendedprice" not in tail


def test_centroid_drift_plan_one_scan_per_use(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    p = _plan(SPARK_QUERIES["emb_centroid_drift"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # counts singleton broadcast


def test_group_by_all_matches_explicit(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    explicit = {(r.lang, r.source): (r.n_docs, r.total_chars) for r in
                d.groupBy("lang", "source")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_chars").alias("total_chars")).collect()}
    got = {(r.lang, r.source): (r.n_docs, r.total_chars) for r in
           SPARK_QUERIES["agg_group_by_all"](spark, sf_dir).collect()}
    assert got == explicit


def test_collation_filter_case_insensitive(spark, tmp_path):
    rows = [(1, "t", "EN", "s", 1), (2, "t", "en", "s", 1),
            (3, "t", "eN", "s", 1), (4, "t", "de", "s", 1),
            (5, "t", "ZH", "s", 1)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.lang: r.n_docs for r in
           SPARK_QUERIES["string_collation_filter"](spark, out)
           .collect()}
    # all EN casings match 'EN'; 'ZH' matches 'Zh'; 'de' excluded
    assert got == {"EN": 1, "en": 1, "eN": 1, "ZH": 1}


def test_paired_ttest_engineered(spark, tmp_path):
    # three paired customers with diffs +10, +20, +30 dollars; one
    # 1999-only customer must be excluded from the pairs
    rows, k = [], 0
    for cust, a, b in ((1, 100.0, 110.0), (2, 100.0, 120.0),
                       (3, 100.0, 130.0)):
        rows.append((k, cust, "F", a, "1999-06-01", "P")); k += 1
        rows.append((k, cust, "F", b, "2000-06-01", "P")); k += 1
    rows.append((k, 9, "F", 55.0, "1999-01-01", "P"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_paired_ttest"](spark, out).first()
    import math
    diffs = [1000, 2000, 3000]
    n, mean = 3, 2000.0
    var = sum((d - mean) ** 2 for d in diffs) / (n - 1)
    t = mean / math.sqrt(var / n)
    assert r.n_pairs == 3 and r.mean_diff_cents == 2000
    assert r.t_micro == math.floor(t * 1e6 + 0.5)


def test_dedup_savings_engineered(spark, tmp_path):
    # source s1: two identical 5-token docs -> keeps one (50% tokens
    # saved); source s2: unique doc -> nothing saved
    rows = [(1, "alpha beta gamma delta epsilon", "en", "s1", 30),
            (2, "alpha beta gamma delta epsilon", "en", "s1", 30),
            (3, "one two three", "en", "s2", 13)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.source: r for r in
           SPARK_QUERIES["pipeline_dedup_savings"](spark, out).collect()}
    assert (got["s1"].n_docs, got["s1"].n_kept) == (2, 1)
    assert got["s1"].tokens_total == 10 and got["s1"].tokens_kept == 5
    assert got["s1"].savings_micro == 500000
    assert got["s2"].savings_micro == 0


def test_malformed_recovery_counts(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    import duckdb
    for name, tbl, key in (("csv_malformed_recovery", "nation",
                            "n_nationkey"),
                           ("jsonl_malformed_recovery", "supplier",
                            "s_suppkey")):
        r = SPARK_QUERIES[name](spark, sf_dir).first()
        exp = duckdb.sql(
            f"SELECT COUNT(*), SUM({key}) FROM "
            f"'{sf_dir}/{tbl}.parquet'").fetchone()
        assert (r.n_clean, r.n_corrupt, r.key_sum) == (exp[0], 3, exp[1])


def test_compaction_report_engineered(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    import duckdb
    n = duckdb.sql(f"SELECT COUNT(*) FROM "
                   f"'{sf_dir}/documents.parquet'").fetchone()[0]
    r = SPARK_QUERIES["source_compaction_report"](spark, sf_dir).first()
    assert r.n_files_before == 64
    assert r.n_files_after == -(-n // 200)  # ceil
    assert r.n_rows == n


def test_pinball_p50_is_minimizer(spark, sf_dir):
    # the exact median must (weakly) beat nearby constants on its own
    # pinball loss — the defining property of the quantile
    from mura_spark.suite import SPARK_QUERIES
    from mura_spark.functions.quantize import micro
    from mura_spark.operators.stats import group_percentiles
    from mura_spark.suite.common import table as _t
    ev = (_t(spark, sf_dir, "events")
          .where(F.col("value").isNotNull())
          .select("event_type", "value"))
    qs = group_percentiles(ev, ["event_type"], "value", [0.5], ["p50"])
    e = ev.join(F.broadcast(qs), "event_type")
    for shift in (-1000000, 1000000):  # ±1.0 in micro units
        base = (e.groupBy("event_type")
                 .agg(F.sum(F.abs(micro(F.col("value"))
                                  - F.col("p50_micro"))).alias("l")))
        moved = (e.groupBy("event_type")
                  .agg(F.sum(F.abs(micro(F.col("value"))
                                   - (F.col("p50_micro")
                                      + F.lit(shift)))).alias("l")))
        b = {r.event_type: r.l for r in base.collect()}
        m = {r.event_type: r.l for r in moved.collect()}
        assert all(b[k] <= m[k] for k in b)


def test_federated_join_matches_parquet_only(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    from mura_spark.suite.common import table as _t
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    exp = {row.r_name: (row.n_nations, row.n_suppliers,
                        row.total_acctbal) for row in
           (s.join(n, s["s_nationkey"] == n["n_nationkey"])
             .join(r, n["n_regionkey"] == r["r_regionkey"])
             .groupBy("r_name")
             .agg(F.countDistinct("n_nationkey").alias("n_nations"),
                  F.count(F.lit(1)).alias("n_suppliers"),
                  F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
                   .cast("double").alias("total_acctbal"))).collect()}
    got = {row.r_name: (row.n_nations, row.n_suppliers,
                        row.total_acctbal) for row in
           SPARK_QUERIES["source_federated_join"](spark, sf_dir)
           .collect()}
    assert got == exp  # text roundtrips are lossless


def test_dispersion_engineered(spark, tmp_path):
    # 4 orders with 1,2,3,4,5,6 lines... use counts [1,1,1,5]:
    # mean=2, var=(1+1+1+9)*... exact: n=4, s=8, q=1+1+1+25=28
    # var=(28-16)/3=4, D=2, z=(2-1)*sqrt(3/2)
    import math
    rows = []
    oid = 0
    for k in (1, 1, 1, 5):
        oid += 1
        for j in range(k):
            rows.append((oid, 1, 1, j, 1.0, 10.0, 0.0, 0.0,
                         "N", "O", "1999-01-01"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_dispersion_orders"](spark, out).first()
    assert (r.n, r.mean_micro, r.dispersion_micro) \
        == (4, 2000000, 2000000)
    assert r.z_micro == math.floor(math.sqrt(1.5) * 1e6 + 0.5)


def test_luma_sums_engineered(spark, tmp_path):
    # a text of 48 identical chars 'A' (65): every pixel is gray 65 ->
    # luma_milli = (299+587+114)*65 = 65000 per pixel, 16 pixels
    rows = [(1, "A" * 48, "en", "s1", 48),
            (2, "A" * 48, "en", "s1", 48)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["mm_brightness_by_source"](spark, out).first()
    assert (r.source, r.n_images) == ("s1", 2)
    assert r.luma_milli_sum == 2 * 16 * 65000
    assert r.mean_luma_milli == 65000


def test_assortativity_engineered(spark, tmp_path):
    # star graph (hub 1 <-> leaves 2,3,4): hub deg 3 pairs with leaf
    # deg 1 on every edge -> perfectly disassortative, r = -1
    # each (hub, leaf) co-occurs in its own order
    rows = []
    for oid, leaf in enumerate((2, 3, 4), start=1):
        rows.append((oid, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     "1999-01-01"))
        rows.append((oid, leaf, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     "1999-01-01"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["graph_degree_assortativity"](spark, out).first()
    assert r.n_edges == 6
    assert r.assortativity_micro == -1000000


def test_bucketed_join_plan_no_exchange(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    # at test scale the tables fit the broadcast threshold, which would
    # sidestep the layout entirely — disable it so the plan must rely
    # on bucketing (the 100 TB situation, where neither side broadcasts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPARK_QUERIES["join_bucketed_colocate"](spark, sf_dir)
        p = _plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # no Exchange may appear between the bucketed scans and the
    # SortMergeJoin (the final 5-group aggregate may exchange AFTER)
    assert "SortMergeJoin" in p
    assert "SelectedBucketsCount: 8 out of 8" in p
    join_part = p.split("SortMergeJoin")[-1]
    assert "Exchange" not in join_part


def test_mann_kendall_engineered(spark, tmp_path):
    # strictly increasing daily sums -> S = C(n,2), maximal trend
    import math
    vals = [float(10 * (i + 1)) for i in range(8)]
    rows = [(i, f"2024-01-0{i+1}T00:00:00", 1, "click", v, "{}")
            for i, v in enumerate(vals)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_mann_kendall_daily"](spark, out).first()
    n = 8
    assert (r.n_days, r.mk_s) == (n, n * (n - 1) // 2)
    var = n * (n - 1) * (2 * n + 5) / 18.0
    z = (r.mk_s - 1) / math.sqrt(var)
    assert r.z_micro == math.floor(z * 1e6 + 0.5)


def test_anomaly_deseasonalized_engineered(spark, tmp_path):
    # two full weeks of a perfect weekly pattern plus one spiked day:
    # only the spike is flagged (a plain threshold would flag every
    # weekend-shaped day)
    rows, i = [], 0
    for day in range(1, 29):
        dow_val = 100.0 if (day - 1) % 7 < 5 else 10.0
        jitter = float(day % 3)  # keeps MAD > 0 on clean days
        v = dow_val + jitter + (900.0 if day == 10 else 0.0)
        rows.append((i, f"2024-01-{day:02d}T00:00:00", 1, "click",
                     v, "{}")); i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.day_id: r for r in
           SPARK_QUERIES["events_anomaly_deseasonalized"](spark, out)
           .collect()}
    flagged = [d for d, r in got.items() if r.is_outlier == 1]
    spike = [d for d, r in got.items() if r.total_cents > 90000]
    assert flagged == spike and len(flagged) == 1


def test_deseasonalized_growth_engineered(spark, tmp_path):
    # month effect x2 in Feb: raw growth Jan->Feb = +100%, adjusted
    # growth ~= 0 (the index absorbs the seasonality)
    rows, k = [], 0
    for yr in (1999, 2000):
        for mon, amt in ((1, 100.0), (2, 200.0)):
            rows.append((k, 1, "F", amt, f"{yr}-{mon:02d}-15", "P"))
            k += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {(r.yr, r.mon): r for r in
           SPARK_QUERIES["orders_deseasonalized_growth"](spark, out)
           .collect()}
    # grand mean 150: Jan index 100/150, Feb index 200/150
    assert got[(1999, 1)].index_micro == 666667
    assert got[(1999, 2)].index_micro == 1333333
    # adjusted series is flat -> growth ~ 0 (within quantization)
    for key in ((1999, 2), (2000, 1), (2000, 2)):
        assert abs(got[key].growth_micro) < 5


def test_ivf_recall_engineered(spark, tmp_path):
    # 8 tight blobs at distinct angles, one per centroid (k = 8, and
    # the k-lowest-id init seeds one point per blob): every query's
    # true cosine top-10 is its blob-mates -> probe-1 recall = 1.0
    import math
    import random
    rng = random.Random(7)
    rows = []
    for i in range(96):
        ang = (i % 8) * math.pi / 4
        rows.append((i, [10.0 * math.cos(ang) + rng.uniform(-0.05, 0.05),
                         10.0 * math.sin(ang) + rng.uniform(-0.05, 0.05)],
                     i % 8))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(rows, "vec_id long, embedding array<float>, "
                                 "label int")
        .coalesce(1).write.parquet(f"{out}/embeddings.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = SPARK_QUERIES["ann_ivf_recall_at10"](spark, out).collect()
    assert len(got) == 10
    for r in got:
        assert r.n_candidates == 12
        assert r.n_hits == 10 and r.recall_micro == 1000000


def test_pq_adc_recall_bounds(spark, sf_dir):
    # recall must be a valid fraction per query, and ADC must beat the
    # random-10-of-N floor comfortably on real data
    from mura_spark.suite import SPARK_QUERIES
    got = SPARK_QUERIES["ann_pq_adc_recall_at10"](spark, sf_dir).collect()
    assert len(got) == 10
    for r in got:
        assert 0 <= r.n_hits <= 10
        assert r.recall_micro == round(r.n_hits / 10 * 1e6)
    mean = sum(r.n_hits for r in got) / 100.0
    assert mean > 0.2  # 2x8 codes on 64 dims: crude, but far from random


def test_hill_engineered(spark, tmp_path):
    # exact Pareto(alpha=2) grid: x_(i) = 1000/sqrt(i); Hill over the
    # top 100 must recover alpha ~ 2 (within quantization + grid noise)
    import math
    rows = [(i, "2024-01-01T00:00:00", 1, "click",
             round(1000.0 / math.sqrt(i + 1), 2), "{}")
            for i in range(300)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_hill_tail_index"](spark, out).first()
    assert r.k_order == 100
    assert 1700000 < r.alpha_micro < 2300000


def test_rich_club_engineered(spark, tmp_path):
    # 4-clique (parts 1-4 in one order) + pendant pairs: the clique
    # members have degree 3+, pendants 1 -> rich set = clique, and the
    # clique is fully connected -> phi = 1.0
    rows = []
    for ln, p in enumerate((1, 2, 3, 4), 1):
        rows.append((100, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     "1999-01-01"))
    oid = 0
    for a, b in ((10, 11), (12, 13), (14, 15), (16, 17)):
        oid += 1
        rows.append((oid, a, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     "1999-01-01"))
        rows.append((oid, b, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     "1999-01-01"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["graph_rich_club"](spark, out).first()
    # degrees: clique nodes 3, pendants 1 -> median 1, rich = degree>1
    assert (r.k_threshold, r.n_rich) == (1, 4)
    assert r.n_edges_rich == 12 and r.phi_micro == 1000000


def test_burrows_delta_engineered(spark, tmp_path):
    # sources A and B share a vocabulary profile; C is lexically
    # different -> Delta(A,B) must be the smallest pair distance
    rows, i = [], 0
    for src, text in (("A", "the cat and the dog ran to the house"),
                      ("A", "the cat and the dog sat in the house"),
                      ("B", "the cat and the dog walk to the house"),
                      ("B", "the cat and the dog hid in the house"),
                      ("C", "zeta omega psi chi phi upsilon tau rho"),
                      ("C", "omega zeta chi psi upsilon phi rho tau")):
        rows.append((i, text, "en", src, len(text))); i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {(r.source_a, r.source_b): r.delta_micro for r in
           SPARK_QUERIES["text_burrows_delta"](spark, out).collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert got[("A", "B")] < got[("A", "C")]
    assert got[("A", "B")] < got[("B", "C")]


def test_type_affinity_engineered(spark, tmp_path):
    # 4 sessions (distinct users, same hour): {a,b} x2, {a} x1, {b} x1
    # -> n=4, n_a=3, n_b=3, n_ab=2: lift = 4*2/(3*3) = 8/9
    rows, i = [], 0
    for u, types in ((1, "ab"), (2, "ab"), (3, "a"), (4, "b")):
        for t in types:
            rows.append((i, "2024-01-01T00:00:00", u, t, 1.0, "{}"))
            i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["events_type_affinity"](spark, out).first()
    assert (r.type_a, r.type_b) == ("a", "b")
    assert (r.n_cooccur, r.n_a, r.n_b) == (2, 3, 3)
    assert r.lift_micro == 888889


def test_cluster_balance_engineered(spark, tmp_path):
    # 8 equal blobs matching k=8 -> perfectly balanced: entropy =
    # ln(8), max share = 1/8
    import math
    import random
    rng = random.Random(11)
    rows = []
    for i in range(64):
        ang = (i % 8) * math.pi / 4
        rows.append((i, [10.0 * math.cos(ang) + rng.uniform(-0.05, 0.05),
                         10.0 * math.sin(ang) + rng.uniform(-0.05, 0.05)],
                     i % 8))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(rows, "vec_id long, embedding array<float>, "
                                 "label int")
        .coalesce(1).write.parquet(f"{out}/embeddings.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["emb_cluster_balance"](spark, out).first()
    assert (r.k_used, r.n_vectors, r.max_share_micro) == (8, 64, 125000)
    # 8 x floor(-(1/8)ln(1/8)*1e6+0.5) = 8 * 259930
    assert r.entropy_micro == 8 * math.floor(
        (1 / 8) * math.log(8) * 1e6 + 0.5)


def test_tost_engineered(spark, tmp_path):
    # identical A/B spend distributions with tiny jitter: diff ~ 0,
    # margin 5% of a ~$100 mean -> decisively equivalent
    rows, i = [], 0
    for uid in range(200):
        v = 100.0 + (uid % 7) * 0.1
        rows.append((i, "2024-01-01T00:00:00", uid, "click", v, "{}"))
        i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_tost_equivalence"](spark, out).first()
    assert r.na + r.nb == 200
    assert r.is_equivalent == 1
    assert abs(r.diff_cents) < 50


def test_circular_engineered(spark, tmp_path):
    # events at 23:00 and 01:00: circular mean = midnight (hour 0),
    # R = cos(15 deg) ~ 0.966 (each event 1h = pi/12 from mean)
    rows = [(0, "2024-01-01T23:00:00", 1, "a", 1.0, "{}"),
            (1, "2024-01-02T01:00:00", 1, "a", 1.0, "{}")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_circular_time_of_day"](spark, out).first()
    # mean hour 0 (or 24 - epsilon): distance to midnight < 1 minute
    assert min(r.mean_hour_micro, 24000000 - r.mean_hour_micro) < 20000
    import math
    assert abs(r.r_micro - round(math.cos(math.pi / 12) * 1e6)) < 5


def test_negative_pairs_engineered(spark, tmp_path):
    # one customer owning EVERY part -> zero negatives possible; one
    # customer owning one part -> up to 5 hash negatives, none equal
    # to the positive
    parts = [(p, f"part{p}") for p in range(4)]
    orows = [(1, 1, "F", 1.0, "1999-01-01", "P"),
             (2, 2, "F", 1.0, "1999-01-01", "P")]
    lrows = [(1, p, 1, p + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
              "1999-01-01") for p in range(4)]
    lrows.append((2, 0, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                  "1999-01-01"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(parts, "p_partkey long, p_name string")
        .coalesce(1).write.parquet(f"{out}/part.parquet"))
    (spark.createDataFrame(
        orows, "o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate string, "
               "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    (spark.createDataFrame(
        lrows, "l_orderkey long, l_partkey long, l_suppkey long, "
               "l_linenumber int, l_quantity double, "
               "l_extendedprice double, l_discount double, l_tax double, "
               "l_returnflag string, l_linestatus string, "
               "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.custkey: r for r in
           SPARK_QUERIES["sample_negative_pairs"](spark, out).collect()}
    assert got[1].n_pos == 4 and got[1].n_neg == 0
    assert got[2].n_pos == 1 and 1 <= got[2].n_neg <= 5


def test_funnel_sensitivity_engineered(spark, tmp_path):
    # user 1 converts in 30m, user 2 in 12h, user 3 never: rates
    # 1/3 at 1h and 6h, 2/3 at 24h
    rows = [(0, "2024-01-01T00:00:00", 1, "view", 1.0, "{}"),
            (1, "2024-01-01T00:30:00", 1, "purchase", 1.0, "{}"),
            (2, "2024-01-01T00:00:00", 2, "view", 1.0, "{}"),
            (3, "2024-01-01T12:00:00", 2, "purchase", 1.0, "{}"),
            (4, "2024-01-01T00:00:00", 3, "view", 1.0, "{}")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.window_label: r for r in
           SPARK_QUERIES["events_funnel_window_sensitivity"](spark, out)
           .collect()}
    assert all(got[w].n_viewers == 3 for w in ("1h", "6h", "24h"))
    assert (got["1h"].n_converted, got["6h"].n_converted,
            got["24h"].n_converted) == (1, 1, 2)
    assert got["24h"].rate_micro == 666667


def test_hash_cross_partitions_docs(spark, sf_dir):
    from mura_spark.suite import SPARK_QUERIES
    import duckdb
    n = duckdb.sql(f"SELECT COUNT(*) FROM "
                   f"'{sf_dir}/documents.parquet'").fetchone()[0]
    got = SPARK_QUERIES["feature_hash_cross"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in got) == n
    assert all(0 <= r.bucket < 32 for r in got)


def test_split_leakage_engineered(spark, tmp_path):
    # corpus of identical docs: every test shingle exists in train ->
    # leakage exactly 1.0 (the pathology leak-safe splitting prevents)
    rows = [(i, "alpha beta gamma delta epsilon zeta", "en", "s", 34)
            for i in range(40)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
        .coalesce(1).write.parquet(f"{out}/documents.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["audit_split_leakage"](spark, out).first()
    assert r.n_leaked == r.n_test_shingles > 0
    assert r.leakage_micro == 1000000


def test_cohens_d_engineered(spark, tmp_path):
    # clicks ~ N-ish around 100 with spread, purchases shifted +10:
    # cross-check d against the numpy closed form
    import numpy as np
    a = [100.0 + (i % 5) for i in range(50)]
    b = [110.0 + (i % 5) for i in range(40)]
    rows = [(i, "2024-01-01T00:00:00", 1, "click", v, "{}")
            for i, v in enumerate(a)]
    rows += [(100 + i, "2024-01-01T00:00:00", 1, "purchase", v, "{}")
             for i, v in enumerate(b)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_cohens_d_value"](spark, out).first()
    ca = np.array(a) * 100
    cb = np.array(b) * 100
    pooled = ((ca.var(ddof=0) * len(ca) + cb.var(ddof=0) * len(cb))
              / (len(ca) + len(cb) - 2))
    d = (cb.mean() - ca.mean()) / np.sqrt(pooled)
    assert (r.na, r.nb) == (50, 40)
    assert abs(r.cohens_d_micro - d * 1e6) < 2


def test_qini_engineered(spark, tmp_path):
    # per-user conversions need >= 15 purchases; build 40 users where
    # treated high-spenders convert and control never does: the top
    # decile's qini must be positive and the curve monotone-ish down
    rows, i = [], 0
    import hashlib
    def variant(uid):
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:12], 16)
        return (h % 1000) % 2
    treated = [u for u in range(200) if variant(u) == 1][:10]
    control = [u for u in range(200) if variant(u) == 0][:10]
    for rank, u in enumerate(treated):
        spend = 1000.0 - rank  # distinct spends -> clean deciles
        rows.append((i, "2024-01-01T00:00:00", u, "view", spend, "{}"))
        i += 1
        if rank < 5:  # top treated spenders convert
            for _ in range(15):
                rows.append((i, "2024-01-01T01:00:00", u, "purchase",
                             1.0, "{}")); i += 1
    for rank, u in enumerate(control):
        rows.append((i, "2024-01-01T00:00:00", u, "view",
                     900.5 - rank, "{}")); i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.decile: r for r in
           SPARK_QUERIES["stats_qini_curve"](spark, out).collect()}
    total_conv_t = sum(r.conv_t for r in got.values())
    assert total_conv_t == 5
    assert sum(r.conv_c for r in got.values()) == 0
    # bottom decile's cumulative row covers everything: qini = 5 - 0
    bottom = got[min(got)]
    assert bottom.qini_micro == 5000000


def test_late_session_plan_shapes(spark, sf_dir):
    # structural pins for the later round-6 additions: broadcast grids
    # everywhere, no raw cartesians, checkpointed pair reuse
    from mura_spark.suite import SPARK_QUERIES
    for name in ("stats_qini_curve", "text_burrows_delta",
                 "events_type_affinity", "stats_hill_tail_index",
                 "ann_pq_adc_recall_at10", "ann_ivf_recall_at10"):
        p = _plan(SPARK_QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in p, name
        assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p, name
    p = _plan(SPARK_QUERIES["dedup_cluster_cohesion"](spark, sf_dir))
    assert p.count("ExistingRDD") >= 1  # pairs mined once


def test_mahalanobis_engineered(spark, tmp_path):
    # tight correlated cloud + one jointly-weird point (high qty, LOW
    # price — inside both marginal ranges, far outside the ellipse)
    rows = []
    for i in range(100):
        q_ = 10 + (i % 10)
        rows.append((i, 1, 1, 1, float(q_), float(q_ * 10), 0.0, 0.0,
                     "N", "O", "1999-01-01"))
    rows.append((100, 1, 1, 1, 19.0, 100.0, 0.0, 0.0, "N", "O",
                 "1999-01-01"))
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_mahalanobis_outliers"](spark, out).first()
    assert r.n_rows == 101
    assert r.n_out99 >= 1          # the planted point
    assert r.n_out95 <= 10         # the cloud itself stays inside


def test_partial_corr_engineered(spark, tmp_path):
    # y = x + z with independent-ish x and z grids: r(x,y) is strong,
    # but r(x,y|z) must be ~1 (controlling z removes its noise);
    # cross-check against numpy
    import numpy as np
    rows, i = [], 0
    for xi in range(10):
        for zi in range(10):
            x, z = float(xi + 1), float(zi) / 100.0
            y = (x + zi) / 1.0  # price = qty + discount-index dollars
            rows.append((i, 1, 1, 1, x, y, z, 0.0, "N", "O",
                         "1999-01-01")); i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_partial_corr"](spark, out).first()
    xs = np.array([int(row[4]) for row in rows], dtype=float)
    ys = np.array([round(row[5] * 100) for row in rows], dtype=float)
    zs = np.array([round(row[6] * 100) for row in rows], dtype=float)
    def corr(a, b):
        return np.corrcoef(a, b)[0, 1]
    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    part = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert r.n_rows == 100
    assert abs(r.partial_rxy_z_micro - part * 1e6) < 5
    assert r.partial_rxy_z_micro > 995000  # ~1 after controlling z


def test_deming_engineered(spark, tmp_path):
    # symmetric noise on both axes around y = 2x + 3 (in the query's
    # integer units): Deming must recover the slope where OLS would
    # attenuate; cross-check against the closed form in numpy
    import numpy as np
    rng = np.random.RandomState(3)
    rows, i = [], 0
    for k in range(200):
        x_true = float(k % 40)
        y_true = 2.0 * x_true + 3.0
        x = x_true + float(rng.randint(-2, 3))
        y = y_true + float(rng.randint(-2, 3))
        # query units: x = quantity (int), y = extendedprice*100 (int)
        rows.append((i, 1, 1, 1, x, y / 100.0, 0.0, 0.0, "N", "O",
                     "1999-01-01")); i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_deming_qty_price"](spark, out).first()
    xs = np.array([int(row[4]) for row in rows], dtype=float)
    ys = np.array([round(row[5] * 100) for row in rows], dtype=float)
    cxx, cyy = xs.var(), ys.var()
    cxy = ((xs - xs.mean()) * (ys - ys.mean())).mean()
    slope = ((cyy - cxx) + np.sqrt((cyy - cxx) ** 2 + 4 * cxy ** 2)) \
        / (2 * cxy)
    assert abs(r.slope_micro - slope * 1e6) < 5
    assert 1800000 < r.slope_micro < 2200000


def test_kendall_engineered(spark, tmp_path):
    # purchases exactly track clicks across days -> every pair
    # concordant: tau-a = 1
    rows, i = [], 0
    for day, n in ((1, 2), (2, 4), (3, 6), (4, 8)):
        for _ in range(n):
            rows.append((i, f"2024-01-0{day}T00:00:00", 1, "click",
                         1.0, "{}")); i += 1
        for _ in range(n // 2):
            rows.append((i, f"2024-01-0{day}T01:00:00", 1, "purchase",
                         1.0, "{}")); i += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_kendall_tau_daily"](spark, out).first()
    assert (r.n_pairs, r.conc, r.disc) == (6, 6, 0)
    assert r.tau_a_micro == 1000000


def test_price_dispersion_engineered(spark, tmp_path):
    # part 1: constant unit price (cv 0); part 2: unit prices 10 and
    # 30 (high cv); part 3: only 2 lines -> filtered by n >= 3
    rows = [(1, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", "1999-01-01"),
            (2, 1, 1, 1, 3.0, 30.0, 0.0, 0.0, "N", "O", "1999-01-01"),
            (3, 1, 1, 1, 4.0, 40.0, 0.0, 0.0, "N", "O", "1999-01-01"),
            (4, 2, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "1999-01-01"),
            (5, 2, 1, 1, 1.0, 30.0, 0.0, 0.0, "N", "O", "1999-01-01"),
            (6, 2, 1, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", "1999-01-01"),
            (7, 3, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", "1999-01-01"),
            (8, 3, 1, 1, 1.0, 9.0, 0.0, 0.0, "N", "O", "1999-01-01")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate string")
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/lineitem.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = SPARK_QUERIES["parts_price_dispersion_topk"](spark, out) \
        .collect()
    assert [r.l_partkey for r in got] == [2, 1]  # part 3 filtered
    assert got[0].cv_micro == 500000  # sd 10 / mean 20
    assert got[1].cv_micro == 0


def test_event_disorder_engineered(spark, tmp_path):
    # user 1's third arrival (event_id order) carries an event time
    # 10 minutes BEFORE an already-seen one; everything else in order
    rows = [(0, "2024-01-01T00:00:00", 1, "a", 1.0, "{}"),
            (1, "2024-01-01T01:00:00", 1, "a", 1.0, "{}"),
            (2, "2024-01-01T00:50:00", 1, "a", 1.0, "{}"),
            (3, "2024-01-01T02:00:00", 2, "a", 1.0, "{}")]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["audit_event_disorder"](spark, out).first()
    assert (r.n_events, r.n_late) == (4, 1)
    assert r.max_late_us == 10 * 60 * 1000000
    assert r.p95_late_us == r.max_late_us


def test_ljung_box_engineered(spark, tmp_path):
    # strongly alternating daily series: lag-1 autocorrelation ~ -1
    # -> Q blows past the chi2(5) critical value (not white noise)
    vals = [100.0 if i % 2 == 0 else 10.0 for i in range(28)]
    rows = [(i, f"2024-01-{i+1:02d}T00:00:00", 1, "click", v, "{}")
            for i, v in enumerate(vals)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_ljung_box_daily"](spark, out).first()
    assert r.n_days == 28 and r.df == 5
    assert r.is_white_noise == 0
    assert r.q_micro > 11070500  # far beyond the critical value


def test_ljung_box_white_noise_direction(spark, tmp_path):
    # iid series -> Q stays UNDER the chi2(5) critical value and the
    # flag fires; pins that q_micro and the threshold share the micro
    # scale (a natural-unit 11.0705 would never flag anything white)
    import datetime

    import numpy as np
    rng = np.random.RandomState(0)
    vals = [round(float(v), 2) for v in rng.uniform(5, 150, 60)]
    d0 = datetime.date(2024, 1, 1)
    rows = [(i, f"{d0 + datetime.timedelta(days=i)}T00:00:00",
             1, "click", v, "{}") for i, v in enumerate(vals)]
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type "
              "string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/events.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    r = SPARK_QUERIES["stats_ljung_box_daily"](spark, out).first()
    assert r.n_days == 60 and r.df == 5
    assert r.q_micro == 4607693  # exact under the pinned quantization
    assert r.is_white_noise == 1


def test_churn_flags_engineered(spark, tmp_path):
    # cust 1: monthly buyer, last order right at the end -> no risk;
    # cust 2: monthly buyer gone silent for 6 months -> flagged
    rows, k = [], 0
    for m in range(1, 13):
        rows.append((k, 1, "F", 10.0, f"1999-{m:02d}-01", "P")); k += 1
    for m in range(1, 7):
        rows.append((k, 2, "F", 10.0, f"1999-{m:02d}-01", "P")); k += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.parquet(f"{out}/orders.parquet"))
    from mura_spark.suite import SPARK_QUERIES
    got = {r.o_custkey: r for r in
           SPARK_QUERIES["orders_churn_risk_flags"](spark, out)
           .collect()}
    assert got[1].churn_risk == 0
    assert got[2].churn_risk == 1
    assert got[2].idle_us > 2 * got[2].median_gap_us
