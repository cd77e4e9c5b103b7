"""Published-definition direction pins for the round-8 rotation cohort.

The oracle gate cannot catch MIRRORED formula bugs (the same wrong
formula in the Spark query and its DuckDB twin hash-matches green), so
each statistic promoted into the round-8 driver window whose formula
carries real misuse risk gets a pin here against its PUBLISHED
definition, computed independently in the test on engineered data:

- ``stats_brown_forsythe`` — one-way ANOVA F on |x − group MEDIAN|
  (Brown & Forsythe 1974). The data is asymmetric within groups so a
  Levene-on-means regression would change every deviation; a pure
  location shift must yield F = 0.
- ``events_survival_km`` — Kaplan–Meier product limit with the standard
  deaths-before-censoring tie convention: same-time censored subjects
  stay in the risk set.
- ``stats_cmh_odds`` — Mantel–Haenszel pooled OR Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ)
  on an engineered 2-stratum table with hand-countable cells.
- ``stats_eb_shrinkage`` — beta-binomial method-of-moments shrinkage:
  prior strength M = m̄(1−m̄)/v − 1, posterior (k + m̄M)/(n + M);
  sparse extreme sources must land strictly between raw and prior.
- ``stats_adf_value_daily`` — ADF t-stat cross-checked against an
  INDEPENDENT numpy least-squares fit (not the engine's Cramer closed
  form); a seeded random walk must not reject, a bounded series must.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest


def _mini_events(spark, tmp_path, rows):
    """(ts, user_id, event_type, value) -> sf dir with events.parquet."""
    df = spark.createDataFrame(
        [(i, ts, uid, et, float(v), "{}") for i, (ts, uid, et, v)
         in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = str(tmp_path / "mini")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def _mini_docs(spark, tmp_path, rows):
    """(lang, source) -> sf dir with documents.parquet."""
    df = spark.createDataFrame(
        [(i, f"doc {i}", lang, src, 5 + i % 7) for i, (lang, src)
         in enumerate(rows)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = str(tmp_path / "minidocs")
    df.coalesce(1).write.mode("overwrite") \
      .parquet(f"{out}/documents.parquet")
    return out


def _micro(x):
    return math.floor(x * 1e6 + 0.5)


# ------------------------------------------------- Brown-Forsythe


def _anova_f_quantized(groups):
    """Published one-way ANOVA F over integer observations, with the
    suite's unit-quantized per-group S²/n terms (exact-decimal SSB)."""
    k = len(groups)
    n = sum(len(v) for v in groups)
    terms, s_all, q_all = [], 0, 0
    for vs in groups:
        sg, qg = sum(vs), sum(x * x for x in vs)
        terms.append(math.floor(sg * sg / len(vs) + 0.5))
        s_all += sg
        q_all += qg
    a = sum(terms)
    b = math.floor(s_all * s_all / n + 0.5)
    ssb = max(a - b, 0)
    ssw = q_all - a
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_brown_forsythe_matches_published_definition(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    d0 = dt.datetime(2024, 9, 2, 12)
    # asymmetric within-group values: median != mean, so a
    # Levene-on-means mirror bug would change every deviation
    va = [10.00, 10.01, 10.02, 10.03, 10.14]   # median 10.02, mean 10.04
    vb = [50.00, 50.10, 50.20, 50.30, 51.40]   # median 50.20, mean 50.40
    rows = [(d0, 1, "a", v) for v in va] + [(d0, 2, "b", v) for v in vb]
    sf = _mini_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_brown_forsythe"](spark, sf).collect()[0]
    # published: cent-deviations from each group's exact MEDIAN
    dev_a = [round(abs(v - 10.02) * 100) for v in va]   # [2,1,0,1,12]
    dev_b = [round(abs(v - 50.20) * 100) for v in vb]   # [20,10,0,10,120]
    f_ref = _anova_f_quantized([dev_a, dev_b])
    assert (r.k, r.n) == (2, 10)
    assert r.f_micro == _micro(f_ref)
    # mirror-bug tripwire: deviations about the MEAN give a different F
    dev_am = [round(abs(v - 10.04) * 100) for v in va]
    dev_bm = [round(abs(v - 50.40) * 100) for v in vb]
    assert _micro(_anova_f_quantized([dev_am, dev_bm])) != r.f_micro


def test_brown_forsythe_location_shift_is_invisible(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    d0 = dt.datetime(2024, 9, 2, 12)
    va = [10.00, 10.01, 10.02, 10.03, 10.14]
    rows = ([(d0, 1, "a", v) for v in va]
            + [(d0, 2, "b", v + 40.00) for v in va])  # same spread
    sf = _mini_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_brown_forsythe"](spark, sf).collect()[0]
    # BF tests SPREAD: a pure level difference must yield F = 0
    assert r.f_micro == 0


# ------------------------------------------------- Kaplan-Meier


def test_survival_km_matches_published_product_limit(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    day = lambda i: dt.datetime(2024, 1, 1 + i, 12)  # noqa: E731
    rows = []
    # durations (last-first) and censoring derived from max day Jan 31:
    # active within the final 3 days (last >= Jan 28) -> censored
    for uid in (1, 2):                      # dur 0, death
        rows.append((day(0), uid, "view", 1.0))
    rows += [(day(0), 3, "view", 1.0), (day(2), 3, "view", 1.0)]   # dur 2 d
    rows += [(day(0), 4, "view", 1.0), (day(5), 4, "view", 1.0)]   # dur 5 d
    rows += [(day(10), 5, "view", 1.0), (day(15), 5, "view", 1.0)]  # dur 5 d
    rows += [(day(0), 6, "view", 1.0), (day(29), 6, "view", 1.0)]  # dur 29 c
    rows += [(day(1), 7, "view", 1.0), (day(28), 7, "view", 1.0)]  # dur 27 c
    rows += [(day(0), 8, "view", 1.0), (day(30), 8, "view", 1.0)]  # dur 30 c
    sf = _mini_events(spark, tmp_path, rows)
    got = [(r.t_days, r.n_risk, r.n_deaths, r.n_censored, r.km_ln_micro)
           for r in SPARK_QUERIES["events_survival_km"](spark, sf)
           .collect()]
    got.sort()
    # published KM: n_risk(t) = n - sum_{t'<t}(d+c); censored-at-t stay
    # at risk (deaths-before-censoring); S(t) = prod(1 - d/n_risk)
    steps = [(0, 2, 0), (2, 1, 0), (5, 2, 0),
             (27, 0, 1), (29, 0, 1), (30, 0, 1)]
    n, at_risk, cum, want = 8, 8, 0, []
    for t, d, c in steps:
        cum += _micro(math.log(1.0 - d / at_risk))
        want.append((t, at_risk, d, c, cum))
        at_risk -= d + c
    assert got == want


# ------------------------------------------------- CMH pooled odds


def test_cmh_odds_matches_mantel_haenszel(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    sat = dt.datetime(2024, 9, 7)    # Saturday (weekend)
    mon = dt.datetime(2024, 9, 9)    # Monday  (weekday)
    cells = {  # stratum hour -> (a, b, c, d) of the published 2x2
        1: (10, 10, 5, 20),
        2: (2, 8, 4, 16),
    }
    rows, uid = [], 0
    for hour, (a, b, c, d) in cells.items():
        for cnt, base, et in ((a, sat, "purchase"), (b, sat, "view"),
                              (c, mon, "purchase"), (d, mon, "view")):
            for _ in range(cnt):
                uid += 1
                rows.append((base.replace(hour=hour), uid, et, 1.0))
    sf = _mini_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_cmh_odds"](spark, sf).collect()[0]
    s_ad = sum(_micro(a * d / (a + b + c + d))
               for a, b, c, d in cells.values())
    s_bc = sum(_micro(b * c / (a + b + c + d))
               for a, b, c, d in cells.values())
    assert (r.n_strata, r.sum_ad_micro, r.sum_bc_micro) == (2, s_ad, s_bc)
    assert r.or_micro == _micro(s_ad / s_bc)
    # both strata have weekend purchase odds > weekday: pooled OR > 1
    assert r.or_micro > 1_000_000


# ------------------------------------------------- EB shrinkage


def test_eb_shrinkage_matches_beta_binomial_mom(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    sources = {  # source -> (n_docs, n_english)
        "big": (400, 120),       # rate 0.30 - dominates nothing (MoM
        "mid": (100, 30),        # is unweighted across sources)
        "small_hi": (4, 4),      # rate 1.00 - must shrink toward prior
        "small_lo": (4, 0),      # rate 0.00 - must shrink toward prior
    }
    rows = []
    for src, (n, k) in sources.items():
        rows += [("en", src)] * k + [("de", src)] * (n - k)
    sf = _mini_docs(spark, tmp_path, rows)
    got = {r.source: r for r in
           SPARK_QUERIES["stats_eb_shrinkage"](spark, sf).collect()}
    # replica of the published MoM: prior strength M = mbar(1-mbar)/v - 1
    pm = {s: _micro(k / n) for s, (n, k) in sources.items()}
    ng = len(sources)
    mbar = math.floor(sum(pm.values()) / ng + 0.5)
    ss = sum((p - mbar) ** 2 for p in pm.values())
    mb = mbar / 1e6
    var = ss / (ng - 1) / 1e12
    m_strength = mb * (1.0 - mb) / var - 1.0
    assert m_strength > 0
    for src, (n, k) in sources.items():
        want = _micro((k + mb * m_strength) / (n + m_strength))
        assert got[src].raw_micro == pm[src]
        assert got[src].shrunk_micro == want, src
    # direction: sparse extremes land strictly between raw and prior
    assert pm["small_hi"] > got["small_hi"].shrunk_micro > mbar
    assert pm["small_lo"] < got["small_lo"].shrunk_micro < mbar
    # and the well-observed source moves far less (relative to its gap)
    assert (abs(got["big"].shrunk_micro - pm["big"])
            < abs(got["small_hi"].shrunk_micro - pm["small_hi"]))


# ------------------------------------------------- Mann-Kendall


def test_mann_kendall_matches_published_tie_corrected_test(spark,
                                                           tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    vals = [1.00, 2.00, 3.00, 2.00, 2.00, 5.00, 4.00, 6.00]
    rows = [(dt.datetime(2024, 5, 1, 10) + dt.timedelta(days=i), 1,
             "purchase", v) for i, v in enumerate(vals)]
    sf = _mini_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_mann_kendall_daily"](spark, sf).collect()[0]
    y = [round(v * 100) for v in vals]
    n = len(y)
    s = sum((yj > yi) - (yj < yi)
            for i, yi in enumerate(y) for yj in y[i + 1:])
    from collections import Counter
    tie = sum(t * (t - 1) * (2 * t + 5)
              for t in Counter(y).values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    num = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
    assert (r.n_days, r.mk_s) == (n, s)
    assert r.z_micro == _micro(num / math.sqrt(var))
    assert s > 0  # the engineered series trends up


# ------------------------------------------------- Hill tail index


def test_hill_tail_index_matches_order_statistic_replica(spark,
                                                         tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    # Pareto-ish positive values incl. deliberate ties spanning the
    # k=100 boundary
    rs = np.random.RandomState(11)
    vals = np.round(10.0 * (1.0 - rs.rand(400)) ** (-1.0 / 1.5), 2)
    vals = np.clip(vals, 0.01, 5000.0)
    rows = [(dt.datetime(2024, 6, 1, 8) + dt.timedelta(minutes=i), 1,
             "view", float(v)) for i, v in enumerate(vals)]
    sf = _mini_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_hill_tail_index"](spark, sf).collect()[0]
    cents = sorted((round(v * 100) for v in vals), reverse=True)
    xk1 = cents[100]                       # the (k+1)-th order statistic
    terms = [math.floor(math.log(c / xk1) * 1e6 + 0.5)
             for c in cents[:100]]
    hill = math.floor(sum(terms) / 100.0 + 0.5)
    assert (r.k_order, r.xk_cents) == (100, xk1)
    assert r.hill_micro == hill
    assert r.alpha_micro == math.floor(1e12 / hill + 0.5)
    # direction: the generator's true tail index is 1.5; Hill on 400
    # samples should land in the right neighborhood
    assert 0.9e6 < r.alpha_micro < 2.4e6


# ------------------------------------------------- circular statistics


def test_circular_time_of_day_wraps_midnight(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    base = dt.datetime(2024, 7, 1)
    rows = (
        # type a: 23:00 and 01:00 -> circular mean 00:00, R = cos 15deg
        [(base.replace(hour=23), 1, "a", 1.0),
         (base.replace(hour=1), 2, "a", 1.0)]
        # type b: all at 12:00 -> mean 12, R = 1
        + [(base.replace(hour=12), 3, "b", 1.0)] * 4)
    sf = _mini_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in
           SPARK_QUERIES["stats_circular_time_of_day"](spark, sf)
           .collect()}
    two_pi = 6.283185307179586

    def replica(hours):
        ss = sum(math.floor(math.sin(h / 24.0 * two_pi) * 1e6 + 0.5)
                 for h in hours)
        sc = sum(math.floor(math.cos(h / 24.0 * two_pi) * 1e6 + 0.5)
                 for h in hours)
        ang = math.atan2(ss, sc)
        if ang < 0:
            ang += two_pi
        return (math.floor(ang / two_pi * 24.0 * 1e6 + 0.5),
                math.floor(math.hypot(ss, sc) / (1e6 * len(hours))
                           * 1e6 + 0.5))
    mh_a, r_a = replica([23, 1])
    mh_b, r_b = replica([12] * 4)
    assert (got["a"].mean_hour_micro, got["a"].r_micro) == (mh_a, r_a)
    assert (got["b"].mean_hour_micro, got["b"].r_micro) == (mh_b, r_b)
    # the published behavior the arithmetic mean gets wrong: 23:00 and
    # 01:00 average to midnight (0h), not noon; R = cos(15deg)
    assert got["a"].mean_hour_micro == 0
    assert abs(got["a"].r_micro - _micro(math.cos(math.radians(15.0)))) <= 2
    assert (got["b"].mean_hour_micro, got["b"].r_micro) \
        == (12_000_000, 1_000_000)


# ------------------------------------------------- TOST equivalence


def test_tost_equivalence_matches_welch_replica(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    d0 = dt.datetime(2024, 8, 1, 9)
    rows, arms = [], {0: [], 1: []}
    for uid in range(1, 161):
        # spend independent of the hash variant: arms differ only by
        # sampling noise -> equivalence should be DECLARED
        spend = 100.0 + (uid % 7)
        rows.append((d0, uid, "purchase", spend))
        arms[_hash_variant(uid)].append(round(spend * 100))
    sf = _mini_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_tost_equivalence"](spark, sf).collect()[0]
    a, b = arms[0], arms[1]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = (sum(x * x for x in a) - sum(a) ** 2 / na) / (na - 1)
    vb = (sum(x * x for x in b) - sum(b) ** 2 / nb) / (nb - 1)
    se = math.sqrt(va / na + vb / nb)
    diff, margin = mb - ma, 0.05 * ma
    assert (r.na, r.nb) == (na, nb)
    assert r.diff_cents == math.floor(diff + 0.5)
    assert abs(r.z_lower_micro - _micro((diff + margin) / se)) <= 3
    assert abs(r.z_upper_micro - _micro((margin - diff) / se)) <= 3
    want_eq = int((diff + margin) / se > 1.644854
                  and (margin - diff) / se > 1.644854)
    assert r.is_equivalent == want_eq == 1


# ------------------------------------------------- ADF unit root


def _adf_numpy(y):
    """Independent ADF(1, constant) fit: numpy lstsq, not Cramer."""
    y = np.asarray(y, float)
    dy = np.diff(y)
    yv, x1, x2 = dy[1:], y[1:-1], dy[:-1]
    X = np.column_stack([np.ones_like(yv), x1, x2])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    resid = yv - X @ beta
    n = len(yv)
    s2 = float(resid @ resid) / (n - 3)
    cov11 = s2 * np.linalg.inv(X.T @ X)[1, 1]
    return float(beta[1]), float(beta[1] / math.sqrt(cov11)), n


def _daily_value_events(tmp_path, spark, series):
    rows = [(dt.datetime(2024, 3, 1, 9) + dt.timedelta(days=i), 1,
             "purchase", float(v)) for i, v in enumerate(series)]
    return _mini_events(spark, tmp_path, rows)


def _mini_lineitem(spark, tmp_path, rows):
    """(qty, price_dollars, discount) -> sf dir with lineitem.parquet."""
    df = spark.createDataFrame(
        [(i, float(q), float(p), float(d)) for i, (q, p, d)
         in enumerate(rows)],
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double")
    out = str(tmp_path / "minili")
    df.coalesce(1).write.mode("overwrite") \
      .parquet(f"{out}/lineitem.parquet")
    return out


def _corr_rows():
    rs = np.random.RandomState(3)
    x = rs.randint(1, 50, 60)
    z = rs.randint(0, 11, 60)                      # discount %
    noise = rs.randint(-300, 301, 60)
    y = 10000 + 100 * x - 150 * z + noise          # price cents
    return [(int(xi), round(yi / 100.0, 2), zi / 100.0)
            for xi, yi, zi in zip(x, y, z)]


# ------------------------------------------- Mahalanobis outlier screen


def test_mahalanobis_counts_match_numpy(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rows = _corr_rows()
    # two jointly-weird points no univariate fence would flag
    rows += [(49, 5.00, 0.00), (1, 200.00, 0.00)]
    sf = _mini_lineitem(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_mahalanobis_outliers"](spark, sf) \
        .collect()[0]
    x = np.array([q for q, _, _ in rows], float)
    y = np.array([round(p * 100) for _, p, _ in rows], float)
    pts = np.column_stack([x, y])
    mu = pts.mean(axis=0)
    cov = np.cov(pts.T, ddof=1)
    inv = np.linalg.inv(cov)
    d = pts - mu
    md2 = np.einsum("ij,jk,ik->i", d, inv, d)
    assert r.n_rows == len(rows)
    assert r.n_out95 == int((md2 > 5.991465).sum())
    assert r.n_out99 == int((md2 > 9.21034).sum())
    assert r.n_out95 >= 2  # the planted pair is caught


# ------------------------------------------------- partial correlation


def test_partial_corr_matches_numpy(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rows = _corr_rows()
    sf = _mini_lineitem(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_partial_corr"](spark, sf).collect()[0]
    x = np.array([q for q, _, _ in rows], float)
    y = np.array([round(p * 100) for _, p, _ in rows], float)
    z = np.array([round(d * 100) for _, _, d in rows], float)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    want = (rxy - rxz * ryz) / math.sqrt((1 - rxz ** 2)
                                         * (1 - ryz ** 2))
    assert r.n_rows == len(rows)
    assert abs(r.rxy_micro - _micro(rxy)) <= 3
    assert abs(r.partial_rxy_z_micro - _micro(want)) <= 3
    # direction: z (discount) depresses y, so netting it out must
    # STRENGTHEN the x-y association, not weaken it
    assert r.partial_rxy_z_micro > r.rxy_micro


# ------------------------------------------------------- Qini curve


def _hash_variant(uid):
    import hashlib
    h = hashlib.md5(str(uid).encode()).hexdigest()[:12]
    return int(h, 16) % 1000 % 2


def test_qini_curve_matches_published_cumulative_uplift(spark,
                                                        tmp_path):
    import pandas as pd
    from mura_spark.suite import SPARK_QUERIES
    d0 = dt.datetime(2024, 4, 1, 12)
    rows, users = [], []
    for uid in range(1, 201):
        variant = _hash_variant(uid)
        conv = 1 if (variant == 1 and uid > 140) else 0  # top-spend lift
        rows.append((d0, uid, "view", float(uid)))       # sp = uid*100
        if conv:
            rows += [(d0, uid, "purchase", 0.00)] * 15
        users.append((uid, uid * 100, variant, conv))
    sf = _mini_events(spark, tmp_path, rows)
    got = {r.decile: r for r in
           SPARK_QUERIES["stats_qini_curve"](spark, sf).collect()}
    u = pd.DataFrame(users, columns=["uid", "sp", "variant", "conv"])
    # decile boundaries: ceil(i*n/10)-th smallest spend, i = 1..9
    bounds = [sorted(u.sp)[(i * len(u) + 9) // 10 - 1]
              for i in range(1, 10)]
    u["decile"] = u.sp.apply(lambda s: sum(s > b for b in bounds))
    ct_n = cc_n = ct_c = cc_c = 0
    for dec in sorted(u.decile.unique(), reverse=True):
        g = u[u.decile == dec]
        ct_n += int((g.variant == 1).sum())
        cc_n += int((g.variant == 0).sum())
        ct_c += int(g[g.variant == 1].conv.sum())
        cc_c += int(g[g.variant == 0].conv.sum())
        # published Qini: cumulative treated conversions minus the
        # control conversions scaled to the treated exposure
        want = _micro(ct_c - cc_c * ct_n / cc_n) if cc_n else None
        assert got[dec].qini_micro == want, dec
    # direction: lift was planted in treated top spenders only, so the
    # full-population cumulative uplift is strictly positive and the
    # top decile already shows it
    assert got[9].qini_micro > 0
    assert got[0].qini_micro > 0


def test_adf_rejects_bounded_series_not_random_walk(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rs = np.random.RandomState(7)
    walk = (500 + np.cumsum(rs.randint(-8, 9, 90))).tolist()
    stat = (100 + np.random.RandomState(7).randint(0, 17, 90)).tolist()
    sf_w = _daily_value_events(tmp_path / "w", spark, walk)
    sf_s = _daily_value_events(tmp_path / "s", spark, stat)
    rw = SPARK_QUERIES["stats_adf_value_daily"](spark, sf_w).collect()[0]
    rsn = SPARK_QUERIES["stats_adf_value_daily"](spark, sf_s).collect()[0]
    assert rw.n_obs == rsn.n_obs == 88
    # the engine's daily series is in CENTS; t-stats are scale-free but
    # b1 is not, and neither is affected by the x100 for the t check
    _, t_w, _ = _adf_numpy([v * 100 for v in walk])
    _, t_s, _ = _adf_numpy([v * 100 for v in stat])
    assert t_w > -2.86 and (rw.is_stationary == 0)
    assert t_s < -2.86 and (rsn.is_stationary == 1)
    # cross-check the t statistic against the independent numpy fit
    assert abs(rw.adf_micro - _micro(t_w)) <= 50
    assert abs(rsn.adf_micro - _micro(t_s)) <= 50
