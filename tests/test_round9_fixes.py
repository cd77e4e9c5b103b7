"""Independent replica pins for the round-9 driver-window cohort.

The oracle gate cannot catch MIRRORED formula bugs (the same wrong
formula in the Spark query and its DuckDB twin hash-matches green).
The round-6 suite pinned each of these statistics on a tiny
hand-countable case; this file adds the stronger defense the round-8
verdict asked for: an INDEPENDENT replica of the published definition
(pure python/pandas, no shared code with the engine) evaluated on a
seeded-random table large enough to exercise every branch — bin
boundaries that split cells, day gaps that separate RANGE from ROWS
frames, segments with a missing year, ties.

- ``events_psi_drift`` — PSI Σ(pᵢ−qᵢ)·ln(pᵢ/qᵢ) over reference-decile
  bins; boundaries are type-1 order statistics at rank ⌈i·n/10⌉.
- ``orders_revenue_bridge`` — price/volume decomposition: volume
  effect (n₂−n₁)·p̄₁, price effect n₂·(p̄₂−p̄₁); the effects sum to
  the exact revenue change.
- ``orders_seasonal_index`` — month MEAN over grand MEAN (uneven
  month counts make a sum-share mirror bug visible).
- ``events_error_budget_burn`` — burn = error_rate / 0.25 on 1-day
  and trailing-7-CALENDAR-day windows (day gaps in the data separate
  the correct RANGE frame from a ROWS-frame mirror bug); alert only
  when both exceed 1.
- ``events_holt_forecast`` — fixed-point Holt (α=β=½) recursion
  replayed by a plain python loop over a 45-day seeded series.
- ``operators.bpe.train_bpe`` — a from-first-principles BPE trainer
  (full pair recount per step, no incremental bookkeeping) must
  reproduce the merge table on the real sf0.001 corpus, so the
  recorded-golden ``bpe_top_merges`` oracle is no longer the only
  corpus-level evidence.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_string, user_id, event_type, value)."""
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/events.parquet"))
    return out


def _write_orders(spark, tmp_path, rows):
    """rows: (o_orderkey, o_custkey, price_dollars, date_str, prio)."""
    out = str(tmp_path / "mini")
    (spark.createDataFrame(
        [(k, c, "F", p, d, pr) for k, c, p, d, pr in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/orders.parquet"))
    return out


# ------------------------------------------------------------- PSI


def _psi_replica(ref_cents, cmp_cents):
    """Published PSI over reference deciles, reimplemented from the
    definition: thresholds are the smallest reference value whose
    cumulative count reaches ⌈i·n/10⌉ (type-1 order statistic, no
    interpolation); bin(c) = #thresholds strictly below c."""
    cells = Counter(ref_cents)
    n = len(ref_cents)
    th = []
    for i in range(1, 10):
        target = (i * n + 9) // 10
        gc = 0
        for v in sorted(cells):
            gc += cells[v]
            if gc >= target:
                th.append(v)
                break
    bin_of = lambda c: sum(1 for x in th if c > x)  # noqa: E731
    rb = Counter(bin_of(c) for c in ref_cents)
    cb = Counter(bin_of(c) for c in cmp_cents)
    tr, tc = float(sum(rb.values())), float(sum(cb.values()))
    out = {}
    for b in set(rb) | set(cb):
        nr, nc = rb.get(b, 0), cb.get(b, 0)
        contrib = None
        if nr > 0 and nc > 0:
            p, q = nr / tr, nc / tc
            contrib = math.floor(
                (p - q) * math.log(p / q) * 1000000.0 + 0.5)
        out[b] = (nr, nc, contrib)
    return out


def test_psi_matches_replica_on_seeded_shift(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(902)
    # reference week: heavy-tailed cents; comparison: shifted + scaled
    ref = [int(100 * rng.lognormvariate(3.0, 0.6)) + 1 for _ in range(300)]
    cmp_ = [int(130 * rng.lognormvariate(3.2, 0.5)) + 1 for _ in range(120)]
    rows = [(i, f"2024-01-0{1 + i % 7}T00:{i % 60:02d}:{i % 30:02d}",
             1, "click", c / 100.0) for i, c in enumerate(ref)]
    rows += [(1000 + i, f"2024-01-2{2 + i % 7}T00:{i % 60:02d}:00",
              1, "click", c / 100.0) for i, c in enumerate(cmp_)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.bin: (r.n_ref, r.n_cmp, r.psi_contrib_micro) for r in
           SPARK_QUERIES["events_psi_drift"](spark, sf).collect()}
    exp = _psi_replica(ref, cmp_)
    assert got == exp
    # PSI contributions are non-negative by construction ((p−q) and
    # ln(p/q) share sign) — a swapped-ratio mirror bug flips signs
    assert all(v[2] is None or v[2] >= 0 for v in got.values())
    # the engineered shift must register as real drift (PSI > 0.1)
    assert sum(v[2] or 0 for v in got.values()) > 100000


# -------------------------------------------------- revenue bridge


def test_revenue_bridge_matches_replica_on_seeded_years(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(903)
    rows, k = [], 0
    for prio in ["1-URGENT", "2-HIGH", "3-MEDIUM"]:
        for yr, lam in [(1998, 7), (1999, 11), (2000, 17)]:
            # 1998 rows must be invisible to the bridge
            for _ in range(rng.randint(5, 25)):
                k += 1
                cents = rng.randint(1000, 9999999)
                rows.append((k, rng.randint(1, 9), cents / 100.0,
                             f"{yr}-{rng.randint(1, 12):02d}-"
                             f"{rng.randint(1, 28):02d}", prio))
    # a segment present only in the current year -> NULL effects
    k += 1
    rows.append((k, 1, 500.0, "2000-06-01", "4-NOT SPECIFIED"))
    sf = _write_orders(spark, tmp_path, rows)
    got = {r.o_orderpriority: r for r in
           SPARK_QUERIES["orders_revenue_bridge"](spark, sf).collect()}

    agg = {}
    for _, _, price, date, prio in rows:
        yr = int(date[:4])
        if yr not in (1999, 2000):
            continue
        n1, s1, n2, s2 = agg.get(prio, (0, 0, 0, 0))
        cents = round(price * 100)
        if yr == 1999:
            n1, s1 = n1 + 1, s1 + cents
        else:
            n2, s2 = n2 + 1, s2 + cents
        agg[prio] = (n1, s1, n2, s2)
    assert set(got) == set(agg)
    for prio, (n1, s1, n2, s2) in agg.items():
        r = got[prio]
        assert (r.n_prev, r.n_curr) == (n1, n2)
        assert (r.rev_prev_cents, r.rev_curr_cents) == (s1, s2)
        assert r.change_cents == s2 - s1
        if n1 > 0 and n2 > 0:
            vol = math.floor((n2 - n1) * float(s1) / n1 * 10000.0 + 0.5)
            price_eff = math.floor(
                (float(s2) - n2 * float(s1) / n1) * 10000.0 + 0.5)
            assert r.volume_effect_micro == vol
            assert r.price_effect_micro == price_eff
            # decomposition identity: effects sum to the exact change
            # (each quantized within half a unit)
            assert abs(vol + price_eff - (s2 - s1) * 10000) <= 1
        else:
            assert r.volume_effect_micro is None
            assert r.price_effect_micro is None


# -------------------------------------------------- seasonal index


def test_seasonal_index_matches_replica_uneven_months(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(904)
    rows, k = [], 0
    month_n = {m: rng.randint(2, 30) for m in range(1, 13)}
    for m, cnt in month_n.items():
        for _ in range(cnt):
            k += 1
            cents = rng.randint(100000, 50000000)
            rows.append((k, 1, cents / 100.0,
                         f"{rng.choice([1997, 1998, 1999])}-{m:02d}-15",
                         "P"))
    sf = _write_orders(spark, tmp_path, rows)
    got = {r.mon: (r.n, r.index_micro) for r in
           SPARK_QUERIES["orders_seasonal_index"](spark, sf).collect()}

    sums = Counter()
    for _, _, price, date, _ in rows:
        sums[int(date[5:7])] += round(price * 100)
    tot_n = sum(month_n.values())
    tot_s = sum(sums.values())
    grand_mean = (tot_s / 100.0) / tot_n
    exp = {}
    for m, cnt in month_n.items():
        mean = (sums[m] / 100.0) / cnt
        exp[m] = (cnt, math.floor(mean / grand_mean * 1000000.0 + 0.5))
    assert got == exp
    # uneven counts: a revenue-SHARE mirror bug ranks months by sum,
    # the published index ranks by mean — they must disagree somewhere
    by_mean = sorted(exp, key=lambda m: exp[m][1])
    by_sum = sorted(sums, key=lambda m: sums[m])
    assert by_mean != by_sum


# -------------------------------------------------- error-budget burn


def test_burn_rate_range_frame_skips_calendar_gaps(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(905)
    # day gaps (4, 7, 8, 13 missing): a ROWS-frame mirror bug would
    # pull days outside the trailing 7 calendar days into n7/e7
    days = [1, 2, 3, 5, 6, 9, 10, 11, 12, 14, 15]
    per_day, rows, eid = {}, [], 0
    for d in days:
        n = rng.randint(4, 40)
        e = rng.randint(0, n)
        per_day[d] = (n, e)
        for i in range(n):
            eid += 1
            rows.append((eid, f"2024-03-{d:02d}T{i % 24:02d}:{i % 60:02d}:00",
                         1, "error" if i < e else "view", 1.0))
    sf = _write_events(spark, tmp_path, rows)
    got = {r.day.day: r for r in
           SPARK_QUERIES["events_error_budget_burn"](spark, sf).collect()}

    burn = lambda e, n: math.floor(  # noqa: E731
        (float(e) / float(n)) / 0.25 * 1000000.0 + 0.5)
    assert set(got) == set(days)
    for d in days:
        n, e = per_day[d]
        n7 = sum(per_day[x][0] for x in days if d - 6 <= x <= d)
        e7 = sum(per_day[x][1] for x in days if d - 6 <= x <= d)
        r = got[d]
        assert (r.n, r.e) == (n, e)
        b1, b7 = burn(e, n), burn(e7, n7)
        assert r.burn_1d_micro == b1
        assert r.burn_7d_micro == b7
        assert r.alert == (b1 > 1000000 and b7 > 1000000)


# ------------------------------------------------------ Holt loop


def test_holt_forecast_matches_loop_on_seeded_series(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(906)
    # 45 contiguous days of trending + noisy daily totals
    daily_cents, rows, eid = [], [], 0
    for d in range(45):
        total = 0
        for _ in range(rng.randint(1, 4)):
            eid += 1
            cents = rng.randint(100, 200000) + 2000 * d
            total += cents
            mm, dd = divmod(d, 28)
            rows.append((eid, f"2024-{1 + mm:02d}-{1 + dd:02d}"
                         f"T{eid % 24:02d}:00:00", 1, "view",
                         cents / 100.0))
        daily_cents.append(total)
    sf = _write_events(spark, tmp_path, rows)
    got = {r.horizon: r.forecast_cents for r in
           SPARK_QUERIES["events_holt_forecast"](spark, sf).collect()}

    # plain-python fixed-point Holt, α=β=½ (Holt 1957 / NIST eHandbook
    # form: l_t = αy_t + (1−α)(l_{t−1}+b_{t−1}),
    # b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}), floor-halved each step
    y = daily_cents
    lvl, b = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        new_lvl = math.floor((y[t] + lvl + b) / 2)
        b = math.floor((new_lvl - lvl + b) / 2)
        lvl = new_lvl
    assert got == {k: lvl + k * b for k in range(8)}


# ------------------------------------------------------ BPE trainer


def test_train_bpe_matches_first_principles_replica(spark, sf_dir):
    """A naive textbook BPE trainer (full pair recount every step, no
    incremental bookkeeping, no code shared with operators.bpe) must
    reproduce train_bpe's merge table on the REAL sf0.001 corpus —
    the from-first-principles corpus-level pin the recorded-golden
    ``bpe_top_merges`` oracle lacks."""
    import regex

    from mura_spark.operators.bpe import train_bpe
    from mura_spark.suite.common import table

    docs = table(spark, sf_dir, "documents")
    texts = [r.text for r in docs.select("text").collect()]

    # spec-level pre-tokenization, restated from the published rule:
    # lowercase, then letter runs | digit runs | single non-ws symbol
    pretoken = regex.compile(
        r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N} \t\n\x0b\f\r]")
    words = Counter()
    for t in texts:
        for w in pretoken.findall(t.lower()):
            words[tuple(w) + ("</w>",)] += 1
    assert len(words) < 100_000  # below the trainer's word-table cap

    num_merges = 120
    expected = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        expected.append(best)
        nxt = Counter()
        for sym, f in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] += f
        words = nxt

    got = train_bpe(docs, num_merges=num_merges)
    assert got == expected


# -------------------------------------------------- pinball loss


def _percentile_micro(vals, p):
    """(n−1)·p linearly-interpolated percentile (Hyndman–Fan type 7 —
    the definition group_percentiles spells out), micro-floored."""
    s = sorted(vals)
    pos = (len(s) - 1) * p
    k = math.floor(pos)
    lo = s[k]
    hi = s[k + 1] if k + 1 < len(s) else lo
    return math.floor((lo + (hi - lo) * (pos - k)) * 1000000.0 + 0.5)


def test_pinball_loss_matches_replica(spark, tmp_path):
    """Published pinball loss L_q(y,ŷ) = q(y−ŷ)⁺ + (1−q)(ŷ−y)⁺,
    10×-scaled to integers, at the type-7 p50/p90 — one type with
    exact order-statistic positions (n=11), one that interpolates on
    both quantiles (n=14)."""
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(907)
    per_type = {"click": [rng.randint(100, 99999) / 100.0
                          for _ in range(11)],
                "view": [rng.randint(100, 99999) / 100.0
                         for _ in range(14)]}
    rows, eid = [], 0
    for et, vals in per_type.items():
        for v in vals:
            eid += 1
            rows.append((eid, f"2024-01-{1 + eid % 28:02d}T00:00:00",
                         1, et, v))
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in
           SPARK_QUERIES["stats_pinball_quantile_eval"](spark, sf)
           .collect()}
    for et, vals in per_type.items():
        vm = [math.floor(v * 1000000.0 + 0.5) for v in vals]
        p50 = _percentile_micro(vals, 0.5)
        p90 = _percentile_micro(vals, 0.9)
        l50 = sum(5 * (x - p50) if x >= p50 else 5 * (p50 - x)
                  for x in vm)
        l90 = sum(9 * (x - p90) if x >= p90 else (p90 - x)
                  for x in vm)
        r = got[et]
        assert r.n_events == len(vals)
        assert r.pinball_p50_x10 == l50
        assert r.pinball_p90_x10 == l90
        # median property: no data value achieves a lower q=.5 loss
        # than the reported p50 (the quantile must MINIMIZE its loss)
        for cand in vm:
            alt = sum(5 * abs(x - cand) for x in vm)
            assert l50 <= alt


# -------------------------------------------------- Simpson screen


def test_simpson_screen_flags_engineered_reversal(spark, tmp_path):
    """Classic Simpson construction: en docs are LONGER than non-en
    inside BOTH sources, yet shorter pooled (source mix confounds).
    Inside source a the en SUM is smaller while the en MEAN is larger,
    so a sum-comparison mirror bug flips that stratum's sign."""
    from mura_spark.suite import SPARK_QUERIES
    docs = ([("en", "a", 1000)] * 2 + [("de", "a", 900)] * 8
            + [("en", "b", 200)] * 8 + [("de", "b", 100)] * 2
            + [("de", "c", 500)] * 3)  # no en docs: NULL-sign stratum
    out = str(tmp_path / "minidocs")
    (spark.createDataFrame(
        [(i, "x", lang, src, n) for i, (lang, src, n)
         in enumerate(docs)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out}/documents.parquet"))
    got = {r.source: r for r in
           SPARK_QUERIES["stats_simpson_screen"](spark, out).collect()}
    # replica of the cross-multiplied mean-gap signs
    cells = {}
    for lang, src, n in docs:
        nt, st, nc, sc = cells.get(src, (0, 0, 0, 0))
        if lang == "en":
            nt, st = nt + 1, st + n
        else:
            nc, sc = nc + 1, sc + n
        cells[src] = (nt, st, nc, sc)
    ont = sum(v[0] for v in cells.values())
    ost = sum(v[1] for v in cells.values())
    onc = sum(v[2] for v in cells.values())
    osc = sum(v[3] for v in cells.values())
    sgn = lambda x: (x > 0) - (x < 0)  # noqa: E731
    overall = sgn(ost * onc - osc * ont)
    assert overall == -1  # pooled: en reads SHORTER
    for src, (nt, st, nc, sc) in cells.items():
        r = got[src]
        assert (r.n_treat, r.n_ctrl) == (nt, nc)
        assert r.overall_sign == overall
        if nt > 0 and nc > 0:
            s = sgn(st * nc - sc * nt)
            assert r.stratum_sign == s
            assert r.is_reversed == int(s * overall == -1)
        else:
            assert r.stratum_sign is None and r.is_reversed is None
    # both populated strata reverse against the pooled sign
    assert got["a"].is_reversed == 1 and got["b"].is_reversed == 1
    # mean/sum divergence really present in source a
    assert cells["a"][1] < cells["a"][3]  # en SUM smaller ...
    assert cells["a"][1] * cells["a"][2] > cells["a"][3] * cells["a"][0]


# -------------------------------------------------- k-means silhouette


def test_kmeans_silhouette_matches_replica(spark):
    """Full first-principles replica of the deterministic k-means +
    simplified silhouette (quantize to the 1e-6 grid, init = k
    lowest-id vectors, Lloyd with floor-mean centroid updates,
    s = (√b−√a)/max(√a,√b) micro-floored before the per-cluster
    mean) on seeded vectors forming three loose blobs."""
    from mura_spark.operators.clustering import kmeans_silhouette
    rng = random.Random(908)
    centers = [[0.8, 0.8, -0.2, 0.1, 0.0],
               [-0.7, 0.1, 0.7, -0.3, 0.2],
               [0.1, -0.8, -0.6, 0.5, -0.4]]
    vecs = []
    for i in range(30):
        c = centers[i % 3]
        vecs.append((i, [round(x + rng.uniform(-0.25, 0.25), 6)
                         for x in c]))
    df = spark.createDataFrame(vecs, "vec_id long, "
                                     "embedding array<double>")
    got = {r.cluster: (r.n_points, r.mean_silhouette_micro) for r in
           kmeans_silhouette(df, k=3, iterations=2).collect()}

    sqd = lambda a, b: sum((x - y) * (x - y)  # noqa: E731
                           for x, y in zip(a, b))
    q = {i: [math.floor(x * 1e6) for x in v] for i, v in vecs}
    cent = {c: q[vid] for c, vid in enumerate(sorted(q)[:3])}
    for _ in range(1):  # iterations − 1 Lloyd rounds
        assign = {vid: min((sqd(v, cv), c)
                           for c, cv in cent.items())[1]
                  for vid, v in q.items()}
        cent = {}
        for c in set(assign.values()):
            members = [q[v] for v, a in assign.items() if a == c]
            cent[c] = [math.floor(float(sum(col)) / len(members))
                       for col in zip(*members)]
    per_cluster = {}
    for vid, v in q.items():
        ds = sorted((sqd(v, cv), c) for c, cv in cent.items())
        da, ca = ds[0]
        db = min(d for d, c in ds if c != ca)
        sa, sb = math.sqrt(float(da)), math.sqrt(float(db))
        mx = max(sa, sb)
        sm = math.floor((sb - sa) / mx * 1e6 + 0.5) if mx > 0 else 0
        per_cluster.setdefault(ca, []).append(sm)
    exp = {c: (len(v), math.floor(float(sum(v)) / len(v) + 0.5))
           for c, v in per_cluster.items()}
    assert got == exp
    # the blobs are real: every cluster's mean silhouette is positive
    assert all(v[1] > 0 for v in exp.values())
