"""Independent replica pins for the round-10 driver-window cohort.

The oracle gate cannot catch MIRRORED formula bugs (the same wrong
formula in the Spark query and its DuckDB twin hash-matches green).
This file extends the round-8/round-9 defense to the three round-10
window rows that until now carried only engineered-direction tests:
an INDEPENDENT replica of the published definition (pure python, no
shared code with the engine) evaluated on seeded data that exercises
every branch — tied days, calendar gaps, collapsed clusters.

- ``stats_kendall_tau_daily`` — τ-a = (concordant − discordant) /
  C(n,2) over all day pairs of the daily click/purchase series;
  engineered ties pin the tie-counting column too.
- ``stats_ljung_box_daily`` — Q = n(n+2)·Σₖ r²ₖ/(n−k), lags 1–5,
  autocorrelations micro-floored before the Q sum, on a seeded AR(1)
  series WITH a missing calendar day (the day-join lag must skip the
  gap, where a row-lag mirror bug would bridge it).
- ``emb_cluster_balance`` — size entropy Σ −p·ln p (per-cluster term
  micro-floored before the exact sum) and largest-cluster share of
  the deterministic k-means assignment, replicated from first
  principles including the k-means itself (1e-6 grid quantize,
  k-lowest-id init, floor-mean Lloyd round, surviving-centroid
  argmin with lowest-cluster tie-break).
"""

from __future__ import annotations

import math
import random

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


# ------------------------------------------------------ Kendall τ-a


def _tau_replica(xc, yc):
    """τ-a from the definition over the daily count dicts (same day
    keys): classify every ordered day pair (a < b)."""
    days = sorted(xc)
    conc = disc = ties = n_pairs = 0
    for i, a in enumerate(days):
        for b in days[i + 1:]:
            n_pairs += 1
            prod = (xc[b] - xc[a]) * (yc[b] - yc[a])
            if prod > 0:
                conc += 1
            elif prod < 0:
                disc += 1
            if xc[b] == xc[a] or yc[b] == yc[a]:
                ties += 1
    tau = math.floor((conc - disc) / n_pairs * 1e6 + 0.5) \
        if n_pairs else None
    return (n_pairs, conc, disc, ties, tau)


def test_kendall_tau_matches_replica_with_ties(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    # 10 days; deliberate ties in BOTH series (days 2/3 share clicks,
    # days 1/10 share purchases) plus concordant and discordant runs
    clicks = [3, 5, 5, 2, 7, 1, 4, 4, 6, 2]
    purchases = [1, 2, 2, 3, 5, 0, 2, 2, 4, 1]
    rows, eid = [], 0
    for j in range(10):
        for _ in range(clicks[j]):
            rows.append((eid, f"2024-02-{j + 1:02d}T08:{eid % 60:02d}:00",
                         1, "click", 1.0))
            eid += 1
        for _ in range(purchases[j]):
            rows.append((eid, f"2024-02-{j + 1:02d}T15:{eid % 60:02d}:00",
                         2, "purchase", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_kendall_tau_daily"](spark, sf).collect()[0]
    xc = {j: c for j, c in enumerate(clicks)}
    yc = {j: c for j, c in enumerate(purchases)}
    exp = _tau_replica(xc, yc)
    assert (r.n_pairs, r.conc, r.disc, r.ties, r.tau_a_micro) == exp
    assert r.n_pairs == 45  # C(10,2): every ordered pair classified
    assert r.ties > 0       # the engineered ties registered
    # the two series co-move: τ must come out positive
    assert r.tau_a_micro > 0


# ------------------------------------------------------- Ljung–Box


def _ljung_box_replica(day_cents):
    """Q from the definition: r_k = Σ e_d·e_{d+k} / Σ e² over pairs k
    CALENDAR days apart (gaps skip), micro-floored; per-lag Q terms
    floor(r²ₖ/(n−k)+0.5) summed exactly; one terminal scaling."""
    n = len(day_cents)
    mean = float(sum(day_cents.values())) / n
    e = {d: float(y) - mean for d, y in day_cents.items()}
    c0 = sum(v * v for v in e.values())
    qsum = 0
    for k in range(1, 6):
        ck = sum(e[d] * e[d + k] for d in e if d + k in e)
        rk = math.floor(ck / c0 * 1e6 + 0.5)
        qsum += math.floor(rk * rk / (n - k) + 0.5)
    qv = n * (n + 2) * qsum / 1e6
    return (n, math.floor(qv + 0.5), int(qv < 11070500.0))


def test_ljung_box_matches_replica_on_seeded_ar1(spark, tmp_path):
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(1001)
    # 28 scheduled days, one missing (2024-03-11): the lag join is on
    # CALENDAR day distance, so pairs bridging the gap at lag 1 must
    # vanish rather than slide (a row-number-lag mirror bug would
    # pair 03-10 with 03-12 at lag 1)
    day_cents, prev = {}, 5000
    for j in range(28):
        if j == 10:
            continue
        prev = int(5000 + 0.9 * (prev - 5000) + rng.uniform(-200, 200))
        day_cents[j] = prev
    rows, eid = [], 0
    for j, total in day_cents.items():
        # split the day's mass over 1–3 events (the daily SUM must
        # aggregate per-event cents, not read one row per day)
        n_ev = 1 + j % 3
        base = total // n_ev
        for i in range(n_ev):
            c = base + (total - base * n_ev if i == 0 else 0)
            rows.append((eid, f"2024-03-{j + 1:02d}T0{i + 1}:00:00",
                         1, "view", c / 100.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_ljung_box_daily"](spark, sf).collect()[0]
    exp_n, exp_q, exp_white = _ljung_box_replica(day_cents)
    assert (r.n_days, r.q_micro, r.df, r.is_white_noise) == \
        (exp_n, exp_q, 5, exp_white)
    assert r.n_days == 27
    # the seeded AR(1) memory must register as non-white
    assert r.is_white_noise == 0


def test_ljung_box_white_on_alternating_noise(spark, tmp_path):
    """Direction control on the same replica: an engineered
    near-memoryless series must land under the χ²₅ 5% critical
    value (and still match the replica exactly)."""
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(1002)
    day_cents = {j: 5000 + rng.randrange(-50, 51) * (-1) ** (j // 2 % 2)
                 for j in range(30)}
    rows = [(j, f"2024-04-{j % 30 + 1:02d}T09:00:00", 1, "view",
             day_cents[j] / 100.0) for j in range(30)]
    sf = _write_events(spark, tmp_path, rows)
    r = SPARK_QUERIES["stats_ljung_box_daily"](spark, sf).collect()[0]
    exp_n, exp_q, exp_white = _ljung_box_replica(day_cents)
    assert (r.n_days, r.q_micro, r.is_white_noise) == \
        (exp_n, exp_q, exp_white)


# ------------------------------------------------ cluster balance


def test_cluster_balance_matches_replica(spark, tmp_path):
    """First-principles replica of deterministic k-means (k=8,
    iterations=2) + the entropy/max-share rollup on three seeded
    blobs of unequal size. Vector components sit on the 1/1024 grid
    so the float32 parquet round-trip is exact."""
    from mura_spark.suite import SPARK_QUERIES
    rng = random.Random(1008)
    centers = [[0.75, 0.75, -0.25, 0.125, 0.0],
               [-0.625, 0.125, 0.75, -0.25, 0.25],
               [0.125, -0.75, -0.625, 0.5, -0.375]]
    sizes = [20, 12, 8]
    vecs, vid = [], 0
    for c, sz in zip(centers, sizes):
        for _ in range(sz):
            vecs.append((vid, [
                (round(x * 1024) + rng.randrange(-256, 257)) / 1024.0
                for x in c]))
            vid += 1
    out = str(tmp_path / "mini")
    (spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
          .coalesce(1).write.mode("overwrite")
          .parquet(f"{out}/embeddings.parquet"))
    r = SPARK_QUERIES["emb_cluster_balance"](spark, out).collect()[0]

    # --- replica: quantize -> k-lowest-id init -> 1 floor-mean Lloyd
    # round -> argmin vs surviving centroids (lowest cluster on ties)
    sqd = lambda a, b: sum((x - y) * (x - y)  # noqa: E731
                           for x, y in zip(a, b))
    q = {i: [math.floor(x * 1e6) for x in v] for i, v in vecs}
    cent = {c: q[vid] for c, vid in enumerate(sorted(q)[:8])}
    for _ in range(1):  # iterations − 1 Lloyd rounds
        assign = {vid: min((sqd(v, cv), c) for c, cv in cent.items())[1]
                  for vid, v in q.items()}
        cent = {}
        for c in set(assign.values()):
            members = [q[v] for v, a in assign.items() if a == c]
            cent[c] = [math.floor(float(sum(col)) / len(members))
                       for col in zip(*members)]
    final = {vid: min((sqd(v, cv), c) for c, cv in cent.items())[1]
             for vid, v in q.items()}
    sizes_by_c = {}
    for c in final.values():
        sizes_by_c[c] = sizes_by_c.get(c, 0) + 1
    n = len(final)
    h = sum(math.floor(-(m / n) * math.log(m / n) * 1e6 + 0.5)
            for m in sizes_by_c.values())
    mx = max(sizes_by_c.values())
    exp = (len(sizes_by_c), n,
           h, math.floor(mx / n * 1e6 + 0.5))
    assert (r.k_used, r.n_vectors, r.entropy_micro,
            r.max_share_micro) == exp
    # the seed is chosen so a cluster collapses: the inner join
    # against SURVIVING centroids is exercised, not just the happy
    # path where all 8 initial clusters keep members
    assert r.k_used < 8
    # blob 2 (12/40) survives intact as the largest cluster
    assert r.max_share_micro == 300000


def test_bfs_recursive_hint_is_spark_side_only_and_result_free(
        spark, tmp_path):
    """The SHUFFLE_HASH(w) hint on graph_bfs_reach's recursive member
    (optimization round 10) must (a) never leak into the DuckDB oracle
    string — the {hint} slot formats empty there, keeping the twin
    byte-identical to the pre-hint rendering — and (b) be result-free:
    the hinted query returns exactly what the hint-free rendering
    returns on a graph engineered so every recursion depth (0..3) is
    exercised and one node sits just past the depth cap."""
    from mura_spark.operators import graph
    from mura_spark.suite import SPARK_QUERIES
    from mura_spark.suite.common import table
    from mura_spark.suite.graph_q import _BFS_ORACLE, _BFS_SQL

    assert "/*+" not in _BFS_ORACLE

    # chain of co-purchase hops: parts 10-11-12-13-14; 14 is 4 hops
    # from the root (min part = 10) and must NOT be reached
    rows = [(1, 10), (1, 11), (2, 11), (2, 12),
            (3, 12), (3, 13), (4, 13), (4, 14)]
    (spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
          .coalesce(1).write.mode("overwrite")
          .parquet(str(tmp_path / "lineitem.parquet")))
    sf = str(tmp_path)

    got = sorted(map(tuple,
                     SPARK_QUERIES["graph_bfs_reach"](spark, sf)
                     .collect()))

    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    edges = (graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
                  .localCheckpoint(eager=True))
    edges.createOrReplaceTempView("__bfs_hintfree_edges")
    unhinted = sorted(map(tuple, spark.sql(
        _BFS_SQL.format(edges="__bfs_hintfree_edges", hint=""))
        .collect()))

    assert got == unhinted == [(10, 0), (11, 1), (12, 2), (13, 3)]
