"""Grouped statistical modeling aggregates: per-group OLS regression and
chi-square contingency analysis.

North-star extension (the reference rejects aggregate functions outright —
SURVEY.md §2.2 #11, /root/reference/src/planner/logicalplan.rs:72-80);
these are the trend/independence diagnostics a pipeline runs over event
telemetry and corpus metadata.

Determinism (both oracle-hashable): every moment is an exact integer /
fixed-point DECIMAL sum (order-independent), and the closed-form results
combine them with only +,−,×,/,√ — IEEE correctly-rounded, unlike ln/exp
— in a fixed association order mirrored by the SQL twins. Continuous
y-values go through the ``floor(y·10⁹)`` nano-fixed-point trick (see
operators/similarity.label_centroids for why a double→DECIMAL cast is
NOT cross-engine safe: decimal halfway cases round differently), summed
in DECIMAL(38,0) so petabyte-group sums cannot overflow int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mura_spark.functions.quantize import micro
from mura_spark.operators.guards import (DEFAULT_DOMAIN_BUDGET,
                                         DEFAULT_ROW_BUDGET,
                                         guarded_scalar)

#: fixed-point scale for continuous y values: 1e9 keeps |y| < 9e9 exact
#: in double·scale and is far below double precision at telemetry scale.
_FP = 1e9


def group_ols(df: DataFrame, group_cols: list[str], x_col: str,
              y_col: str) -> DataFrame:
    """Per-group simple linear regression of ``y`` on ``x``:
    ``(groups..., n, slope_micro, intercept_micro)`` with
    micro = ⌊v·10⁶ + ½⌋.

    ``x`` must be integer-valued (a bucket index, an hour, a position);
    ``y`` is any double. Moments Σx, Σx², Σy, Σxy accumulate exactly
    (x as DECIMAL, y in nano-fixed-point); slope/intercept are then one
    closed-form double expression per group. Groups with zero x-variance
    (every row at the same x) surface NULL slope/intercept instead of a
    division by zero.

    One shuffle total: all five moments ride in a single
    map-side-combined groupBy; there is no second pass.
    """
    x = F.col(x_col).cast("decimal(19,0)")
    yf = F.floor(F.col(y_col).cast("double") * F.lit(_FP)) \
          .cast("decimal(38,0)")
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
        F.sum(yf).alias("__sy"),
        F.sum(x.cast("decimal(38,0)") * yf).alias("__sxy"))
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den / F.lit(_FP)
    intercept = (sy / F.lit(_FP) - slope * sx) / n
    return m.select(
        *group_cols, "n",
        F.when(den != F.lit(0.0), micro(slope)).alias("slope_micro"),
        F.when(den != F.lit(0.0), micro(intercept)).alias("intercept_micro"))


def sql_group_ols(table_expr: str, group_cols: list[str], x_expr: str,
                  y_expr: str) -> str:
    """DuckDB twin of :func:`group_ols` — same fixed-point moments, same
    association order in the closed form."""
    g = ", ".join(group_cols)
    return (
        f"WITH m AS (SELECT {g}, COUNT(*) AS n, "
        f"SUM(CAST({x_expr} AS DECIMAL(19,0))) AS sx, "
        f"SUM(CAST({x_expr} AS DECIMAL(19,0)) "
        f"* CAST({x_expr} AS DECIMAL(19,0))) AS sxx, "
        f"SUM(CAST(floor(CAST({y_expr} AS DOUBLE) * 1000000000.0) "
        f"AS DECIMAL(38,0))) AS sy, "
        f"SUM(CAST(CAST({x_expr} AS DECIMAL(19,0)) AS DECIMAL(38,0)) "
        f"* CAST(floor(CAST({y_expr} AS DOUBLE) * 1000000000.0) "
        f"AS DECIMAL(38,0))) AS sxy "
        f"FROM {table_expr} GROUP BY {g}) "
        f"SELECT {g}, n, "
        "CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN "
        "CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 1000000000.0 "
        "* 1000000.0 + 0.5) AS BIGINT) END AS slope_micro, "
        "CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN "
        "CAST(floor((CAST(sy AS DOUBLE) / 1000000000.0 "
        "- (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 1000000000.0 "
        "* CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) "
        "* 1000000.0 + 0.5) AS BIGINT) END AS intercept_micro FROM m")


def chi2_contingency(df: DataFrame, row_col: str,
                     col_col: str) -> DataFrame:
    """Chi-square contingency cells for two categorical columns:
    ``(row, col, observed, expected_micro, chi2_micro)`` per occupied
    cell, with E = row_total·col_total/N and contribution (O−E)²/E.

    The grand chi-square statistic is the exact integer sum of
    ``chi2_micro`` — callers wanting one row can aggregate it without a
    determinism hazard (the per-cell quantization happened first).

    Plan: one groupBy to cells (the only full-data shuffle); marginals
    are two groupBys over the already-aggregated cells, joined back
    broadcast (cardinality = category counts); N is a broadcast
    single-row crossJoin. No driver-side state.
    """
    cells = (df.groupBy(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
               .agg(F.count(F.lit(1)).alias("observed")))
    row_tot = cells.groupBy("r").agg(F.sum("observed").alias("__rt"))
    col_tot = cells.groupBy("c").agg(F.sum("observed").alias("__ct"))
    total = cells.agg(F.sum("observed").alias("__t"))
    o = F.col("observed").cast("double")
    e = (F.col("__rt").cast("double") * F.col("__ct").cast("double")
         / F.col("__t").cast("double"))
    contrib = (o - e) * (o - e) / e
    return (cells.join(F.broadcast(row_tot), "r")
                 .join(F.broadcast(col_tot), "c")
                 .crossJoin(F.broadcast(total))
                 .select(F.col("r").alias(row_col),
                         F.col("c").alias(col_col),
                         "observed",
                         micro(e).alias("expected_micro"),
                         micro(contrib).alias("chi2_micro")))


def group_percentiles(df: DataFrame, group_cols: list[str],
                      value_col: str, ps: list[float],
                      out_names: list[str]) -> DataFrame:
    """Exact linearly-interpolated percentiles per group —
    ``(groups..., <out_names>_micro...)`` — computed from EXPLICIT order
    statistics rather than the engine's percentile aggregate.

    Why not ``F.percentile`` / ``quantile_cont``: both implement the
    same (n−1)·p definition, but the interpolation arithmetic runs
    inside each engine's aggregate with an unspecified association
    order, so the raw doubles are not guaranteed to match across
    engines. Here the definition is spelled out once and mirrored
    verbatim by the SQL twin: rank rows per group, pick the ⌊(n−1)p⌋
    and ⌊(n−1)p⌋+1 order statistics via conditional MAX in one groupBy,
    and interpolate post-aggregation with a fixed expression tree —
    deterministic by construction, then micro-floored.

    Plan: one window shuffle on the group key (rank + group size in the
    same pass), one map-side-combined groupBy. Values order by the value
    alone — equal values make either boundary choice identical, so no
    tiebreak is needed.
    """
    if len(ps) != len(out_names):
        raise ValueError("ps and out_names must align")
    # percentiles are of the NON-NULL observations (the published
    # definition); unfiltered NULLs would both inflate n and rank at
    # engine-dependent ends (Spark NULLS FIRST asc vs DuckDB NULLS
    # LAST), shifting every (n-1)p position
    df = df.where(F.col(value_col).isNotNull())
    w_rn = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    w_n = Window.partitionBy(*group_cols)
    ranked = df.select(*group_cols, F.col(value_col).alias("__v"),
                       (F.row_number().over(w_rn) - F.lit(1)).alias("__i"),
                       F.count(F.lit(1)).over(w_n).alias("__n"))
    aggs = [F.first("__n").alias("__n")]
    for p, name in zip(ps, out_names):
        pos = (F.col("__n") - F.lit(1)).cast("double") * F.lit(float(p))
        k = F.floor(pos)
        aggs.append(F.max(F.when(F.col("__i") == k, F.col("__v")))
                     .alias(f"__lo_{name}"))
        aggs.append(F.max(F.when(F.col("__i") == k + F.lit(1),
                                 F.col("__v")))
                     .alias(f"__hi_{name}"))
    agg = ranked.groupBy(*group_cols).agg(*aggs)
    outs = list(group_cols)
    for p, name in zip(ps, out_names):
        pos = (F.col("__n") - F.lit(1)).cast("double") * F.lit(float(p))
        f = pos - F.floor(pos).cast("double")
        lo, hi = F.col(f"__lo_{name}"), F.col(f"__hi_{name}")
        val = lo + (F.coalesce(hi, lo) - lo) * f
        outs.append(micro(val).alias(f"{name}_micro"))
    return agg.select(*outs)


def sql_group_percentiles(table_expr: str, group_cols: list[str],
                          value_expr: str, ps: list[float],
                          out_names: list[str]) -> str:
    """DuckDB twin of :func:`group_percentiles` — identical expression
    tree, spelled out (never quantile_cont; see the operator docstring)."""
    g = ", ".join(group_cols)
    los, sels = [], []
    for p, name in zip(ps, out_names):
        pos = f"CAST(n - 1 AS DOUBLE) * {float(p)!r}"
        los.append(f"MAX(CASE WHEN i = CAST(floor({pos}) AS BIGINT) "
                   f"THEN v END) AS lo_{name}")
        los.append(f"MAX(CASE WHEN i = CAST(floor({pos}) AS BIGINT) + 1 "
                   f"THEN v END) AS hi_{name}")
        sels.append(
            f"CAST(floor((lo_{name} + (coalesce(hi_{name}, lo_{name}) "
            f"- lo_{name}) * ({pos} - floor({pos}))) * 1000000.0 + 0.5) "
            f"AS BIGINT) AS {name}_micro")
    return (
        f"WITH ranked AS (SELECT {g}, {value_expr} AS v, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {g} "
        f"ORDER BY {value_expr}) - 1 AS BIGINT) AS i, "
        f"COUNT(*) OVER (PARTITION BY {g}) AS n FROM {table_expr} "
        f"WHERE {value_expr} IS NOT NULL), "
        f"agg AS (SELECT {g}, ANY_VALUE(n) AS n, " + ", ".join(los)
        + f" FROM ranked GROUP BY {g}) "
        f"SELECT {g}, " + ", ".join(sels) + " FROM agg")


# ------------------------------------------------- two-sample rank tests

def _two_sample_value_counts(df: DataFrame, value_col: str, group_col: str,
                             a, b):
    """Shared ECDF core for the two-sample tests: per-distinct-value
    counts ``(__v, __da, __db)`` of samples ``a`` and ``b``.

    ONE map-side-combined groupBy reduces the scan to the distinct-value
    domain; everything downstream (cumulative windows, the closed-form
    statistics) runs over that reduced frame only. Telemetry values are
    fixed-point (cents), so the domain is bounded (~50k buckets at any
    scale) and the un-partitioned ordered window downstream is a
    bucket-table pass, not a data pass — same posture as
    rolling.cumulative_users' calendar window.
    """
    ind_a = (F.col(group_col) == F.lit(a)).cast("int")
    return (df.filter(F.col(group_col).isin([a, b])
                      & F.col(value_col).isNotNull())
              .groupBy(F.col(value_col).alias("__v"))
              .agg(F.sum(ind_a).alias("__da"),
                   F.sum(F.lit(1) - ind_a).alias("__db")))


def ks_2sample(df: DataFrame, value_col: str, group_col: str,
               a, b,
               domain_budget: int | None = DEFAULT_DOMAIN_BUDGET
               ) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the ``value_col``
    distributions of groups ``a`` and ``b``: one row
    ``(na, nb, ks_micro)`` with D = max_v |F_a(v) − F_b(v)|.

    Determinism: the max runs over the EXACT integer numerator
    |ca·nb − cb·na| in DECIMAL (ca/cb = cumulative counts ≤ v); one
    double division at the very end, micro-floored — no
    order-dependent double aggregation anywhere.

    Plan: groupBy to the value domain, cumulative window over the
    reduced frame, totals as a broadcast singleton crossJoin. The
    value-domain NDV is asserted against ``domain_budget`` inside the
    totals aggregate (guards.guarded_scalar) — a continuous double
    column fails loudly during the broadcast build instead of feeding
    the single-partition cumulative window n rows.
    """
    g = _two_sample_value_counts(df, value_col, group_col, a, b)
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(F.sum("__da").over(w).alias("__ca"),
                 F.sum("__db").over(w).alias("__cb"))
    t = (g.agg(F.sum("__da").cast("bigint").alias("na"),
               F.sum("__db").cast("bigint").alias("nb"),
               F.count(F.lit(1)).alias("__ndv"))
          .select(guarded_scalar(F.col("na"), F.col("__ndv"),
                                 domain_budget, "ks_2sample")
                  .alias("na"), "nb"))
    from mura_spark.functions.quantize import dec18 as d18
    num = F.abs(d18(F.col("__ca")) * d18(F.col("nb"))
                - d18(F.col("__cb")) * d18(F.col("na")))
    m = (c.crossJoin(F.broadcast(t))
          .groupBy("na", "nb")
          .agg(F.max(num).alias("__m")))
    ks = (F.col("__m").cast("double")
          / (F.col("na").cast("double") * F.col("nb").cast("double")))
    # empty side -> NULL (the suite's degenerate convention); without the
    # guard the 0/0 NaN aborts at the ANSI bigint cast inside micro()
    both = (F.col("na") > 0) & (F.col("nb") > 0)
    return m.select("na", "nb",
                    F.when(both, micro(ks)).alias("ks_micro"))


def sql_ks_2sample(table_expr: str, value_expr: str, group_expr: str,
                   a: str, b: str) -> str:
    """DuckDB twin of :func:`ks_2sample` — identical expression tree."""
    return (
        f"WITH g AS (SELECT {value_expr} AS v, "
        f"SUM(CAST({group_expr} = '{a}' AS INT)) AS da, "
        f"SUM(1 - CAST({group_expr} = '{a}' AS INT)) AS db "
        f"FROM {table_expr} WHERE {group_expr} IN ('{a}', '{b}') "
        f"AND {value_expr} IS NOT NULL GROUP BY 1), "
        "c AS (SELECT SUM(da) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS ca, "
        "SUM(db) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS cb FROM g), "
        "t AS (SELECT CAST(SUM(da) AS BIGINT) AS na, "
        "CAST(SUM(db) AS BIGINT) AS nb FROM g) "
        "SELECT na, nb, CASE WHEN na > 0 AND nb > 0 THEN "
        "CAST(floor(CAST(MAX(abs("
        "CAST(ca AS DECIMAL(18,0)) * CAST(nb AS DECIMAL(18,0)) "
        "- CAST(cb AS DECIMAL(18,0)) * CAST(na AS DECIMAL(18,0)))) "
        "AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) "
        "* 1000000.0 + 0.5) AS BIGINT) END AS ks_micro "
        "FROM c CROSS JOIN t GROUP BY na, nb")


def mannwhitney_u(df: DataFrame, value_col: str, group_col: str,
                  a, b,
                  domain_budget: int | None = DEFAULT_DOMAIN_BUDGET
                  ) -> DataFrame:
    """Mann–Whitney U (mid-rank tie handling) between the ``value_col``
    distributions of groups ``a`` and ``b``: one row
    ``(na, nb, u2, auc_micro, z_micro)`` where

    - ``u2`` = 2·U_a = Σ_v da·(2·cbb + db) — exact (cbb = b-counts at
      strictly smaller values; the ½-tie term stays integer via the
      doubling),
    - ``auc_micro`` = ⌊U_a/(na·nb)·10⁶+½⌋, the common-language effect
      size P(a > b) + ½P(a = b),
    - ``z_micro`` = the tie-corrected normal approximation
      (U − na·nb/2) / √(na·nb/12·((n+1) − Σ(t³−t)/(n(n−1)))), NULL when
      the variance degenerates (all values tied).

    Determinism: U accumulates in DECIMAL products of exact counts; the
    tie term Σ(t³−t) is integer-valued double quantized to DECIMAL per
    bucket BEFORE summing (exact while per-bucket t³ < 2⁵³ — holds to
    ~10⁵ rows per distinct value; extreme corpora would move it into
    DECIMAL products); z/auc are one mirrored double expression each,
    micro-floored.

    Plan: identical to :func:`ks_2sample` — one reducing groupBy, a
    bucket-domain window, broadcast-singleton totals, and the same
    NDV-budget guard riding the totals aggregate.
    """
    g = _two_sample_value_counts(df, value_col, group_col, a, b)
    wexc = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select("__da", "__db",
                 F.coalesce(F.sum("__db").over(wexc),
                            F.lit(0).cast("bigint")).alias("__cbb"))
    from mura_spark.functions.quantize import dec18 as d18
    td = (F.col("__da") + F.col("__db")).cast("double")
    s = c.agg(
        F.sum(d18(F.col("__da"))
              * d18(F.lit(2) * F.col("__cbb") + F.col("__db")))
         .cast("decimal(38,0)").alias("__u2"),
        F.sum((td * td * td - td).cast("decimal(38,0)")).alias("__ts"))
    t = (g.agg(F.sum("__da").cast("bigint").alias("na"),
               F.sum("__db").cast("bigint").alias("nb"),
               F.count(F.lit(1)).alias("__ndv"))
          .select(guarded_scalar(F.col("na"), F.col("__ndv"),
                                 domain_budget, "mannwhitney_u")
                  .alias("na"), "nb"))
    j = s.crossJoin(F.broadcast(t))
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    n_d = na_d + nb_d
    u2d = F.col("__u2").cast("double")
    ts_d = F.col("__ts").cast("double")
    var12 = (na_d * nb_d / F.lit(12.0)
             * ((n_d + F.lit(1.0)) - ts_d / (n_d * (n_d - F.lit(1.0)))))
    z = (u2d - na_d * nb_d) / (F.lit(2.0) * F.sqrt(var12))
    auc = u2d / (F.lit(2.0) * (na_d * nb_d))
    both = (F.col("na") > 0) & (F.col("nb") > 0)
    return j.select("na", "nb",
                    F.col("__u2").cast("bigint").alias("u2"),
                    F.when(both, micro(auc)).alias("auc_micro"),
                    F.when(both & (var12 > F.lit(0.0)),
                           micro(z)).alias("z_micro"))


def sql_mannwhitney_u(table_expr: str, value_expr: str, group_expr: str,
                      a: str, b: str) -> str:
    """DuckDB twin of :func:`mannwhitney_u` — identical expression tree."""
    var12 = ("CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 * "
             "((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0) "
             "- CAST(ts AS DOUBLE) "
             "/ ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) "
             "* (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1.0)))")
    return (
        f"WITH g AS (SELECT {value_expr} AS v, "
        f"SUM(CAST({group_expr} = '{a}' AS INT)) AS da, "
        f"SUM(1 - CAST({group_expr} = '{a}' AS INT)) AS db "
        f"FROM {table_expr} WHERE {group_expr} IN ('{a}', '{b}') "
        f"AND {value_expr} IS NOT NULL GROUP BY 1), "
        "c AS (SELECT da, db, coalesce(SUM(db) OVER (ORDER BY v ROWS "
        "BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbb FROM g), "
        "s AS (SELECT CAST(SUM(CAST(da AS DECIMAL(18,0)) "
        "* CAST(2 * cbb + db AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS u2, "
        "SUM(CAST(CAST(da + db AS DOUBLE) * CAST(da + db AS DOUBLE) "
        "* CAST(da + db AS DOUBLE) - CAST(da + db AS DOUBLE) "
        "AS DECIMAL(38,0))) AS ts FROM c), "
        "t AS (SELECT CAST(SUM(da) AS BIGINT) AS na, "
        "CAST(SUM(db) AS BIGINT) AS nb FROM g) "
        "SELECT na, nb, CAST(u2 AS BIGINT) AS u2, "
        "CASE WHEN na > 0 AND nb > 0 THEN "
        "CAST(floor(CAST(u2 AS DOUBLE) "
        "/ (2.0 * (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) "
        "* 1000000.0 + 0.5) AS BIGINT) END AS auc_micro, "
        f"CASE WHEN na > 0 AND nb > 0 AND {var12} > 0.0 THEN "
        "CAST(floor((CAST(u2 AS DOUBLE) "
        "- CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) "
        f"/ (2.0 * sqrt({var12})) * 1000000.0 + 0.5) AS BIGINT) END "
        "AS z_micro FROM s CROSS JOIN t")


def theil_sen_slope(df: DataFrame, x_col: str, y_col: str,
                    max_points: int | None = 100_000) -> DataFrame:
    """Theil-Sen robust trend: the MEDIAN of all pairwise slopes
    ``(y_j − y_i)/(x_j − x_i)``, x strictly increasing — up to ~29%
    contaminated points cannot move it (the robust alternative to the
    OLS slope in group_ols, which one outlier day can own). Returns one
    row ``(n_points, n_pairs, slope)``.

    Intended for SERIES data (a time-bucketed aggregate): the pair join
    is O(n²) in the number of BUCKETS — calendar-bounded, not
    data-bounded — so the input must already be reduced (the caller's
    groupBy is the only row-scale shuffle). Exactness: slopes are one
    correctly-rounded division of exact integers; the median is an
    explicit order statistic (even counts average two doubles, which is
    a single exact-input IEEE add + halving, associativity-free).
    ``max_points`` asserts the already-reduced contract: the guard is
    folded into the a-side join key (evaluated per point, before any
    pair materializes), so an unreduced row-scale input fails loudly
    instead of exploding into n² pairs.
    """
    pts = df.select(F.col(x_col).cast("bigint").alias("__x"),
                    F.col(y_col).cast("bigint").alias("__y"))
    n = pts.agg(F.count(F.lit(1)).alias("n_points"))
    a = (pts.crossJoin(F.broadcast(n))
            .select(guarded_scalar(F.col("__x"), F.col("n_points"),
                                   max_points, "theil_sen_slope")
                    .alias("__x"), "__y")
            .alias("a"))
    b = pts.alias("b")
    slopes = (a.join(b, F.col("b.__x") > F.col("a.__x"))
                .select(((F.col("b.__y") - F.col("a.__y")).cast("double")
                         / (F.col("b.__x") - F.col("a.__x"))
                         .cast("double")).alias("__s")))
    w = Window.orderBy("__s")
    ranked = slopes.select(
        "__s", F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__m"))
    lo = F.floor((F.col("__m") + 1) / 2)
    hi = F.floor(F.col("__m") / 2) + 1
    med = (ranked.filter((F.col("__rn") == lo) | (F.col("__rn") == hi))
                 .agg((F.sum("__s") / F.count(F.lit(1))).alias("slope"),
                      F.max("__m").alias("n_pairs")))
    return (med.crossJoin(F.broadcast(n))
               .select("n_points", F.col("n_pairs").cast("bigint"),
                       "slope"))


def mutual_information(df: DataFrame, col_a: str,
                       col_b: str) -> DataFrame:
    """Mutual information I(A;B) = Σ p(a,b)·ln(p(a,b)/(p(a)p(b)))
    between two categorical columns, in micro-nats — the
    feature-selection / redundancy screen beside the chi-square
    independence test (chi2_contingency): MI reads in nats how much
    knowing A tells you about B. Returns ``(n, n_cells, mi_micro)``.

    Per-cell terms pass through ``ln`` so each is micro-quantized
    BEFORE the sum (the usual libm-drift discipline); everything else
    is exact counts. Plan: one (a,b) groupBy — the only row-scale
    shuffle — then marginal rollups of the CELLS (already reduced) and
    two cell-keyed joins; N rides broadcast.
    """
    cells = (df.groupBy(F.col(col_a).alias("__a"),
                        F.col(col_b).alias("__b"))
               .agg(F.count(F.lit(1)).alias("__c")))
    ra = cells.groupBy("__a").agg(F.sum("__c").alias("__ca"))
    rb = cells.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    tot = cells.agg(F.sum("__c").alias("__n"))
    j = (cells.join(ra, "__a").join(rb, "__b")
              .crossJoin(F.broadcast(tot)))
    c, ca, cb, n = (F.col("__c").cast("double"),
                    F.col("__ca").cast("double"),
                    F.col("__cb").cast("double"),
                    F.col("__n").cast("double"))
    term = (c / n) * F.log((c * n) / (ca * cb))
    per = j.select(
        F.col("__n"),
        F.floor(term * 1000000.0 + F.lit(0.5)).cast("bigint")
         .alias("__t"))
    return per.agg(F.max("__n").alias("n"),
                   F.count(F.lit(1)).alias("n_cells"),
                   F.sum("__t").alias("mi_micro"))


def group_weighted_median(df: DataFrame, group_cols: list[str],
                          value_col: str,
                          weight_col: str) -> DataFrame:
    """Lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total —
    ``(group…, w_total, median_value)``. The survey-reweighting /
    importance-weighted form of the exact percentile operator
    (group_percentiles weights every row equally); integer weights keep
    the threshold test exact (``2·cumw ≥ W``, no division).

    Plan: one groupBy-key window pass (cumulative weight in value
    order with a unique-ish tiebreak), then a min-conditional rollup.
    The ordered scan per group is inherent to an exact weighted
    quantile; the mergeable-sketch route is the approximate 100 TB
    fallback, same contract.
    """
    w = (Window.partitionBy(*group_cols)
               .orderBy(F.col(value_col).asc())
               .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy(*group_cols)
    cum = df.select(
        *group_cols, value_col,
        F.sum(weight_col).over(w).alias("__cw"),
        F.sum(weight_col).over(wt).alias("__wt"))
    return (cum.filter(F.lit(2) * F.col("__cw") >= F.col("__wt"))
               .groupBy(*group_cols)
               .agg(F.max("__wt").alias("w_total"),
                    F.min(value_col).alias("median_value")))


def group_entropy(df: DataFrame, group_cols: list[str],
                  cat_col: str) -> DataFrame:
    """Shannon entropy of a categorical distribution per group, in
    micro-nats: ``(group…, n_rows, n_cats, entropy_micro)``. The
    behavioral-diversity / concentration screen (a user who only ever
    fires one event type scores 0; uniform across k types scores
    ln k) — the per-group sibling of corpus.simpson_diversity, which
    avoids ln entirely; here the per-category ``−p·ln p`` terms are
    micro-quantized BEFORE the sum, the usual libm discipline.

    Plan: one (group, cat) groupBy — the only row-scale shuffle — then
    group-partitioned windows over the reduced cells and one final
    group rollup.
    """
    cells = (df.groupBy(*group_cols, F.col(cat_col).alias("__cat"))
               .agg(F.count(F.lit(1)).alias("__c")))
    wg = Window.partitionBy(*group_cols)
    w = cells.select(
        *group_cols, "__c",
        F.sum("__c").over(wg).alias("__n"),
        F.count(F.lit(1)).over(wg).alias("__k"))
    c, n = F.col("__c").cast("double"), F.col("__n").cast("double")
    term = F.floor(-(c / n) * F.log(c / n) * F.lit(1000000.0)
                   + F.lit(0.5)).cast("bigint")
    t = w.select(*group_cols, "__n", "__k", term.alias("__t"))
    return (t.groupBy(*group_cols)
             .agg(F.max("__n").alias("n_rows"),
                  F.max("__k").alias("n_cats"),
                  F.sum("__t").alias("entropy_micro")))


def oneway_anova(df: DataFrame, group_col: str,
                 value_col: str) -> DataFrame:
    """One-way ANOVA over an INTEGER-valued (fixed-point) metric:
    ``(k, n, f_micro, eta2_micro)`` — does the group mean differ across
    k groups? F = (SSB/(k−1))/(SSW/(n−k)), η² = SSB/SST the effect
    size. The omnibus sibling of the two-sample z/KS/MWU tests.

    Determinism: group sums and sums-of-squares are exact
    DECIMAL(38,0); each group's ``S_g²/n_g`` term and the grand
    ``S²/n`` are quantized to integer UNITS before the cross-group
    sums (a k-group float sum would be association-ordered), so SSB is
    an exact DECIMAL integer of unit-scale resolution (unit² sums
    overflow int64 at scale) and the two final
    divisions are mirrored doubles. Negative-by-quantization SSB
    clamps to 0. One map-side-combined groupBy; everything after runs
    on k rows.
    """
    v = F.col(value_col).cast("bigint")
    g = (df.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("__ng"),
                F.sum(v.cast("decimal(38,0)")).alias("__sg"),
                F.sum((v * v).cast("decimal(38,0)")).alias("__qg")))
    term = F.floor(F.col("__sg").cast("double")
                   * F.col("__sg").cast("double")
                   / F.col("__ng").cast("double")
                   + F.lit(0.5)).cast("decimal(38,0)")
    tot = (g.select("__ng", "__sg", "__qg", term.alias("__t"))
            .agg(F.count(F.lit(1)).alias("k"),
                 F.sum("__ng").alias("n"),
                 F.sum("__t").alias("__a"),
                 F.sum("__sg").alias("__s"),
                 F.sum("__qg").alias("__q")))
    b = F.floor(F.col("__s").cast("double") * F.col("__s").cast("double")
                / F.col("n").cast("double")
                + F.lit(0.5)).cast("decimal(38,0)")
    ssb = F.greatest(F.col("__a") - b, F.lit(0).cast("decimal(38,0)"))
    ssw = F.col("__q").cast("double") - F.col("__a").cast("double")
    f = ((ssb.cast("double") / (F.col("k") - F.lit(1)).cast("double"))
         / (ssw / (F.col("n") - F.col("k")).cast("double")))
    eta2 = ssb.cast("double") / (ssb.cast("double") + ssw)
    mk = lambda c: (F.floor(c * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                    .cast("bigint"))
    cond = (F.col("k") > 1) & (ssw > 0)
    return tot.select(
        "k", "n",
        F.when(cond, mk(f)).alias("f_micro"),
        F.when(cond, mk(eta2)).alias("eta2_micro"))


def spearman_corr(df: DataFrame, x_col: str, y_col: str,
                  row_budget: int | None = DEFAULT_ROW_BUDGET
                  ) -> DataFrame:
    """Spearman rank correlation: Pearson on AVERAGE ranks, the
    monotone-association measure robust to any monotone rescaling
    (Pearson, stats_corr_lineitem, sees only linearity). Returns one
    row ``(n, rho_micro)``.

    Exactness: doubled average ranks are pure integers —
    ``2·avg_rank = 2·RANK() + tie_count − 1`` — so every moment is
    exact DECIMAL arithmetic and the single final division is a
    mirrored double. The global rank windows are the honest cost of
    exact Spearman (rank needs a total order); at 100 TB the same
    operator runs per-group or on a stratified sample — and
    ``row_budget`` enforces that ceiling: the guard is folded into the
    x-rank window's SORT KEY (evaluated per row before the global sort
    shuffles), so an over-budget frame fails loudly before the
    single-task rank pass, at the cost of one extra counting pass.

    Rows with a NULL in either variable are excluded first — the
    published complete-observations rule (ranking NULLs would place
    them at engine-dependent ends and shift every rank).
    """
    df = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    cnt = df.agg(F.count(F.lit(1)).alias("__n_rows"))
    base = df.crossJoin(F.broadcast(cnt))
    xg = guarded_scalar(F.col(x_col), F.col("__n_rows"), row_budget,
                        "spearman_corr")
    wx = Window.orderBy(xg)
    wy = Window.orderBy(y_col)
    cx = Window.partitionBy(x_col)
    cy = Window.partitionBy(y_col)
    r = base.select(
        (F.lit(2) * F.rank().over(wx)
         + F.count(F.lit(1)).over(cx) - F.lit(1)).alias("__rx"),
        (F.lit(2) * F.rank().over(wy)
         + F.count(F.lit(1)).over(cy) - F.lit(1)).alias("__ry"))
    d = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = r.agg(F.count(F.lit(1)).alias("n"),
              d(F.col("__rx")).alias("sx"), d(F.col("__ry")).alias("sy"),
              d(F.col("__rx") * F.col("__ry")).alias("sxy"),
              d(F.col("__rx") * F.col("__rx")).alias("sxx"),
              d(F.col("__ry") * F.col("__ry")).alias("syy"))
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                 * (n * F.col("syy") - F.col("sy") * F.col("sy")))
    rho = F.when(den > 0, num / den)
    return m.select("n",
                    F.floor(rho * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").alias("rho_micro"))


def ks_by_group(df: DataFrame, group_col: str, value_col: str,
                domain_budget: int | None = DEFAULT_DOMAIN_BUDGET
                ) -> DataFrame:
    """One-vs-rest Kolmogorov-Smirnov distance for EVERY group in one
    pass: ``(group, n_group, n_rest, ks_micro)`` — which slices of the
    corpus are distributionally drifted from everything else (the
    per-slice generalization of the two-sample ks_2sample). The KS sup
    is evaluated on the union grid of distinct values — correct for
    step ECDFs, whose sup sits at a jump of either side.

    Plan: one (group, value) cell reduction, a global per-value
    cumulative, then a groups × distinct-values grid (bounded by
    |groups|·NDV — for integer-ish metrics this is a small reduced
    frame, NOT row-scale) with each group's cumulative carried by a
    running sum over coalesced cell counts. Exact integer counts
    end-to-end; floating
    point enters only in one terminal division per group.
    """
    # null groups/values are excluded up front: a NULL group key would
    # silently drop out of the grid equi-join (NULL ≠ NULL) and skew
    # every other group's "rest" side
    cells = (df.where(F.col(group_col).isNotNull()
                      & F.col(value_col).isNotNull())
               .groupBy(F.col(group_col).alias("__g"),
                        F.col(value_col).alias("__v"))
               .agg(F.count(F.lit(1)).alias("__c")))
    vals = cells.groupBy("__v").agg(F.sum("__c").alias("__cv"))
    wv = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    gcum = vals.select("__v", F.sum("__cv").over(wv).alias("__gc"))
    groups = cells.groupBy("__g").agg(F.sum("__c").alias("__ng"))
    # NDV guard rides the totals singleton: __n is load-bearing (the
    # rest-side size), so pruning cannot drop the budget check
    tot = (vals.agg(F.sum("__cv").alias("__n"),
                    F.count(F.lit(1)).alias("__ndv"))
               .select(guarded_scalar(F.col("__n"), F.col("__ndv"),
                                      domain_budget, "ks_by_group")
                       .alias("__n")))
    grid = gcum.crossJoin(F.broadcast(groups))
    own = grid.join(cells, ["__g", "__v"], "left")
    wg = (Window.partitionBy("__g").orderBy("__v")
                .rowsBetween(Window.unboundedPreceding, 0))
    cum = own.select(
        "__g", "__v", "__ng", "__gc",
        F.sum(F.coalesce("__c", F.lit(0))).over(wg).alias("__sc"))
    rest = F.col("__gc") - F.col("__sc")
    nrest = F.col("__n") - F.col("__ng")
    # exact-integer sup numerator |sc·n_rest − rest·n_g| (the common
    # denominator n_g·n_rest is constant per group, and floor is
    # monotone, so max-then-divide == divide-then-max) — only the ONE
    # terminal division per group touches floating point
    num = F.abs(F.col("__sc").cast("decimal(38,0)")
                * nrest.cast("decimal(38,0)")
                - rest.cast("decimal(38,0)")
                * F.col("__ng").cast("decimal(38,0)"))
    per = (cum.crossJoin(F.broadcast(tot))
              .filter(nrest > 0)
              .select("__g", "__ng", nrest.alias("__nr"),
                      num.alias("__num")))
    return (per.groupBy(F.col("__g").alias(group_col))
               .agg(F.max("__ng").alias("n_group"),
                    F.max("__nr").alias("n_rest"),
                    F.floor(F.max("__num").cast("double")
                            / (F.max("__ng").cast("double")
                               * F.max("__nr").cast("double"))
                            * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").alias("ks_micro")))


def simpson_screen(df: DataFrame, stratum_col: str, treat: "F.Column",
                   value_col: str) -> DataFrame:
    """Simpson's-paradox screen: does the treated-vs-control mean gap
    of ``value_col`` point the SAME way inside each stratum as it does
    in the pooled aggregate? Per stratum: ``(stratum, n_treat,
    n_ctrl, stratum_sign, overall_sign, is_reversed)`` — the
    confounding detector run before trusting any aggregate comparison
    (stratum mix can flip the pooled sign).

    Exact end-to-end: mean comparison is done by integer
    cross-multiplication sign(s_t·n_c − s_c·n_t) in DECIMAL(38,0) —
    no division, no floats anywhere. One shuffle to the stratum grain;
    the pooled row is a broadcast singleton.
    """
    v = F.col(value_col).cast("decimal(38,0)")
    cells = (df.groupBy(F.col(stratum_col).alias("__s"))
               .agg(F.sum(F.when(treat, 1).otherwise(0)).alias("__nt"),
                    F.sum(F.when(treat, v).otherwise(F.lit(0)
                          .cast("decimal(38,0)"))).alias("__st"),
                    F.sum(F.when(~treat, 1).otherwise(0)).alias("__nc"),
                    F.sum(F.when(~treat, v).otherwise(F.lit(0)
                          .cast("decimal(38,0)"))).alias("__sc")))
    overall = cells.agg(F.sum("__nt").alias("__ont"),
                        F.sum("__st").alias("__ost"),
                        F.sum("__nc").alias("__onc"),
                        F.sum("__sc").alias("__osc"))

    def _sign(num):
        return (F.when(num > 0, 1).when(num < 0, -1).otherwise(0)
                 .cast("int"))

    s_sign = _sign(F.col("__st") * F.col("__nc")
                   - F.col("__sc") * F.col("__nt"))
    o_sign = _sign(F.col("__ost") * F.col("__onc")
                   - F.col("__osc") * F.col("__ont"))
    both = (F.col("__nt") > 0) & (F.col("__nc") > 0)
    return (cells.crossJoin(F.broadcast(overall))
                 .select(F.col("__s").alias(stratum_col),
                         F.col("__nt").alias("n_treat"),
                         F.col("__nc").alias("n_ctrl"),
                         F.when(both, s_sign).alias("stratum_sign"),
                         o_sign.alias("overall_sign"),
                         F.when(both, (s_sign * o_sign == -1)
                                .cast("int")).alias("is_reversed")))
