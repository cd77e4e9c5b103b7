"""One-pass table profiling (the ANALYZE/data-quality summary).

Per-column null counts, distinct counts, and min/max in a SINGLE scan —
the profiling step a 100 TB ingest runs before anything else (schema
drift, null explosions, key-uniqueness checks). No reference analog
(SURVEY.md §2.3 — the reference has no statistics surface); extension
alongside the sources layer.

Scale design:
- ONE pass: all columns' aggregates ride in one aggregation; Spark plans
  multiple exact ``count_distinct``s via an Expand (|cols| rows emitted
  per input row) — exact mode therefore costs |cols|× the scan in
  shuffle input, which is the honest price of exact NDVs.
- ``exact=False`` switches every NDV to ``approx_count_distinct``
  (HyperLogLog++, mergeable, no Expand) — the default posture at real
  scale, same output schema.
- min/max are rendered to strings so one tidy (column, stats) row schema
  covers mixed column types; numeric formatting pitfalls are avoided by
  profiling only integral/string/date columns with exact cross-engine
  renderings (doubles would format differently per engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mura_spark.functions.quantize import micro


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  exact: bool = True) -> DataFrame:
    """One row per profiled column: ``(col_name, n_rows, n_nonnull,
    n_distinct, min_str, max_str)``, ordered by ``col_name``."""
    cols = cols or df.columns
    # positional sanitation: profiled tables are arbitrary pre-cleaning
    # inputs, so column names may contain spaces/quotes/backticks — every
    # by-name Column lookup PARSES the name (a stray backtick is a syntax
    # error), and splicing names into stack() below would be worse. toDF
    # renames positionally without parsing; original names survive only
    # as string literals in the output.
    positions = [df.columns.index(c) for c in cols]
    work = df.toDF(*[f"__c{i}" for i in range(len(df.columns))])
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, pos in enumerate(positions):
        col = F.col(f"__c{pos}")
        aggs.append(F.count(col).alias(f"nn_{i}"))
        aggs.append((F.count_distinct(col) if exact
                     else F.approx_count_distinct(col)).alias(f"nd_{i}"))
        aggs.append(F.min(col).cast("string").alias(f"mn_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"mx_{i}"))
    wide = work.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        name_lit = c.replace("'", "''")  # SQL string-literal escape
        stack_args += [f"'{name_lit}'", f"nn_{i}", f"nd_{i}",
                       f"mn_{i}", f"mx_{i}"]
    stacked = wide.select(
        "n_rows",
        F.expr(f"stack({len(cols)}, {', '.join(stack_args)}) AS "
               "(col_name, n_nonnull, n_distinct, min_str, max_str)"))
    return (stacked.select("col_name", "n_rows", "n_nonnull", "n_distinct",
                           "min_str", "max_str")
                   .orderBy("col_name"))


def corr_pairs(df, cols, scale: int = 2):
    """Pairwise Pearson correlation matrix (long form) over numeric
    columns carrying ≤ ``scale`` decimals: ``(col_x, col_y, corr_micro)``
    for every unordered pair, ``corr_micro = ⌊ρ·10⁶ + ½⌋``.

    Built from exact decimal moments, NOT ``F.corr``: the streaming
    co-moment aggregate is partition-order-dependent in its low bits,
    so its raw double is not reproducible run-to-run, let alone across
    engines. Here every moment (Σx, Σx², Σxy) is an exact DECIMAL sum —
    order-independent — and ρ = (n·Σxy − Σx·Σy) / √((n·Σx²−(Σx)²)·
    (n·Σy²−(Σy)²)) is then one fixed double expression over those exact
    inputs (÷ and √ are IEEE correctly-rounded, unlike ln/exp), so the
    result is bit-identical everywhere and oracle-hashable.

    Scale: ALL moments for all pairs ride in ONE aggregation over one
    scan (k columns → k(k−1)/2 + 2k running sums — fine for the ≤ tens
    of columns a profiling pass covers); output is one row per pair,
    assembled driver-free via an explode over a literal pair array.
    Per-row arithmetic stays in BIGINT — values quantize once to
    ``round(x·10^scale)`` (exact: the true scaled value is an integer,
    so no halfway case exists) and products multiply as longs inside
    whole-stage codegen; only the accumulators are DECIMAL(38,0), which
    measured 4× faster than per-row decimal multiplication at 10×
    sf0.1. Correlation is invariant under the linear scaling, so no
    rescale is needed. Precondition: |x|·10^scale < 3e9 per value so
    the long product cannot overflow (ANSI mode would throw, not wrap).
    """
    from pyspark.sql import functions as F
    if len(cols) < 2:
        raise ValueError("need at least two columns to correlate")
    fp = {c: F.round(F.col(c).cast("double") * F.lit(float(10 ** scale)))
           .cast("bigint") for c in cols}
    dec38 = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(fp[c].cast(dec38)).alias(f"__s_{c}"))
        aggs.append(F.sum((fp[c] * fp[c]).cast(dec38)).alias(f"__q_{c}"))
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1:]]
    for x, y in pairs:
        aggs.append(F.sum((fp[x] * fp[y]).cast(dec38))
                    .alias(f"__p_{x}_{y}"))
    m = df.agg(*aggs)
    n = F.col("__n").cast("double")
    rows = []
    for x, y in pairs:
        sx, sy = F.col(f"__s_{x}").cast("double"), F.col(f"__s_{y}").cast("double")
        qx, qy = F.col(f"__q_{x}").cast("double"), F.col(f"__q_{y}").cast("double")
        pxy = F.col(f"__p_{x}_{y}").cast("double")
        den = (n * qx - sx * sx) * (n * qy - sy * sy)
        rho = (n * pxy - sx * sy) / F.sqrt(den)
        # zero-variance column -> correlation undefined: NULL, not a
        # DIVIDE_BY_ZERO abort (ANSI mode) — matches the SQL twin's CASE
        rows.append(F.struct(
            F.lit(x).alias("col_x"), F.lit(y).alias("col_y"),
            F.when(den > F.lit(0.0), micro(rho)).alias("corr_micro")))
    return (m.select(F.explode(F.array(*rows)).alias("__r"))
             .select("__r.col_x", "__r.col_y", "__r.corr_micro"))


def quantile_normalize(df, part_col: str, value_col: str, id_col: str):
    """Within-partition percent-rank normalization:
    ``(id, part, pr_micro)`` with ``pr_micro = ⌊percent_rank·10⁶ + ½⌋``.

    The cross-source score equalizer: raw quality scores are not
    comparable across sources (different length/markup distributions),
    so mixture planning ranks each document within its own source and
    selects on the normalized rank instead. Ordering carries ``id_col``
    as the tiebreak, so equal scores still produce a deterministic,
    hash-stable ranking.

    One shuffle on ``part_col``; the window runs per source — bounded by
    the largest source's row count, the natural partitioning for this
    semantics (a global sort would be both wrong and slower).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = Window.partitionBy(part_col).orderBy(F.col(value_col).asc(),
                                             F.col(id_col).asc())
    return df.select(
        F.col(id_col), F.col(part_col),
        micro(F.percent_rank().over(w)).alias("pr_micro"))


def referential_audit(pairs):
    """Referential-integrity summary over (child, parent) relationships:
    one row per relationship — ``(relationship, n_child, n_orphan,
    n_unreferenced)`` where ``n_orphan`` counts child rows whose foreign
    key misses the parent and ``n_unreferenced`` counts parent keys no
    child references. The ingest gate a pipeline runs after every load
    (late dimension arrivals, retention-window cleanups, bad backfills).

    ``pairs``: list of ``(name, child_df, fk_col, parent_df, pk_col)``.

    Plan per relationship: two aggregates over key-projected inputs —
    the orphan side is a LEFT ANTI hash join (streams the big child,
    never materializes matches; AQE broadcasts small parents), the
    unreferenced side anti-joins the DISTINCT child keys (already
    reduced) against the parent. Single-row results cross-join into one
    output frame; no driver-side state beyond the plan.
    """
    from functools import reduce

    from pyspark.sql import functions as F
    outs = []
    for name, child, fk, parent, pk in pairs:
        ckeys = child.select(F.col(fk).alias("__k"))
        pkeys = parent.select(F.col(pk).alias("__k"))
        n_child = child.agg(F.count(F.lit(1)).alias("n_child"))
        orphan = (ckeys.join(pkeys.distinct(), "__k", "left_anti")
                       .agg(F.count(F.lit(1)).alias("n_orphan")))
        unref = (pkeys.join(ckeys.distinct(), "__k", "left_anti")
                      .agg(F.count(F.lit(1)).alias("n_unreferenced")))
        outs.append(n_child.crossJoin(orphan).crossJoin(unref)
                    .select(F.lit(name).alias("relationship"),
                            "n_child", "n_orphan", "n_unreferenced"))
    return reduce(lambda a, b: a.unionByName(b), outs)


def benford_audit(df, value_col: str):
    """First-digit (Benford) distribution audit over a positive numeric
    column: ``(digit, observed, expected_micro, chi2_micro)`` for digits
    1-9, with the Benford expectation ``n·log10(1 + 1/d)``. The classic
    fabricated-numbers screen for ingested financial/metric columns —
    synthetic or truncated feeds snap to near-uniform first digits and
    light up the chi-square column.

    One groupBy over the digit (9 groups, map-side combined); n rides in
    as a broadcast single-row total. The occupied cells LEFT-join onto a
    literal 1-9 digit grid so absent digits surface as observed=0 rather
    than vanishing — a digit that never occurs contributes its full
    (0−E)²/E = E to the statistic, and the strongest deviations are
    exactly the ones with missing digits. The per-digit log10 expectation
    is quantized per row (9 rows) under the usual micro-floor, keeping
    the libm call out of any aggregation.
    """
    from pyspark.sql import functions as F
    digit = F.substring(F.floor(F.col(value_col).cast("double"))
                        .cast("string"), 1, 1).cast("int")
    cells = (df.filter(F.col(value_col) >= 1)
               .groupBy(digit.alias("digit"))
               .agg(F.count(F.lit(1)).alias("__obs")))
    total = cells.agg(F.sum("__obs").alias("__n"))
    grid = total.select(
        F.explode(F.array(*[F.lit(d) for d in range(1, 10)]))
         .alias("digit"), "__n")
    full = (grid.join(F.broadcast(cells), "digit", "left")
                .select("digit", "__n",
                        F.coalesce("__obs", F.lit(0).cast("bigint"))
                         .alias("observed")))
    d = F.col("digit").cast("double")
    e = (F.col("__n").cast("double")
         * F.log10(F.lit(1.0) + F.lit(1.0) / d))
    o = F.col("observed").cast("double")
    contrib = (o - e) * (o - e) / e
    return full.select("digit", "observed",
                       micro(e).alias("expected_micro"),
                       micro(contrib).alias("chi2_micro"))


def k_anonymity_bands(df, qi_cols):
    """k-anonymity audit over a quasi-identifier combination: bucket
    every QI group by its size band — ``1_unique`` (k=1, re-identifiable
    outright), ``2_lt5``, ``3_lt20``, ``4_ge20`` — and report
    ``(k_band, qi_groups, n_rows, pct_rows_micro)``. The privacy gate a
    corpus release runs before publishing: the share of rows sitting in
    small QI groups IS the re-identification exposure. No reference
    analog (the reference has no audit surface); extension alongside
    the profiling layer.

    Plan: one map-side-combined groupBy on the QI columns (the only
    full shuffle), then a ≤4-row band rollup; the grand total rides in
    as a broadcast single-row cross join, so the 100 TB input is
    scanned once and never re-shuffled.
    """
    from pyspark.sql import functions as F
    groups = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__gsz"))
    band = (F.when(F.col("__gsz") == 1, "1_unique")
             .when(F.col("__gsz") < 5, "2_lt5")
             .when(F.col("__gsz") < 20, "3_lt20")
             .otherwise("4_ge20"))
    bands = (groups.groupBy(band.alias("k_band"))
                   .agg(F.count(F.lit(1)).alias("qi_groups"),
                        F.sum("__gsz").alias("n_rows")))
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    pct = F.floor(F.col("n_rows").cast("double")
                  / F.col("__n").cast("double") * 1000000.0
                  + F.lit(0.5)).cast("bigint")
    return (bands.crossJoin(F.broadcast(total))
                 .select("k_band", "qi_groups", "n_rows",
                         pct.alias("pct_rows_micro")))


def join_cardinality_report(pairs):
    """Join-size estimation WITHOUT executing the join: for each
    ``(name, left_df, left_key, right_df, right_key)`` relationship,
    compute the exact inner-equi-join output cardinality
    ``Σ_k cnt_l(k)·cnt_r(k)`` from per-key counts, plus the largest
    single key's contribution and its share (``skew_micro``). This is
    the planning probe a 100 TB pipeline runs BEFORE a join it cannot
    afford to get wrong — a skew_micro near 10⁶ says one key produces
    nearly the whole output (salt it); an est_rows far above both
    inputs says the join explodes (rethink it).

    Plan per relationship: two map-side-combined per-key counts (each a
    reduction to the key's NDV, never the raw rows), an equi-join of
    the two count tables, and a single-row rollup; totals arrive as
    broadcast scalars. Nothing materializes the estimated join.
    """
    from functools import reduce

    from pyspark.sql import functions as F
    outs = []
    for name, left, lk, right, rk in pairs:
        ca = (left.groupBy(F.col(lk).alias("__k"))
                  .agg(F.count(F.lit(1)).alias("__ca")))
        cb = (right.groupBy(F.col(rk).alias("__k"))
                   .agg(F.count(F.lit(1)).alias("__cb")))
        prod = F.col("__ca") * F.col("__cb")
        est = (ca.join(cb, "__k")
                 .agg(F.count(F.lit(1)).alias("matched_keys"),
                      F.coalesce(F.sum(prod), F.lit(0).cast("bigint"))
                       .alias("est_rows"),
                      F.coalesce(F.max(prod), F.lit(0).cast("bigint"))
                       .alias("max_key_rows")))
        nl = left.agg(F.count(F.lit(1)).alias("n_left"))
        nr = right.agg(F.count(F.lit(1)).alias("n_right"))
        skew = (F.when(F.col("est_rows") > 0,
                       F.floor(F.col("max_key_rows").cast("double")
                               / F.col("est_rows").cast("double")
                               * 1000000.0 + F.lit(0.5)).cast("bigint"))
                 .otherwise(F.lit(0).cast("bigint")))
        outs.append(
            est.crossJoin(F.broadcast(nl)).crossJoin(F.broadcast(nr))
               .select(F.lit(name).alias("join_name"), "n_left",
                       "n_right", "matched_keys", "est_rows",
                       "max_key_rows", skew.alias("skew_micro")))
    return reduce(lambda a, b: a.unionByName(b), outs)


def sequence_gaps(df, id_col: str):
    """Dense-sequence integrity audit over an id column: how much of
    the [min, max] span is missing, and where the holes start. The
    dropped-batch detector for ingest pipelines whose upstream assigns
    monotone ids — a nonzero ``n_missing`` localizes loss without any
    row-level diff. Returns one row ``(n_ids, span_min, span_max,
    n_missing, n_gap_runs, first_missing)``.

    Plan: the distinct-id reduction is the only row-scale shuffle; gap
    RUNS are found with a self ANTI join on the successor key
    (``k+1 ∉ ids`` — an equi join on a computed key, never a sort or
    window over the global sequence), so the audit scales as two
    hash passes regardless of span size.
    """
    from pyspark.sql import functions as F
    ids = df.select(F.col(id_col).alias("__k")).distinct()
    b = ids.agg(F.min("__k").alias("span_min"),
                F.max("__k").alias("span_max"),
                F.count(F.lit(1)).alias("n_ids"))
    ends = ids.alias("a").join(
        ids.alias("bb"),
        F.col("a.__k") + F.lit(1) == F.col("bb.__k"), "left_anti")
    gaps = (ends.crossJoin(F.broadcast(b))
                .filter(F.col("__k") < F.col("span_max")))
    gagg = gaps.agg(F.count(F.lit(1)).alias("n_gap_runs"),
                    (F.min("__k") + F.lit(1)).alias("first_missing"))
    return (b.crossJoin(F.broadcast(gagg))
             .select("n_ids", "span_min", "span_max",
                     (F.col("span_max") - F.col("span_min") + F.lit(1)
                      - F.col("n_ids")).alias("n_missing"),
                     "n_gap_runs", "first_missing"))
