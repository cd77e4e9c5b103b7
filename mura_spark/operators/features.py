"""Feature-engineering operators for model training prep (leakage-safe
encodings, ranking-based evaluation).

No reference analog (SURVEY.md §2 — the reference has no ML-prep
surface); extension beside sampling/packing in the training-data
pipeline family.

Scale design: target encoding is one window shuffle on the grouping key
(row grain preserved, no join back); AUC reduces the row scale to the
score's distinct values BEFORE any ordered walk, so the sequential part
is bounded by the score domain, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(df: DataFrame, group_cols: list[str],
                      target_col: str, out_col: str) -> DataFrame:
    """Leave-one-out target encoding: each row gets its group's mean of
    ``target_col`` computed WITHOUT the row itself —
    ``(Σ_group − x) / (n_group − 1)`` — the leakage-safe form (plain
    group-mean encoding leaks each row's own label into its feature;
    LOO is the standard fix). ``n`` counts NON-NULL labels only (a
    NULL-labeled row contributes nothing to the sum, so counting it in
    the denominator would bias every encoding toward 0); a row whose
    OTHER-rows label count is zero — singleton groups, or any row in a
    group whose only label is its own — encodes NULL rather than a
    self-derived or fabricated value. NULL-labeled rows themselves
    encode the group's full mean over the labeled rows (nothing of
    their own to leave out).

    One window shuffle on the group key; the subtraction happens at row
    grain, so no second pass or join-back. Exact: integer/decimal sum
    and count, one correctly-rounded double division per row.
    """
    w = Window.partitionBy(*group_cols)
    n = F.count(target_col).over(w)  # non-null labels only
    s = F.sum(target_col).over(w)
    self_labeled = F.col(target_col).isNotNull().cast("int")
    n_others = n - self_labeled
    loo = ((s - F.coalesce(F.col(target_col), F.lit(0)))
           .cast("double") / n_others.cast("double"))
    return df.withColumn(out_col, F.when(n_others > 0, loo))


def rank_auc(df: DataFrame, score_col: str, label_col: str,
             domain_budget: int | None = None) -> DataFrame:
    """Exact ROC AUC of a numeric score against a boolean label, via
    the rank formulation: AUC = P(score⁺ > score⁻) + ½·P(tie). Returns
    one row ``(n_pos, n_neg, auc_micro)``.

    Integer-exact: rows first reduce to per-distinct-score (pos, neg)
    counts — the only row-scale shuffle — then a prefix walk over the
    distinct scores accumulates ``2·pos·neg_below + pos·neg_same``
    (doubled to keep half-credit ties integral). The ordered walk runs
    over score NDV (domain-bounded), not rows; the single division to
    micro-units happens once at the end.

    ``domain_budget`` asserts the bounded-score-domain contract: totals
    ride a broadcast singleton crossJoined BEFORE the prefix window, so
    a continuous unquantized score column fails loudly (during the
    broadcast build) instead of feeding the single-partition walk n
    rows. The guard defaults OFF because it costs a second reduction
    pass over the data; pass guards.DEFAULT_DOMAIN_BUDGET (or any
    ceiling) when the score column's domain is not pinned by
    construction.

    Rows with a NULL score or NULL label are excluded first — the
    published complete-observations rule (a NULL label is unknown, not
    negative; a NULL score has no rank position).
    """
    from mura_spark.operators.guards import guarded_scalar
    df = df.where(F.col(score_col).isNotNull()
                  & F.col(label_col).isNotNull())
    cells = (df.groupBy(F.col(score_col).alias("__s"))
               .agg(F.sum(F.when(F.col(label_col), 1).otherwise(0))
                     .alias("__p"),
                    F.sum(F.when(F.col(label_col), 0).otherwise(1))
                     .alias("__n")))
    below = (Window.orderBy("__s")
                   .rowsBetween(Window.unboundedPreceding, -1))
    contrib = (F.lit(2) * F.col("__p")
               * F.coalesce(F.sum("__n").over(below), F.lit(0))
               + F.col("__p") * F.col("__n"))
    if domain_budget is not None:
        t = (cells.agg(F.sum("__p").alias("n_pos"),
                       F.sum("__n").alias("n_neg"),
                       F.count(F.lit(1)).alias("__ndv"))
                  .select(guarded_scalar(F.col("n_pos"), F.col("__ndv"),
                                         domain_budget, "rank_auc")
                          .alias("n_pos"), "n_neg"))
        tot = (cells.crossJoin(F.broadcast(t))
                    .select("n_pos", "n_neg", contrib.alias("__c"))
                    .groupBy("n_pos", "n_neg")
                    .agg(F.sum("__c").alias("__auc2")))
    else:
        tot = (cells.select("__p", "__n", contrib.alias("__c"))
                    .agg(F.sum("__p").alias("n_pos"),
                         F.sum("__n").alias("n_neg"),
                         F.sum("__c").alias("__auc2")))
    auc = (F.col("__auc2").cast("double")
           / (F.lit(2.0) * F.col("n_pos").cast("double")
              * F.col("n_neg").cast("double")))
    return tot.select(
        "n_pos", "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               F.floor(auc * 1000000.0 + F.lit(0.5)).cast("bigint"))
         .alias("auc_micro"))


def quartile_migration(df: DataFrame, key_col: str, period_col: str,
                       value_col: str, n_tiles: int = 4) -> DataFrame:
    """Cohort-migration matrix: each key's value-quantile tile in
    period P versus its tile in period P+1, counted over all adjacent
    period pairs — the customer-upgrade/churn flow behind every
    "segment movement" dashboard. Output ``(tile_from, tile_to,
    n_moves)`` (n_tiles² rows).

    NTILE over (period) partitions with a (value, key) tiebreak makes
    tile assignment deterministic (both engines use the standard
    front-loaded-remainder NTILE rule, pinned by window_ntile); the
    self-join on (key, period+1) is an equi join at key grain.

    Plan: one (key, period) reduction is the caller's job; here one
    window shuffle per period partition + one key-grain equi join.

    Rows with a NULL period or NULL value are excluded: a NULL value
    has no quantile position (engines rank NULLs at opposite ends) and
    a NULL period can never match any period+1.
    """
    df = df.where(F.col(value_col).isNotNull()
                  & F.col(period_col).isNotNull())
    w = (Window.partitionBy(period_col)
               .orderBy(F.col(value_col).asc(), F.col(key_col).asc()))
    tiled = df.select(key_col, period_col,
                      F.ntile(n_tiles).over(w).alias("__tile"))
    nxt = tiled.select(F.col(key_col).alias("__k"),
                       (F.col(period_col) - F.lit(1)).alias(period_col),
                       F.col("__tile").alias("__tile_to"))
    j = tiled.join(
        nxt, (F.col(key_col) == F.col("__k"))
        & (tiled[period_col] == nxt[period_col]))
    return (j.groupBy(F.col("__tile").alias("tile_from"),
                      F.col("__tile_to").alias("tile_to"))
             .agg(F.count(F.lit(1)).alias("n_moves")))
