"""Skyline (Pareto-frontier) operator: the maximal vectors under
(minimize x, maximize y) dominance.

Classic OLAP preference query (Börzsönyi et al., "The Skyline Operator",
ICDE'01). A point p is dominated iff some q has ``q.x <= p.x AND
q.y >= p.y`` with at least one strict inequality.

100 TB plan shape (three lossless stages, no all-pairs join anywhere):

1. **Cell reduction** — groupBy the (x, y) value pair. Dominance only
   depends on the distinct value cells, so duplicates collapse in one
   map-side-combined shuffle; cell count is bounded by |distinct x| ×
   |distinct y|, typically orders of magnitude below the row count.
2. **Bucket prune** — per ``floor(x)`` bucket, the max y; a cell whose y
   is ≤ the running max over *strictly lower* buckets is dominated by a
   strictly-cheaper cell and is killed. The running max runs over the
   tiny bucket table (≤ distinct integer parts of x), never the data.
   This is a lossless kill (never drops a skyline member) and leaves
   ~one candidate band per bucket.
3. **Exact sweep** — survivors sort once by (x asc, y desc); with
   distinct cells, a cell is dominated iff ``max(y) over the preceding
   cells >= y`` (an earlier cell has x' < x, or x' = x with y' > y — in
   either case y-max coverage is exactly dominance). Dominance is
   transitive, so testing against surviving cells only is sufficient:
   any killed dominator is itself dominated by a survivor with lower x.
   The sweep's single-partition window touches only the pruned
   survivors, not the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_min_max(df: DataFrame, x_col: str, y_col: str,
                    count_alias: str = "n_rows",
                    rep_col: str | None = None,
                    rep_alias: str = "rep_key") -> DataFrame:
    """Skyline of ``df`` under (minimize ``x_col``, maximize ``y_col``).

    Returns one row per surviving (x, y) cell: ``(x, y, count_alias[,
    rep_alias])`` where ``rep_alias`` is ``min(rep_col)`` — the
    deterministic representative row key for the cell.

    Rows with a NULL ``x`` or ``y`` do not participate: dominance is
    UNKNOWN against a NULL coordinate, so the NOT-EXISTS definition
    neither dominates with nor eliminates such rows — but the sweep's
    asc ordering would put a NULL-x cell FIRST and let its y kill
    genuine skyline members. Filtering matches the oracle's effective
    treatment of comparisons (and drops NULL cells from the output,
    where a NULL coordinate is not a Pareto point in any case).
    """
    df = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    aggs = [F.count(F.lit(1)).alias(count_alias)]
    if rep_col is not None:
        aggs.append(F.min(rep_col).alias(rep_alias))
    cells = df.groupBy(x_col, y_col).agg(*aggs)

    # Stage 2: per-integer-bucket max y, running max over lower buckets.
    bucket = F.floor(F.col(x_col)).alias("__bkt")
    bmax = (cells.groupBy(bucket)
                 .agg(F.max(y_col).alias("__bmax")))
    wb = (Window.orderBy("__bkt")
                .rowsBetween(Window.unboundedPreceding, -1))
    bprev = bmax.select("__bkt",
                        F.max("__bmax").over(wb).alias("__prev_bmax"))
    pruned = (cells.join(F.broadcast(bprev),
                         F.floor(F.col(x_col)) == F.col("__bkt"), "left")
                   .where(F.col("__prev_bmax").isNull()
                          | (F.col("__prev_bmax") < F.col(y_col)))
                   .drop("__bkt", "__prev_bmax"))

    # Stage 3: exact sweep over the survivors.
    ws = (Window.orderBy(F.col(x_col).asc(), F.col(y_col).desc())
                .rowsBetween(Window.unboundedPreceding, -1))
    swept = pruned.withColumn("__prev_max", F.max(y_col).over(ws))
    return (swept.where(F.col("__prev_max").isNull()
                        | (F.col("__prev_max") < F.col(y_col)))
                 .drop("__prev_max"))


def sql_skyline_min_max(table_expr: str, x_expr: str, y_expr: str,
                        count_alias: str = "n_rows",
                        rep_expr: str | None = None,
                        rep_alias: str = "rep_key") -> str:
    """DuckDB twin of :func:`skyline_min_max` — same cell reduction, but
    dominance spelled as the textbook NOT EXISTS (quadratic over cells is
    fine at oracle scale and is the clearest statement of the semantics
    the staged Spark plan must reproduce)."""
    rep_sel = (f", MIN({rep_expr}) AS {rep_alias}" if rep_expr else "")
    rep_out = f", {rep_alias}" if rep_expr else ""
    return (
        f"WITH cells AS (SELECT {x_expr} AS x, {y_expr} AS y, "
        f"COUNT(*) AS {count_alias}{rep_sel} "
        f"FROM {table_expr} "
        f"WHERE {x_expr} IS NOT NULL AND {y_expr} IS NOT NULL "
        f"GROUP BY 1, 2) "
        f"SELECT x AS {x_expr}, y AS {y_expr}, {count_alias}{rep_out} "
        "FROM cells c WHERE NOT EXISTS ("
        "SELECT 1 FROM cells d WHERE d.x <= c.x AND d.y >= c.y "
        "AND (d.x < c.x OR d.y > c.y))")
