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
