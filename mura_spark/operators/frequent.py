"""Heavy hitters: all values of a column with frequency ≥ num/den of the
total row count — EXACT result via a lossless two-pass sketch.

No reference analog (the reference has no aggregation surface at all,
SURVEY.md §2.3 'Aggregations'); this is extension surface for corpus
analysis: dominant tokens/domains/boilerplate lines in a pretraining set.

Why not one big groupBy: at 100 TB a full ``groupBy(col).count()`` shuffles
every distinct value — for tokens that is the whole corpus — to answer a
question whose output is at most ``den/num`` rows. The two-pass shape
shuffles almost nothing:

1. **Candidate pass** (no shuffle): each input partition counts its own
   values in-memory and emits only those with local share ≥ num/den — at
   most ``den/num`` values per partition. Pigeonhole makes this lossless:
   a value with global share ≥ num/den must reach that share in at least
   one partition (if count ≥ (num/den)·Σn_p then count_p ≥ (num/den)·n_p
   for some p). All thresholds are integer cross-multiplications — no
   float arithmetic anywhere, so the result is engine- and
   partitioning-independent.
2. **Verify pass**: the candidate set (≤ partitions·den/num values) is
   broadcast; one filtered groupBy produces exact global counts, and the
   exact threshold keeps true heavy hitters only.

The driver holds one scalar (the total row count) and never sees values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, col: str, num: int, den: int) -> DataFrame:
    """(value, n_occ) for every NON-NULL value of ``col`` whose occurrence
    count satisfies ``den * count >= num * total_rows`` — exact,
    deterministic under any input partitioning. ``num/den`` is the share
    threshold as an integer ratio (e.g. 5/1000 = every value covering
    ≥ 0.5% of rows). NULL is never reported even when its share exceeds
    the threshold (a frequent NULL is a data-quality finding, not a
    heavy hitter — audit it with ``profile``'s null-rate report), but
    NULL rows DO count in ``total_rows``, so every value's share is of
    the whole column."""
    if num <= 0 or den <= 0:
        raise ValueError("num and den must be positive")
    # One scalar to the driver; no values cross. approx_row_count is EXACT
    # in every path it takes: parquet footers only for provably
    # count-preserving file-backed plans (skipping a full extra scan at
    # 100 TB), a real count() otherwise — so the threshold stays exact.
    from mura_spark.sources.parquet import approx_row_count
    total = approx_row_count(df)

    def kernel(batches):
        import pandas as pd
        parts = []
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            parts.append(pdf[col].value_counts(dropna=True))
        if parts:  # vectorized merge — no per-distinct-value Python loop
            tot = pd.concat(parts).groupby(level=0).sum()
            out = tot.index[tot.to_numpy() * den >= num * n_p]
        else:
            out = []
        yield pd.DataFrame({col: out})

    field = df.schema[col]
    cands = (df.select(col)
             .mapInPandas(kernel, schema=f"{field.name} {field.dataType.simpleString()}")
             .distinct())
    return (df.join(F.broadcast(cands), col)
            .groupBy(col).agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") * den >= F.lit(num * total)))
