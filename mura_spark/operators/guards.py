"""Scale guards for NDV-bounded operators.

Several exact-statistics operators (KS, Mann-Whitney, AUC, Spearman,
Theil-Sen) reduce the row scale to a value DOMAIN first and then run a
single-partition ordered pass over that reduced frame. The reduction is
what makes them 100 TB-safe — telemetry values are fixed-point so the
domain is bounded — but the assumption breaks silently if a caller feeds
a CONTINUOUS double column: the groupBy stops reducing and the
unpartitioned cumulative window becomes an n-row single-task bottleneck.

:func:`guarded_scalar` makes that misuse degrade loudly instead: it
wraps a load-bearing scalar (one the query provably evaluates — pruning
cannot remove it) so that, at execution time, exceeding the row budget
raises a clear ``[mura domain-budget]`` error telling the caller to
pre-quantize. The count it checks is folded into an aggregate the
operator already computes and broadcasts, so the guard costs zero extra
passes over the data; because Spark materializes broadcast build sides
before streaming the probe side, the error fires before the oversized
window does the damage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default NDV budget for value-domain-reduced operators. 10^6 distinct
#: buckets keeps the single-partition cumulative pass in the tens of
#: milliseconds and a few MB; real telemetry domains (cents, counts,
#: bucketed scores) sit orders of magnitude below it.
DEFAULT_DOMAIN_BUDGET = 1_000_000

#: Default row ceiling for operators whose ordered pass is inherently
#: row-scale (exact Spearman ranks). A 10^8-row single-node sort is the
#: practical single-task limit; beyond it, stratify or pre-quantize.
DEFAULT_ROW_BUDGET = 100_000_000

_HINT = ("pre-quantize the value column to a bounded domain before this "
         "operator (e.g. fixed-point cents via floor(v*100), or a "
         "bucketed grid), raise the budget explicitly if the domain is "
         "genuinely bounded, or pass budget=None to opt out")


def guarded_scalar(col: Column, n: Column, budget: int | None,
                   what: str, hint: str = _HINT) -> Column:
    """Wrap ``col`` so evaluating it first asserts ``n <= budget``.

    ``n`` must ride in an aggregate the operator already computes (the
    broadcast singleton totals), and ``col`` must be a column the query
    actually uses — the guard lives inside it, so column pruning cannot
    silently drop the check. Under budget the wrapped value is
    bit-identical to ``col`` (oracle hashes unchanged); over budget the
    query fails with an actionable message instead of feeding an n-row
    frame to a single-partition window.
    """
    if budget is None:
        return col
    msg = F.concat(
        F.lit(f"[mura domain-budget] {what}: reduced frame holds "),
        n.cast("string"),
        F.lit(f" rows, over the {budget:,}-row budget - {hint}"))
    return F.when(n > F.lit(budget), F.raise_error(msg)).otherwise(col)
