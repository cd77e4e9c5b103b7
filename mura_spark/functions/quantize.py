"""The suite-wide fixed-point quantizer.

``micro(x) = ⌊x·10⁶ + ½⌋`` as BIGINT is THE cross-engine determinism
contract for every score that passes through a transcendental (ln, exp,
pow, log10) or any other last-ulp-engine-sensitive double: quantize per
row BEFORE any aggregation, then combine as exact integers. Each operator
used to inline this formula; a single definition removes the risk that a
future change (scale, rounding mode) drifts between call sites — the
DuckDB oracle twins spell the same formula as
``CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micro(col: Column, scale: float = 1e6) -> Column:
    """Round-half-up fixed-point quantization to integer ``scale``-units
    (micro-units by default): ``⌊col·scale + ½⌋`` as BIGINT."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("bigint")


def dec18(col: Column) -> Column:
    """Exact DECIMAL(18,0) cast for integer-count products — the shared
    cross-engine contract (bigint×bigint would overflow; double would
    round past 2⁵³). One definition so a precision change cannot drift
    between call sites."""
    return col.cast("decimal(18,0)")
