"""Stream-stream joins (Structured Streaming).

The batch twin is :func:`mura_spark.operators.asof.range_join`; here both
sides are unbounded, so watermarks bound the join state: each side buffers
only rows young enough to still find partners (Spark evicts state using the
watermark plus the join's time-range condition — the same decomposition the
batch bucketed range join makes explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(left: DataFrame, right: DataFrame, on: str,
                          by: str, lower: int, upper: int,
                          watermark: str = "1 hour",
                          suffix: str = "_r") -> DataFrame:
    """Inner join of two event streams on ``by`` where
    ``left[on] + lower <= right[on] <= left[on] + upper`` (seconds).

    Both sides carry the watermark; Spark derives per-side state retention
    from the interval bounds. Output columns: left columns + right columns
    with ``suffix``.
    """
    if lower > upper:
        raise ValueError("lower must be <= upper")
    l2 = left.withWatermark(on, watermark)
    r2 = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns]
    ).withWatermark(f"{on}{suffix}", watermark)
    on_r = F.col(f"{on}{suffix}")
    cond = ((F.col(by) == F.col(f"{by}{suffix}"))
            & (on_r >= F.col(on) + F.expr(f"INTERVAL {lower} SECOND"))
            & (on_r <= F.col(on) + F.expr(f"INTERVAL {upper} SECOND")))
    return l2.join(r2, cond, "inner")


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str | list[str],
                  how: str = "left", broadcast_dim: bool = True) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    columns (user profile, domain metadata) to an event stream.

    Stream-static joins are stateless in Structured Streaming — each
    micro-batch joins against the *current* static side, so no watermark
    or state store is involved, and the static side is re-read per batch
    (picking up dimension updates between batches). ``broadcast_dim``
    (default) hints the dimension for a broadcast hash join: the right
    call when the dimension fits in executor memory, which avoids
    shuffling the stream side every micro-batch — the dominant cost at
    scale. Set it False for huge dimensions (falls back to a shuffle join
    on the batch's key distribution).

    Batch/stream symmetric: pass a plain DataFrame for backfill and the
    DuckDB-oracle twin.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)
