"""Training-sequence packing: lay documents out into fixed-token-budget
sequences — the step between dedup/filtering and writing training shards.

No reference analog (the reference has no text surface at all,
/root/reference/src/planner/logicalplan.rs:63-71 names zero functions);
this is north-star extension surface for the 100 TB training-data pipeline.

Two standard semantics, both deterministic and oracle-verifiable:

- :func:`pack_chunks` — **concat-and-chunk** (pretraining): within a shard,
  documents are conceptually concatenated in ascending-id order and the
  token stream is cut every ``budget`` tokens, so a document may span chunk
  boundaries. The relational form needs no concatenation: a running-sum
  window gives each document its stream offset, and the chunks it overlaps
  are a closed integer range — one shuffle (the per-shard window) plus an
  explode of that range.
- :func:`pack_greedy` — **whole-document next-fit** (fine-tuning): walk the
  shard in ascending-id order, accumulate documents into the current
  sequence, open a new sequence when the next document would overflow the
  budget. Inherently sequential per shard, so it runs as one Arrow-batched
  ``applyInPandas`` pass per shard group.

Scale notes: sharding (portable md5-derived hash of the id) bounds every
window partition / pandas group to ~|corpus| / n_shards documents; at 100 TB
raise ``n_shards`` so one shard's (id, size) pairs fit a task comfortably —
the packing state is two scalars per shard, and more shards cost only
boundary waste (at most one partial chunk per shard), never skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mura_spark.functions.hashing import md5_hash48


def _with_shard(df: DataFrame, id_col: str, size_col: str,
                n_shards: int) -> DataFrame:
    """(id, __sz, shard): portable deterministic shard assignment. The hash
    is MD5-derived (functions/hashing.py) so the oracle SQL and any
    re-partitioning of the input reproduce identical shards."""
    return df.select(
        F.col(id_col),
        F.col(size_col).cast("bigint").alias("__sz"),
        (md5_hash48(F.col(id_col).cast("string")) % n_shards).alias("shard"))


def pack_chunks(df: DataFrame, id_col: str, size_col: str, budget: int,
                n_shards: int = 8) -> DataFrame:
    """Concat-and-chunk packing map.

    Output: (id, shard, chunk_id, tok_start, tok_end) — one row per
    (document, chunk) overlap; [tok_start, tok_end) is the document-local
    token span that lands in that chunk. Every chunk except a shard's last
    is exactly ``budget`` tokens when reassembled. All arithmetic is integer
    (``div``), so the DuckDB oracle reproduces it bit-for-bit.
    """
    base = _with_shard(df, id_col, size_col, n_shards)
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = base.withColumn("__off", F.sum("__sz").over(w) - F.col("__sz"))
    first = F.expr(f"__off div {budget}")
    # sz = 0 would make the naive last < first (Spark's sequence() would
    # count *down*); clamp to emit exactly one zero-width span
    last = F.greatest(F.expr(f"(__off + __sz - 1) div {budget}"), first)
    return (base
            .withColumn("chunk_id",
                        F.explode(F.sequence(first, last)))
            .select(
                id_col, "shard", "chunk_id",
                F.greatest(F.col("chunk_id") * budget - F.col("__off"),
                           F.lit(0).cast("bigint")).alias("tok_start"),
                F.least((F.col("chunk_id") + 1) * budget - F.col("__off"),
                        F.col("__sz")).alias("tok_end")))


def chunk_overlap(df: DataFrame, id_col: str, size_col: str,
                  chunk: int, overlap: int) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the
    context-window layout for retrieval corpora and long-document
    pretraining (each chunk re-reads the previous chunk's last ``overlap``
    tokens so no span of ≤ ``overlap`` tokens is ever split).

    Output: (id, chunk_idx, tok_start, tok_end) with
    ``tok_start = chunk_idx·(chunk-overlap)``,
    ``tok_end = min(tok_start+chunk, size)``; a document shorter than
    ``chunk`` yields exactly one chunk. Chunk count is
    ``1 + ceil((size-chunk)/stride)`` for longer ones — the standard
    fixed-stride tiling, all integer arithmetic (oracle-exact).

    Scale shape: row-local explode — no shuffle, no window, no state; at
    100 TB this is a pure scan-side map whose output is ~``size/stride``
    rows per document.
    """
    if overlap >= chunk:
        raise ValueError(f"overlap {overlap} must be < chunk {chunk}")
    stride = chunk - overlap
    sz = F.col(size_col).cast("bigint")
    n_chunks = F.when(sz <= chunk, F.lit(1).cast("bigint")).otherwise(
        F.expr(f"(`{size_col}` - {chunk} + {stride} - 1) div {stride}") + 1)
    start = F.col("chunk_idx") * stride
    return (df.select(F.col(id_col), sz.alias("__sz"),
                      F.explode(F.sequence(F.lit(0).cast("bigint"),
                                           n_chunks - 1)).alias("chunk_idx"))
            .select(id_col, "chunk_idx",
                    start.alias("tok_start"),
                    F.least(start + chunk, F.col("__sz")).alias("tok_end")))


def pack_greedy(df: DataFrame, id_col: str, size_col: str, budget: int,
                n_shards: int = 8) -> DataFrame:
    """Whole-document NEXT-FIT packing (streaming concat-and-cut).

    Next-fit, not first-fit: only the currently open sequence is
    considered — an overflowing document closes it forever and opens a
    new one, which is the standard streaming packer for LLM data
    pipelines (single pass, O(1) state, order-preserving). Classic
    first-fit revisits earlier sequences with remaining room for a
    tighter fill at the cost of O(open sequences) state and loss of
    document order; choose a bin-packing library offline if fill
    percentage matters more than streaming.

    Output: (id, shard, seq_id, seq_fill) — seq_id is the 0-based sequence
    within the shard, seq_fill the running token count of that sequence
    after adding the document. A document larger than ``budget`` gets a
    sequence of its own (never split — that is :func:`pack_chunks`' job).
    Sequential per shard by construction, so each shard group is one
    Arrow-batched pandas pass; determinism comes from the ascending-id walk.
    """
    import pandas as pd

    base = _with_shard(df, id_col, size_col, n_shards)
    id_type = base.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("shard", T.LongType()),
        T.StructField("seq_id", T.LongType()),
        T.StructField("seq_fill", T.LongType())])

    def pack(key, pdf):
        pdf = pdf.sort_values(id_col)
        seq_ids, fills = [], []
        seq, fill = 0, 0
        for sz in pdf["__sz"]:
            if fill > 0 and fill + sz > budget:
                seq += 1
                fill = 0
            fill += sz
            seq_ids.append(seq)
            fills.append(fill)
        return pd.DataFrame({
            id_col: pdf[id_col], "shard": key[0],
            "seq_id": seq_ids, "seq_fill": fills})

    return base.groupBy("shard").applyInPandas(pack, out_schema)


def global_stream_offsets(df: DataFrame, order_col: str, size_col: str,
                          n_buckets: int = 64) -> DataFrame:
    """Each row's exact starting offset in the ONE global token stream
    ordered by ``order_col`` — the global prefix sum, computed without the
    single-task bottleneck of ``SUM() OVER (ORDER BY ...)`` (a global
    window collapses the whole corpus into one partition; at 100 TB that
    task never finishes).

    Distributed shape (all deterministic, independent of input
    partitioning):

    1. one reduced aggregation for the key span (2 scalars);
    2. rows map to ``n_buckets`` contiguous key-range buckets (pure
       row-local arithmetic on ``order_col`` — equal-width ranges; for a
       skewed key domain raise ``n_buckets`` or pre-map the key to a dense
       rank, the buckets only need to be *bounded*, not balanced);
    3. one reduced aggregation of per-bucket totals (≤ ``n_buckets`` rows
       to the driver) → running offsets, re-broadcast as a map literal;
    4. one per-bucket window (partitionBy bucket — a normal hash shuffle
       across ``n_buckets``-way parallelism) adds the local prefix sum to
       the bucket's offset.

    ``order_col`` must be non-null and unique (it defines the stream
    order). Offsets are exact for streams under 2^53 tokens.
    Output: (order_col, n_tokens, stream_start).
    """
    bounds = df.agg(F.min(order_col).alias("lo"),
                    F.max(order_col).alias("hi")).first()
    if bounds["lo"] is None:  # empty input
        return (df.select(F.col(order_col),
                          F.col(size_col).cast("bigint").alias("n_tokens"),
                          F.lit(0).cast("bigint").alias("stream_start"))
                  .limit(0))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))
    bucket = F.floor((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("int")
    sized = df.select(F.col(order_col),
                      F.col(size_col).cast("bigint").alias("n_tokens"),
                      bucket.alias("__b"))
    totals = {r["__b"]: r["t"] for r in
              sized.groupBy("__b").agg(F.sum("n_tokens").alias("t"))
                   .collect()}
    running, offsets = 0, {}
    for b in sorted(totals):
        offsets[b] = running
        running += totals[b]
    omap = F.create_map(*[x for b in sorted(totals)
                          for x in (F.lit(b), F.lit(offsets[b]))])
    w = (Window.partitionBy("__b").orderBy(F.col(order_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    start = (F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
             + omap[F.col("__b")])
    return sized.select(order_col, "n_tokens",
                        start.cast("bigint").alias("stream_start"))


def assign_token_shards(df: DataFrame, order_col: str, size_col: str,
                        budget: int, n_buckets: int = 64) -> DataFrame:
    """Training-shard planning: walk the corpus in ``order_col`` order and
    cut a new shard every ``budget`` tokens — shard_id = stream_start div
    budget, so every shard holds ~budget tokens (± one document) and the
    assignment is reproducible from the data alone. Built on
    :func:`global_stream_offsets`; same scale shape (no global window).
    Output: (order_col, n_tokens, shard_id).
    """
    off = global_stream_offsets(df, order_col, size_col, n_buckets)
    return off.select(
        order_col, "n_tokens",
        F.floor(F.col("stream_start") / F.lit(budget)).cast("bigint")
         .alias("shard_id"))
