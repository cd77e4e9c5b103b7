"""Vector math over ``array<float/double>`` embedding columns.

Pure higher-order-function compositions (``zip_with`` / ``aggregate``) so dot
products and norms run JVM-side with no Python crossing — the recommended
fast path for embedding columns at scale. Accumulation is in double,
left-to-right over the array, which is deterministic (bit-stable) for a given
input — the property the DuckDB-oracle comparisons rely on.

The reference has no array types at all (SURVEY.md §1.3: "No arrays, maps, or
nested types reachable from SQL"); this module is north-star extension
surface (similarity search over an embedding column).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, accumulated in double, element order left-to-right."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    """Euclidean (L2) norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero vectors rather than null/NaN,
    NULL when either input array is NULL. Clamped to [-1, 1]: rounding
    can push identical vectors to 1+2⁻⁵² (and DuckDB's
    list_cosine_similarity clamps, which the oracle comparisons rely
    on). The clamp is a when-chain, NOT least/greatest — Spark's
    least/greatest SKIP null arguments, which would silently turn a
    null input's NULL similarity into -1.0 ("maximally dissimilar"), a
    data-corrupting default for any ranking built on top."""
    denom = norm(a) * norm(b)
    raw = F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
    return (F.when(raw < -1.0, F.lit(-1.0))
             .when(raw > 1.0, F.lit(1.0))
             .otherwise(raw))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v))


def normalize_unit(a: Column) -> Column:
    """Scale to unit L2 norm (zero vectors pass through unchanged)."""
    n = norm(a)
    return F.when(n == 0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast("double") / n))


# ---------------------------------------------------------------------------
# int8 quantization — storage/transfer compression for embedding columns
# (4× smaller than float32, 8× smaller than float64; the standard trick for
# shipping 100 TB of embeddings through a shuffle or into an ANN index).
# Symmetric per-vector scheme: scale = max|xᵢ|/127, qᵢ = ⌊xᵢ/scale + ½⌋
# clamped to [-127, 127]. Rounding is rendered as floor(x + 0.5) — NOT
# F.round — because Spark's HALF_UP on negative values and DuckDB's
# half-away-from-zero disagree at exact .5 boundaries, while floor is
# bit-identical in both engines.
# ---------------------------------------------------------------------------

def abs_max(a: Column) -> Column:
    """max |aᵢ| in double (exact — max is order-independent)."""
    return F.aggregate(a, F.lit(0.0),
                       lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))


def quantize_scale(a: Column) -> Column:
    """Per-vector symmetric int8 scale: max|aᵢ|/127 (0.0 for zero vectors)."""
    return abs_max(a) / F.lit(127.0)


def int8_quantize(a: Column, scale: Column) -> Column:
    """array<int> of ⌊aᵢ/scale + ½⌋ clamped to [-127, 127]; all-zero for
    zero-scale vectors. Values fit int8; surfaced as int for portability."""
    return F.when(scale == 0, F.transform(a, lambda x: F.lit(0))).otherwise(
        F.transform(a, lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127),
                    F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")))))


def dequantize(q: Column, scale: Column) -> Column:
    """Reconstruct array<double>: qᵢ·scale."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def quantize_roundtrip_stats(df, id_col: str, vec_col: str):
    """(id, scale, q_l1, max_err) for the int8 round-trip of every vector,
    as one Arrow-batched numpy pass.

    Spark evaluates HOF lambdas (transform/aggregate) INTERPRETED per
    element — measured ~8× super-linear cost on the quantize pipeline at
    10× data (BASELINE.md scale table). This kernel computes the same
    values vectorized: every op (float32→double widen, /, floor(x+0.5),
    int clamp, ·scale, |a−b|, max, integer Σ) is IEEE-exact and
    order-independent, so outputs are bit-identical to the expression form
    (:func:`quantize_scale` / :func:`int8_quantize` / :func:`dequantize`
    compositions — equivalence pinned in tests/test_vectors.py).
    Requires fixed-dimension vectors per batch (embedding tables are);
    use the Column functions for ragged data."""
    import numpy as np
    import pandas as pd

    from mura_spark.sources.parquet import ensure_min_partitions

    id_dt = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            # a NULL vector yields NULL stats, row kept — the row-wise
            # NULL-propagation contract (like emb_normalize), matching
            # the SQL twin where every list function of NULL is NULL
            mask = pdf[vec_col].notna().to_numpy()
            n = len(pdf)
            scale_o = np.full(n, None, dtype=object)
            l1_o = np.full(n, None, dtype=object)
            err_o = np.full(n, None, dtype=object)
            if mask.any():
                vecs = np.stack(
                    pdf[vec_col][mask].to_numpy()).astype(np.float64)
                if vecs.shape[1] == 0:
                    # zero-length vectors: scale 0, empty-sum stats
                    # (np.max over axis 1 of shape (n,0) would raise)
                    scale_o[mask] = 0.0
                    l1_o[mask] = np.zeros(
                        int(mask.sum()), dtype=np.int64)
                    err_o[mask] = 0.0
                    yield pd.DataFrame({
                        id_col: pdf[id_col], "scale": scale_o,
                        "q_l1": l1_o, "max_err": err_o})
                    continue
                scale = np.abs(vecs).max(axis=1) / 127.0
                safe = np.where(scale == 0.0, 1.0, scale)
                q = np.clip(np.floor(vecs / safe[:, None] + 0.5),
                            -127, 127)
                q[scale == 0.0, :] = 0.0
                err = np.abs(q * scale[:, None] - vecs).max(axis=1)
                scale_o[mask] = scale
                l1_o[mask] = np.abs(q).sum(axis=1).astype(np.int64)
                err_o[mask] = err
            yield pd.DataFrame({
                id_col: pdf[id_col], "scale": scale_o,
                "q_l1": l1_o, "max_err": err_o})

    return ensure_min_partitions(df.select(id_col, vec_col)).mapInPandas(
        kernel,
        f"{id_col} {id_dt}, scale double, q_l1 bigint, max_err double")
