"""Embedding similarity search (approximate-nearest-neighbor surface).

Two paths, per the standard scale playbook:

- **brute-force top-k** — the exact baseline: broadcast the (small) query
  set against the corpus, cosine via JVM-side ``zip_with``/``aggregate``,
  rank with a window partitioned by query id. No shuffle of the corpus at
  all when the query side broadcasts; the window shuffle is on
  (query_id, sim) pairs only — at 100 TB the corpus is scanned once,
  streamed, never materialized.
- **random-hyperplane LSH** — the scale path: H fixed seeded hyperplanes →
  sign-bit signature → band-bucket equi-join between query and corpus
  signatures → exact cosine re-rank within buckets. Approximate (tested for
  recall against brute force, not oracle-hashed).

Embedding near-dup (cosine ≥ t over all pairs) lives here too: exact
triangular variant for oracle verification plus the LSH-blocked variant.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mura_spark.functions.quantize import micro
from pyspark.sql.window import Window

from mura_spark.functions.vectors import cosine, dot, norm
from mura_spark.sources.parquet import approx_row_count, ensure_min_partitions

#: Default hyperplane count for sign-LSH (signature bits): 16 bits / 4
#: bands of 4 — right for corpora up to a few thousand vectors. Band width
#: must GROW with the corpus: a band of b bits has 2^b buckets, so random
#: pairs collide at ~n²/2^b per band — quadratic unless b tracks log2(n).
#: Callers of the LSH paths get that automatically via _auto_band_bits.
LSH_PLANES = 16
LSH_BANDS = 4

#: Corpus size the 4-bit default is tuned for; _auto_band_bits widens by
#: one bit per doubling beyond it (capped — recall at the operating
#: threshold falls as bands widen, so very large corpora should also raise
#: the number of bands).
_AUTO_BASE_N = 2000
_AUTO_MAX_BITS = 12

#: Corpus size at which embedding_dup_pairs switches from the direct band
#: self-join (vectors ride the candidate join — cheapest while the whole
#: corpus broadcasts and nothing big shuffles) to the proxy shape
#: (candidate mining on (id, band) only, vectors re-attached by id —
#: guide §8). Interleaved A/B at jittered replication (r10): direct wins
#: 2.6× at 2 k vectors, parity at 16 k, and the proxy's payload-shuffle
#: saving grows linearly in n while its extra-stage cost stays constant,
#: so the crossover sits just past the measured parity point.
_PAIRS_PROXY_MIN_N = 32768


def _auto_band_bits(n: int) -> int:
    """Band width (bits) for a corpus of n vectors: 4 at ≤2k, +1 per
    doubling, capped at 12 — keeps expected random collisions per band
    ~n²/2^bits growing linearly instead of quadratically."""
    import math
    if n <= _AUTO_BASE_N:
        return LSH_PLANES // LSH_BANDS
    return min(_AUTO_MAX_BITS,
               LSH_PLANES // LSH_BANDS
               + math.ceil(math.log2(n / _AUTO_BASE_N)))


def _drop_null_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """ANN/pair operators consider only rows with a non-null vector — a
    null embedding carries no geometry to score or index, so it can
    never produce a match (the data contract row-wise transforms like
    emb_normalize intentionally do NOT share: those NULL-propagate).
    Without this ingress guard a single null row kills the whole job at
    the first numpy ``np.stack`` kernel — on a 100 TB corpus that is a
    guaranteed outage, not an edge case."""
    return df.where(F.col(vec_col).isNotNull())


def _paired_cosine(dot_col, norm_a, norm_b):
    """cosine from a pair dot + precomputed per-row norms. Identical
    arithmetic to functions.vectors.cosine (dot / (sqrt·sqrt), clamped) —
    precomputing the norms changes the *cost* (1 array traversal per pair
    instead of 3), not the values, so oracle bit-exactness is preserved."""
    denom = norm_a * norm_b
    raw = F.when(denom == 0, F.lit(0.0)).otherwise(dot_col / denom)
    # when-chain clamp, not least/greatest: those skip NULL arguments
    # and would fold a NULL similarity to -1.0 (see vectors.cosine)
    return (F.when(raw < -1.0, F.lit(-1.0))
             .when(raw > 1.0, F.lit(1.0))
             .otherwise(raw))


def _hyperplanes(dim: int, count: int = LSH_PLANES,
                 seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free Gaussian hyperplanes (seeded; library-stable
    across runs — plain `random`, no numpy dependency in the plan)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(count)]


def _partial_topk(scored: DataFrame, k: int, query_id: str) -> DataFrame:
    """Narrow per-partition top-k pre-reduction over (query_id, neighbor_id,
    sim) rows: keep at most k rows per query id *within each input
    partition*. The global per-query top-k is a subset of every partition's
    local top-k (row_number order: sim desc, neighbor_id asc — identical
    here), so the downstream global window sees O(num_partitions · k) rows
    per query instead of the full scored corpus. No shuffle — a carried
    bounded buffer per partition inside mapInPandas; sim doubles round-trip
    Arrow bit-exactly, so oracle comparisons are unaffected."""
    import pandas as pd

    cols = scored.columns

    def kernel(batches):
        carry = None
        for pdf in batches:
            pool = (pdf if carry is None
                    else pd.concat((carry, pdf), ignore_index=True))
            pool = pool.sort_values(["sim", "neighbor_id"],
                                    ascending=[False, True])
            carry = pool.groupby(query_id, sort=False).head(k)
        if carry is not None:
            yield carry[cols]

    return scored.mapInPandas(kernel, schema=scored.schema)


def _partial_topk_multi(scored: DataFrame, k: int, query_id: str,
                        sim_cols: list[str]) -> DataFrame:
    """:func:`_partial_topk` generalized to several similarity columns
    scored in ONE pass: per input partition keep, for each query id, the
    top-k rows under EVERY sim column (union, deduped on neighbor_id —
    ≤ k·len(sim_cols) rows per query per partition). Each metric's
    global top-k is a subset of its per-partition top-k, so a downstream
    per-metric window over this pool ranks identically to one fed by a
    dedicated single-metric pass — while the corpus crosses the Python
    boundary once instead of once per metric (guide §4.1)."""
    import pandas as pd

    cols = scored.columns

    def kernel(batches):
        carry = None
        for pdf in batches:
            pool = (pdf if carry is None
                    else pd.concat((carry, pdf), ignore_index=True))
            keep = [
                pool.sort_values([sc, "neighbor_id"],
                                 ascending=[False, True])
                    .groupby(query_id, sort=False).head(k)
                for sc in sim_cols]
            carry = (pd.concat(keep, ignore_index=True)
                       .drop_duplicates(subset=[query_id, "neighbor_id"]))
        if carry is not None:
            yield carry[cols]

    return scored.mapInPandas(kernel, schema=scored.schema)


def topk_bruteforce(queries: DataFrame, corpus: DataFrame, k: int,
                    query_id: str = "query_id", corpus_id: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k for each query vector.

    The query side is broadcast (callers keep it small — a batch of probes);
    the corpus side streams through a single stage and is pre-reduced to k
    candidates per query *per partition* before the global ranking window —
    the window's shuffle moves O(num_partitions · k) rows per query, not the
    whole scored corpus, so the plan survives a 100× corpus. Ties break on
    ascending neighbor id for determinism.
    Output: (query_id, neighbor_id, rank, sim).
    """
    queries = _drop_null_vectors(queries, vec_col)
    corpus = _drop_null_vectors(corpus, vec_col)
    q = F.broadcast(queries.select(F.col(query_id).alias("__qid"),
                                   F.col(vec_col).alias("__qvec"),
                                   norm(F.col(vec_col)).alias("__qn")))
    c = ensure_min_partitions(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cn"))
    scored = q.join(c).select(
        F.col("__qid").alias(query_id),
        "neighbor_id",
        _paired_cosine(dot(F.col("__qvec"), F.col("__cvec")),
                       F.col("__qn"), F.col("__cn")).alias("sim"))
    scored = _partial_topk(scored, k, query_id)
    w = (Window.partitionBy(query_id)
               .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id, "neighbor_id", "rank", "sim"))


def _with_bands(df: DataFrame, vec_col: str, planes: list[list[float]],
                n_bands: int = LSH_BANDS,
                out_col: str = "__bands") -> DataFrame:
    """Attach the array of ``n_bands`` band-keys (bit-packed hyperplane sign
    pattern; ``len(planes) / n_bands`` bits each) per row. Arrow-batched
    numpy kernel: one (n × dim) @ (dim × P) matmul per batch instead of P
    interpreted HOF dot products per row.

    Degenerate mode: with no planes (``band_bits=0`` upstream) every row
    gets the same constant key per band — one global bucket, i.e. the
    candidate set becomes exhaustive. That turns the LSH operators into
    exact search *through the same join machinery*, which is what the
    deterministic driver-companion queries and the recall tests pin
    against."""
    import numpy as np
    import pandas as pd

    per_band = len(planes) // n_bands
    if planes:
        pm = np.asarray(planes, dtype=np.float64).T      # (dim, P)
        weights = (1 << np.arange(per_band)).astype(np.int64)

    df = ensure_min_partitions(df)

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if not planes:
                pdf[out_col] = [[f"{b}_0" for b in range(n_bands)]
                                for _ in range(len(pdf))]
                yield pdf
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (vecs @ pm >= 0).astype(np.int64)     # (n, P)
            bands = []
            for bidx in range(n_bands):
                seg = bits[:, bidx * per_band:(bidx + 1) * per_band]
                packed = seg @ weights
                bands.append([f"{bidx}_{v}" for v in packed])
            pdf[out_col] = [list(t) for t in zip(*bands)]
            yield pdf

    schema = T.StructType(list(df.schema.fields) + [
        T.StructField(out_col, T.ArrayType(T.StringType()))])
    return df.mapInPandas(kernel, schema=schema)


def topk_lsh(queries: DataFrame, corpus: DataFrame, k: int,
             query_id: str = "query_id", corpus_id: str = "vec_id",
             vec_col: str = "embedding", dim: int | None = None,
             seed: int = 42, n_bands: int = LSH_BANDS,
             band_bits: int | None = None,
             corpus_rows: int | None = None) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing ≥1 LSH band with
    the query, re-ranked by exact cosine. Multi-band = multi-probe recall.
    Output schema matches :func:`topk_bruteforce`. ``dim`` is inferred from
    the first query row when not given; ``band_bits`` (width of each band)
    defaults to :func:`_auto_band_bits` of the corpus size, so bucket
    cardinality tracks corpus size and random collisions stay near-linear.
    ``corpus_rows`` is a caller-supplied sizing hint; without it the count
    comes from Parquet footer metadata (no scan job) when the corpus is
    file-backed, and only falls back to a full ``count()`` otherwise."""
    queries = _drop_null_vectors(queries, vec_col)
    corpus = _drop_null_vectors(corpus, vec_col)
    if dim is None:
        first = queries.select(vec_col).first()
        if first is None:  # no queries → empty result, correct schema
            # neighbor_id takes the corpus id column's actual type so the
            # empty frame's schema matches topk_bruteforce's contract
            id_t = corpus.schema[corpus_id].dataType
            return (queries.select(F.col(query_id),
                                   F.lit(None).cast(id_t).alias("neighbor_id"),
                                   F.lit(0).alias("rank"),
                                   F.lit(0.0).alias("sim")).limit(0))
        dim = len(first[0])
    if band_bits is None:
        band_bits = _auto_band_bits(corpus_rows if corpus_rows is not None
                                    else approx_row_count(corpus))
    planes = _hyperplanes(dim, n_bands * band_bits, seed)
    # Vectors ride the band join here DELIBERATELY: the query panel is
    # small by contract (a batch of probes — the same bound
    # topk_bruteforce's broadcast relies on), so the planner broadcasts
    # the query side and the corpus streams through the join unshuffled;
    # the candidate `distinct` is bounded by |queries| × bucketmates.
    # The guide-§8 "proxy candidates then re-attach vectors by id"
    # restructure was implemented and interleave-A/B-measured (r10):
    # 1.6 s → 6.5 s at a 16 k corpus — the re-attach joins add real
    # shuffles where the current shape has none. Rejected; see
    # embedding_dup_pairs for the self-join case where it DOES win.
    q = (_with_bands(queries.select(F.col(query_id).alias("__qid"),
                                    F.col(vec_col).alias("__qvec")),
                     "__qvec", planes, n_bands)
         .select("__qid", "__qvec", F.explode("__bands").alias("band_key")))
    c = (_with_bands(corpus.select(F.col(corpus_id).alias("neighbor_id"),
                                   F.col(vec_col).alias("__cvec")),
                     "__cvec", planes, n_bands)
         .select("neighbor_id", "__cvec",
                 F.explode("__bands").alias("band_key")))
    cand = (q.join(c, "band_key")
             .select("__qid", "__qvec", "neighbor_id", "__cvec")
             .distinct())
    scored = cand.select(
        F.col("__qid").alias(query_id), "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("sim"))
    w = (Window.partitionBy(query_id)
               .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id, "neighbor_id", "rank", "sim"))


def _blocked_exact_pairs(df: DataFrame, threshold: float, id_col: str,
                         vec_col: str, n_blocks: int = 16) -> DataFrame:
    """Exact all-pairs cosine via block-pair decomposition + Arrow-batched
    numpy kernels.

    Rows are hashed into ``n_blocks`` blocks; every unordered block pair
    (i ≤ j) becomes one ``applyInPandas`` group holding both blocks' rows, so
    each row is shipped ~n_blocks times (vs. n times in a pair join) and the
    per-group kernel scores the full cross product vectorized. The kernel
    accumulates dot/norms dimension-by-dimension left-to-right in double —
    bit-identical to the ``zip_with``/``aggregate`` HOF arithmetic (float32
    products are exact in double; add order matches), so results equal the
    naive path and the DuckDB oracle exactly.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("id_a", id_type), T.StructField("id_b", id_type),
        T.StructField("sim", T.DoubleType())])

    pair_keys = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    all_keys = F.array(*[
        F.struct(F.lit(i).alias("ba"), F.lit(j).alias("bb"))
        for i, j in pair_keys])
    blk = F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks))
    df = ensure_min_partitions(_drop_null_vectors(df, vec_col))
    tagged = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
        blk.alias("__blk"))
    exploded = (tagged
                .withColumn("__pk", F.explode(F.filter(
                    all_keys,
                    lambda p: (p["ba"] == F.col("__blk"))
                              | (p["bb"] == F.col("__blk")))))
                .select("__id", "__v", "__blk",
                        F.col("__pk.ba").alias("__ba"),
                        F.col("__pk.bb").alias("__bb")))

    def score(key, pdf):
        ba, bb = key
        side_a = pdf[pdf["__blk"] == ba]
        side_b = side_a if ba == bb else pdf[pdf["__blk"] == bb]
        if len(side_a) == 0 or len(side_b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        ma = np.stack(side_a["__v"].to_numpy()).astype(np.float64)
        mb = (ma if ba == bb
              else np.stack(side_b["__v"].to_numpy()).astype(np.float64))
        na, nb = ma.shape[0], mb.shape[0]
        dim = ma.shape[1]
        # dimension-major accumulation == left-to-right per pair
        dots = np.zeros((na, nb))
        qa = np.zeros(na)
        qb = np.zeros(nb)
        for d in range(dim):
            xa, xb = ma[:, d], mb[:, d]
            dots += np.outer(xa, xb)
            qa += xa * xa
            qb += xb * xb
        denom = np.sqrt(qa)[:, None] * np.sqrt(qb)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.where(denom == 0.0, 0.0, dots / denom)
        sim = np.clip(sim, -1.0, 1.0)
        ids_a = side_a["__id"].to_numpy()
        ids_b = side_b["__id"].to_numpy()
        mask = sim >= threshold
        if ba == bb:
            mask &= ids_a[:, None] < ids_b[None, :]
        ii, jj = np.nonzero(mask)
        lo = np.minimum(ids_a[ii], ids_b[jj])
        hi = np.maximum(ids_a[ii], ids_b[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": sim[ii, jj]})

    return exploded.groupBy("__ba", "__bb").applyInPandas(score, out_schema)


def _assign_centroids(df: DataFrame, vec_col: str, centroids, n_probe: int,
                      id_alias: str):
    """Attach the ``n_probe`` nearest centroid ids (by cosine) to each row
    via an Arrow-batched numpy kernel (C small, broadcast in the closure)."""
    import numpy as np
    import pandas as pd

    cm = np.asarray(centroids, dtype=np.float64)          # (C, dim)
    cm_unit = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True),
                              1e-12)
    n_probe = min(n_probe, cm.shape[0])  # tiny corpus: probe what exists

    df = ensure_min_partitions(df)
    out_cols = [c for c in df.columns]

    def assign(batches):
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vn @ cm_unit.T                          # (n, C)
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            reps = pd.DataFrame(
                {c: pdf[c].to_numpy().repeat(n_probe) for c in out_cols})
            reps[id_alias] = order.reshape(-1)
            yield reps

    # fresh StructType: .add() mutates the df's schema object in place
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(id_alias, T.IntegerType())])
    return df.mapInPandas(assign, schema=schema)


def _refine_centroids(corpus: DataFrame, vec_col: str,
                      centroids: list[list[float]], iters: int):
    """Lloyd refinement of IVF centroids, ``iters`` passes. Each pass:

    1. a narrow Arrow kernel emits per-batch partial sums — at most C rows
       of (cid, count, sum-vector) per batch, regardless of batch size;
    2. the partials reduce JVM-side (posexplode → groupBy (cid, dim) — a
       C·dim·n_partitions-row shuffle, independent of corpus size);
    3. only the C·dim reduced cells reach the driver (bounded, like the
       seed collect).

    Clusters that attract no rows keep their previous centroid. Determinism
    is not required here (IVF is recall-tested, not hash-compared): the
    double sums reduce in shuffle order."""
    import numpy as np
    import pandas as pd

    for _ in range(iters):
        cm = np.asarray(centroids, dtype=np.float64)
        cm_unit = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True),
                                  1e-12)
        n_c, dim = cm.shape

        def partials(batches):
            for pdf in batches:
                vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                vn = vecs / np.maximum(
                    np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
                near = np.argmax(vn @ cm_unit.T, axis=1)
                sums = np.zeros((n_c, dim))
                np.add.at(sums, near, vecs)
                counts = np.bincount(near, minlength=n_c)
                live = np.nonzero(counts)[0]
                # count rides as the sum-vector's trailing element so ONE
                # reduce + collect serves both (a separate count aggregation
                # would re-run this whole corpus scan — no cache here).
                packed = np.concatenate(
                    [sums[live], counts[live, None].astype(np.float64)],
                    axis=1)
                yield pd.DataFrame({"cid": live, "s": list(packed)})

        part = corpus.select(vec_col).mapInPandas(
            partials, "cid int, s array<double>")
        cells = (part.select("cid", F.posexplode("s").alias("pos", "v"))
                 .groupBy("cid", "pos").agg(F.sum("v").alias("v")).collect())
        cnts = {r.cid: r.v for r in cells if r.pos == dim}
        new = cm.copy()
        for r in cells:
            if r.pos < dim:
                new[r.cid, r.pos] = r.v / cnts[r.cid]
        centroids = [list(row) for row in new]
    return centroids


def topk_ivf(queries: DataFrame, corpus: DataFrame, k: int,
             n_centroids: int = 16, n_probe: int = 4,
             query_id: str = "query_id", corpus_id: str = "vec_id",
             vec_col: str = "embedding", refine_iters: int = 1) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning.

    Deterministic centroid seed: the ``n_centroids`` corpus rows with the
    smallest ids (collected — provably small, like LSH planes), then
    ``refine_iters`` Lloyd passes (see :func:`_refine_centroids` — per-batch
    partial sums, so refinement never shuffles corpus rows). Corpus rows
    index into their single nearest centroid's list; queries probe their
    ``n_probe`` nearest lists; exact cosine re-ranks within probed lists.
    The join is a plain shuffled equi-join on centroid id — the inverted
    lists never cross the driver. Recall is tested against brute force
    (higher n_probe/centroid-count/refine_iters trade recall for cost).
    Output schema matches :func:`topk_bruteforce`.
    """
    queries = _drop_null_vectors(queries, vec_col)
    corpus = _drop_null_vectors(corpus, vec_col)
    seed_rows = (corpus.orderBy(F.col(corpus_id).asc()).limit(n_centroids)
                 .select(vec_col).collect())
    centroids = [list(r[0]) for r in seed_rows]
    if refine_iters > 0:
        centroids = _refine_centroids(corpus.select(vec_col), vec_col,
                                      centroids, refine_iters)
    c_assigned = _assign_centroids(
        corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(vec_col).alias("__cvec")),
        "__cvec", centroids, 1, "__cid")
    q_assigned = _assign_centroids(
        queries.select(F.col(query_id).alias("__qid"),
                       F.col(vec_col).alias("__qvec")),
        "__qvec", centroids, n_probe, "__cid")
    cand = q_assigned.join(c_assigned, "__cid")
    scored = cand.select(
        F.col("__qid").alias(query_id), "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("sim"))
    w = (Window.partitionBy(query_id)
               .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id, "neighbor_id", "rank", "sim"))


def embedding_dup_pairs(df: DataFrame, threshold: float,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        method: str = "lsh",
                        corpus_rows: int | None = None,
                        band_bits: int | None = None) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    ``method='lsh'`` (default — the pipeline path): hyperplane-banded
    blocking then exact cosine verification of candidates. Near-linear in
    the input (candidates come from band-bucket equi-joins, never all
    pairs), which is the only shape that survives a 100 TB corpus;
    approximate recall (pinned ≥ threshold in pytest against the exact
    path), exact precision. ``method='blocked'``: *exact* all-pairs via
    block-pair decomposition — O(n²) FLOPs but vectorized and
    bounded-replication; the verification/oracle path, not the default.
    ``method='exact'``: triangular pair join scored with HOF expressions —
    the reference implementation 'blocked' is verified against.
    Output: (id_a, id_b, sim).
    """
    df = _drop_null_vectors(df, vec_col)
    if method == "blocked":
        return _blocked_exact_pairs(df, threshold, id_col, vec_col)
    df = ensure_min_partitions(df)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
                  norm(F.col(vec_col)).alias("__na"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
                  norm(F.col(vec_col)).alias("__nb"))
    if method == "exact":
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        first = df.select(vec_col).first()
        if first is None:  # empty input → empty result, correct schema
            return df.select(F.col(id_col).alias("id_a"),
                             F.col(id_col).alias("id_b"),
                             F.lit(0.0).alias("sim")).limit(0)
        # band width tracks corpus size (see _auto_band_bits) — fixed-width
        # bands collide quadratically once the corpus outgrows 2^bits.
        # Sizing count from the hint / parquet footers, not a full scan.
        # band_bits=0 = degenerate single-bucket mode: exhaustive candidates
        # through the same band join, exact output (see _with_bands).
        n = corpus_rows if corpus_rows is not None else approx_row_count(df)
        if band_bits is None:
            band_bits = _auto_band_bits(n)
        planes = _hyperplanes(len(first[0]), LSH_BANDS * band_bits)
        banded = _with_bands(df.select(id_col, vec_col), vec_col, planes)
        if n >= _PAIRS_PROXY_MIN_N:
            # Large corpus — candidate mining moves (id, band_key)
            # proxies only (guide §8: every shuffle but the last moves
            # a lightweight proxy): the band self-join and the pair
            # `distinct` never touch a vector, and the full vectors
            # re-attach afterwards through two id-keyed joins, so each
            # vector crosses the network once per attach join instead
            # of riding every band replica through the candidate join
            # AND its distinct. Identical pair set (ids unique per the
            # vec_id key contract) and identical cosine arithmetic —
            # only the shuffle payload changes. Below the threshold the
            # direct shape wins instead: the whole corpus broadcasts,
            # nothing big shuffles, and the proxy shape's three extra
            # stages are pure overhead (interleaved A/B at sf0.1:
            # 1.6 s vs 4.2 s at 2 k rows, parity at 16 k, proxy ahead
            # beyond — the fixed stage cost is constant while the
            # payload-shuffle saving grows linearly in n).
            ea = banded.select(F.col(id_col).alias("id_a"),
                               F.explode("__bands").alias("bk"))
            eb = ea.select(F.col("id_a").alias("id_b"), "bk")
            cand = (ea.join(eb, "bk")
                      .filter(F.col("id_a") < F.col("id_b"))
                      .select("id_a", "id_b").distinct())
            pairs = (cand.join(a, "id_a").join(b, "id_b")
                         .select("id_a", "id_b",
                                 "__va", "__vb", "__na", "__nb"))
        else:
            ea = banded.select(F.col(id_col).alias("id_a"),
                               F.col(vec_col).alias("__va"),
                               norm(F.col(vec_col)).alias("__na"),
                               F.explode("__bands").alias("bk"))
            eb = banded.select(F.col(id_col).alias("id_b"),
                               F.col(vec_col).alias("__vb"),
                               norm(F.col(vec_col)).alias("__nb"),
                               F.explode("__bands").alias("bk"))
            pairs = (ea.join(eb, "bk")
                       .filter(F.col("id_a") < F.col("id_b"))
                       .select("id_a", "id_b",
                               "__va", "__vb", "__na", "__nb")
                       .distinct())
    else:
        raise ValueError(f"unknown method {method!r}")
    return (pairs.select("id_a", "id_b",
                         _paired_cosine(dot(F.col("__va"), F.col("__vb")),
                                        F.col("__na"), F.col("__nb"))
                         .alias("sim"))
                 .filter(F.col("sim") >= threshold))


def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid components: (label, pos, centroid, n).

    posexplode flattens vectors to (label, position, component) rows and
    one groupBy computes every component mean — a single shuffle keyed on
    (label, pos), so parallelism is labels × dimensions regardless of
    corpus size, and AQE coalesces the tiny result.

    Components are summed as nano-fixed-point integers
    (``floor(x · 1e9)``), NOT via a double→decimal cast: float components
    are exact binary fractions, so decimal halfway cases really occur
    (0.1983642578125 rounds HALF_UP in Spark, HALF_EVEN in DuckDB) —
    whereas double multiply + floor is IEEE-identical everywhere and the
    integer sum is order-independent. The ≤1e-9 per-component truncation
    is far below float precision at unit scale. Terms sum in
    DECIMAL(38,0) so petabyte-sized labels cannot overflow int64.

    The centroid table is the seed for IVF coarse quantizers, per-class
    mean-shift diagnostics, and nearest-class-mean classification.
    """
    ex = df.select(F.col(label_col).alias("label"),
                   F.posexplode(F.col(vec_col)).alias("pos", "x"))
    fp = F.floor(F.col("x").cast("double") * F.lit(1e9))
    return (ex.groupBy("label", F.col("pos").cast("int").alias("pos"))
              .agg((F.sum(fp.cast("decimal(38,0)")).cast("double")
                    / F.lit(1e9) / F.count(F.lit(1))).alias("centroid"),
                   F.count(F.lit(1)).alias("n")))


def knn_classify(test_df: DataFrame, train_df: DataFrame, k: int,
                 id_col: str = "vec_id", label_col: str = "label",
                 vec_col: str = "embedding") -> DataFrame:
    """k-nearest-neighbor label prediction: exact cosine top-k of each
    test vector against the train corpus (same broadcast-probe /
    partial-topk plan as :func:`topk_bruteforce`), then a majority vote
    over the k neighbor labels. Vote ties break to the smallest label;
    neighbor-set ties break on ascending neighbor id — fully
    deterministic, so the prediction table is oracle-hashable.

    Output: (query_id, true_label, pred_label, votes).
    """
    queries = test_df.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias(vec_col))
    nbrs = topk_bruteforce(queries, train_df, k,
                           corpus_id=id_col, vec_col=vec_col)
    labels = train_df.select(F.col(id_col).alias("neighbor_id"),
                             F.col(label_col).alias("nb_label"))
    votes = (nbrs.join(F.broadcast(labels), "neighbor_id")
                 .groupBy("query_id", "nb_label")
                 .agg(F.count(F.lit(1)).alias("votes")))
    w = (Window.partitionBy("query_id")
               .orderBy(F.col("votes").desc(), F.col("nb_label").asc()))
    pred = (votes.withColumn("__r", F.row_number().over(w))
                 .filter(F.col("__r") == 1)
                 .select("query_id", F.col("nb_label").alias("pred_label"),
                         "votes"))
    truth = test_df.select(F.col(id_col).alias("query_id"),
                           F.col(label_col).alias("true_label"))
    return (pred.join(F.broadcast(truth), "query_id")
                .select("query_id", "true_label", "pred_label", "votes"))


def centroid_cosine(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Pairwise cosine similarity between per-label centroids:
    ``(label_a, label_b, cos_micro)`` for ``label_a < label_b`` — the
    class-separation diagnostic run after :func:`label_centroids`
    (collapsing classes, candidate merge targets, curriculum ordering).

    Determinism: centroid components are themselves deterministic
    doubles (nano-fixed-point means, see :func:`label_centroids`); the
    dot product and squared norms then quantize each per-dimension
    product to ``floor(cᵢ·dᵢ·10¹²)`` and sum as exact integers in
    DECIMAL(38,0) — a plain double sum over dimensions would be
    partition-order-dependent. The 1e12 scales cancel in
    ``dot/√(na·nb)``, so no rescale is needed.

    Scale: the centroid table is labels×dim rows; the pos-keyed
    self-join and both aggregates are bounded by labels²×dim — tiny
    relative to any corpus, and independent of corpus size.
    """
    cents = label_centroids(df, label_col, vec_col) \
        .select("label", "pos", "centroid")
    fp = lambda c: F.floor(c * F.lit(1e12)).cast("decimal(38,0)")  # noqa: E731
    norms = (cents.groupBy("label")
                  .agg(F.sum(fp(F.col("centroid") * F.col("centroid")))
                        .alias("__n2")))
    a = cents.select(F.col("label").alias("label_a"), "pos",
                     F.col("centroid").alias("__ca"))
    b = cents.select(F.col("label").alias("label_b"), "pos",
                     F.col("centroid").alias("__cb"))
    dots = (a.join(b, "pos")
             .filter(F.col("label_a") < F.col("label_b"))
             .groupBy("label_a", "label_b")
             .agg(F.sum(fp(F.col("__ca") * F.col("__cb"))).alias("__dot")))
    na = norms.select(F.col("label").alias("label_a"),
                      F.col("__n2").alias("__na"))
    nb = norms.select(F.col("label").alias("label_b"),
                      F.col("__n2").alias("__nb"))
    cos = (F.col("__dot").cast("double")
           / F.sqrt(F.col("__na").cast("double")
                    * F.col("__nb").cast("double")))
    return (dots.join(F.broadcast(na), "label_a")
                .join(F.broadcast(nb), "label_b")
                .select("label_a", "label_b",
                        F.when((F.col("__na") > 0) & (F.col("__nb") > 0),
                               micro(cos)).alias("cos_micro")))


def confusion_matrix(pred: DataFrame, true_col: str = "true_label",
                     pred_col: str = "pred_label") -> DataFrame:
    """Confusion matrix + per-cell recall share from a prediction table:
    ``(true_label, pred_label, n, recall_micro)`` where recall_micro is
    the cell's share of its true-label row. The evaluation rollup for
    :func:`knn_classify` (or any classifier output).

    One groupBy to cells; row totals come from a window partitioned by
    the true label over the already-aggregated cells — NOT a groupBy +
    self-join, which would branch the DAG and re-evaluate the (often
    expensive) upstream prediction plan once per branch. The window input
    is label²-sized. Exact integer counts; the share is one exact-int
    division, micro-floored.
    """
    cells = (pred.groupBy(F.col(true_col), F.col(pred_col))
                 .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy(true_col)
    rt = F.sum("n").over(w)
    share = F.col("n").cast("double") / rt.cast("double")
    return cells.select(true_col, pred_col, "n",
                        micro(share).alias("recall_micro"))


def centroid_outliers(df: DataFrame, id_col: str = "vec_id",
                      label_col: str = "label", vec_col: str = "embedding",
                      p: float = 0.95) -> DataFrame:
    """Embedding quality screen: vectors whose squared distance to their
    label centroid exceeds the label's exact ``p``-quantile —
    ``(id, label, dist2_fp)`` for the flagged tail. The per-class
    mislabel/outlier detector run before training on labeled embeddings.

    Distances accumulate in 1e12 fixed point (per-dimension
    ``⌊(x−c)²·10¹²⌋`` summed as exact integers — a plain double sum over
    dimensions would be order-dependent); the threshold comes from the
    same explicit order-statistics interpolation as
    operators.stats.group_percentiles (engine quantile aggregates are
    not hash-safe), computed over the already-aggregated |vectors|-row
    distance table and broadcast back label-wise. Precondition:
    dist²·10¹² must stay under 2⁵³ (dims up to ~2k at unit scale) so the
    threshold comparison is exact in double.
    """
    cents = label_centroids(df, label_col, vec_col) \
        .select("label", "pos", "centroid")
    ex = df.select(F.col(id_col).alias("__id"),
                   F.col(label_col).alias("label"),
                   F.posexplode(F.col(vec_col)).alias("pos", "x"))
    joined = (ex.withColumn("pos", F.col("pos").cast("int"))
                .join(cents, ["label", "pos"]))
    diff = F.col("x").cast("double") - F.col("centroid")
    dist = (joined.groupBy("__id", "label")
            .agg(F.sum(F.floor(diff * diff * F.lit(1e12))
                       .cast("decimal(38,0)"))
                  .cast("bigint").alias("dist2_fp")))
    w_rn = Window.partitionBy("label").orderBy(F.col("dist2_fp").asc())
    w_n = Window.partitionBy("label")
    ranked = dist.select(
        "label", "dist2_fp",
        (F.row_number().over(w_rn) - F.lit(1)).alias("__i"),
        F.count(F.lit(1)).over(w_n).alias("__n"))
    pos = (F.col("__n") - F.lit(1)).cast("double") * F.lit(float(p))
    k = F.floor(pos)
    agg = ranked.groupBy("label").agg(
        F.first("__n").alias("__n"),
        F.max(F.when(F.col("__i") == k, F.col("dist2_fp")))
         .alias("__lo"),
        F.max(F.when(F.col("__i") == k + F.lit(1), F.col("dist2_fp")))
         .alias("__hi"))
    pos2 = (F.col("__n") - F.lit(1)).cast("double") * F.lit(float(p))
    f = pos2 - F.floor(pos2).cast("double")
    lo = F.col("__lo").cast("double")
    hi = F.coalesce(F.col("__hi"), F.col("__lo")).cast("double")
    thr = agg.select("label", (lo + (hi - lo) * f).alias("__thr"))
    return (dist.join(F.broadcast(thr), "label")
                .filter(F.col("dist2_fp").cast("double") > F.col("__thr"))
                .select(F.col("__id").alias(id_col), "label", "dist2_fp"))


def hard_negatives(test_df: DataFrame, train_df: DataFrame,
                   id_col: str = "vec_id", label_col: str = "label",
                   vec_col: str = "embedding") -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe,
    the single most-similar corpus vector with a DIFFERENT label — the
    negatives that actually move a contrastive loss (random negatives
    are trivially separated; the nearest wrong-label point defines the
    margin).

    Same plan as :func:`topk_bruteforce` (broadcast probes, one corpus
    stream, per-partition partial top-k before the global window), with
    the label-mismatch predicate applied BEFORE any ranking state so
    same-label rows never occupy top-k slots. Ties break on ascending
    neighbor id. Output: (query_id, true_label, neg_id, neg_label).
    """
    q = F.broadcast(test_df.select(F.col(id_col).alias("query_id"),
                                   F.col(label_col).alias("true_label"),
                                   F.col(vec_col).alias("__qvec"),
                                   norm(F.col(vec_col)).alias("__qn")))
    c = ensure_min_partitions(train_df).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__clab"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cn"))
    scored = (q.join(c)
               .where(F.col("true_label") != F.col("__clab"))
               .select("query_id", "true_label", "neighbor_id",
                       F.col("__clab").alias("neg_label"),
                       _paired_cosine(dot(F.col("__qvec"),
                                          F.col("__cvec")),
                                      F.col("__qn"),
                                      F.col("__cn")).alias("sim")))
    scored = _partial_topk(scored, 1, "query_id")
    w = (Window.partitionBy("query_id")
               .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("__r", F.row_number().over(w))
                  .filter(F.col("__r") == 1)
                  .select("query_id", "true_label",
                          F.col("neighbor_id").alias("neg_id"),
                          "neg_label"))


def mean_pairwise_cosine(df: DataFrame, vec_col: str,
                         dim: int = 64) -> DataFrame:
    """Corpus-level embedding diversity in ONE linear pass: the exact
    mean pairwise cosine over all n(n−1)/2 vector pairs, via the
    sum-vector identity ``Σ_{i≠j} v̂_i·v̂_j = ‖Σv̂‖² − Σ‖v̂‖²`` — no pair
    join ever forms (the O(n²) histogram twin is
    emb_pair_cosine_histogram). A collapsing corpus (mode collapse,
    crawler loop) drives the mean toward 1; a healthy one sits near 0.

    Determinism: unit-normalized components are micro-quantized to
    integers FIRST; every aggregate after that is exact integer
    arithmetic in DECIMAL(38,0) (per-dim sums reach ~10⁶·n, their
    squares overflow int64 at corpus scale), with one final double
    division. The reported value is therefore the exact mean cosine of
    the quantized unit vectors (≤1e-6/dim from the float value), not a
    float-order artifact. Zero vectors are excluded.

    Plan: one Arrow-batched numpy pass emits per-BATCH integer
    partials — count, Σself-dot, and the dim per-dimension component
    sums — so the only thing that ever leaves an executor is dim+2
    scalars per batch (no explode, no row-scale shuffle, no
    interpreted HOF: Spark evaluates transform/aggregate lambdas per
    element, the same measured ~8× pitfall functions/vectors.py
    documents). Bit-exactness: the squared-norm accumulates as an
    explicit LEFT FOLD over dimensions (matching F.aggregate's and
    DuckDB list_reduce's association order — np.sum's pairwise
    reduction would drift low bits); sqrt/division/floor are IEEE
    correctly-rounded elementwise ops; everything after quantization
    is exact integer arithmetic. ``dim`` must be given (embedding
    width is schema knowledge, not data).
    """
    from functools import reduce as _reduce

    import numpy as np
    import pandas as pd

    from mura_spark.sources.parquet import ensure_min_partitions

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            acc = np.zeros(len(vecs), dtype=np.float64)
            for j in range(vecs.shape[1]):       # left fold, HOF order
                acc = acc + vecs[:, j] * vecs[:, j]
            nrm = np.sqrt(acc)
            keep = nrm != 0.0
            if not keep.any():
                continue
            u = vecs[keep] / nrm[keep, None]
            q = np.floor(u * 1000000.0 + 0.5).astype(np.int64)
            yield pd.DataFrame({
                "n": [np.int64(len(q))],
                "sd": [(q * q).sum(axis=1).sum()],
                "s": [q.sum(axis=0)]})

    partials = ensure_min_partitions(
        _drop_null_vectors(df, vec_col).select(vec_col)).mapInPandas(
        kernel, "n bigint, sd bigint, s array<bigint>")
    one = partials.agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("bigint")).alias("n_vecs"),
        F.sum(F.col("sd").cast("decimal(38,0)")).alias("__sd"),
        *[F.sum(F.element_at("s", i)).alias(f"__s{i}")
          for i in range(1, dim + 1)])
    ss = _reduce(
        lambda a, b: a + b,
        [F.col(f"__s{i}").cast("decimal(38,0)") * F.col(f"__s{i}")
         for i in range(1, dim + 1)])
    mean = ((ss - F.col("__sd")).cast("double")
            / (F.col("n_vecs").cast("double")
               * (F.col("n_vecs") - F.lit(1)).cast("double"))
            / F.lit(1000000000000.0))
    return one.select("n_vecs",
                      F.when(F.col("n_vecs") > 1, mean)
                       .alias("mean_cosine"))


def mutual_nearest_neighbors(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_blocks: int = 16) -> DataFrame:
    """Reciprocal best match over a vector corpus: pairs (a, b) where b
    is a's cosine top-1 AND a is b's — the high-precision alignment/
    pairing rule (translation pair mining, cross-corpus entity match,
    near-dup confirmation): mutuality filters out hub vectors that are
    everyone's neighbor but nobody's match. Output ``(id_a, id_b,
    sim)`` with id_a < id_b.

    Exact path via the same block-pair decomposition as
    _blocked_exact_pairs: every unordered block pair scores its cross
    product in one vectorized kernel but emits only each row's BEST
    non-self candidate within that pair (ties → smallest id), so what
    leaves a kernel is one partial row per (vector, block-pair) —
    O(n·n_blocks), never O(n²) rows. A global per-id argmax (window,
    sim desc / id asc) then one equi self-join of the 1-row-per-vector
    best table tests reciprocity. Cosines accumulate dimension-major
    left-to-right — bit-identical to the HOF/oracle arithmetic. At
    100 TB the SAME top-1 + reciprocal-join tail runs over LSH/IVF
    candidates instead of block pairs.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("__id", id_type), T.StructField("__cand", id_type),
        T.StructField("sim", T.DoubleType())])

    pair_keys = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    all_keys = F.array(*[
        F.struct(F.lit(i).alias("ba"), F.lit(j).alias("bb"))
        for i, j in pair_keys])
    blk = F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks))
    dfm = ensure_min_partitions(_drop_null_vectors(df, vec_col))
    tagged = dfm.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
        blk.alias("__blk"))
    exploded = (tagged
                .withColumn("__pk", F.explode(F.filter(
                    all_keys,
                    lambda p: (p["ba"] == F.col("__blk"))
                              | (p["bb"] == F.col("__blk")))))
                .select("__id", "__v", "__blk",
                        F.col("__pk.ba").alias("__ba"),
                        F.col("__pk.bb").alias("__bb")))

    def _bests(ids_q, sim, ids_c, self_mask=None):
        """Per query row: best candidate (ties -> smallest id)."""
        if self_mask is not None:
            sim = sim.copy()
            sim[self_mask] = -np.inf
        best = sim.max(axis=1)
        ok = best > -np.inf
        rows = []
        order = np.argsort(ids_c, kind="stable")
        sim_sorted = sim[:, order]
        ids_sorted = ids_c[order]
        pick = np.argmax(sim_sorted == best[:, None], axis=1)
        return pd.DataFrame({
            "__id": ids_q[ok], "__cand": ids_sorted[pick[ok]],
            "sim": best[ok]})

    def score(key, pdf):
        ba, bb = key
        side_a = pdf[pdf["__blk"] == ba]
        side_b = side_a if ba == bb else pdf[pdf["__blk"] == bb]
        if len(side_a) == 0 or len(side_b) == 0:
            return pd.DataFrame({"__id": [], "__cand": [], "sim": []})
        ma = np.stack(side_a["__v"].to_numpy()).astype(np.float64)
        mb = (ma if ba == bb
              else np.stack(side_b["__v"].to_numpy()).astype(np.float64))
        dim = ma.shape[1]
        dots = np.zeros((ma.shape[0], mb.shape[0]))
        qa = np.zeros(ma.shape[0])
        qb = np.zeros(mb.shape[0])
        for d in range(dim):          # dimension-major == HOF order
            xa, xb = ma[:, d], mb[:, d]
            dots += np.outer(xa, xb)
            qa += xa * xa
            qb += xb * xb
        denom = np.sqrt(qa)[:, None] * np.sqrt(qb)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.where(denom == 0.0, 0.0, dots / denom)
        sim = np.clip(sim, -1.0, 1.0)
        ids_a = side_a["__id"].to_numpy()
        ids_b = side_b["__id"].to_numpy()
        if ba == bb:
            out = _bests(ids_a, sim, ids_b,
                         ids_a[:, None] == ids_b[None, :])
            return out
        return pd.concat([
            _bests(ids_a, sim, ids_b),
            _bests(ids_b, sim.T, ids_a)], ignore_index=True)

    partials = (exploded.groupBy("__ba", "__bb")
                        .applyInPandas(score, out_schema))
    w = Window.partitionBy("__id").orderBy(
        F.col("sim").desc(), F.col("__cand").asc())
    best = (partials.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .select("__id", "__cand", "sim"))
    b2 = best.select(F.col("__id").alias("__bq"),
                     F.col("__cand").alias("__bn"))
    return (best.join(b2, (F.col("__id") == F.col("__bn"))
                      & (F.col("__cand") == F.col("__bq")))
                .filter(F.col("__id") < F.col("__cand"))
                .select(F.col("__id").alias("id_a"),
                        F.col("__cand").alias("id_b"), "sim"))
