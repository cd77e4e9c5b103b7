"""Document deduplication operators.

Four families, all shuffle-disciplined for the 100 TB case:

- **exact** — hash-groupBy on a content key. One shuffle, map-side partial
  aggregation; the key is a portable MD5-derived hash.
- **n-gram Jaccard** — exact set-similarity self-join with *lossless*
  pruning: candidate pairs must share a shingle (any pair with J ≥ t > 0
  shares one), plus the AllPairs prefix filter (Bayardo et al., WWW'07)
  under a global shingle order, plus the length filter
  (min(|a|,|b|) ≥ ⌈t·max(|a|,|b|)⌉, since J ≤ min/max). All three preserve
  exactness while shrinking the candidate space.
- **MinHash-LSH** — k=32 permutations, 16 bands × 2 rows, candidates from
  band-bucket equi-joins, then *exact* Jaccard verification of candidates.
  Miss probability per true pair is (1 − J²)¹⁶ — ≈ 8e-8 at exactly
  J = 0.8, < 3e-12 from J ≥ 0.9 — so the verified output equals the
  brute-force answer unless a corpus holds ~10⁷+ pairs sitting exactly
  at the threshold (raise bands or lower the band threshold there).
- **SimHash** — 48-bit signatures over shingle hashes; banded into
  ``hd_max + 1`` segments so any pair within Hamming distance ``hd_max``
  shares a whole band (pigeonhole) → blocking is lossless; the Hamming
  filter runs *before* the pair-dedup so the distinct only sees survivors.

Verification strategy: candidates carry doc ids only; exact Jaccard is then
computed by joining each side to the per-doc shingle *array* and taking
``array_intersect`` sizes — two hash joins + an O(|set|) per-pair kernel,
instead of re-exploding and re-aggregating the full corpus.

Scale notes: every self-join here is an equi-join on a derived key (shingle /
band bucket), so Spark shuffles both sides on that key — no cross joins, no
driver collects. Skewed buckets (a shingle shared by millions of docs) are
the classic hazard; AQE skew-join splitting handles moderate skew, and the
prefix/length filters bound the quadratic blowup frequent shingles cause.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mura_spark.functions import text as TX
from mura_spark.sources.parquet import ensure_min_partitions
from mura_spark.functions.hashing import (
    BANDS,
    MINHASH_SEEDS,
    MERSENNE_P,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    md5_hash48,
)


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Group rows by an exact content key; one row per group with the kept
    (minimum) id and the group size. Single hash-shuffle on the key."""
    return (df.select(key.alias("dup_key"), F.col(id_col))
              .groupBy("dup_key")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("group_size")))


def exact_dedup(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Keep exactly one row (minimum id) per content key. Implemented as
    groupBy + semi-join back, both on the same key/id, so Catalyst plans two
    stages with map-side combine — never a window over raw text."""
    keep = exact_dup_groups(df, id_col, key).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


def dedup_incremental(new_df: DataFrame, seen_df: DataFrame,
                      new_key: Column, seen_key: Column) -> DataFrame:
    """Incremental ingest dedup: rows of ``new_df`` whose content key does
    not already exist in ``seen_df`` (the previously ingested corpus) — the
    between-crawls half of exact dedup (``exact_dedup`` handles the
    within-batch half; compose them: within-batch first, then this).

    Implemented as a left-anti hash join on the key: both sides shuffle
    once on the content hash, nothing crosses the driver. At 100 TB the
    seen side is the huge one, which is exactly the side an anti-join
    streams through; if the seen-key set is small (early corpus), AQE
    downgrades to a broadcast anti-join automatically. A pre-filter Bloom
    of the seen keys is a natural add-on at real scale, but it belongs in
    the storage layout: key-sorted parquet (write_sorted on the key) gives
    footer-range skipping for free — :func:`dedup_incremental_pruned`
    exploits exactly that.
    """
    # temp key column must not collide with a caller column — withColumn
    # would silently REPLACE it and the final drop would corrupt the schema
    tmp = "__dup_key"
    while tmp in new_df.columns:
        tmp += "_"
    seen_keys = seen_df.select(seen_key.alias(tmp)).distinct()
    return (new_df.withColumn(tmp, new_key)
            .join(seen_keys, on=tmp, how="left_anti")
            .drop(tmp))


def dedup_incremental_pruned(new_df: DataFrame, seen_df: DataFrame,
                             new_key: Column,
                             seen_key_col: str) -> DataFrame:
    """:func:`dedup_incremental` with a seen-side key-range pre-filter —
    the storage-layout alternative to a Bloom filter at 100 TB.

    The new batch's key range [lo, hi] is computed first (one aggregate,
    two scalars to the driver — bounded regardless of batch size) and
    pushed as ``seen_key_col BETWEEN lo AND hi`` into the seen-corpus scan.
    ``seen_key_col`` must be a *stored column* (an ingest-time content
    hash), not an expression — only plain column predicates reach the
    parquet reader as PushedFilters. When the seen corpus is written
    key-sorted (``sources.parquet.write_sorted`` on the key column), every
    file/row-group owns a disjoint, tight min/max range, so the pushed
    range predicate skips whole row groups: a between-crawls ingest only
    reads the slice of the seen corpus its own key range can possibly
    collide with, instead of anti-joining against all of it.

    Semantics are IDENTICAL to :func:`dedup_incremental` under any layout —
    the filter only removes seen keys that cannot equal any new key
    (pinned in tests/test_dedup.py); the layout changes the I/O, not the
    answer.
    """
    bounds = (new_df.select(new_key.alias("__k"))
              .agg(F.min("__k").alias("lo"), F.max("__k").alias("hi"))
              .first())
    if bounds["lo"] is None:  # empty/all-null batch: nothing can collide
        return dedup_incremental(new_df, seen_df.limit(0), new_key,
                                 F.col(seen_key_col))
    pruned = seen_df.filter(
        F.col(seen_key_col).between(F.lit(bounds["lo"]), F.lit(bounds["hi"])))
    return dedup_incremental(new_df, pruned, new_key, F.col(seen_key_col))


# --------------------------------------------------------------------------
# shingle machinery shared by jaccard / minhash / simhash
# --------------------------------------------------------------------------

def shingle_sets(df: DataFrame, id_col: str, text_col: str,
                 n: int = 3) -> DataFrame:
    """(id, shset: array<string> of distinct word-n-grams, n_shingles).

    Uses the Arrow-batched shingle kernel — output identical to the native
    ``TX.shingles(TX.tokens(...))`` expression (equivalence pinned in
    tests/test_text.py) at ~1% of its CPU cost; see shingle_text_udf.
    Input widened first: the kernel is the compute-heavy first stage."""
    sh = ensure_min_partitions(df).select(
        F.col(id_col),
        TX.shingle_text_udf(n)(F.col(text_col)).alias("shset"))
    return sh.withColumn("n_shingles", F.size("shset"))


def _explode_sets(sets: DataFrame, id_col: str) -> DataFrame:
    """(id, n_shingles, shingle) exploded view of a shingle-set table."""
    return sets.select(id_col, "n_shingles",
                       F.explode("shset").alias("shingle"))


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, n_shingles, shingle) exploded form — the one explode in the
    pipeline; everything downstream is equi-joins/groupBys on its columns."""
    return _explode_sets(shingle_sets(df, id_col, text_col, n), id_col)


def contamination_hits(df: DataFrame, benchmark: DataFrame, id_col: str,
                       text_col: str, n: int = 3) -> DataFrame:
    """Benchmark-decontamination scan: for each document, count how many of
    its distinct word ``n``-grams also occur anywhere in ``benchmark`` —
    the standard eval-set-overlap check a pretraining pipeline runs before
    training. Returns ``(id, n_hit)`` for documents with ≥ 1 overlapping
    shingle; callers drop (or audit) those rows.

    Scale shape: the benchmark side is an eval set — thousands of docs,
    not billions — so its distinct shingle set is collapsed (one small
    groupBy) and **broadcast**; the corpus side is a single shingle-kernel
    pass + a broadcast-hash semi-ish join and one groupBy on the doc id.
    The corpus never shuffles on shingle, and the join output is bounded
    by corpus_shingles ∩ benchmark_shingles. If the benchmark ever grows
    past broadcast size, drop the hint and this degrades gracefully to a
    shuffle equi-join on the shingle key.
    """
    bench_sh = (shingle_table(benchmark, id_col, text_col, n)
                .select("shingle").distinct())
    corpus_sh = shingle_table(df, id_col, text_col, n)
    hits = corpus_sh.join(F.broadcast(bench_sh), "shingle")
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hit"))


def _length_compatible(threshold: float) -> Column:
    """Lossless size prune: J(a,b) ≤ min/max ⇒ J ≥ t requires
    min ≥ ceil(t·max)."""
    lo = F.least(F.col("n_a"), F.col("n_b"))
    hi = F.greatest(F.col("n_a"), F.col("n_b"))
    return lo >= F.ceil(F.lit(threshold) * hi)


def _ppjoin_positional_ok(required: Column, *sides: tuple[str, str]) -> Column:
    """The PPJoin positional-filter predicate ``ubound ≥ required`` with
    ``ubound = 1 + min over sides of (m − p)`` (``m`` = the doc's pruned
    set size, ``p`` = the occurrence's rare-first rank) — single-sourced
    so the exactness-critical bound formula cannot drift between the
    self-join, cross-corpus, and containment variants.

    Float safety: ``ubound`` is an exact small integer, but ``required``
    is computed in doubles (e.g. t·(n_a+n_b)/(1+t)) and can land a few
    ulps ABOVE its real value; comparing raw could drop an exact-boundary
    pair. The slack is RELATIVE (required·(1−1e-12)), so it tracks the
    magnitude of the rounding error at any document size — an absolute
    slack (the old 1e-9) stops covering double rounding once the operands
    exceed ~1e7 shingles. 1e-12 is ≥ 3 decimal orders above the ~1e-16
    relative error of the two or three roundings involved, and far below
    the gap to the next attainable integer bound, so it can neither drop
    a true pair nor admit anything the exact verify would keep anyway
    (false keeps are harmless by construction)."""
    bounds = [F.col(m) - F.col(p) for m, p in sides]
    ub = bounds[0] if len(bounds) == 1 else F.least(*bounds)
    return (1 + ub).cast("double") >= required * F.lit(1.0 - 1e-12)


def _verify_jaccard_cross(left_sets: DataFrame, right_sets: DataFrame,
                          id_col: str, candidates: DataFrame,
                          threshold: float) -> DataFrame:
    """Exact-Jaccard verification of cross-corpus (id_a, id_b) candidates
    against the two corpora's per-doc shingle arrays — the shared tail of
    both cross-pair generators (exact prefix and MinHash-banded), so their
    verification arithmetic cannot drift apart. Same shuffle_hash rationale
    as :func:`_verify_jaccard`."""
    sa = left_sets.select(F.col(id_col).alias("id_a"),
                          F.col("shset").alias("sh_a"))
    sb = right_sets.select(F.col(id_col).alias("id_b"),
                           F.col("shset").alias("sh_b"))
    paired = (candidates.join(sa.hint("shuffle_hash"), "id_a")
                        .join(sb.hint("shuffle_hash"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (paired.select("id_a", "id_b",
                          (inter.cast("double") / union).alias("jaccard"))
                  .filter(F.col("jaccard") >= threshold))


def _verify_jaccard(sets: DataFrame, id_col: str,
                    candidates: DataFrame) -> DataFrame:
    """Exact Jaccard for (id_a, id_b) candidate pairs via per-doc shingle
    arrays: two equi-joins + array_intersect. Returns
    (id_a, id_b, jaccard).

    The shuffle_hash hint stops AQE from broadcasting the sets side:
    building that broadcast would execute the whole shingle pipeline in a
    single task (broadcast-exchange builds are not parallel), which
    measured slower than the two small shuffles it avoids."""
    a = sets.select(F.col(id_col).alias("id_a"), F.col("shset").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("shset").alias("sh_b"))
    paired = (candidates.join(a.hint("shuffle_hash"), "id_a")
                        .join(b.hint("shuffle_hash"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return paired.select(
        "id_a", "id_b",
        (inter.cast("double") / union).alias("jaccard"))


# --------------------------------------------------------------------------
# n-gram Jaccard set-similarity join (exact, lossless pruning)
# --------------------------------------------------------------------------

def jaccard_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float, n: int = 3,
                      prefix_filter: bool = True) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold — *exact* result.

    Candidates come from the shared-shingle equi-join (lossless for t > 0);
    with ``prefix_filter`` the join probes only each doc's AllPairs prefix
    (|d| - ceil(t·|d|) + 1 shingles under a global hash order), the
    length filter prunes size-incompatible pairs, and the PPJoin
    positional filter (Xiao et al., WWW'08) prunes occurrences whose
    position-derived intersection upper bound cannot reach the Jaccard
    threshold — all three exactness-preserving.
    Output: (id_a, id_b, jaccard).
    """
    # The shingle table feeds both the candidate join and verification.
    # Deliberately NOT .persist()ed: AQE stages over InMemoryRelation lose
    # pipelining (measured 4× slower end-to-end here), recomputing the
    # narrow tokenize+shingle map is cheap, and Catalyst's ReusedExchange
    # dedupes the shared shuffle anyway. At 100 TB the right materialization
    # is an explicit checkpoint of the shingle table to storage, not
    # executor cache — callers own that decision.
    sets = shingle_sets(df, id_col, text_col, n)
    ex = _explode_sets(sets, id_col)
    if prefix_filter:
        # AllPairs prefix under the canonical global order: ascending
        # document frequency (rarest shingles first, ties on the shingle).
        # Rare-first prefixes barely collide, so the candidate join stays
        # near-linear even on skewed/small-vocab corpora — frequent shingles
        # fall out of every doc's prefix entirely, which is also the skew
        # defense.
        #
        # df=1 shingles are dropped BEFORE the position window: a shingle
        # held by one document matches only itself in the candidate join
        # (self-pairs are excluded by id_a < id_b), so removing them loses
        # no pair. Restricting to df≥2 shingles only shrinks each shingle's
        # rare-first position, so `pos ≤ prefix_len` keeps a superset of
        # the original prefix ∩ {df≥2} — still lossless. On real corpora
        # most shingles are unique, so this collapses both the per-doc
        # window input and the candidate join probe. The groupBy keeps
        # map-side partial aggregation (skew-safe for hot shingles), and
        # its exchange on `shingle` is reused by the equi-join.
        from pyspark.sql.window import Window
        dfreq2 = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
                    .filter(F.col("__df") >= 2))
        w = Window.partitionBy(id_col).orderBy("__df", "shingle")
        wcnt = Window.partitionBy(id_col)
        prefix_len = (F.col("n_shingles")
                      - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1)
        # __pos/__m feed the PPJoin positional filter below: __pos is the
        # shingle's rank in the doc's rare-first order, __m the doc's
        # df≥2-pruned set size (same window partitioning — one sort, no
        # extra exchange).
        probe = (ex.join(dfreq2, "shingle")
                   .withColumn("__pos", F.row_number().over(w))
                   .withColumn("__m", F.count(F.lit(1)).over(wcnt))
                   .filter(F.col("__pos") <= prefix_len)
                   .select(id_col, "n_shingles", "__pos", "__m", "shingle"))
        a = probe.select(F.col(id_col).alias("id_a"),
                         F.col("n_shingles").alias("n_a"),
                         F.col("__pos").alias("__pa"),
                         F.col("__m").alias("__ma"), "shingle")
        b = probe.select(F.col(id_col).alias("id_b"),
                         F.col("n_shingles").alias("n_b"),
                         F.col("__pos").alias("__pb"),
                         F.col("__m").alias("__mb"), "shingle")
        # PPJoin positional filter (lossless; Xiao et al., WWW'08). For a
        # true pair take its globally FIRST common shingle: every other
        # intersection element has df≥2 and ranks strictly after it in
        # both docs' pruned orders, so
        #     inter ≤ 1 + min(__ma − __pa, __mb − __pb),
        # while J ≥ t ⟺ inter ≥ t·(n_a + n_b)/(1 + t). Occurrences whose
        # bound cannot reach the requirement are dropped; the first common
        # occurrence of every true pair always passes, so filter-then-
        # distinct keeps every true pair. False keeps are harmless (exact
        # verification follows). Float-boundary handling lives in
        # _ppjoin_positional_ok; measured 310k → 125k candidates at t=0.5
        # on the sf0.1 corpus (2.5×), results identical.
        required = (F.lit(threshold)
                    * (F.col("n_a") + F.col("n_b")).cast("double")
                    / F.lit(1.0 + threshold))
        extra = _ppjoin_positional_ok(required, ("__ma", "__pa"),
                                      ("__mb", "__pb"))
    else:
        probe = ex
        a = probe.select(F.col(id_col).alias("id_a"),
                         F.col("n_shingles").alias("n_a"), "shingle")
        b = probe.select(F.col(id_col).alias("id_b"),
                         F.col("n_shingles").alias("n_b"), "shingle")
        extra = F.lit(True)
    cand = (a.join(b, "shingle")
             .filter((F.col("id_a") < F.col("id_b"))
                     & _length_compatible(threshold) & extra)
             .select("id_a", "id_b").distinct())
    verified = _verify_jaccard(sets, id_col, cand)
    return verified.filter(F.col("jaccard") >= threshold)


def jaccard_cross_pairs(left: DataFrame, right: DataFrame, id_col: str,
                        text_col: str, threshold: float,
                        n: int = 3) -> DataFrame:
    """Cross-corpus near-dup join — *exact* result: all (left, right) pairs
    with shingle-set Jaccard ≥ threshold. The near-dup counterpart of
    :func:`dedup_incremental`: dedup a new crawl against the existing
    corpus where exact content hashing misses boilerplate-level edits.

    Candidates come from the shared-shingle equi-join between the corpora
    (lossless for t > 0: J ≥ t > 0 implies a common shingle), restricted
    to each document's AllPairs prefix under a rare-first global order by
    *combined* document frequency — the same lossless prefix theorem as
    the self-join (its proof never uses that both sets come from one
    collection). Shingles absent from the other corpus are dropped before
    the position window (they cannot produce a cross pair, and removing
    them only shrinks prefix positions — superset of the true prefix, so
    still lossless; without this prune the join was measured 10× slower).
    Output: (id_a = left id, id_b = right id, jaccard).

    Scale shape: two shingle-kernel passes, two map-side-combined df
    groupBys, one equi-join on the shingle key over prefix shingles only,
    candidate-only verification (two hash joins to the per-doc arrays).
    In the usual call the left side (new crawl) is much smaller than the
    right (corpus); AQE handles the asymmetry. Ids may collide across
    corpora — pairs are (left, right) positional, not ordered by value.
    """
    from pyspark.sql.window import Window
    ls = shingle_sets(left, id_col, text_col, n)
    rs = shingle_sets(right, id_col, text_col, n)
    lex = _explode_sets(ls, id_col)
    rex = _explode_sets(rs, id_col)
    dfl = lex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__dfl"))
    dfr = rex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__dfr"))
    shared = (dfl.join(dfr, "shingle")        # inner: present on both sides
              .select("shingle",
                      (F.col("__dfl") + F.col("__dfr")).alias("__df")))
    w = Window.partitionBy(id_col).orderBy("__df", "shingle")
    wcnt = Window.partitionBy(id_col)
    prefix_len = (F.col("n_shingles")
                  - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1)

    def prefix(ex, id_alias, n_alias, p_alias, m_alias):
        # __pos = rank in the doc's rare-first order over SHARED shingles,
        # __m = the doc's shared-shingle count — the positional filter's
        # inputs (every intersection element is shared by definition, so
        # the pruned order is intersection-complete and the PPJoin bound
        # below is valid).
        return (ex.join(shared, "shingle")
                  .withColumn("__pos", F.row_number().over(w))
                  .withColumn("__m", F.count(F.lit(1)).over(wcnt))
                  .filter(F.col("__pos") <= prefix_len)
                  .select(F.col(id_col).alias(id_alias),
                          F.col("n_shingles").alias(n_alias),
                          F.col("__pos").alias(p_alias),
                          F.col("__m").alias(m_alias), "shingle"))

    # PPJoin positional filter — same lossless theorem as the self-join
    # (jaccard_dup_pairs): the globally first common shingle of a true
    # pair bounds inter ≤ 1 + min(__ma − __pa, __mb − __pb), and J ≥ t
    # needs inter ≥ t·(n_a + n_b)/(1 + t); that witness occurrence always
    # passes, so filter-then-distinct keeps every true pair.
    required = (F.lit(threshold)
                * (F.col("n_a") + F.col("n_b")).cast("double")
                / F.lit(1.0 + threshold))
    cand = (prefix(lex, "id_a", "n_a", "__pa", "__ma")
            .join(prefix(rex, "id_b", "n_b", "__pb", "__mb"), "shingle")
            .filter(_length_compatible(threshold)
                    & _ppjoin_positional_ok(required, ("__ma", "__pa"),
                                            ("__mb", "__pb")))
            .select("id_a", "id_b").distinct())
    return _verify_jaccard_cross(ls, rs, id_col, cand, threshold)


def minhash_cross_pairs(left: DataFrame, right: DataFrame, id_col: str,
                        text_col: str, threshold: float,
                        n: int = 3) -> DataFrame:
    """Cross-corpus near-dup join, MinHash-LSH path: banded signature
    candidates between the corpora, exact Jaccard verification. The scale
    default where :func:`jaccard_cross_pairs` is the exact reference —
    signatures are zero-shuffle narrow maps, so the only corpus-sized
    shuffle is the band-bucket equi-join over 16 short keys per doc
    (vs the prefix-shingle join of the exact path). Same banding as the
    self-join (16×2: miss probability (1 − J²)¹⁶ per true pair — ≈ 8e-8
    at exactly J = 0.8, < 3e-12 from J ≥ 0.9), so the verified output
    equals the exact join on any realistic corpus
    (pinned in pytest). Output: (id_a = left id, id_b = right id, jaccard).
    """
    def banded(df, alias):
        sig = minhash_signatures(df, id_col, text_col, n)
        return sig.select(F.col(id_col).alias(alias),
                          F.explode(_minhash_band_keys()).alias("band_key"))

    cand = (banded(left, "id_a").join(banded(right, "id_b"), "band_key")
            .select("id_a", "id_b").distinct())
    return _verify_jaccard_cross(
        shingle_sets(left, id_col, text_col, n),
        shingle_sets(right, id_col, text_col, n),
        id_col, cand, threshold)


# --------------------------------------------------------------------------
# duplicate clusters (connected components over the pair graph)
# --------------------------------------------------------------------------

def dup_clusters(pairs: DataFrame, max_iter: int = 20,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components of the duplicate-pair graph: (id, cluster_id),
    cluster_id = the minimum member id. Input: (id_a, id_b) pairs.

    Min-label propagation driven to fixpoint: each round every vertex takes
    the minimum label in its closed neighborhood, **and labels themselves
    become edges** (label ↔ vertex), which is the pointer-doubling that
    makes chains converge in O(log n) rounds rather than O(diameter) — the
    alternating-star trick from Kiveris et al., "Connected Components in
    MapReduce and Beyond" (SoCC'14). Each round is one groupBy shuffle; the
    driver only reads the single changed-row count per round.

    ``checkpoint_dir``: when set, per-round materialization uses *reliable*
    checkpoints (``df.checkpoint``) written under that directory instead of
    ``localCheckpoint``. localCheckpoint blocks live in executor storage and
    die with the executor — fine on local[...], fatal mid-loop on a real
    cluster — so at 100 TB pass a durable path (HDFS/S3) here.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _materialize(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _materialize(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    edges = _materialize(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst"))))
    # materialized once: the loop joins edges every round, and the upstream
    # pair pipeline (shingling + similarity join) must not re-execute per
    # round
    # Init at the round-1 fixpoint directly: label = min(id, min neighbor)
    # — one groupBy (same cost as the distinct init it replaces) that makes
    # clique-shaped duplicate groups (the common near-dup case) converge in
    # a single confirming round instead of three.
    labels = (edges.groupBy("src")
              .agg(F.min("dst").alias("__mn"))
              .select(F.col("src").alias("id"),
                      F.least(F.col("src"), F.col("__mn")).alias("label")))
    for _ in range(max_iter):
        lab_src = labels
        neigh = (edges.join(lab_src.withColumnRenamed("id", "dst")
                            .withColumnRenamed("label", "dst_label"), "dst")
                 .select(F.col("src").alias("id"),
                         F.col("dst_label").alias("cand"),
                         F.lit(False).alias("is_own")))
        # pointer doubling: my current label's label is also a candidate
        via_label = (labels.alias("v")
                     .join(labels.withColumnRenamed("id", "label_id")
                           .withColumnRenamed("label", "label_label"),
                           F.col("v.label") == F.col("label_id"))
                     .select(F.col("v.id").alias("id"),
                             F.col("label_label").alias("cand"),
                             F.lit(False).alias("is_own")))
        own = labels.select("id", F.col("label").alias("cand"),
                            F.lit(True).alias("is_own"))
        # the old label rides along as min(cand where is_own), so the
        # convergence check is a filter on this frame — no extra join/shuffle
        # per round. New label ≤ old label always (own ⊆ candidates).
        new_labels = _materialize(
            # cut lineage each round — otherwise round i re-executes
            # rounds 1..i-1 (O(i²) total work)
            neigh.union(via_label).union(own)
                 .groupBy("id")
                 .agg(F.min("cand").alias("label"),
                      F.min(F.when(F.col("is_own"), F.col("cand")))
                       .alias("__old")))
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


# --------------------------------------------------------------------------
# signature kernels (narrow maps — zero shuffle)
# --------------------------------------------------------------------------
#
# Signatures are per-document reductions of per-document shingle sets, so
# they are embarrassingly parallel. The explode → groupBy formulation (kept
# below as ``_*_signatures_expr`` — the 1:1 analog of the SQL-oracle
# rendering) shuffles the exploded corpus (~10× the input) just to reunite
# rows that started on the same document; at 100 TB that shuffle IS the
# cost. The Arrow-batched kernel computes the same md5/modular arithmetic
# document-locally: no shuffle, one Python crossing, numpy-vectorized.
# Kernel ≡ expression equivalence is pinned in tests/test_dedup.py.

def _signature_kernel(id_col: str, text_col: str, n: int, kind: str):
    """Batch-wide signature kernel: shingles of every doc in the Arrow batch
    are hashed in one flat pass (md5 digest bytes — value-identical to the
    hex form md5_hash48 renders) and reduced per document with
    ``np.minimum/add.reduceat`` over segment starts, so per-document numpy
    allocation never happens — measured ~25% faster than the per-doc loop
    and allocation-flat regardless of documents-per-batch."""
    import hashlib

    import numpy as np
    import pandas as pd

    md5 = hashlib.md5
    from_bytes = int.from_bytes
    bit_idx = np.arange(SIMHASH_BITS, dtype=np.int64)

    def run(batches):
        for pdf in batches:
            ids, sh_lists = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                sh = TX.shingle_list(t, n)
                if sh is None:
                    continue  # explode(null) emits no rows in the expr form
                ids.append(i)
                sh_lists.append(sh)
            if not ids:
                yield pd.DataFrame({id_col: [], "__val": []})
                continue
            counts = np.fromiter((len(s) for s in sh_lists),
                                 dtype=np.int64, count=len(sh_lists))
            flat = [s for lst in sh_lists for s in lst]
            # first 6 digest bytes big-endian == int(hexdigest[:12], 16)
            h = np.fromiter(
                (from_bytes(md5(s.encode("utf-8")).digest()[:6], "big")
                 for s in flat), dtype=np.int64, count=len(flat))
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            if kind == "minhash":
                r = h % MERSENNE_P
                mat = np.empty((len(MINHASH_SEEDS), len(ids)), dtype=np.int64)
                for j, (a, b) in enumerate(MINHASH_SEEDS):
                    mat[j] = np.minimum.reduceat((a * r + b) % MERSENNE_P,
                                                 starts)
                vals = mat.T.tolist()
            else:
                bits = ((h[:, None] >> bit_idx) & 1).astype(np.int32)
                ones = np.add.reduceat(bits, starts, axis=0)
                vals = ((ones * 2 > counts[:, None]).astype(np.int64)
                        << bit_idx).sum(axis=1).tolist()
            yield pd.DataFrame({id_col: ids, "__val": vals})

    return run


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: columns mh_0..mh_{k-1}. Narrow-map Arrow
    kernel — no shuffle (see the kernel note above)."""
    id_type = df.schema[id_col].dataType.simpleString()
    raw = ensure_min_partitions(df.select(id_col, text_col)).mapInPandas(
        _signature_kernel(id_col, text_col, n, "minhash"),
        schema=f"{id_col} {id_type}, __val array<bigint>")
    return raw.select(
        id_col, *[F.element_at("__val", i + 1).alias(f"mh_{i}")
                  for i in range(len(MINHASH_SEEDS))])


def _minhash_signatures_expr(df: DataFrame, id_col: str, text_col: str,
                             n: int = 3) -> DataFrame:
    """Explode + groupBy expression form (the SQL-oracle analog; used to pin
    kernel equivalence)."""
    sh = shingle_table(df, id_col, text_col, n)
    h = (md5_hash48(F.col("shingle")) % MERSENNE_P).alias("h")
    hashed = sh.select(id_col, h)
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P).alias(f"mh_{i}")
            for i, (a, b) in enumerate(MINHASH_SEEDS)]
    return hashed.groupBy(id_col).agg(*aggs)


def _minhash_band_keys():
    """The BANDS×ROWS_PER_BAND banding of an mh_0..mh_{k-1} signature row,
    as an array of band-key strings — the one encoding both the self-join
    and cross-corpus candidate generators must agree on."""
    return F.array(*[
        F.concat_ws("_", F.lit(j), *[
            F.col(f"mh_{j * ROWS_PER_BAND + r}")
            for r in range(ROWS_PER_BAND)])
        for j in range(BANDS)])


def minhash_candidate_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """LSH banding: signature → BANDS band-keys, equi-join per band bucket.
    Emits distinct (id_a, id_b) candidates."""
    exploded = sigs.select(F.col(id_col),
                           F.explode(_minhash_band_keys()).alias("band_key"))
    a = exploded.select(F.col(id_col).alias("id_a"), "band_key")
    b = exploded.select(F.col(id_col).alias("id_b"), "band_key")
    return (a.join(b, "band_key").filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())


def minhash_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8, n: int = 3) -> DataFrame:
    """MinHash-LSH candidates + exact-Jaccard verification.

    Output: (id_a, id_b, jaccard) for verified pairs ≥ threshold. Because
    candidates are verified exactly, precision is 1.0; per-pair recall
    with 16×2 banding is 1 − (1 − J²)¹⁶: ~1 − 8e-8 at exactly J = 0.8,
    1 − 3e-12 from J ≥ 0.9.
    """
    sets = shingle_sets(df, id_col, text_col, n)  # un-persisted: see jaccard
    sigs = minhash_signatures(df, id_col, text_col, n)
    cand = minhash_candidate_pairs(sigs, id_col)
    verified = _verify_jaccard(sets, id_col, cand)
    return verified.filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3) -> DataFrame:
    """48-bit SimHash per doc: majority vote per bit over distinct shingle
    hashes. Narrow-map Arrow kernel — no shuffle (see the kernel note).
    Output: (id, simhash)."""
    id_type = df.schema[id_col].dataType.simpleString()
    return (ensure_min_partitions(df.select(id_col, text_col))
              .mapInPandas(_signature_kernel(id_col, text_col, n, "simhash"),
                           schema=f"{id_col} {id_type}, __val bigint")
              .withColumnRenamed("__val", "simhash"))


def _simhash_signatures_expr(df: DataFrame, id_col: str, text_col: str,
                             n: int = 3) -> DataFrame:
    """Explode + groupBy expression form (the SQL-oracle analog; used to pin
    kernel equivalence)."""
    sh = shingle_table(df, id_col, text_col, n)
    hashed = sh.select(id_col, md5_hash48(F.col("shingle")).alias("h"))
    aggs = [F.sum(F.shiftright("h", bit) % 2).alias(f"ones_{bit}")
            for bit in range(SIMHASH_BITS)]
    counted = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_el"), *aggs)
    sig = sum(
        (F.when(F.col(f"ones_{bit}") * 2 > F.col("n_el"),
                F.lit(2 ** bit).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
         for bit in range(SIMHASH_BITS)),
        F.lit(0).cast("bigint"))
    return counted.select(id_col, sig.alias("simhash"))


def simhash_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      hd_max: int = 3, n: int = 3) -> DataFrame:
    """Pairs within Hamming distance ``hd_max`` of 48-bit SimHash — exact.

    Blocking: split the signature into ``hd_max + 1`` bit-segments; a pair
    with ≤ hd_max differing bits must agree on ≥1 whole segment (pigeonhole),
    so the segment equi-join is lossless. The Hamming filter runs on the raw
    join output; only survivors reach the pair-distinct.
    Output: (id_a, id_b, hamming).
    """
    sigs = simhash_signatures(df, id_col, text_col, n)
    n_bands = hd_max + 1
    width = SIMHASH_BITS // n_bands
    bands = F.array(*[
        F.concat_ws("_", F.lit(j),
                    (F.shiftright("simhash", j * width)
                     % F.lit(2 ** width if j < n_bands - 1 else
                             2 ** (SIMHASH_BITS - j * width))))
        for j in range(n_bands)])
    exploded = sigs.select(id_col, "simhash", F.explode(bands).alias("band_key"))
    a = exploded.select(F.col(id_col).alias("id_a"),
                        F.col("simhash").alias("sig_a"), "band_key")
    b = exploded.select(F.col(id_col).alias("id_b"),
                        F.col("simhash").alias("sig_b"), "band_key")
    return (a.join(b, "band_key")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                      .alias("hamming"))
             .filter(F.col("hamming") <= hd_max)
             .distinct())


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.9, n: int = 3) -> DataFrame:
    """Asymmetric near-dup join — *exact* result: all ordered pairs
    (contained, container) with shingle containment
    ``|S_c ∩ S_o| / |S_c| ≥ threshold`` (``c`` = contained doc,
    ``o`` = container, c ≠ o). Catches quote-and-extend, snippet reposts,
    and doc-in-doc inclusion that symmetric Jaccard scores far below any
    usable threshold when the container is much larger.

    Blocking mirrors :func:`jaccard_dup_pairs` but prefixes ONLY the
    contained side: containment ≥ t bounds the intersection from below by
    ``ceil(t·|S_c|)``, so the AllPairs theorem applies with prefix size
    ``|S_c| − ceil(t·|S_c|) + 1`` on the contained side while the
    container side must probe with its full (df≥2-pruned) shingle list —
    no size bound exists on the container, which is also why there is no
    length-compatibility filter here. df=1 shingles drop losslessly on
    both sides (a pair-witness shingle has df ≥ 2; dropping them only
    advances contained-side prefix positions). Verification is
    candidate-only: two hash joins to the per-doc arrays, one
    array_intersect per pair.

    Scale shape: identical to the Jaccard join — shingle kernel pass, one
    df groupBy, one prefix-bounded equi-join, candidate verification.
    Rare-first ordering keeps hot shingles out of every contained-side
    prefix; the container side joins through them but map-side combine on
    the df groupBy and AQE skew-split bound the damage.
    Output: (contained_id, container_id, containment).
    """
    sets = shingle_sets(df, id_col, text_col, n)
    ex = _explode_sets(sets, id_col)
    from pyspark.sql.window import Window
    dfreq2 = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") >= 2))
    ex2 = ex.join(dfreq2, "shingle")
    w = Window.partitionBy(id_col).orderBy("__df", "shingle")
    wcnt = Window.partitionBy(id_col)
    prefix_len = (F.col("n_shingles")
                  - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1)
    # Positional filter on the contained side (PPJoin, lossless — see
    # jaccard_dup_pairs): a true pair's globally first common shingle has
    # every other intersection element (all df≥2 by membership in both
    # docs) ranking after it in the contained doc's pruned order, so
    # inter ≤ 1 + (__m − __pos), while containment ≥ t needs
    # inter ≥ t·|S_c|. The witness occurrence always passes; extra
    # occurrences it prunes only shrink the distinct/verify input.
    pos = (ex2.withColumn("__pos", F.row_number().over(w))
              .withColumn("__m", F.count(F.lit(1)).over(wcnt)))
    contained = (pos.filter(F.col("__pos") <= prefix_len)
                    .select(F.col(id_col).alias("contained_id"),
                            F.col("n_shingles").alias("__nc"),
                            F.col("__pos").alias("__pc"),
                            F.col("__m").alias("__mc"), "shingle"))
    # The container side probes through the SAME position frame (the
    # window subtree is shared — the static plan has fewer exchanges
    # than the un-windowed container had), which makes the container
    # bound available too: intersection elements rank after the
    # globally-first common shingle in BOTH docs' pruned orders.
    container = pos.select(F.col(id_col).alias("container_id"),
                           F.col("__pos").alias("__po"),
                           F.col("__m").alias("__mo"), "shingle")
    req = F.lit(threshold) * F.col("__nc").cast("double")
    pos_ok = _ppjoin_positional_ok(req, ("__mc", "__pc"),
                                   ("__mo", "__po"))
    cand = (contained.join(container, "shingle")
                     .filter((F.col("contained_id")
                              != F.col("container_id")) & pos_ok)
                     .select("contained_id", "container_id").distinct())
    a = sets.select(F.col(id_col).alias("contained_id"),
                    F.col("shset").alias("__sc"))
    b = sets.select(F.col(id_col).alias("container_id"),
                    F.col("shset").alias("__so"))
    inter = F.size(F.array_intersect("__sc", "__so"))
    return (cand.join(a.hint("shuffle_hash"), "contained_id")
                .join(b.hint("shuffle_hash"), "container_id")
                .select("contained_id", "container_id",
                        (inter.cast("double") / F.size("__sc"))
                        .alias("containment"))
                .filter(F.col("containment") >= threshold))


def sorted_neighborhood_pairs(df: DataFrame, id_col: str, key_col: str,
                              window: int = 3,
                              partitions: int = 64,
                              verify: bool = True) -> DataFrame:
    """Sorted-neighborhood (SNM) duplicate detection: globally sort on
    the blocking key, then compare only records within ``window``
    positions of each other — the classic entity-resolution blocking
    method that trades the O(n²) all-pairs for O(n·w) candidates,
    catching duplicates whose keys sort adjacently. Output: verified
    pairs ``(id_a, id_b)`` (key equality; id_a < id_b in rank order).

    Scale shape — the point of the operator is a DISTRIBUTED global
    rank, never a single-task sort: repartitionByRange on the key
    range-partitions the corpus; per-partition ``row_number`` windows
    run in parallel; the global rank is partition rank + an offset
    from the per-partition counts (a bounded collect — ONE scalar per
    partition, the sample_global_shuffle posture). The rank is
    well-defined regardless of where the range boundaries fall because
    the (key, id) sort key is unique. Candidates then come from a
    banded equi-join on ⌊rank/w⌋ buckets (each pair at distance ≤ w
    shares a bucket or sits in adjacent ones) — no window function
    ever sees the corpus globally.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    d = df.select(F.col(id_col).alias("__id"), F.col(key_col).alias("__k"))
    p = (d.repartitionByRange(partitions, "__k", "__id")
          .withColumn("__pid", F.spark_partition_id()))
    counts = sorted(
        ((r["__pid"], r["n"]) for r in
         p.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()))
    acc, offs = 0, []
    for pid, n in counts:
        offs.append((pid, acc))
        acc += n
    off_df = p.sparkSession.createDataFrame(offs, "__pid int, __off long")
    from pyspark.sql import Window
    w = Window.partitionBy("__pid").orderBy("__k", "__id")
    ranked = (p.withColumn("__prn", F.row_number().over(w))
               .join(F.broadcast(off_df), "__pid")
               .select("__id", "__k",
                       (F.col("__prn") + F.col("__off")).alias("__rn")))
    b = ranked.withColumn(
        "__b", F.floor((F.col("__rn") - F.lit(1)) / F.lit(window)))
    # each ≤w-distance pair shares a bucket or sits in adjacent ones;
    # exploding the left side to (bkt, bkt+1) keeps this an EQUI-join
    # (an OR-of-equalities condition would plan a nested loop)
    lhs = (b.select(F.col("__id").alias("id_a"),
                    F.col("__k").alias("__ka"),
                    F.col("__rn").alias("__ra"), "__b")
            .withColumn("__jb", F.explode(F.array(F.col("__b"),
                                                  F.col("__b") + 1)))
            .drop("__b"))
    rhs = b.select(F.col("__id").alias("id_b"), F.col("__k").alias("__kb"),
                   F.col("__rn").alias("__rb"),
                   F.col("__b").alias("__jb"))
    cand = (lhs.join(rhs, "__jb")
               .filter((F.col("__rb") > F.col("__ra"))
                       & (F.col("__rb") - F.col("__ra") <= window)))
    if not verify:
        # blocking-quality callers want the raw candidate set the
        # window generates (each qualifying pair appears exactly once:
        # the rhs bucket matches exactly one of the lhs's two bands)
        return cand.select("id_a", "id_b")
    return (cand.filter(F.col("__ka") == F.col("__kb"))  # verify
                .select("id_a", "id_b"))


def sql_sorted_neighborhood_pairs(table: str, id_col: str, key_col: str,
                                  window: int = 3) -> str:
    """DuckDB twin of :func:`sorted_neighborhood_pairs` — one global
    ROW_NUMBER (fine single-node) + the same banded join + verify."""
    return (
        f"WITH r AS (SELECT {id_col} AS id, {key_col} AS k, "
        f"ROW_NUMBER() OVER (ORDER BY {key_col}, {id_col}) AS rn "
        f"FROM {table}), "
        f"b AS (SELECT id, k, rn, "
        f"CAST(floor(CAST(rn - 1 AS DOUBLE) / {window}.0) AS BIGINT) "
        f"AS bkt FROM r) "
        f"SELECT a.id AS id_a, c.id AS id_b FROM b a JOIN b c "
        f"ON (c.bkt = a.bkt OR c.bkt = a.bkt + 1) "
        f"AND c.rn > a.rn AND c.rn - a.rn <= {window} "
        f"AND a.k = c.k")
