"""Edit-distance similarity join (exact, lossless pruning) — the
string-metric member of the near-dup family (north-star extension; the
reference executes no joins, /root/reference/src/planner/queryplanner.rs:51
consumes a single FROM relation).

Levenshtein matching catches character-level near-dups (OCR noise, typo
farms, template fills) that token-level Jaccard misses. The naive join is
O(n²) string DPs; this operator makes it an equi-join via **PassJoin-style
segment blocking** (Li, Deng & Feng, SIGMOD'11 — public literature):

1. fixed-length key: compare length-L prefixes (documents shorter than L
   are excluded up front — a stated, deterministic domain restriction);
2. partition every prefix into d+r contiguous segments (r=2 by
   default). Pigeonhole: d edits cannot touch more than d segments, so
   if ed(a,b) ≤ d then at least r segments of b occur in a EXACTLY,
   each shifted by at most the net indel count ≤ d. Candidates come
   from an equi-join between each prefix's (segment_id, segment_text)
   index entries and each prefix's (segment_id, substring-at-offset)
   probe entries for the (2d+1) offsets around the segment's home
   position, keeping only pairs that match on ≥ r DISTINCT segments —
   lossless, and requiring two independent aligned exact substring
   matches is what kills the accidental single-common-word collisions
   (small-vocabulary corpora align words across unrelated documents;
   the r=2 count filter measured ~40× fewer verification pairs than
   r=1 at sf0.1, and either beats the q-gram AllPairs variant by an
   order of magnitude);
3. verification: one banded JVM ``levenshtein(…, threshold=d)`` per
   surviving candidate — O(L·d) instead of O(L²) per pair.

Scale shape: segment/probe emission is a projection against a broadcast
literal offset grid (the only "join" without an equi-key is that
broadcast of ≤ (d+1)(2d+1) constant rows); candidates meet in one
equi-join on (segment_id, text-piece); the DP runs only on candidates.
No UDFs, no cartesian between data-sized relations, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(prefix_len: int, n_segs: int) -> list[tuple[int, int, int]]:
    """Even partition of [1..prefix_len] into n_segs segments:
    (seg_id, start_1based, length). First L mod m segments get the extra
    char — any fixed allocation works for correctness."""
    m = n_segs
    base, extra = divmod(prefix_len, m)
    out, start = [], 1
    for i in range(m):
        ln = base + (1 if i < extra else 0)
        out.append((i, start, ln))
        start += ln
    return out


def editdist_pairs(df: DataFrame, id_col: str, text_col: str,
                   max_dist: int = 8, prefix_len: int = 64,
                   min_matches: int = 2) -> DataFrame:
    """All pairs of documents (length ≥ ``prefix_len``) whose length-
    ``prefix_len`` prefixes are within Levenshtein distance ``max_dist``.
    Exact over that domain. Output: (id_a, id_b, dist), id_a < id_b.

    ``min_matches`` (r) trades candidate selectivity against segment
    length: d+r segments are indexed and pairs must match on r of them.
    r is capped so every segment keeps ≥ 2 chars (single-char segments
    generate more collisions than the extra match requirement removes).
    """
    r = max(1, min(min_matches, prefix_len // 2 - max_dist))
    m = max_dist + r
    segs = _segments(prefix_len, m)
    if any(ln < 1 for _, _, ln in segs):
        raise ValueError(
            f"prefix_len={prefix_len} too short for max_dist={max_dist}: "
            f"every one of the {m} segments needs ≥ 1 char")
    spark = df.sparkSession
    pfx = (df.filter(F.length(F.col(text_col)) >= prefix_len)
             .select(F.col(id_col).alias("__id"),
                     F.substring(F.col(text_col), 1, prefix_len)
                      .alias("__pfx")))
    # index side: each prefix's d+1 home segments
    seg_grid = spark.createDataFrame(segs, ["seg_id", "pos", "len"])
    index = (pfx.join(F.broadcast(seg_grid))
                .select(F.col("__id").alias("id_idx"), "seg_id",
                        F.col("__pfx").substr(F.col("pos"), F.col("len"))
                         .alias("piece")))
    # probe side: substrings of the segment's length at offsets shifted
    # by at most max_dist from the segment's home position
    probe_rows = [(i, off, ln)
                  for i, pos, ln in segs
                  for off in range(max(1, pos - max_dist),
                                   min(prefix_len - ln + 1,
                                       pos + max_dist) + 1)]
    probe_grid = spark.createDataFrame(probe_rows, ["seg_id", "off", "len"])
    probe = (pfx.join(F.broadcast(probe_grid))
                .select(F.col("__id").alias("id_prb"), "seg_id",
                        F.col("__pfx").substr(F.col("off"), F.col("len"))
                         .alias("piece")))
    # ≥ r distinct matched segments per pair (pigeonhole guarantees r;
    # the groupBy doubles as the pair dedup, so no separate distinct)
    cand = (probe.join(index, ["seg_id", "piece"])
                 .filter(F.col("id_prb") != F.col("id_idx"))
                 .groupBy(F.least("id_prb", "id_idx").alias("id_a"),
                          F.greatest("id_prb", "id_idx").alias("id_b"))
                 .agg(F.count_distinct("seg_id").alias("__nseg"))
                 .filter(F.col("__nseg") >= r)
                 .select("id_a", "id_b"))
    pa = pfx.select(F.col("__id").alias("id_a"), F.col("__pfx").alias("__pa"))
    pb = pfx.select(F.col("__id").alias("id_b"), F.col("__pfx").alias("__pb"))
    # banded DP: threshold-capped levenshtein returns -1 above max_dist
    return (cand.join(pa.hint("shuffle_hash"), "id_a")
                .join(pb.hint("shuffle_hash"), "id_b")
                .select("id_a", "id_b",
                        F.levenshtein("__pa", "__pb", max_dist)
                         .alias("dist"))
                .filter(F.col("dist") >= 0))
