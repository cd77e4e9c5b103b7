"""Dedup operator tests: lossless-blocking equivalences and exact-keeper
semantics, on the real documents table (sf0.001) + hand-built corpora."""

import pytest
from pyspark.sql import functions as F

from mura_spark.operators import dedup


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (4, "completely different words entirely here now"),
        (5, "The  Quick   Brown fox jumps over the lazy dog"),  # ws/case dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(tiny_docs):
    from mura_spark.functions.text import normalize
    out = dedup.exact_dedup(tiny_docs, "doc_id", F.md5(normalize(F.col("text"))))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 4]


def test_exact_dup_groups(tiny_docs):
    from mura_spark.functions.text import normalize
    groups = dedup.exact_dup_groups(tiny_docs, "doc_id",
                                    F.md5(normalize(F.col("text"))))
    big = groups.filter(F.col("group_size") > 1).first()
    assert big.keep_id == 1 and big.group_size == 3


def test_contamination_hits_counts_shared_shingles(spark):
    """Hand-built corpus: hit counts are the number of a train doc's
    distinct 3-gram shingles present in the benchmark set; clean docs are
    absent; the benchmark side is broadcast in the plan."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"])
    train = spark.createDataFrame([
        (1, "alpha beta gamma epsilon"),   # shares 'alpha beta gamma' → 1
        (2, "alpha beta gamma delta tau"), # shares 2 bench shingles
        (3, "nothing in common here at all"),
    ], ["doc_id", "text"])
    out = dedup.contamination_hits(train, bench, "doc_id", "text", n=3)
    got = {r.doc_id: r.n_hit for r in out.collect()}
    assert got == {1: 1, 2: 2}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_jaccard_finds_near_dup(tiny_docs):
    pairs = {(r.id_a, r.id_b)
             for r in dedup.jaccard_dup_pairs(tiny_docs, "doc_id", "text",
                                              threshold=0.5).collect()}
    assert (1, 2) in pairs          # one-word edit
    assert (1, 3) in pairs and (1, 5) in pairs  # exact/normalized dups (J=1)
    assert not any(4 in p for p in pairs)


def test_prefix_filter_is_lossless(documents):
    with_pf = dedup.jaccard_dup_pairs(documents, "doc_id", "text", 0.8,
                                      prefix_filter=True)
    without = dedup.jaccard_dup_pairs(documents, "doc_id", "text", 0.8,
                                      prefix_filter=False)
    a = sorted((r.id_a, r.id_b, r.jaccard) for r in with_pf.collect())
    b = sorted((r.id_a, r.id_b, r.jaccard) for r in without.collect())
    assert a == b and len(a) > 0


def test_minhash_equals_exact_jaccard(documents):
    """Verified MinHash-LSH output == brute-force Jaccard join (recall at
    these parameters is 1 - ~1e-11 per pair; the corpus has a clean gap)."""
    mh = dedup.minhash_dup_pairs(documents, "doc_id", "text", threshold=0.8)
    ex = dedup.jaccard_dup_pairs(documents, "doc_id", "text", threshold=0.8)
    assert (sorted((r.id_a, r.id_b, r.jaccard) for r in mh.collect())
            == sorted((r.id_a, r.id_b, r.jaccard) for r in ex.collect()))


def test_simhash_banding_is_lossless(documents):
    """Banded simhash pairs == brute-force hamming filter over all signature
    pairs (pigeonhole argument)."""
    sigs = dedup.simhash_signatures(documents, "doc_id", "text")
    a = sigs.select(F.col("doc_id").alias("id_a"),
                    F.col("simhash").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"),
                    F.col("simhash").alias("sig_b"))
    brute = (a.join(b, F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                      .alias("hamming"))
             .filter(F.col("hamming") <= 8))
    banded = dedup.simhash_dup_pairs(documents, "doc_id", "text", hd_max=8)
    assert (sorted(map(tuple, banded.collect()))
            == sorted(map(tuple, brute.collect())))


def test_jaccard_value_is_exact(tiny_docs):
    """J(doc1, doc2): 3-gram shingle sets of the two 9-token docs differ in
    the final shingles only."""
    row = (dedup.jaccard_dup_pairs(tiny_docs, "doc_id", "text", 0.1)
           .filter((F.col("id_a") == 1) & (F.col("id_b") == 2)).first())
    # 7 shingles each, 6 shared (only the final dog/cat shingle differs)
    assert row.jaccard == 6 / 8


def test_short_document_shingles(spark):
    """Documents shorter than the shingle width collapse to one shingle."""
    df = spark.createDataFrame([(1, "hello world"), (2, "hello world"),
                                (3, "hello")], ["doc_id", "text"])
    pairs = dedup.jaccard_dup_pairs(df, "doc_id", "text", 0.9).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]


def test_signature_kernels_match_expression_forms(documents):
    """The narrow-map signature kernels must equal the explode+groupBy
    expression forms value-for-value (the SQL-oracle analogs)."""
    mh_k = {tuple(r) for r in
            dedup.minhash_signatures(documents, "doc_id", "text").collect()}
    mh_e = {tuple(r) for r in
            dedup._minhash_signatures_expr(documents, "doc_id", "text").collect()}
    assert mh_k == mh_e
    sh_k = {tuple(r) for r in
            dedup.simhash_signatures(documents, "doc_id", "text").collect()}
    sh_e = {tuple(r) for r in
            dedup._simhash_signatures_expr(documents, "doc_id", "text").collect()}
    assert sh_k == sh_e


def test_dup_clusters_chain_and_components(spark):
    """Chains must collapse to the minimum id (pointer doubling), and
    disjoint components must stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),   # chain 1-2-3-4-5
         (10, 11), (11, 12), (10, 12),     # triangle
         (20, 21)],                        # isolated pair
        ["id_a", "id_b"])
    got = {r.id: r.cluster_id for r in dedup.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dup_clusters_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir mode (reliable df.checkpoint — survives executor loss
    at scale) must produce identical components to localCheckpoint mode."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    local = {r.id: r.cluster_id for r in dedup.dup_clusters(pairs).collect()}
    reliable = {r.id: r.cluster_id
                for r in dedup.dup_clusters(
                    pairs, checkpoint_dir=str(tmp_path / "ckpt")).collect()}
    assert reliable == local == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # the reliable mode actually wrote checkpoint data to the durable path
    import os
    assert any(os.scandir(tmp_path / "ckpt"))


def test_dedup_incremental_anti_join(spark):
    from mura_spark.operators.dedup import dedup_incremental
    from pyspark.sql import functions as F
    seen = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["id", "text"])
    new = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "BETA"), (13, "delta")],
        ["id", "text"])
    out = dedup_incremental(new, seen, F.md5(F.lower(F.col("text"))),
                            F.md5(F.lower(F.col("text"))))
    got = sorted(r.id for r in out.collect())
    # alpha and BETA (case-normalized) are already ingested
    assert got == [11, 13]
    # idempotent: re-running against the same snapshot changes nothing
    again = dedup_incremental(out, seen, F.md5(F.lower(F.col("text"))),
                              F.md5(F.lower(F.col("text"))))
    assert sorted(r.id for r in again.collect()) == got


def test_dedup_incremental_pruned_sorted_layout(spark, tmp_path):
    """The key-sorted seen-corpus layout + range pre-filter: (a) equal to
    the plain anti-join, (b) the range predicate reaches the parquet scan
    as PushedFilters, (c) the write_sorted layout gives disjoint per-file
    key ranges so the pushed range can only intersect a strict subset of
    the files — the footer-skipping evidence."""
    from pyspark.sql import functions as F

    from mura_spark.operators.dedup import (dedup_incremental,
                                            dedup_incremental_pruned)
    from mura_spark.sources.parquet import write_sorted

    # seen corpus: 800 rows keyed by a stored zero-padded content key
    seen_rows = [(i, f"k{i:05d}") for i in range(0, 1600, 2)]
    seen_df = spark.createDataFrame(seen_rows, ["id", "ck"])
    path = str(tmp_path / "seen_sorted")
    write_sorted(seen_df, path, ["ck"], n_files=8)
    seen = spark.read.parquet(path)

    # new batch confined to a narrow key band; half collide with seen
    new = spark.createDataFrame(
        [(1000 + i, f"k{i:05d}") for i in range(300, 340)], ["id", "ck"])
    key = F.col("ck")

    pruned = dedup_incremental_pruned(new, seen, key, "ck")
    plain = dedup_incremental(new, seen, key, key)
    assert (sorted(r.id for r in pruned.collect())
            == sorted(r.id for r in plain.collect())
            == [1000 + i for i in range(300, 340) if i % 2 == 1])

    # (b) range predicate pushed into the seen scan
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThanOrEqual(ck," in plan and "LessThanOrEqual(ck," in plan

    # (c) layout evidence: per-file footer ranges are pairwise disjoint and
    # the batch's [lo, hi] intersects only a strict subset of the files —
    # the row groups the reader can skip are exactly the other files'
    import os

    import pyarrow.parquet as pq
    ranges = []
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            stats = md.row_group(0).column(
                [md.schema.column(i).name
                 for i in range(md.num_columns)].index("ck")).statistics
            ranges.append((stats.min, stats.max))
    ranges.sort()
    assert len(ranges) == 8
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
    lo, hi = "k00300", "k00339"
    touched = [r for r in ranges if r[0] <= hi and r[1] >= lo]
    assert 1 <= len(touched) <= 2  # 39 keys of 800 → at most 2 of 8 files


def test_jaccard_cross_pairs_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    from mura_spark.functions import text as TX
    from mura_spark.operators.dedup import jaccard_cross_pairs, shingle_sets

    left = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different content with no overlap here"),
         (3, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"])
    right = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy cat"),
         (11, "alpha beta gamma delta epsilon zeta eta theta"),
         (12, "unrelated words entirely absent from the left side")],
        ["doc_id", "text"])
    got = {(r.id_a, r.id_b): round(r.jaccard, 6)
           for r in jaccard_cross_pairs(left, right, "doc_id", "text",
                                        threshold=0.5).collect()}
    # brute force over the full cross product
    ls = {r.doc_id: set(r.shset)
          for r in shingle_sets(left, "doc_id", "text", 3).collect()}
    rs = {r.doc_id: set(r.shset)
          for r in shingle_sets(right, "doc_id", "text", 3).collect()}
    want = {}
    for a, sa in ls.items():
        for b, sb in rs.items():
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                want[(a, b)] = round(j, 6)
    assert got == want
    assert (3, 11) in got and got[(3, 11)] == 1.0
    assert (1, 10) in got


def test_minhash_cross_pairs_equals_exact(spark, sf_dir):
    """The banded MinHash cross-corpus join must produce exactly the exact
    prefix-join's verified pairs on the real corpus (16x2 banding: miss
    probability < 1e-11 per true pair at J >= 0.8)."""
    from pyspark.sql import functions as F

    from mura_spark.operators.dedup import (jaccard_cross_pairs,
                                            minhash_cross_pairs)
    from mura_spark.suite.common import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 3 != 0)
    seen = docs.filter(F.col("doc_id") % 3 == 0)
    exact = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in
             jaccard_cross_pairs(new, seen, "doc_id", "text", 0.8).collect()}
    approx = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in
              minhash_cross_pairs(new, seen, "doc_id", "text", 0.8).collect()}
    assert approx == exact
    assert len(exact) > 0


# ------------------------------------------- sorted neighborhood (5gg)

def test_sorted_neighborhood_distributed_rank_and_window(spark):
    """The distributed rank (range partition + offsets) must reproduce
    the global-sort semantics: within a duplicate-key group, pairs at
    rank distance <= window are emitted, beyond it are not."""
    from mura_spark.operators.dedup import sorted_neighborhood_pairs
    rows = ([(i, "aaa") for i in range(6)]        # 6-way duplicate group
            + [(10, "bbb"), (11, "bbb")]          # adjacent pair
            + [(20, "ccc")])                      # singleton
    df = spark.createDataFrame(rows, "doc_id long, k string")
    got = {(r.id_a, r.id_b) for r in
           sorted_neighborhood_pairs(df, "doc_id", "k",
                                     window=3, partitions=4).collect()}
    # 'aaa' ranks 1..6 by id: pairs with distance <= 3 only
    want = {(a, b) for a in range(6) for b in range(6)
            if 0 < b - a <= 3}
    want.add((10, 11))
    assert got == want


def test_sorted_neighborhood_rejects_bad_window(spark):
    import pytest as pt
    from mura_spark.operators.dedup import sorted_neighborhood_pairs
    df = spark.createDataFrame([(1, "x")], "doc_id long, k string")
    with pt.raises(ValueError):
        sorted_neighborhood_pairs(df, "doc_id", "k", window=0)


def test_positional_filter_keeps_boundary_exact_pairs(spark):
    """PPJoin positional-filter losslessness at the float boundary: pairs
    whose Jaccard is EXACTLY the threshold (where a naive float comparison
    in the pruning bound could misdrop) must survive the filtered miner.
    J(1,2) = 1/2 exactly; J(3,4) = 4/5 exactly (shingle containment chains
    over word 3-grams)."""
    rows = [
        (1, "a b c"),                    # 1 shingle
        (2, "a b c d"),                  # 2 shingles, inter 1, union 2
        (3, "t1 t2 t3 t4 t5 t6 t7"),     # 5 shingles
        (4, "t1 t2 t3 t4 t5 t6"),        # 4 shingles ⊂ doc 3's
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    at_05 = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.jaccard_dup_pairs(df, "doc_id", "text",
                                              threshold=0.5).collect()}
    assert at_05[(1, 2)] == 0.5
    at_08 = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.jaccard_dup_pairs(df, "doc_id", "text",
                                              threshold=0.8).collect()}
    assert at_08[(3, 4)] == 0.8
    assert (1, 2) not in at_08          # below threshold stays dropped


def test_cross_positional_filter_keeps_boundary_exact_pairs(spark):
    """jaccard_cross_pairs' positional filter at the float boundary: a
    (left, right) pair with Jaccard EXACTLY the threshold must survive.
    Same corpus split as the self-join pin: J = 1/2 exactly at t=0.5,
    and the 4/5-exact pair pins t=0.8 across corpora too."""
    from mura_spark.operators.dedup import jaccard_cross_pairs
    left = spark.createDataFrame(
        [(1, "a b c"), (3, "t1 t2 t3 t4 t5 t6 t7")], ["doc_id", "text"])
    right = spark.createDataFrame(
        [(2, "a b c d"), (4, "t1 t2 t3 t4 t5 t6")], ["doc_id", "text"])
    at_05 = {(r.id_a, r.id_b): r.jaccard
             for r in jaccard_cross_pairs(left, right, "doc_id", "text",
                                          threshold=0.5).collect()}
    assert at_05[(1, 2)] == 0.5
    at_08 = {(r.id_a, r.id_b): r.jaccard
             for r in jaccard_cross_pairs(left, right, "doc_id", "text",
                                          threshold=0.8).collect()}
    assert at_08[(3, 4)] == 0.8
    assert (1, 2) not in at_08


def test_containment_positional_filter_boundary(spark):
    """Contained-side positional filter keeps a containment == threshold
    pair: doc 1 has 10 shingles, 9 of them inside doc 2 → exactly 0.9."""
    from mura_spark.operators.dedup import containment_pairs
    c_tokens = " ".join(f"u{i}" for i in range(12))    # 10 shingles
    o_tokens = " ".join(f"u{i}" for i in range(11)) + " z1 z2 z3 z4"
    df = spark.createDataFrame([(1, c_tokens), (2, o_tokens)],
                               ["doc_id", "text"])
    got = {(r.contained_id, r.container_id): r.containment
           for r in containment_pairs(df, "doc_id", "text",
                                      threshold=0.9).collect()}
    assert got.get((1, 2)) == 0.9
