"""Edit-distance and containment join semantics, pinned against
brute-force pure-Python references (losslessness of the prune paths)."""

from __future__ import annotations

import itertools

import pytest


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the old river bank plaza"),  # tail edit
    (3, "the quick brown fox jumped over the lazy dog near the old river bank today"),  # mid edit
    (4, "a completely different sentence about distributed query engines and shuffles"),
    (5, "the quick brown fox jumps over the lazy dog near the old river bank today"),  # exact dup of 1
    (6, "short text under limit"),  # < 64 chars -> excluded from editdist domain
]


def test_editdist_pairs_lossless_vs_bruteforce(spark):
    from mura_spark.operators.editdist import editdist_pairs
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.dist
           for r in editdist_pairs(df, "doc_id", "text", max_dist=8,
                                   prefix_len=64).collect()}
    eligible = [(i, t[:64]) for i, t in _CORPUS if len(t) >= 64]
    want = {}
    for (ia, pa), (ib, pb) in itertools.combinations(eligible, 2):
        d = _lev(pa, pb)
        if d <= 8:
            want[(ia, ib)] = d
    assert got == want
    assert got, "fixture must produce at least one pair"


def test_editdist_rejects_infeasible_segmentation(spark):
    from mura_spark.operators.editdist import editdist_pairs
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        # 65 segments cannot each get a char of a 64-char prefix
        editdist_pairs(df, "doc_id", "text", max_dist=64, prefix_len=64)


def test_editdist_wide_threshold_still_lossless(spark):
    """Large max_dist relative to prefix length (2-char segments) —
    stresses the shift-window clamping at both string ends."""
    from mura_spark.operators.editdist import editdist_pairs
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.dist
           for r in editdist_pairs(df, "doc_id", "text", max_dist=30,
                                   prefix_len=64).collect()}
    eligible = [(i, t[:64]) for i, t in _CORPUS if len(t) >= 64]
    want = {}
    for (ia, pa), (ib, pb) in itertools.combinations(eligible, 2):
        d = _lev(pa, pb)
        if d <= 30:
            want[(ia, ib)] = d
    assert got == want


def _shingles(text: str, n: int = 3) -> set:
    toks = text.lower().split()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_containment_pairs_lossless_vs_bruteforce(spark):
    from mura_spark.operators.dedup import containment_pairs
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "intro words alpha beta gamma delta epsilon zeta eta theta "
            "and a long continuation that extends the document further"),
        (3, "totally unrelated content with no shared phrases here"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.contained_id, r.container_id): r.containment
           for r in containment_pairs(df, "doc_id", "text",
                                      threshold=0.9).collect()}
    want = {}
    for (ia, ta), (ib, tb) in itertools.permutations(docs, 2):
        sa, sb = _shingles(ta), _shingles(tb)
        c = len(sa & sb) / len(sa)
        if c >= 0.9:
            want[(ia, ib)] = pytest.approx(c)
    assert got == want
    # the asymmetry: 1 ⊂ 2 holds, 2 ⊄ 1
    assert (1, 2) in got and (2, 1) not in got
