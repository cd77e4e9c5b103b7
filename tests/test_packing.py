"""Sequence-packing tests: invariants of both packing semantics plus
determinism under input repartitioning."""

import pytest
from pyspark.sql import functions as F

from mura_spark.operators import packing


@pytest.fixture(scope="module")
def sized(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(200)]  # sizes 10..99
    return spark.createDataFrame(rows, ["doc_id", "sz"])


def test_pack_chunks_reassembles_exactly(sized):
    """Per (shard, chunk): spans sum to exactly the budget for every chunk
    except each shard's last, and per document the spans cover [0, sz)."""
    budget = 128
    out = packing.pack_chunks(sized, "doc_id", "sz", budget).collect()
    by_chunk, by_doc = {}, {}
    for r in out:
        assert 0 <= r.tok_start < r.tok_end  # non-empty, doc-local
        by_chunk.setdefault((r.shard, r.chunk_id), 0)
        by_chunk[(r.shard, r.chunk_id)] += r.tok_end - r.tok_start
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.tok_start,
                                                r.tok_end))
    last_chunk = {}
    for (shard, chunk), _ in by_chunk.items():
        last_chunk[shard] = max(last_chunk.get(shard, -1), chunk)
    for (shard, chunk), tot in by_chunk.items():
        if chunk < last_chunk[shard]:
            assert tot == budget, (shard, chunk, tot)
        else:
            assert 0 < tot <= budget
    sizes = {r.doc_id: r.sz for r in sized.collect()}
    for doc, spans in by_doc.items():
        spans.sort()
        assert spans[0][1] == 0 and spans[-1][2] == sizes[doc]
        for (c1, _, e1), (c2, s2, _) in zip(spans, spans[1:]):
            assert c2 == c1 + 1 and s2 == e1  # contiguous, adjacent chunks


def test_pack_greedy_budget_and_order(sized):
    """No sequence exceeds the budget (sizes here are all < budget), fills
    are the running sums of an ascending-id walk, and a new sequence starts
    only when the previous could not fit the document."""
    budget = 128
    out = sorted(packing.pack_greedy(sized, "doc_id", "sz", budget).collect(),
                 key=lambda r: (r.shard, r.doc_id))
    sizes = {r.doc_id: r.sz for r in sized.collect()}
    prev = {}
    for r in out:
        sz = sizes[r.doc_id]
        if r.shard not in prev:
            assert r.seq_id == 0 and r.seq_fill == sz
        else:
            p = prev[r.shard]
            if p.seq_fill + sz > budget:
                assert r.seq_id == p.seq_id + 1 and r.seq_fill == sz
            else:
                assert r.seq_id == p.seq_id and r.seq_fill == p.seq_fill + sz
        assert r.seq_fill <= budget
        prev[r.shard] = r


def test_pack_greedy_oversized_doc_gets_own_sequence(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 500), (3, 60)], ["doc_id", "sz"])
    out = {r.doc_id: r for r in
           packing.pack_greedy(df, "doc_id", "sz", budget=128,
                               n_shards=1).collect()}
    assert out[2].seq_fill == 500  # never split, own sequence
    assert len({r.seq_id for r in out.values()}) == 3  # 50 then 500 then 60


def test_packing_deterministic_under_repartition(sized):
    a = {tuple(r) for r in
         packing.pack_chunks(sized, "doc_id", "sz", 128).collect()}
    b = {tuple(r) for r in
         packing.pack_chunks(sized.repartition(7), "doc_id", "sz",
                             128).collect()}
    assert a == b
    c = {tuple(r) for r in
         packing.pack_greedy(sized, "doc_id", "sz", 128).collect()}
    d = {tuple(r) for r in
         packing.pack_greedy(sized.repartition(7), "doc_id", "sz",
                             128).collect()}
    assert c == d


def test_ngram_list_matches_shingle_normalization():
    from mura_spark.functions.text import ngram_list, shingle_list
    t = "The  quick   brown fox the quick brown"
    assert ngram_list(t, 2) == ["the quick", "quick brown", "brown fox",
                                "fox the", "the quick", "quick brown"]
    # distinct(ngrams) == shingles (same normalize/window)
    assert list(dict.fromkeys(ngram_list(t, 3))) == shingle_list(t, 3)
    assert ngram_list(None) is None
    assert ngram_list("one") == ["one"]


def test_chunk_overlap_tiling(sized):
    """Every chunk except the last is exactly `chunk` tokens, consecutive
    chunks overlap by exactly `overlap`, and the union of spans covers
    [0, sz) with no chunk past the end."""
    chunk, overlap = 32, 8
    out = packing.chunk_overlap(sized, "doc_id", "sz", chunk, overlap)
    rows = {}
    for r in out.collect():
        rows.setdefault(r.doc_id, []).append((r.chunk_idx, r.tok_start,
                                              r.tok_end))
    sizes = {r.doc_id: r.sz for r in sized.collect()}
    assert set(rows) == set(sizes)
    for doc, spans in rows.items():
        spans.sort()
        sz = sizes[doc]
        assert spans[0][1] == 0
        assert spans[-1][2] == sz
        assert [s[0] for s in spans] == list(range(len(spans)))
        for (_, s0, e0), (_, s1, e1) in zip(spans, spans[1:]):
            assert e0 - s0 == chunk           # only the last may be short
            assert s1 == s0 + (chunk - overlap)
        assert all(e <= sz and e > s for _, s, e in spans)
        if sz <= chunk:
            assert len(spans) == 1


def test_chunk_overlap_rejects_bad_overlap(sized):
    with pytest.raises(ValueError):
        packing.chunk_overlap(sized, "doc_id", "sz", 32, 32)


def test_global_stream_offsets_match_global_window(spark):
    """The bucketed distributed prefix sum equals the single global window
    it replaces, under any input partitioning, including bucket-boundary
    and sparse-key layouts."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mura_spark.operators.packing import (assign_token_shards,
                                              global_stream_offsets)

    rows = [(i * 7 + 3, (i * 13) % 41 + 1) for i in range(257)]  # sparse ids
    df = spark.createDataFrame(rows, ["doc_id", "sz"]).repartition(11)
    got = {r.doc_id: (r.n_tokens, r.stream_start)
           for r in global_stream_offsets(df, "doc_id", "sz",
                                          n_buckets=8).collect()}
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    ref = {r.doc_id: (r.sz, r.off) for r in df.select(
        "doc_id", "sz",
        F.coalesce(F.sum("sz").over(w), F.lit(0)).alias("off")).collect()}
    assert got == ref

    shards = {r.doc_id: r.shard_id
              for r in assign_token_shards(df, "doc_id", "sz", budget=100,
                                           n_buckets=8).collect()}
    assert shards == {d: off // 100 for d, (_, off) in ref.items()}
    # shards are contiguous ranges of the stream order: non-decreasing ids
    ordered = [shards[d] for d in sorted(shards)]
    assert ordered == sorted(ordered)


def test_global_stream_offsets_empty_input(spark):
    from mura_spark.operators.packing import global_stream_offsets
    df = spark.createDataFrame([], "doc_id long, sz long")
    out = global_stream_offsets(df, "doc_id", "sz")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "stream_start"]
