"""End-to-end training-data pipeline over the REAL documents corpus:
every major subsystem composed in the order a production run uses
them — versioned ingest with quality gates → DML purge → exact dedup
→ materialized rollup refreshed through the change feed → BPE vocab →
shard planning → CDC mirror → bloom needle lookup. The point is that
the pieces COMPOSE: each stage's assertion is stated against the
previous stage's table state, not against fixtures."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mura_spark.operators.bpe import bpe_encode, train_bpe
from mura_spark.operators.dedup import exact_dedup, exact_dup_groups
from mura_spark.operators.packing import assign_token_shards
from mura_spark.sources.incremental_view import IncrementalAggView
from mura_spark.sources.table_format import MuraTable

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")


def test_full_training_data_pipeline(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_raw = docs.count()

    # 1) versioned ingest: constraints gate garbage at write time,
    #    blooms index the id, CDF records row-level history
    corpus = MuraTable.create(
        spark, str(tmp_path / "corpus"), docs.repartition(8, "doc_id"),
        bloom_cols=["doc_id"],
        constraints={"id_set": "doc_id IS NOT NULL",
                     "chars_sane": "n_chars >= 0"},
        cdf=True)
    assert corpus.row_count() == n_raw

    # 2) rollup BEFORE the purges — must follow them incrementally
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), corpus, keys=["lang"],
        aggs={"n_docs": ("count", "doc_id"),
              "chars": ("sum", "n_chars")})

    # 3) quality purge: short documents go (GDPR-delete shape)
    v, n_purged, _files = corpus.delete_where("n_chars < 100")
    assert n_purged > 0

    # 4) exact dedup: keep one doc per identical text, drop the rest
    cur = corpus.read()
    losers = (cur.join(exact_dedup(cur, "doc_id", F.col("text"))
                       .select("doc_id"), "doc_id", "left_anti")
              .select("doc_id"))
    n_losers = losers.count()
    if n_losers:
        corpus.merge(cur.join(losers, "doc_id", "left_semi"),
                     key_cols=["doc_id"], when_matched="delete",
                     insert_not_matched=False)
    n_clean = corpus.row_count()
    assert n_clean == n_raw - n_purged - n_losers
    # dedup is idempotent: no duplicate text remains
    assert (exact_dup_groups(corpus.read(), "doc_id", F.col("text"))
            .where(F.col("group_size") > 1).count()) == 0

    # 5) the rollup refreshes INCREMENTALLY through the purges (signed
    #    feed deltas) and equals a from-scratch aggregate
    r = view.refresh()
    assert r.mode == "incremental" and not r.reason
    got = {(x.lang, x.n_docs, x.chars)
           for x in view.read().collect()}
    want = {(x.lang, x.n_docs, x.chars)
            for x in corpus.read().groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("chars")).collect()}
    assert got == want

    # 6) learn a BPE vocab on the clean corpus and budget the tokens
    merges = train_bpe(corpus.read(), num_merges=80)
    assert len(merges) > 20
    counts = bpe_encode(corpus.read(), merges, tokens_out=False)
    assert counts.count() == n_clean
    shards = assign_token_shards(counts, order_col="doc_id",
                                 size_col="n_tokens", budget=4096)
    n_tokens = counts.agg(F.sum("n_tokens")).collect()[0][0]
    n_shards = shards.select("shard_id").distinct().count()
    # every shard holds ~budget tokens (± one document)
    assert n_shards >= max(1, n_tokens // 4096)
    assert shards.count() == n_clean

    # 7) CDC-mirror the curated corpus (exactly-once replication)
    from mura_spark.sources.table_stream import (register,
                                                 replicate_changes)
    register(spark)
    mirror = MuraTable.create(spark, str(tmp_path / "mirror"),
                              docs.limit(0))
    replicate_changes(spark, str(tmp_path / "corpus"), mirror,
                      ["doc_id"], str(tmp_path / "ckpt")) \
        .awaitTermination(180)
    assert mirror.row_count() == n_clean
    assert ({r.doc_id for r in mirror.read().select("doc_id").collect()}
            == {r.doc_id for r in
                corpus.read().select("doc_id").collect()})

    # 8) needle lookup: one surviving document by id opens a strict
    #    subset of the files (bloom pruning on real data)
    some = corpus.read().select("doc_id").limit(1).collect()[0][0]
    hit = corpus.read(lookup={"doc_id": some})
    assert len(hit.inputFiles()) < len(corpus.read().inputFiles())
    assert hit.where(F.col("doc_id") == some).count() == 1

    # 9) the audit trail survives it all: history names every stage
    actions = [m["action"] for m in corpus.history()]
    assert actions[0] == "create" and "delete" in actions
    assert corpus.read(version=1).count() == n_raw  # time travel
