#!/usr/bin/env python
"""Composed training-data pipeline demo over the real documents corpus.

Runs the same flow `tests/test_pipeline_e2e.py` pins, at a configurable
scale, and prints ONE JSON line of stage metrics — the runnable
showcase that the subsystems compose: versioned ingest (constraints +
blooms + CDF) → DML quality purge → exact dedup → materialized rollup
refreshed INCREMENTALLY through the purges → BPE vocab + token shard
planning → CDC mirror replication → bloom needle lookup.

Usage::

    python scripts/pipeline_demo.py [sf_dir] [work_dir]

Defaults: sf_dir=$SPARK_GRAFT_SF_DIR_SMALL or /root/testdata/sf0.01,
work_dir=a temp dir (cleaned afterwards).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="mura_pipeline_")

    from pyspark.sql import functions as F

    from mura_spark import MuraTable, get_spark
    from mura_spark.operators.bpe import bpe_encode, train_bpe
    from mura_spark.operators.dedup import exact_dedup
    from mura_spark.operators.packing import assign_token_shards
    from mura_spark.sources.incremental_view import IncrementalAggView
    from mura_spark.sources.table_stream import (register,
                                                 replicate_changes)

    spark = get_spark("mura-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    out: dict = {"probe": "pipeline_demo", "sf_dir": sf_dir}
    t0 = time.monotonic()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = MuraTable.create(
        spark, os.path.join(work, "corpus"),
        docs.repartition(16, "doc_id"),
        bloom_cols=["doc_id"],
        constraints={"id_set": "doc_id IS NOT NULL"},
        cdf=True)
    out["ingested_rows"] = corpus.row_count()

    view = IncrementalAggView.create(
        spark, os.path.join(work, "view"), corpus, keys=["lang"],
        aggs={"n_docs": ("count", "doc_id"),
              "chars": ("sum", "n_chars")})

    _v, purged, _f = corpus.delete_where("n_chars < 100")
    out["quality_purged"] = purged

    cur = corpus.read()
    losers = (cur.join(exact_dedup(cur, "doc_id", F.col("text"))
                       .select("doc_id"), "doc_id", "left_anti")
              .select("doc_id"))
    n_losers = losers.count()
    if n_losers:
        corpus.merge(cur.join(losers, "doc_id", "left_semi"),
                     key_cols=["doc_id"], when_matched="delete",
                     insert_not_matched=False)
    out["dedup_removed"] = n_losers
    out["clean_rows"] = corpus.row_count()

    r = view.refresh()
    out["view_refresh_mode"] = r.mode  # must be "incremental"

    merges = train_bpe(corpus.read(), num_merges=300)
    out["bpe_merges"] = len(merges)
    counts = bpe_encode(corpus.read(), merges, tokens_out=False)
    out["total_tokens"] = counts.agg(F.sum("n_tokens")).collect()[0][0]
    shards = assign_token_shards(counts, order_col="doc_id",
                                 size_col="n_tokens", budget=65536)
    out["shards"] = shards.select("shard_id").distinct().count()

    mirror = MuraTable.create(spark, os.path.join(work, "mirror"),
                              docs.limit(0))
    q = replicate_changes(spark, os.path.join(work, "corpus"), mirror,
                          ["doc_id"], os.path.join(work, "ckpt"))
    if not q.awaitTermination(300):
        # don't report metrics from (or rmtree under) a live stream
        q.stop()
        raise RuntimeError("CDC mirror did not drain within 300s")
    out["mirror_rows"] = mirror.row_count()
    out["mirror_exact"] = mirror.row_count() == out["clean_rows"]

    some = corpus.read().select("doc_id").limit(1).collect()[0][0]
    hit = corpus.read(lookup={"doc_id": some})
    out["lookup_files"] = len(hit.inputFiles())
    out["total_files"] = len(corpus.read().inputFiles())

    out["wall_s"] = round(time.monotonic() - t0, 1)
    print(json.dumps(out))
    if len(sys.argv) <= 2:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
