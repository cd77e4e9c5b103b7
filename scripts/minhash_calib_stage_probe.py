#!/usr/bin/env python
"""Stage-cost localization for dedup_minhash_calibration (round 10 opt).

Times each pipeline prefix with the noop sink, interleaved twice, so we
know which stage owns the wall clock before restructuring anything.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mura_spark.session import get_spark  # noqa: E402
from mura_spark.suite.common import table  # noqa: E402
from mura_spark.operators import dedup  # noqa: E402
from mura_spark.operators.dedup import (  # noqa: E402
    _explode_sets, _verify_jaccard, shingle_sets)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main():
    spark = get_spark("minhash-calib-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, SF, "documents")
    d.count()  # warm

    threshold = 0.5
    stages = {}

    def build():
        sets = shingle_sets(d, "doc_id", "text", 3)
        ex = _explode_sets(sets, "doc_id")
        from pyspark.sql.window import Window
        dfreq2 = (ex.groupBy("shingle")
                  .agg(F.count(F.lit(1)).alias("__df"))
                  .filter(F.col("__df") >= 2))
        w = Window.partitionBy("doc_id").orderBy("__df", "shingle")
        prefix_len = (F.col("n_shingles")
                      - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1)
        probe = (ex.join(dfreq2, "shingle")
                 .withColumn("__pos", F.row_number().over(w))
                 .filter(F.col("__pos") <= prefix_len)
                 .select("doc_id", "n_shingles", "shingle"))
        a = probe.select(F.col("doc_id").alias("id_a"),
                         F.col("n_shingles").alias("n_a"), "shingle")
        b = probe.select(F.col("doc_id").alias("id_b"),
                         F.col("n_shingles").alias("n_b"), "shingle")
        from mura_spark.operators.dedup import _length_compatible
        cand = (a.join(b, "shingle")
                .filter((F.col("id_a") < F.col("id_b"))
                        & _length_compatible(threshold))
                .select("id_a", "id_b").distinct())
        pairs = (_verify_jaccard(sets, "doc_id", cand)
                 .filter(F.col("jaccard") >= threshold))
        return sets, ex, dfreq2, probe, cand, pairs

    for trial in range(2):
        sets, ex, dfreq2, probe, cand, pairs = build()
        for name, df in [("1_sets", sets), ("2_ex", ex),
                         ("3_dfreq2", dfreq2), ("4_probe", probe),
                         ("5_cand", cand), ("6_pairs", pairs)]:
            spark.sparkContext.setJobDescription(f"{name} t{trial}")
            el = noop(df)
            stages.setdefault(name, []).append(el)
        # signatures + full query
        sigs = dedup.minhash_signatures(d, "doc_id", "text")
        spark.sparkContext.setJobDescription(f"7_sigs t{trial}")
        stages.setdefault("7_sigs", []).append(noop(sigs))
        from mura_spark.suite.dedup_q import dedup_minhash_calibration
        spark.sparkContext.setJobDescription(f"8_full t{trial}")
        stages.setdefault("8_full", []).append(
            noop(dedup_minhash_calibration(spark, SF)))

    for name, ts in sorted(stages.items()):
        print(f"{name:10s} " + " ".join(f"{t:6.2f}" for t in ts)
              + f"   min {min(ts):6.2f}")

    n_docs = d.count()
    emb = table(spark, SF, "embeddings")
    print("documents rows:", n_docs, " embeddings rows:", emb.count())


if __name__ == "__main__":
    main()
