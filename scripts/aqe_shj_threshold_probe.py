#!/usr/bin/env python
"""Interleaved A/B: spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold.

Unlike the REJECTED plan-time preferSortMergeJoin=false (round-10 change
#3), this is AQE's RUNTIME rewrite: a sort-merge join becomes shuffled-
hash only when every post-shuffle partition measures below the
threshold — per-partition-gated, so large joins keep SMJ at any scale.

Query panel mixes the SMJ-heavy rows with the stats/emb shapes that
regressed under the plan-time flip. Conf toggled per trial via
spark.conf.set (runtime-settable), median of 4 interleaved trials.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

PANEL = [
    "text_burrows_delta",        # 10 SMJ
    "ann_ivf_recall_at10",       # 8 SMJ
    "emb_silhouette",            # 4 SMJ
    "dedup_editdist_pairs",      # 2 SMJ
    "graph_rich_club",           # 2 SMJ
    "sample_negative_pairs",     # 4 SMJ
    "stats_spearman_qty_discount",  # regressed under the plan-time flip
    "emb_pca_project",           # stats/PCA family canary
    "emb_top_pc",
    "sample_split_leak_safe",    # dedup family canary
]


def main():
    from mura_spark.session import get_spark
    from mura_spark.suite import SPARK_QUERIES

    spark = get_spark("aqe-shj-ab")
    spark.sparkContext.setLogLevel("ERROR")
    SPARK_QUERIES["scan_region"](spark, SF).count()

    res = {}
    for trial in range(4):
        for mode, val in (("off", "0"), ("on128m", str(128 * 1024 * 1024))):
            spark.conf.set(KEY, val)
            t0 = time.time()
            for name in PANEL:
                spark.sparkContext.setJobDescription(
                    f"{mode} {name} t{trial}")
                SPARK_QUERIES[name](spark, SF).write.mode(
                    "overwrite").format("noop").save()
            res.setdefault(mode, []).append(time.time() - t0)
    spark.conf.set(KEY, "0")
    for mode, ts in res.items():
        s = sorted(ts)
        print(f"{mode:8s} " + " ".join(f"{t:6.2f}" for t in ts)
              + f"  median {s[len(s)//2]:6.2f} min {min(ts):6.2f}")


if __name__ == "__main__":
    main()
