#!/usr/bin/env python
"""Order-reversed, per-query variant of aqe_shj_threshold_probe (the
'on' arm runs FIRST each trial so session warming favors 'off')."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

PANEL = [
    "text_burrows_delta", "ann_ivf_recall_at10", "emb_silhouette",
    "dedup_editdist_pairs", "graph_rich_club", "sample_negative_pairs",
    "stats_spearman_qty_discount", "emb_pca_project", "emb_top_pc",
    "sample_split_leak_safe",
]


def main():
    from mura_spark.session import get_spark
    from mura_spark.suite import SPARK_QUERIES

    spark = get_spark("aqe-shj-ab2")
    spark.sparkContext.setLogLevel("ERROR")
    SPARK_QUERIES["scan_region"](spark, SF).count()

    per = {}
    for trial in range(4):
        for mode, val in (("on128m", str(128 * 1024 * 1024)), ("off", "0")):
            spark.conf.set(KEY, val)
            for name in PANEL:
                spark.sparkContext.setJobDescription(
                    f"{mode} {name} t{trial}")
                t0 = time.time()
                SPARK_QUERIES[name](spark, SF).write.mode(
                    "overwrite").format("noop").save()
                per.setdefault((name, mode), []).append(time.time() - t0)
    spark.conf.set(KEY, "0")
    tot = {"on128m": 0.0, "off": 0.0}
    for name in PANEL:
        row = []
        for mode in ("off", "on128m"):
            ts = sorted(per[(name, mode)])
            med = ts[len(ts) // 2]
            tot[mode] += med
            row.append(f"{mode} med {med:5.2f} (min {min(ts):5.2f})")
        print(f"{name:30s} " + "  ".join(row))
    print("panel median totals:", {k: round(v, 2) for k, v in tot.items()})


if __name__ == "__main__":
    main()

