#!/usr/bin/env python
"""O(delta) scaling probe for IncrementalAggView.refresh.

The structural claim (pinned by tests/test_incremental_view.py's
file-read spy) is that an incremental refresh reads ONLY the files
added after the watermark. This probe pins the TIMING corollary: with a
FIXED-SIZE delta, refresh wall-time stays flat while the source table
grows K× — the refresh cost is a function of the delta, never the
table. For contrast it also times the full rebuild at each K, which
must grow ~linearly with K.

Method: seed a MuraTable with the sf0.1 orders replicated K times
(o_orderkey shifted per replica so keys stay unique), create the
priority-rollup view, append ONE fixed sf0.01-sized batch, time
refresh() (incremental path), then time a from-scratch
IncrementalAggView.create (full aggregate) on the grown table. A K=1
warmup pipeline runs first so JVM/code-path warmup doesn't land in the
first measured point. Prints one JSON line:

    {"probe": "view_scale", "ks": [...], "refresh_s": {...},
     "rebuild_s": {...}, "refresh_growth": x, "rebuild_growth": y,
     "flat_law_ok": bool}

The law is FLATNESS: refresh(K_max) ≤ 1.5 × refresh(K_min) while the
table grows K_max× (observed locally: 1.02× at 32× growth). The
rebuild time is reported for contrast — it grows with the table, but
at local scales a 5-group full aggregate stays cheap in absolute
terms; the refresh's ~2 s floor is merge-commit machinery, and the
refresh-beats-rebuild crossover sits where a full scan costs more
than that floor (i.e., the real-cluster regime this is designed for,
not a local toy).

Usage::

    python scripts/view_scale_probe.py [out_root]

Default out_root=/tmp/mura_view_scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
DELTA_SF = "/root/testdata/sf0.01"
SCALES = [1, 8, 32]

AGGS = {"n_orders": ("count", "o_orderkey"),
        "total_price_sum": ("sum", "o_totalprice"),
        "first_order": ("min", "o_orderdate"),
        "last_order": ("max", "o_orderdate")}


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mura_view_scale"
    from pyspark.sql import functions as F

    from mura_spark import get_spark
    from mura_spark.sources.incremental_view import IncrementalAggView
    from mura_spark.sources.table_format import MuraTable

    spark = get_spark()
    orders = spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
    max_id = orders.agg(F.max("o_orderkey")).collect()[0][0]

    def replicated(k: int):
        parts = [orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * (max_id + 1)))
            for i in range(k)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # fixed-size delta (sf0.01 ~ 10% of one replica), keys never collide
    delta = (spark.read.parquet(os.path.join(DELTA_SF, "orders.parquet"))
             .withColumn("o_orderkey",
                         F.col("o_orderkey") + F.lit(10**12)))

    # fixed-size DML: deletes land ONLY in the appended delta's key
    # range, so footer-stats pruning bounds the COW rewrite and the
    # CDF sidecar regardless of K
    DML_PRED = (f"o_orderkey >= {10**12} "
                f"AND o_orderkey < {10**12 + 5000}")
    SUB_AGGS = {"n_orders": ("count", "o_orderkey"),
                "total_price_sum": ("sum", "o_totalprice")}

    def one_point(k: int, root: str):
        shutil.rmtree(root, ignore_errors=True)
        src = MuraTable.create(spark, os.path.join(root, "src"),
                               replicated(k), cdf=True)
        view = IncrementalAggView.create(
            spark, os.path.join(root, "view"), src,
            keys=["o_orderpriority"], aggs=AGGS)
        src.append(delta)
        t0 = time.monotonic()
        r = view.refresh()
        dt_refresh = round(time.monotonic() - t0, 3)
        assert r.mode == "incremental", r
        t0 = time.monotonic()
        IncrementalAggView.create(spark, os.path.join(root, "rebuild"),
                                  src, keys=["o_orderpriority"],
                                  aggs=AGGS)
        dt_rebuild = round(time.monotonic() - t0, 3)
        # DML law: a subtractable view refreshes a fixed-size DELETE
        # through the row-level feed at flat cost as the table grows
        view2 = IncrementalAggView.create(
            spark, os.path.join(root, "view2"), src,
            keys=["o_orderpriority"], aggs=SUB_AGGS)
        src.delete_where(DML_PRED)
        t0 = time.monotonic()
        r2 = view2.refresh()
        dt_dml = round(time.monotonic() - t0, 3)
        assert r2.mode == "incremental" and not r2.reason, r2
        return dt_refresh, dt_rebuild, dt_dml

    one_point(1, os.path.join(out_root, "warmup"))  # JVM/code warmup

    refresh_s, rebuild_s, dml_refresh_s = {}, {}, {}
    for k in SCALES:
        refresh_s[k], rebuild_s[k], dml_refresh_s[k] = one_point(
            k, os.path.join(out_root, f"k{k}"))

    kmin, kmax = SCALES[0], SCALES[-1]
    flat = refresh_s[kmax] <= 1.5 * refresh_s[kmin]
    dml_flat = dml_refresh_s[kmax] <= 1.5 * dml_refresh_s[kmin]
    result = {"probe": "view_scale", "ks": SCALES,
              "refresh_s": refresh_s, "rebuild_s": rebuild_s,
              "dml_refresh_s": dml_refresh_s,
              "refresh_growth":
                  round(refresh_s[kmax] / refresh_s[kmin], 3),
              "rebuild_growth":
                  round(rebuild_s[kmax] / rebuild_s[kmin], 3),
              "dml_refresh_growth":
                  round(dml_refresh_s[kmax]
                        / dml_refresh_s[kmin], 3),
              "flat_law_ok": flat,
              "dml_flat_law_ok": dml_flat}
    print(json.dumps(result))
    # per-round artifact next to SCALELAW.json (the pair-mining law):
    # a reviewer reads the committed numbers, not a transcript
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "VIEWSCALE.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
