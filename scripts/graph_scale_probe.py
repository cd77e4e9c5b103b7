#!/usr/bin/env python
"""Linear-in-edges scaling law for the iterative graph family.

PageRank, label propagation, and connected components run one
node-keyed join + one reduce per round — so their wall time must track
the EDGE COUNT, not blow up superlinearly, as the graph grows. This
probe pins that mechanically (the graph sibling of
``tests/test_scale_law.py``'s pair-mining law and
``scripts/view_scale_probe.py``'s O(delta) view law):

- derive the sf0.01 co-purchase edge list once (same derivation as the
  ``graph_*`` suite queries);
- replicate it K× with node-id offsets — K disjoint copies of the
  SAME graph, so rounds-to-converge stays constant while edges grow
  exactly K× (the clean isolation of per-round cost from structure);
- time ``pagerank(iterations=3)`` and ``label_propagation(rounds=2)``
  at each K and assert sec/Medge is flat-to-falling (slack 1.6× for
  local-mode timing noise).

A K=min warmup runs first so JVM/code-path warmup never lands in the
first measured point. Emits ``GRAPHSCALE.json`` at the repo root as
the per-round artifact. Run::

    python scripts/graph_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_SF = "/root/testdata/sf0.01"
SCALES = [4, 16]
SLACK = 1.6


def main() -> int:
    from pyspark.sql import functions as F

    from mura_spark import get_spark
    from mura_spark.operators import graph
    from mura_spark.suite.graph_q import _copurchase_edges

    spark = get_spark()
    base = _copurchase_edges(spark, PROBE_SF).localCheckpoint(eager=True)
    n_edges = base.count()
    max_id = base.agg(F.greatest(F.max("src"), F.max("dst"))).first()[0]

    def replicated(k: int):
        parts = [base.select(
            (F.col("src") + F.lit(i * (max_id + 1))).alias("src"),
            (F.col("dst") + F.lit(i * (max_id + 1))).alias("dst"))
            for i in range(k)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint(eager=True)

    def timed(fn, edges) -> float:
        t0 = time.monotonic()
        fn(edges).count()
        return round(time.monotonic() - t0, 3)

    ops = {
        "pagerank3": lambda e: graph.pagerank(e, iterations=3),
        "label_prop2": lambda e: graph.label_propagation(e, rounds=2),
    }

    # warmup at the smallest K (not recorded)
    warm = replicated(SCALES[0])
    for fn in ops.values():
        fn(warm).count()

    results: dict[str, dict[int, float]] = {name: {} for name in ops}
    for k in SCALES:
        edges = replicated(k)
        for name, fn in ops.items():
            results[name][k] = timed(fn, edges)
        edges.unpersist()

    kmin, kmax = SCALES[0], SCALES[-1]
    out = {"probe": "graph_scale", "probe_sf": PROBE_SF,
           "base_edges": n_edges, "ks": SCALES, "ops": {}}
    ok_all = True
    for name, ts in results.items():
        per_medge = {k: ts[k] / (n_edges * k / 1e6) for k in SCALES}
        ratio = per_medge[kmax] / per_medge[kmin]
        ok = ratio <= SLACK
        ok_all = ok_all and ok
        out["ops"][name] = {
            "sec": {str(k): ts[k] for k in SCALES},
            "sec_per_medge": {str(k): round(per_medge[k], 3)
                              for k in SCALES},
            "law_ratio": round(ratio, 3), "flat_law_ok": ok}
    out["flat_law_ok"] = ok_all
    print(json.dumps(out))
    with open(os.path.join(REPO, "GRAPHSCALE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
