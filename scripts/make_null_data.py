#!/usr/bin/env python
"""Build a NULL-injected copy of an sf test-data directory.

The driver's corpus has ZERO NULLs in any column, so every NULL-handling
path in the engine is latent until real data hits it. This script writes
a copy of the corpus with a deterministic ~5% of values nulled in the
non-key columns (measures, dimensions, text, dates, embeddings), so the
regular oracle sweep can be pointed at it::

    python scripts/make_null_data.py [src_sf_dir] [dst_dir]
    python scripts/check_oracle.py <dst_dir>

Spark and DuckDB then read the SAME nulled parquet — every hash mismatch
is a genuine cross-engine NULL-semantics divergence (NULLS FIRST/LAST
window defaults, kernel crashes on None, NaN-vs-NULL folds), not noise.

Injection is keyed on ``hash(primary_key, column_name)`` so the data is
reproducible for a given DuckDB version. Deliberately NOT nulled (the
v1 data contract — each is load-bearing for query semantics rather than
value arithmetic):

- primary/foreign keys (joins would silently shrink, hiding real bugs
  behind volume changes);
- ``events.ts`` and ``events.user_id`` (the time axis and session key
  of every windowed query — a null time axis is a malformed-feed
  problem, handled at ingest);
- ``orders.o_orderstatus`` (partition column of the versioned-table
  queries; null partition values are a separate surface);
- ``documents.doc_id`` / ``embeddings.vec_id``.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: table -> (key column used for the hash, [columns to null ~5% of])
PLAN = {
    "events": ("event_id", ["event_type", "value", "props"]),
    "orders": ("o_orderkey", ["o_orderpriority", "o_totalprice",
                              "o_orderdate"]),
    "lineitem": ("l_orderkey * 16 + l_linenumber",
                 ["l_quantity", "l_extendedprice", "l_discount",
                  "l_tax", "l_shipdate"]),
    "documents": ("doc_id", ["text", "lang", "source", "n_chars"]),
    "embeddings": ("vec_id", ["embedding"]),
    "customer": ("c_custkey", ["c_acctbal"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_retailprice"]),
    "nation": ("n_nationkey", []),
    "region": ("r_regionkey", []),
}

RATE_PCT = 5


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for tbl, (key, null_cols) in PLAN.items():
        src_p = f"{src}/{tbl}.parquet"
        if not os.path.exists(src_p):
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src_p}'").fetchall()]
        sel = []
        for c in cols:
            if c in null_cols:
                sel.append(
                    f"CASE WHEN hash(CAST(({key}) AS VARCHAR) "
                    f"|| '|{c}') % 100 < {RATE_PCT} "
                    f"THEN NULL ELSE \"{c}\" END AS \"{c}\"")
            else:
                sel.append(f'"{c}"')
        dst_p = f"{dst}/{tbl}.parquet"
        con.execute(f"COPY (SELECT {', '.join(sel)} FROM '{src_p}') "
                    f"TO '{dst_p}' (FORMAT PARQUET)")
        nulled = {}
        for c in null_cols:
            n = con.execute(
                f'SELECT COUNT(*) - COUNT("{c}") FROM \'{dst_p}\''
            ).fetchone()[0]
            nulled[c] = n
        print(f"{tbl}: {nulled or 'copied verbatim'}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mura_nulldata"
    build(src, dst)
