#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values. Usage::

    python scripts/check_oracle.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Normalize a cell, PRESERVING the int-vs-float distinction.

    The driver's value hash is type-sensitive (112946 != 112946.0 there),
    while Python's == is not — so every numeric cell is tagged with its
    type family to make the local gate at least as strict as the driver's.
    Decimal is tagged as float: the suite convention surfaces all decimal
    arithmetic as DOUBLE on both engines before returning.

    Cells arrive from *pandas* frames (not fetchall) so the dtype quirks
    the driver sees are reproduced here — most importantly DuckDB
    HUGEINT (the result of SUM over any integer type) → float64, which
    is what broke events_sessionize / events_json_extract /
    pipeline_pretrain_prep in round 2 while the fetchall-based local
    gate stayed green.
    """
    import datetime
    import decimal

    import numpy as np
    import pandas as pd
    if v is None or v is pd.NaT or (
            isinstance(v, (float, np.floating)) and math.isnan(v)):
        # NaN folds into None: the pandas round-trip already conflates
        # float-column NULL with NaN on both engines, so the suite
        # convention is that queries never emit NaN as a data value.
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, decimal.Decimal):
        return ("float", float(v))
    if isinstance(v, (float, np.floating)):
        return ("float", float(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, np.ndarray):
        return ("ARRAY-CELL", tuple(norm_cell(x) for x in v))
    if isinstance(v, (list, tuple)):
        return ("ARRAY-CELL", tuple(norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    return (type(v).__name__, v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [c for _, c in sorted(zip(cols, cols))], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entrymod
    from mura_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = [tuple(r) for r in spdf.itertuples(index=False,
                                                       name=None)]
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        # Row-independent: detect array columns from the Spark schema, not
        # the first row (a leading NULL or empty result must not mask one).
        from pyspark.sql.types import ArrayType
        arrayish = [f.name for f in sdf.schema.fields
                    if isinstance(f.dataType, ArrayType)]
        if arrayish:
            # The driver's canonicalizer sort_values every column; list
            # cells are unhashable there and kill the whole row (this is
            # exactly how sketch_value_percentiles errored in r02).
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: array-typed output columns {arrayish} "
                  "(driver canonicalizer cannot sort list cells)")
            continue
        if name not in oracles:
            n_rowsonly += 1
            print(f"rows-only {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
            ocols = list(opdf.columns)
            orows = [tuple(r) for r in opdf.itertuples(index=False,
                                                       name=None)]
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        _, s_n = norm_rows(scols, srows)
        _, o_n = norm_rows(ocols, orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = s_n == o_n
        if ok_cols and ok_count and ok_vals:
            n_pass += 1
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: cols_match={ok_cols} "
                  f"count {len(srows)} vs {len(orows)} vals_match={ok_vals}")
            if ok_cols and ok_count and not ok_vals:
                diffs = [(a, b) for a, b in zip(s_n, o_n) if a != b][:3]
                for a, b in diffs:
                    print(f"   spark : {a}\n   oracle: {b}")
            elif not ok_cols:
                print(f"   spark cols : {sorted(scols)}")
                print(f"   oracle cols: {sorted(ocols)}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
