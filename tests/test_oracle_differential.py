"""Oracle-differential test — the in-repo replica of the driver's t2 gate
at sf0.001 (full sweep at sf0.01 via scripts/check_oracle.py).

Every oracle-paired query in the suite must match DuckDB on row count,
column names, and order-insensitive values.
"""

import os
import subprocess
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_oracle import TABLES, norm_rows  # noqa: E402

from mura_spark.suite import ORACLE_SQL, SPARK_QUERIES  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = SPARK_QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLE_SQL[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    _, s_n = norm_rows(scols, srows)
    _, o_n = norm_rows(ocols, orows)
    assert s_n == o_n


def test_every_query_has_entry_or_documented_rows_only():
    rows_only = set(SPARK_QUERIES) - set(ORACLE_SQL)
    # approximate-by-design operators only
    assert rows_only == {"ann_topk_lsh", "ann_topk_ivf",
                         "sketch_distinct_users", "dedup_embedding_pairs_lsh",
                         "sketch_value_percentiles"}
