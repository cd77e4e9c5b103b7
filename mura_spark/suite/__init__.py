"""The engine's query suite: every operator from SURVEY.md §2 (reference
parity), the Phase-2 relational gap operators, and the north-star extension
operators — each as a (Spark callable, DuckDB oracle SQL) pair.

Registry contract (mirrors ``__spark_entry__.py``):
- ``SPARK_QUERIES[name](spark, sf_dir) -> DataFrame``
- ``ORACLE_SQL[name]`` — equivalent ANSI SQL for DuckDB over the same
  parquet (absent for non-SQL-expressible ops → rows-only check).

Column names are aliased identically on both sides (the driver's comparator
sorts columns by name before hashing).
"""

from __future__ import annotations

from mura_spark.suite import (
    dedup_q,
    events_q,
    multimodal_q,
    packing_q,
    relational,
    similarity_q,
    sources_q,
    textops,
    tpch_more,
    tpch_ps,
)

# Registry order == the order the driver verifies queries in. Round 1's
# CORRECTNESS file stopped after the first 50 entries, leaving the entire
# extension surface driver-unverified, so the extension families
# (text / packing / sources / dedup / ANN / events / multimodal) now come
# FIRST and the reference-parity + relational-gap families (all
# driver-green in r01) last — whatever the driver's budget is, the
# least-verified queries get it.
_MODULES = [textops, packing_q, sources_q, dedup_q, similarity_q, events_q,
            multimodal_q, relational, tpch_more, tpch_ps]

SPARK_QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    for _name, _fn in _m.SPARK_QUERIES.items():
        if _name in SPARK_QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        SPARK_QUERIES[_name] = _fn
    ORACLE_SQL.update(_m.ORACLE_SQL)

_missing = set(ORACLE_SQL) - set(SPARK_QUERIES)
if _missing:
    raise ValueError(f"oracle without query: {sorted(_missing)}")
