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

_MODULES = [textops, packing_q, sources_q, dedup_q, similarity_q, events_q,
            multimodal_q, relational, tpch_more, tpch_ps]

# Registry order == the order the driver verifies queries in, and the driver
# checks only the FIRST 50 entries per round. Rounds 1-3 left exactly 20
# queries with zero driver rows (rotation put them past position 50 every
# time) and `scalar_functions` with only a failed r1 row (since fixed). Those
# 21 go first this round; the rest of the window is filled with queries whose
# only green row is from round 1; the families driver-green in r2/r3 go last.
_PRIORITY = [
    # never driver-verified (r1-r3 all stopped before these)
    "q2_min_cost_supplier", "q9_product_profit", "q11_important_stock",
    "q16_parts_supplier_count", "q20_promotion_parts",
    "q4_priority_exists", "q7_nation_volume", "q8_market_share",
    "q13_order_distribution", "q15_top_supplier", "q17_small_quantity",
    "q19_disjunctive_revenue", "q21_waiting_supplier", "q22_idle_customers",
    "window_lead_lag", "string_functions", "agg_grouping_sets",
    "column_positional", "mm_resize", "mm_frame_sample",
    # failed r1, fixed in r3, never driver-re-run
    "scalar_functions",
]

# Round-5 rotation note: once the round-4 driver run lands rows for the
# priority list above, promote the round-4 additions — events_enrich_users,
# dedup_incremental_new/near, pack_chunk_overlap, sample_global_shuffle,
# sample_weighted_quality, sample_k_per_lang, pipeline_finetune_prep,
# events_value_histogram — into the front window; they are local-green but
# sit past position 50 this round.

SPARK_QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    for _name, _fn in _m.SPARK_QUERIES.items():
        if _name in SPARK_QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        SPARK_QUERIES[_name] = _fn
    ORACLE_SQL.update(_m.ORACLE_SQL)

_missing_priority = [n for n in _PRIORITY if n not in SPARK_QUERIES]
if _missing_priority:
    raise ValueError(f"priority query not in registry: {_missing_priority}")
# Next tier: reference-parity/relational queries last verified in round 1.
_R1_ONLY = [n for n in relational.SPARK_QUERIES if n not in _PRIORITY]
_front = _PRIORITY + _R1_ONLY
SPARK_QUERIES = {**{n: SPARK_QUERIES[n] for n in _front},
                 **{n: f for n, f in SPARK_QUERIES.items() if n not in _front}}

_missing = set(ORACLE_SQL) - set(SPARK_QUERIES)
if _missing:
    raise ValueError(f"oracle without query: {sorted(_missing)}")
