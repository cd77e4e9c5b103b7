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
    analytics_q,
    dedup_q,
    events_q,
    graph_q,
    multimodal_q,
    packing_q,
    quality_q,
    relational,
    similarity_q,
    sources_q,
    stats_q,
    textops,
    tpch_more,
    tpch_ps,
)

_MODULES = [textops, packing_q, sources_q, dedup_q, similarity_q, events_q,
            graph_q, analytics_q, stats_q, quality_q,
            multimodal_q, relational, tpch_more, tpch_ps]

# Registry order == the order the driver verifies queries in, and the driver
# checks only the FIRST 50 entries per round. Round-10 rotation: the whole
# round-9 window came back green in CORRECTNESS_r09 (50/50 hash-match), so
# it rotates out and the window takes ALL 34 never-driver-verified
# queries (the 6kkk..6bbbb residue, the judge-ordered round-8/round-9
# additions, and the eight round-10 additions) — this drains the
# never-verified debt to ZERO — plus 16 re-verification backfill slots
# filled STALEST-FIRST (oldest last-green ledger, then registry order),
# exactly as scripts/rotate_window.py computes: all 16 last green in
# CORRECTNESS_r01 (the displaced r03 rows re-enter via the staleness
# policy below). The 5
# rows-only approximate queries stay pinned to the registry tail (their
# driver-facing signal is their deterministic companions).
#
# ROUND-11+ STALENESS POLICY (the debt is zero after this window lands, so
# every future window is pure re-verification unless new rows are added):
# each round, rotate the full 50-slot window onto the stalest-green rows —
# oldest last-green CORRECTNESS round first, registry order as the
# tie-break — via scripts/rotate_window.py. Never-driver-verified rows
# (new queries) always outrank re-verification and take the window head.
# At 50/round over ~394 registry rows the full re-verification cycle is
# ~8 rounds, bounding any row's staleness to that.
# tests/test_registry.py::test_window_prefers_stalest_rows enforces the
# ordering mechanically.
_PRIORITY = [
    # ---- never-driver-verified debt (31 rows — drains to zero) ----
    # round-6kkk: exactly-measured PQ asymmetric-distance recall
    "ann_pq_adc_recall_at10",
    # round-6lll: Hill heavy-tail index + rich-club coefficient
    "stats_hill_tail_index", "graph_rich_club",
    # round-6mmm: Burrows' Delta stylometric source distance
    "text_burrows_delta",
    # round-6nnn: within-session event-type affinity (lift)
    "events_type_affinity",
    # round-6ooo: clustering balance health check
    "emb_cluster_balance",
    # round-6ppp: TOST equivalence + circular time-of-day statistics
    "stats_tost_equivalence", "stats_circular_time_of_day",
    # round-6qqq: deterministic implicit-feedback negative sampling
    "sample_negative_pairs",
    # round-6rrr: attribution-window sensitivity + hashed feature cross
    "events_funnel_window_sensitivity", "feature_hash_cross",
    # round-6sss: naive-split leakage audit + Cohen's d effect size
    "audit_split_leakage", "stats_cohens_d_value",
    # round-6ttt: Qini uplift curve
    "stats_qini_curve",
    # round-6uuu: bivariate Mahalanobis outlier screen
    "stats_mahalanobis_outliers",
    # round-6vvv: confounder-adjusted partial correlation
    "stats_partial_corr",
    # round-6www: errors-in-variables Deming regression
    "stats_deming_qty_price",
    # round-6xxx: Kendall's tau-a between daily series
    "stats_kendall_tau_daily",
    # round-6yyy: pricing-integrity dispersion top-k
    "parts_price_dispersion_topk",
    # round-6zzz: event-time disorder / watermark-sizing audit
    "audit_event_disorder",
    # round-6aaaa: Ljung-Box whiteness test
    "stats_ljung_box_daily",
    # round-6bbbb: personalized churn-risk dormancy flags
    "orders_churn_risk_flags",
    # round-8a: the versioned-table format's first driver row — time
    # travel + COW DELETE snapshot reconciliation
    "table_time_travel_roundtrip",
    # round-8b: the BPE trainer's first driver row — recorded-golden
    # oracle over the deterministic merge table
    "bpe_top_merges",
    # round-9a: the CDF stack's first driver row — row-level
    # table_changes TVF replay vs a ground-truth delta replay
    "table_changes_replay",
    # round-9b: the streaming sink's first driver row — exactly-once
    # mura_table->mura_table stream with time-travel readback
    "table_stream_sink_roundtrip",
    # round-10a: the incremental materialized view's first driver row —
    # O(delta) refresh through BOTH fast paths (append file-diff + CDF
    # retraction), result == DuckDB's from-scratch rollup of the same
    # logical end state; the refresh modes ride as pinned literals
    "view_incremental_refresh",
    # round-10b: the SQL MERGE INTO router's first driver row — upsert
    # rollup + exact updated/deleted/inserted stats vs set algebra
    "merge_upsert_sql",
    # round-10c: CHECK constraints as write-time gates — violating
    # append fails without publishing; add-on-violating-rows refuses
    "table_constraints_gate",
    # round-10d: zero-copy CLONE independence — both sides mutate,
    # neither leaks into the other, clone time-travel reaches the
    # shared snapshot
    "table_clone_divergence",
    # round-10e: the maintenance lifecycle — compact (layout-only),
    # tag, restore (undoes an incident), vacuum (tag retention honored)
    "table_lifecycle_maintenance",
    # round-10f: bloom-filter equality pruning on the versioned table —
    # lookup rollup vs ground truth + pinned prunes-at-all and
    # prunes-strictly-more-than-minmax flags
    "table_bloom_lookup_skipping",
    # round-10g: ADD-COLUMN schema evolution — pre-evolution files read
    # the new column as typed NULL; unmerged-new-column and
    # type-change refusals ride as pinned flags
    "table_schema_evolution",
    # round-10h: idempotent transactional writes — txn-stamped replays
    # of append AND overwrite must commit nothing (the batch
    # exactly-once contract; the streaming-sink row pins the stream one)
    "table_txn_idempotent_writes",
    # ---- stalest-green backfill (16 rows; 9 rounds of engine change
    # since the r01 cohort was last driver-checked) ----
    "join_cross_small",  # backfill (r01)
    "setop_union",  # backfill (r01)
    "setop_intersect",  # backfill (r01)
    "setop_except",  # backfill (r01)
    "window_topk_per_group",  # backfill (r01)
    "window_running_sum",  # backfill (r01)
    "q6_revenue_change",  # backfill (r01)
    "q10_returned_items",  # backfill (r01)
    "q14_promo_share",  # backfill (r01)
    "q18_large_orders",  # backfill (r01)
    "agg_rollup",  # backfill (r01)
    "agg_cube",  # backfill (r01)
    "agg_pivot",  # backfill (r01)
    "agg_median",  # backfill (r01)
    "date_functions",  # backfill (r01)
    "subquery_scalar",  # backfill (r01)
]

#: Never-driver-verified overflow: EMPTY — the round-10 window above
#: absorbs the last 26 pre-existing debt rows AND the five round-10
#: additions (view_incremental_refresh, merge_upsert_sql,
#: table_constraints_gate, table_clone_divergence,
#: table_lifecycle_maintenance), which displaced the five
#: least-stale backfill slots per the
#: never-verified-outranks-backfill rule. Future new queries append
#: here and take the next window's head.
_NEXT_WINDOW = []

#: The approximate/rows-only queries: pinned to the registry tail (see
#: above). Their driver-facing correctness signal is the deterministic
#: companion row each gained in round 5.
_ROWS_ONLY_TAIL = [
    "ann_topk_lsh", "ann_topk_ivf", "dedup_embedding_pairs_lsh",
    "sketch_distinct_users", "sketch_value_percentiles",
]

SPARK_QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    for _name, _fn in _m.SPARK_QUERIES.items():
        if _name in SPARK_QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        SPARK_QUERIES[_name] = _fn
    ORACLE_SQL.update(_m.ORACLE_SQL)

_missing_priority = [n for n in _PRIORITY + _NEXT_WINDOW + _ROWS_ONLY_TAIL
                     if n not in SPARK_QUERIES]
if _missing_priority:
    raise ValueError(f"priority query not in registry: {_missing_priority}")
if len(_PRIORITY) != 50:
    raise ValueError(f"driver window must hold exactly 50 queries, "
                     f"got {len(_PRIORITY)}")
_tail = set(_ROWS_ONLY_TAIL)
_front = set(_PRIORITY) | set(_NEXT_WINDOW)
SPARK_QUERIES = {
    **{n: SPARK_QUERIES[n] for n in _PRIORITY + _NEXT_WINDOW},
    **{n: f for n, f in SPARK_QUERIES.items()
       if n not in _front and n not in _tail},
    **{n: SPARK_QUERIES[n] for n in _ROWS_ONLY_TAIL}}

_missing = set(ORACLE_SQL) - set(SPARK_QUERIES)
if _missing:
    raise ValueError(f"oracle without query: {sorted(_missing)}")
