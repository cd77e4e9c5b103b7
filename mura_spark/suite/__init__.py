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
# checks only the FIRST 50 entries per round. Round-9 rotation: the whole
# round-8 window came back green in CORRECTNESS_r08 (50/50 hash-match), so
# it rotates out and the window is filled entirely from the head of the
# overflow that sat at positions 51+ last round (rounds 6jj..6jjj, oldest
# first, exactly as the round-8 plan ordered them) — never-driver-verified
# queries always outrank re-verification. The remaining overflow (24
# queries: the 6kkk..6bbbb residue plus the two judge-ordered round-8
# additions) stays contiguous at positions 51+ for round 10. The 5
# rows-only approximate queries stay pinned to the registry tail (their
# driver-facing signal is their deterministic companions).
_PRIORITY = [
    # round-6jj (second half): velocity screen
    "events_velocity_screen",
    # round-6kk: script-label audit + A/B power planner
    "text_script_mismatch", "stats_power_analysis",
    # round-6ll: SRE burn-rate monitor + feature hashing
    "events_error_budget_burn", "text_feature_hashing",
    # round-6mm: duplicate-payment audit + audio VAD segmentation
    "orders_duplicate_invoice_screen", "mm_audio_vad_segments",
    # round-6nn: SQL-scripting procedural surface
    "scripting_monthly_accumulator",
    # round-6oo: recursive-CTE Holt smoothing + linear forecast
    "events_holt_forecast",
    # round-6pp: seasonal index + next-event baseline accuracy
    "orders_seasonal_index", "events_markov_baseline_acc",
    # round-6qq: one-vs-rest KS drift per source + Simpson's-paradox
    # sign-reversal screen
    "text_ks_drift_by_source", "stats_simpson_screen",
    # round-6rr: blocking-quality meta-eval (reduction ratio + pair
    # completeness, exact truth) + time-weighted average value
    "dedup_blocking_quality", "events_twap_value",
    # round-6ss: YoY price/volume revenue bridge + lead-lag daily
    # cross-correlation
    "orders_revenue_bridge", "events_xcorr_lag",
    # round-6tt: stratum-adjusted pooled odds ratio + k-means
    # clustering-quality silhouette
    "stats_cmh_odds", "emb_silhouette",
    # round-6uu: near-dup cluster cohesion audit + PSI drift metric
    "dedup_cluster_cohesion", "events_psi_drift",
    # round-6vv: cumulative gains/lift table + split-conformal
    # threshold calibration for the quality scorer
    "text_quality_gains", "text_conformal_threshold",
    # round-6ww: MinHash estimator calibration curve + Wald–Wolfowitz
    # runs test
    "dedup_minhash_calibration", "stats_runs_test_daily",
    # round-6xx: header-vs-lines totals reconciliation + embedding
    # centroid drift monitor
    "audit_order_totals", "emb_centroid_drift",
    # round-6yy: empirical-Bayes rate shrinkage + domain importance
    # reweighting plan
    "stats_eb_shrinkage", "sample_importance_weights",
    # round-6zz: ADF unit-root pre-flight + open-order backlog aging
    "stats_adf_value_daily", "orders_backlog_aging",
    # round-6aaa: PK-uniqueness audit + Wilson-LCB supplier ranking
    "audit_primary_keys", "supplier_return_rate_lcb",
    # round-6bbb: GROUP BY ALL + collation surface pins
    "agg_group_by_all", "string_collation_filter",
    # round-6ccc: paired t-test + dedup token-savings report
    "stats_paired_ttest", "pipeline_dedup_savings",
    # round-6ddd: malformed-input recovery (CSV + JSONL PERMISSIVE)
    "csv_malformed_recovery", "jsonl_malformed_recovery",
    # round-6eee: small-files compaction report + pinball quantile eval
    "source_compaction_report", "stats_pinball_quantile_eval",
    # round-6fff: multi-format federated join + dispersion check
    "source_federated_join", "stats_dispersion_orders",
    # round-6ggg: real-decode brightness drift + degree assortativity
    "mm_brightness_by_source", "graph_degree_assortativity",
    # round-6hhh: shuffle-free bucketed join + Mann–Kendall trend test
    "join_bucketed_colocate", "stats_mann_kendall_daily",
    # round-6iii: seasonality-aware anomaly screen + deseasonalized
    # growth
    "events_anomaly_deseasonalized", "orders_deseasonalized_growth",
    # round-6jjj: hash-checked IVF recall@10 (exactly-measured ANN
    # quality)
    "ann_ivf_recall_at10",
]

# ROUND-10 ROTATION PLAN: assuming CORRECTNESS_r09 comes back green for
# this window, round 10's window takes ALL 26 of _NEXT_WINDOW below
# (22 round-6kkk..6bbbb residue + the two judge-ordered round-8
# additions + the two judge-ordered round-9 additions at the tail),
# draining the never-driver-verified debt to zero, plus 24 backfill
# re-verification slots by staleness: (a) the r1-only greens displaced
# in round 5
# (join_cross_small, setop_union, setop_intersect, window_topk_per_group,
# window_running_sum, q6_revenue_change, q10_returned_items,
# q14_promo_share, q18_large_orders, agg_rollup, agg_cube,
# subquery_scalar, subquery_exists, subquery_correlated_scalar,
# setop_except, agg_pivot, agg_median, date_functions), (b) the remaining
# r1-only cohort, (c) the r3 cohort (text_* / sample_* / pack_train_* /
# csv_roundtrip), oldest first. tests/test_registry.py enforces the
# overflow contiguity.

#: Queries landed AFTER the 50-slot window was already full of
#: never-verified entries: first in line for round 10's window (positions
#: 51+ now). All are locally oracle-green; this is the driver-window
#: overflow the rotation tests bound to at most one more round. NEW
#: queries (judge-ordered only, under the addition freeze) append at the
#: TAIL to keep the debt contiguous.
_NEXT_WINDOW = [
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
    # round-6aaaa: Ljung–Box whiteness test
    "stats_ljung_box_daily",
    # round-6bbbb: personalized churn-risk dormancy flags
    "orders_churn_risk_flags",
    # round-8a: the versioned-table format's first driver row — time
    # travel + COW DELETE snapshot reconciliation (the r7 MuraTable
    # stack was pytest-only until this)
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
]

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
