"""Plan-builder parity tests, anchored to the reference's only unit test
(test_simple_plan_builder, /root/reference/src/planner/logicalplan.rs:470-499)
plus the plan-shape assertions SURVEY.md §5 calls for: pushdown and pruning
must actually reach the Parquet scan — the rules the reference reserved
slots for but never wired.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from mura_spark import MuraSession, PlanBuilder
from mura_spark import expressions as E

EMPLOYEE_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("first_name", T.StringType(), False),
    T.StructField("last_name", T.StringType(), False),
    T.StructField("state", T.StringType(), False),
    T.StructField("salary", T.IntegerType(), False),
])

EMPLOYEES = [
    (1, "Ada", "Lovelace", "CO", 100),
    (2, "Grace", "Hopper", "CA", 120),
    (3, "Alan", "Turing", "CO", 90),
    (4, "Edsger", "Dijkstra", "NY", 110),
    (5, "Barbara", "Liskov", "CO", 130),
]


@pytest.fixture(scope="module")
def employee(spark):
    df = spark.createDataFrame(EMPLOYEES, EMPLOYEE_SCHEMA)
    df.createOrReplaceTempView("employee")
    return df


def test_reference_plan_pipeline(employee):
    """The reference test's pipeline: scan employee → filter state='CO' →
    project id (logicalplan.rs:470-488) — executed, not just printed."""
    out = (PlanBuilder.from_df(employee)
           .filter(E.eq(E.col("state"), E.lit("CO")))
           .project([E.col("id")])
           .build())
    assert out.columns == ["id"]
    assert sorted(r.id for r in out.collect()) == [1, 3, 5]


def test_full_verb_chain(employee):
    out = (PlanBuilder.from_df(employee)
           .filter(F.col("salary") >= 100)
           .project([F.col("id"), F.col("salary")])
           .sort(F.col("salary").desc())
           .limit(2)
           .build())
    assert [(r.id, r.salary) for r in out.collect()] == [(5, 130), (2, 120)]


def test_wildcard_expansion(employee):
    out = PlanBuilder.from_df(employee).project(["*"]).build()
    assert out.columns == employee.columns


def test_empty_relation(spark):
    b = PlanBuilder.empty(spark, EMPLOYEE_SCHEMA)
    assert b.build().count() == 0
    assert b.build().schema == EMPLOYEE_SCHEMA


def test_aggregate_and_join(employee):
    counts = (PlanBuilder.from_df(employee)
              .aggregate([F.col("state")], [F.count(F.lit(1)).alias("n")])
              .build())
    got = {r.state: r.n for r in counts.collect()}
    assert got == {"CO": 3, "CA": 1, "NY": 1}


# ---- plan-shape assertions (SURVEY.md §5 item 1) ----

def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_parquet(session, sf_dir):
    session.create_external_table("pp_lineitem", f"{sf_dir}/lineitem.parquet")
    df = (session.scan("pp_lineitem")
          .filter(F.col("l_quantity") < 5)
          .project([F.col("l_orderkey")])
          .build())
    plan = _formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)]" in plan


def test_projection_prunes_read_schema(session, sf_dir):
    session.create_external_table("pp_li2", f"{sf_dir}/lineitem.parquet")
    df = session.scan("pp_li2", projection=["l_orderkey", "l_tax"]).build()
    plan = _formatted_plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_tax:double>" in plan


def test_sort_limit_becomes_top_k(session, sf_dir):
    session.create_external_table("pp_orders", f"{sf_dir}/orders.parquet")
    df = (session.scan("pp_orders")
          .sort(F.col("o_totalprice").desc())
          .limit(5)
          .build())
    assert "TakeOrderedAndProject" in _formatted_plan(df)


def test_broadcast_join_strategy(session, sf_dir):
    session.create_external_table("pp_li3", f"{sf_dir}/lineitem.parquet")
    session.create_external_table("pp_part", f"{sf_dir}/part.parquet")
    df = (session.scan("pp_li3")
          .join(PlanBuilder.from_df(session.table("pp_part")),
                F.col("l_partkey") == F.col("p_partkey"),
                broadcast_other=True)
          .build())
    assert "BroadcastHashJoin" in _formatted_plan(df)


def test_suite_query_plan_shapes(spark, sf_dir):
    """Physical-plan discipline for the headline suite queries: predicates
    reach the scan, dims broadcast, sort+limit becomes top-k."""
    from mura_spark.suite import SPARK_QUERIES
    q6 = _formatted_plan(SPARK_QUERIES["q6_revenue_change"](spark, sf_dir))
    assert "PushedFilters" in q6 and "l_discount" in q6 and "l_quantity" in q6
    # only needed columns read
    assert ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
            "l_discount:double,l_shipdate" in q6)
    q10 = _formatted_plan(SPARK_QUERIES["q10_returned_items"](spark, sf_dir))
    assert "BroadcastHashJoin" in q10
    assert "TakeOrderedAndProject" in q10
    assert "EqualTo(l_returnflag,R)" in q10  # fact filter at the scan


def test_no_suite_query_plans_a_cartesian_product(spark, sf_dir):
    """Structural guard over the whole suite: no query may plan an
    unbounded CartesianProduct. Deliberate tiny cross joins (explicitly
    broadcast or provably small sides) are whitelisted."""
    from mura_spark.suite import SPARK_QUERIES
    allowed_cartesian = {
        "join_cross_small",        # 5×25 dims — the cross-join query itself
        "events_resample_gapfill", # day-grid × event-type grid (tiny)
    }
    offenders = []
    for name, fn in SPARK_QUERIES.items():
        if name in allowed_cartesian:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as e:  # planning must not fail either
            offenders.append(f"{name}: plan error {str(e)[:80]}")
            continue
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_round2_operator_plan_shapes(spark, sf_dir):
    """Plan discipline for the round-2 operators: packing is one shuffle
    (the per-shard window) + a narrow explode; the upsert merge is one
    key-shuffle window over the union; the brute-force ANN pre-reduction
    sits below the ranking window (narrow MapInPandas, no extra
    exchange)."""
    from mura_spark.suite import SPARK_QUERIES

    pack = _formatted_plan(SPARK_QUERIES["pack_train_chunks"](spark, sf_dir))
    assert pack.count("hashpartitioning(") == 1  # the shard window only
    assert "explode" in pack

    ups = _formatted_plan(SPARK_QUERIES["events_upsert_latest"](spark, sf_dir))
    assert ups.count("hashpartitioning(") == 1  # the key window only
    assert "Union" in ups


def test_tpch_remaining_plan_shapes(spark, sf_dir):
    """Plan discipline for the Q7/Q8/Q19 additions: dimensions broadcast
    (never a sort-merge join against a dim), and Q19's OR-of-ANDs splits
    into per-side conjunct unions that reach BOTH scans."""
    from mura_spark.suite import SPARK_QUERIES

    q7 = _formatted_plan(SPARK_QUERIES["q7_nation_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in q7 and "SortMergeJoin" not in q7

    q8 = _formatted_plan(SPARK_QUERIES["q8_market_share"](spark, sf_dir))
    assert q8.count("BroadcastHashJoin") >= 4   # part/supp-nation/cust chain
    assert "SortMergeJoin" not in q8

    q19 = _formatted_plan(
        SPARK_QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    pushed = [l for l in q19.splitlines() if "PushedFilters" in l]
    assert any("p_brand" in l and "Or(" in l for l in pushed)
    assert any("l_quantity" in l and "Or(" in l for l in pushed)


def test_round5_analytics_plan_shapes(spark, sf_dir):
    """Plan discipline for the round-5 analytics widening: the
    edit-distance candidate stage is an EQUI-join (nested loops appear
    only against the constant offset grids), the anomaly detector is
    exactly its two designed shuffles (hourly rollup + moments window),
    and k-means never sort-merges — the k-row centroid table always
    broadcasts."""
    from mura_spark.suite import SPARK_QUERIES

    ed = _formatted_plan(SPARK_QUERIES["dedup_editdist_pairs"](spark,
                                                               sf_dir))
    assert "levenshtein" in ed
    # candidate join on (seg_id, piece) is hash/merge machinery
    assert ("SortMergeJoin" in ed) or ("ShuffledHashJoin" in ed) \
        or ("BroadcastHashJoin" in ed)
    # nested loops only for the ≤(d+r)(2d+1)-row broadcast grids
    assert ed.count("BroadcastNestedLoopJoin") <= 4

    an = _formatted_plan(SPARK_QUERIES["events_anomaly_hours"](spark,
                                                               sf_dir))
    assert an.count("hashpartitioning(") == 2

    km = _formatted_plan(SPARK_QUERIES["emb_kmeans_assign"](spark, sf_dir))
    assert "SortMergeJoin" not in km
    assert "BroadcastNestedLoopJoin" in km  # centroids broadcast


def test_lateral_topn_decorrelates_to_window(spark, sf_dir):
    """The correlated LATERAL + LIMIT must plan as a per-key ranked
    window (scalable top-k), never a per-row nested-loop re-execution."""
    from mura_spark.suite import SPARK_QUERIES
    plan = SPARK_QUERIES["join_lateral_topn"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_round5r_plus_plan_shapes(spark, sf_dir):
    """Plan discipline for the round-5r..5ee additions: the right-outer
    join must be a key-shuffle join (the preserved side is the small
    one — broadcasting it is illegal for this join type), the rank
    tests must reduce BEFORE their global window (bucket-table pass,
    not a corpus sort), and top-k diagnostics use distributed
    TakeOrdered."""
    from mura_spark.suite import SPARK_QUERIES

    ro = SPARK_QUERIES["join_right_outer"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    # the join must keep its RightOuter semantics; strategy is size-
    # dependent (AQE broadcasts the small LEFT side at toy SF — the
    # preserved right side can never broadcast, and at scale the left
    # fact side exceeds the threshold, degrading to a shuffle join)
    assert "RightOuter" in ro
    assert "CartesianProduct" not in ro

    ks = SPARK_QUERIES["stats_ks_value"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    # the single-partition window must sit ABOVE an aggregate (the
    # value-domain reduction), never directly on the scan
    assert "Window" in ks and "HashAggregate" in ks

    skew = SPARK_QUERIES["profile_key_skew"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in skew
