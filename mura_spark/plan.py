"""Fluent plan builder — the reference's ``LogicalPlanBuilder``, Spark-first.

The reference's tested API (its only unit test, ``/root/reference/src/planner/
logicalplan.rs:470-488``) is::

    LogicalPlanBuilder::scan(schema, table, schema, projection)
        .filter(expr).project(exprs).sort(keys).limit(n).build()

Each builder call appends a node to an immutable logical plan. A Spark
DataFrame *is* an immutable logical plan handle, so the builder composes
DataFrame transformations one-to-one — Catalyst receives exactly the tree the
reference would print, then optimizes and executes it (the two stages the
reference never reached).

Beyond the reference's five verbs this builder carries the engine's
extension verbs (aggregate/join/distinct/union — SURVEY.md §2 'absent from
the reference', §7 Phase 2) so one fluent surface covers the whole engine.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


class PlanBuilder:
    """Immutable fluent builder; every method returns a new builder."""

    def __init__(self, df: DataFrame):
        self._df = df

    # ---- leaves (reference logicalplan.rs:376-401) ----

    @classmethod
    def scan(cls, session, table_name: str,
             projection: Sequence[str] | None = None) -> "PlanBuilder":
        """``LogicalPlanBuilder::scan`` (logicalplan.rs:383-401). The
        ``projection`` maps to a select that Catalyst pushes into the Parquet
        reader (ReadSchema pruning) — the rule the reference reserved a slot
        for but never wired (queryplanner.rs:58)."""
        df = session.table(table_name) if hasattr(session, "table") else session
        b = cls(df)
        if projection is not None:
            b = b.project([F.col(c) for c in projection])
        return b

    @classmethod
    def from_df(cls, df: DataFrame) -> "PlanBuilder":
        """``LogicalPlanBuilder::from(&plan)`` (logicalplan.rs:371-373)."""
        return cls(df)

    @classmethod
    def empty(cls, spark, schema) -> "PlanBuilder":
        """``EmptyRelation`` (logicalplan.rs:246-250, builder rs:376-380)."""
        return cls(spark.createDataFrame([], schema))

    # ---- reference verbs (logicalplan.rs:404-456) ----

    def project(self, exprs: Iterable[ColumnOrName]) -> "PlanBuilder":
        """``project`` (logicalplan.rs:404-430). ``"*"`` expands to all input
        columns, matching the reference's Wildcard expansion (rs:406-418)."""
        return PlanBuilder(self._df.select(*exprs))

    def filter(self, condition: Column) -> "PlanBuilder":
        """``filter`` (logicalplan.rs:433-438)."""
        return PlanBuilder(self._df.filter(condition))

    def sort(self, *keys: ColumnOrName) -> "PlanBuilder":
        """``sort`` (logicalplan.rs:450-456); keys carry asc/desc via
        ``Column.asc()/.desc()`` (Expression::Sort, rs:56-62)."""
        return PlanBuilder(self._df.orderBy(*keys))

    def limit(self, n: int) -> "PlanBuilder":
        """``limit`` (logicalplan.rs:441-447). ``sort().limit()`` collapses to
        a single TakeOrderedAndProject physical operator — the top-k the
        reference lacks (SURVEY.md §2.3)."""
        return PlanBuilder(self._df.limit(n))

    # ---- extension verbs (absent from the reference; SURVEY.md §7 Phase 2) ----

    def aggregate(self, group_exprs: Sequence[ColumnOrName],
                  agg_exprs: Sequence[Column]) -> "PlanBuilder":
        """GROUP BY — the operation the reference explicitly rejects
        ('Aggregation is currently not supported.', logicalplan.rs:88).
        Spark executes it as partial (map-side) + final aggregation, so the
        shuffle carries pre-combined state, not raw rows."""
        if group_exprs:
            return PlanBuilder(self._df.groupBy(*group_exprs).agg(*agg_exprs))
        return PlanBuilder(self._df.agg(*agg_exprs))

    def join(self, other: "PlanBuilder | DataFrame", on, how: str = "inner",
             broadcast_other: bool = False) -> "PlanBuilder":
        right = other._df if isinstance(other, PlanBuilder) else other
        if broadcast_other:
            right = F.broadcast(right)
        return PlanBuilder(self._df.join(right, on, how))

    def distinct(self) -> "PlanBuilder":
        return PlanBuilder(self._df.distinct())

    def union(self, other: "PlanBuilder | DataFrame") -> "PlanBuilder":
        right = other._df if isinstance(other, PlanBuilder) else other
        return PlanBuilder(self._df.unionByName(right))

    # ---- terminals ----

    def build(self) -> DataFrame:
        """``build`` (logicalplan.rs:459-461): hand the plan to the engine.
        The DataFrame is the logical plan; execution is lazy."""
        return self._df

    def explain_str(self, mode: str = "formatted") -> str:
        """The reference prints the plan's Debug tree (main.rs:44,
        logicalplan.rs:292-362); the Spark-first analog is the query
        execution's plan string, which additionally shows the *optimized*
        and *physical* plans the reference never produced."""
        return self._df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            self._df._jdf.queryExecution(), mode)

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode=mode)
