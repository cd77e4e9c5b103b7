"""Expression surface — the reference's ``Expression`` enum, Spark-first.

Covers every variant of ``Expression`` (``/root/reference/src/planner/
logicalplan.rs:27-83``) and every member of ``Operator``
(``logicalplan.rs:132-149``), mapped onto :class:`pyspark.sql.Column`
operations so the whole surface stays JVM-side / whole-stage-codegen — no
Python in the row path.

Also carries the reference's two type tables as Spark types:
- SQL-DDL types (``queryplanner.rs:176-191``) → :data:`DDL_TYPES`
- ``ScalarValue`` literal types incl. the unsigned widening Spark needs
  (``logicalplan.rs:153-202``) → :data:`SCALAR_TYPES`
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Type tables (SURVEY.md §1.3)
# --------------------------------------------------------------------------

#: DDL type name → Spark type (reference to_arrow_type, queryplanner.rs:176-191).
#: The reference coarsens FLOAT/REAL to Float64; we keep REAL=float (Spark's
#: lattice) and note the divergence — both satisfy the DDL.
DDL_TYPES: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.DoubleType(),   # reference queryplanner.rs:182
    "REAL": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "CHAR": T.StringType(),    # length dropped, reference queryplanner.rs:184
    "VARCHAR": T.StringType(),
    "TIMESTAMP": T.TimestampType(),  # ns in reference → µs in Spark
}

#: ScalarValue type → Spark type (reference logicalplan.rs:186-202). Spark has
#: no unsigned integers, so unsigned types widen to the next signed type that
#: holds the full range (SURVEY.md §1.3) — the only lattice divergence.
SCALAR_TYPES: dict[str, T.DataType] = {
    "Boolean": T.BooleanType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.DecimalType(20, 0),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "Utf8": T.StringType(),
}


def ddl_type(name: str) -> T.DataType:
    """Resolve a DDL type name (case-insensitive, ``CHAR(10)`` → CHAR)."""
    base = name.split("(", 1)[0].strip().upper()
    if base not in DDL_TYPES:
        # mirrors the reference's rejection (queryplanner.rs:186-189) for its
        # types, but we accept anything Spark itself can parse as DDL.
        try:
            return T._parse_datatype_string(name)  # e.g. DECIMAL(10,2), DATE
        except Exception as exc:
            raise ValueError(f"SQL type {name!r} is not supported") from exc
    return DDL_TYPES[base]


# --------------------------------------------------------------------------
# Expression constructors (reference Expression enum, logicalplan.rs:27-83)
# --------------------------------------------------------------------------

def col(name: str) -> Column:
    """``UnresolvedColumn`` (logicalplan.rs:28-29; helper col(), rs:121-123)."""
    return F.col(name)


def col_index(df, i: int) -> Column:
    """``Column(usize)`` — positional reference (logicalplan.rs:30-31).
    Spark resolution is name-based, so position is resolved at the API
    edge against the DataFrame's schema, exactly once. The name is
    BACKTICK-QUOTED before resolution — a bare ``F.col(df.columns[i])``
    PARSES the name, so a legal column called ``a.b`` would resolve as
    struct access (the reference's ``schema.field(idx)``,
    logicalplan.rs, is purely ordinal and has no such hazard).
    Duplicate column names remain ambiguous under Spark's name-based
    resolution; keep names unique when using positional references."""
    name = df.columns[i]
    return F.col("`" + name.replace("`", "``") + "`")


def lit(value) -> Column:
    """``Literal(ScalarValue)`` (logicalplan.rs:32-33). Spark's literal
    typing replaces the reference's everything-is-Float64 coarsening
    (queryplanner.rs:109), which SURVEY.md §1.3 says not to replicate."""
    return F.lit(value)


def cast(expr: Column, to: str | T.DataType) -> Column:
    """``Cast { expr, data_type }`` (logicalplan.rs:49-55)."""
    if isinstance(to, str):
        to = ddl_type(to)
    return expr.cast(to)


def is_null(expr: Column) -> Column:
    """``IsNull`` (logicalplan.rs:47-48)."""
    return expr.isNull()


def is_not_null(expr: Column) -> Column:
    """``IsNotNull`` (logicalplan.rs:45-46)."""
    return expr.isNotNull()


def not_(expr: Column) -> Column:
    """``Not`` (logicalplan.rs:43-44)."""
    return ~expr


def sort_key(expr: Column, asc: bool = True) -> Column:
    """``Expression::Sort { expr, asc }`` (logicalplan.rs:56-62)."""
    return expr.asc() if asc else expr.desc()


#: ``Operator`` enum (logicalplan.rs:132-149) → Column binop. These eight are
#: the reference's entire binary-operator surface; arithmetic/LIKE/IN/BETWEEN
#: are *additions* of this engine (Spark natives, tested separately).
BINARY_OPS = {
    "Eq": lambda l, r: l == r,
    "NotEq": lambda l, r: l != r,
    "Lt": lambda l, r: l < r,
    "LtEq": lambda l, r: l <= r,
    "Gt": lambda l, r: l > r,
    "GtEq": lambda l, r: l >= r,
    "And": lambda l, r: l & r,
    "Or": lambda l, r: l | r,
}


def binary_expr(left: Column, op: str, right: Column) -> Column:
    """``BinaryExpression { left, op, right }`` (logicalplan.rs:34-42)."""
    try:
        fn = BINARY_OPS[op]
    except KeyError:
        raise ValueError(
            f"Unsupported binary operator {op!r} (reference rejects the rest "
            f"at queryplanner.rs:131)") from None
    return fn(left, right)


def eq(left: Column, right: Column) -> Column:
    """Helper mirroring the reference's ``eq()`` (logicalplan.rs:106-112)."""
    return left == right


def scalar_function(name: str, *args: Column) -> Column:
    """``ScalarFunction { name, args, .. }`` (logicalplan.rs:63-71). The
    reference names no concrete function; in Spark the namespace is the whole
    of ``pyspark.sql.functions`` plus registered UDFs — dispatch by name via
    ``F.call_function`` / ``call_udf``."""
    return F.call_function(name, *args)


def aggregate_function(name: str, *args: Column) -> Column:
    """``AggregateFunction`` (logicalplan.rs:72-80) — declared then rejected
    by the reference ('Aggregation is currently not supported.',
    logicalplan.rs:88). This engine supports it: any Spark aggregate by name."""
    return F.call_function(name, *args)
