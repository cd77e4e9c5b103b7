"""Property-based cross-engine semantics: Spark and DuckDB must agree on
three-valued logic, comparisons, and null tests over arbitrary data —
the SURVEY.md §5 item-4 edge semantics, generated rather than hand-picked.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

ROW = st.tuples(
    st.one_of(st.none(), st.integers(-2**31, 2**31 - 1)),
    st.one_of(st.none(),
              st.floats(allow_nan=False, allow_infinity=False, width=32)),
    st.one_of(st.none(), st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=8)),
)

PREDICATES = [
    "i < 5",
    "i >= 0 AND f < 0.5",
    "NOT (i < 5)",
    "i IS NULL",
    "f IS NOT NULL",
    "s = 'x' OR i <= -1",
    "(i < 0) = (f < 0)",          # null-propagating equality of booleans
    "i BETWEEN -10 AND 10",
    "s > 'm'",
]

SCHEMA = T.StructType([
    T.StructField("rid", T.IntegerType()),
    T.StructField("i", T.IntegerType()),
    T.StructField("f", T.DoubleType()),
    T.StructField("s", T.StringType()),
])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(rows=st.lists(ROW, min_size=0, max_size=25))
def test_filters_agree_with_duckdb(spark, rows):
    data = [(idx, i, float(f) if f is not None else None, s)
            for idx, (i, f, s) in enumerate(rows)]
    sdf = spark.createDataFrame(data, SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (rid INTEGER, i INTEGER, f DOUBLE, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", data) if data else None
    for pred in PREDICATES:
        got = sorted(r.rid for r in sdf.filter(pred).select("rid").collect())
        want = sorted(r[0] for r in
                      con.execute(f"SELECT rid FROM t WHERE {pred}").fetchall())
        assert got == want, f"disagreement on {pred!r}"
    con.close()


def test_ansi_cast_overflow_throws_like_duckdb(spark):
    """ANSI mode on: int overflow in CAST errors in both engines rather
    than silently wrapping/nulling (SURVEY §5 item 4)."""
    import duckdb
    from pyspark.errors.exceptions.captured import (
        ArithmeticException, NumberFormatException,
    )
    df = spark.createDataFrame([(40000,)], ["i"])
    with pytest.raises(Exception) as spark_err:
        df.select(df.i.cast("smallint")).collect()
    assert "CAST_OVERFLOW" in str(spark_err.value) or isinstance(
        spark_err.value, (ArithmeticException, NumberFormatException))
    con = duckdb.connect()
    with pytest.raises(duckdb.ConversionException):
        con.execute("SELECT CAST(40000 AS SMALLINT)").fetchall()


def test_double_to_int_cast_divergence_is_pinned(spark):
    """DOCUMENTED DIVERGENCE: Spark CAST(double AS int) truncates toward
    zero; DuckDB rounds to nearest. Oracle queries must therefore never
    cast fractional doubles to ints (use floor/ceil/round explicitly —
    those agree). Integral values agree exactly."""
    import duckdb
    vals = [0.0, 1.9, -1.9, 2.5, -2.5, 123.456, 7.0, -3.0]
    df = spark.createDataFrame([(v,) for v in vals], ["d"])
    got = [r[0] for r in df.select(df.d.cast("int")).collect()]
    con = duckdb.connect()
    want = [con.execute(f"SELECT CAST({v} AS INT)").fetchone()[0]
            for v in vals]
    assert got == [0, 1, -1, 2, -2, 123, 7, -3]      # Spark truncates
    assert want == [0, 2, -2, 3, -3, 123, 7, -3]     # DuckDB rounds
    # floor() is the portable spelling — both engines agree
    got_f = [r[0] for r in
             df.select(F.floor(df.d).cast("int")).collect()]
    want_f = [con.execute(f"SELECT CAST(floor({v}) AS INT)").fetchone()[0]
              for v in vals]
    assert got_f == want_f


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(sizes=st.lists(st.integers(0, 500), min_size=1, max_size=30),
       chunk=st.integers(2, 64),
       overlap_frac=st.floats(0.0, 0.9))
def test_chunk_overlap_matches_reference(spark, sizes, chunk, overlap_frac):
    """chunk_overlap equals the obvious sequential tiling for arbitrary
    (size, chunk, overlap) — including 0-size docs (one zero-width chunk)
    and docs exactly at stride boundaries."""
    from mura_spark.operators.packing import chunk_overlap

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap

    def reference(sz):
        spans, start = [], 0
        while True:
            end = min(start + chunk, sz)
            spans.append((start, end))
            if end >= sz:
                return spans
            start += stride

    df = spark.createDataFrame(list(enumerate(sizes)), ["doc_id", "sz"])
    out = chunk_overlap(df, "doc_id", "sz", chunk, overlap)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.tok_start,
                                             r.tok_end))
    for doc_id, sz in enumerate(sizes):
        want = [(i, s, e) for i, (s, e) in enumerate(reference(sz))]
        assert sorted(got[doc_id]) == want, (sz, chunk, overlap)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(sizes=st.lists(st.integers(0, 300), min_size=1, max_size=25),
       budget=st.integers(8, 128))
def test_pack_greedy_matches_reference(spark, sizes, budget):
    """pack_greedy equals a sequential first-fit walk per shard for
    arbitrary sizes/budgets — including docs larger than the budget (own
    sequence) and zero-size docs."""
    from mura_spark.functions.hashing import md5_hash48
    from mura_spark.operators.packing import pack_greedy
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(enumerate(sizes)), ["doc_id", "sz"])
    shards = {r.doc_id: r.s for r in
              df.select("doc_id",
                        (md5_hash48(F.col("doc_id").cast("string")) % 4)
                        .alias("s")).collect()}

    def reference():
        out = {}
        per_shard = {}
        for doc_id, sz in enumerate(sizes):
            per_shard.setdefault(shards[doc_id], []).append((doc_id, sz))
        for shard, docs in per_shard.items():
            seq, fill = 0, 0
            for doc_id, sz in sorted(docs):
                if fill > 0 and fill + sz > budget:
                    seq += 1
                    fill = 0
                fill += sz
                out[doc_id] = (shard, seq, fill)
        return out

    got = {r.doc_id: (r.shard, r.seq_id, r.seq_fill) for r in
           pack_greedy(df, "doc_id", "sz", budget, n_shards=4).collect()}
    assert got == reference()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_editdist_passjoin_is_lossless_under_random_edit_scripts(
        spark, data):
    """PassJoin segment blocking must find EVERY pair within the distance
    budget — generate base strings over a tiny alphabet (maximizing
    accidental collisions) plus mutants built by random ≤ d edit scripts,
    and compare against the O(n²) DP reference."""
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    from mura_spark.operators.editdist import editdist_pairs

    L, d = 32, 5
    alpha = "ab"
    bases = data.draw(st.lists(
        st.text(alphabet=alpha, min_size=L, max_size=L + 8),
        min_size=2, max_size=4))
    corpus = list(bases)
    for b in bases:
        ops = data.draw(st.lists(
            st.tuples(st.sampled_from("ids"),
                      st.integers(0, L - 1),
                      st.sampled_from(alpha)),
            min_size=0, max_size=d))
        s = b
        for kind, pos, ch in ops:
            pos = min(pos, max(len(s) - 1, 0))
            if kind == "i":
                s = s[:pos] + ch + s[pos:]
            elif kind == "d" and s:
                s = s[:pos] + s[pos + 1:]
            else:
                s = s[:pos] + ch + s[pos + 1:]
        corpus.append(s)
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.dist
           for r in editdist_pairs(df, "doc_id", "text", max_dist=d,
                                   prefix_len=L).collect()}
    eligible = [(i, t[:L]) for i, t in rows if len(t) >= L]
    want = {}
    for (ia, pa), (ib, pb) in itertools.combinations(eligible, 2):
        dd = lev(pa, pb)
        if dd <= d:
            want[(ia, ib)] = dd
    assert got == want


# ---------------------------------------------------- round-5 operators

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                      min_size=0, max_size=40))
def test_triangle_counts_match_bruteforce(spark, edges):
    """Degree-ordered triangle counting equals the O(n³) enumeration on
    arbitrary small graphs (duplicates, self-loops, both directions)."""
    from itertools import combinations

    from mura_spark.operators.graph import triangle_counts
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    expect = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    if edges:
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["n_triangles"]
               for r in triangle_counts(df).collect()}
        assert got == expect


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.floats(-1e4, 1e4, allow_nan=False,
                               allow_infinity=False),
                     min_size=2, max_size=60))
def test_group_percentiles_match_numpy(spark, vals):
    """Explicit order-statistics interpolation equals numpy's 'linear'
    percentile definition (the same (n−1)·p formula)."""
    import numpy as np

    from mura_spark.operators.stats import group_percentiles
    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "g string, v double")
    row = group_percentiles(df, ["g"], "v", [0.5, 0.95],
                            ["p50", "p95"]).collect()[0]
    for name, p in (("p50", 50), ("p95", 95)):
        ref = float(np.percentile(np.array(vals), p, method="linear"))
        assert abs(row[f"{name}_micro"] / 1e6 - ref) < 2e-6, (name, ref)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=st.dictionaries(st.integers(0, 15), st.integers(0, 3),
                           max_size=12),
       new=st.dictionaries(st.integers(0, 15), st.integers(0, 3),
                           max_size=12))
def test_snapshot_diff_reconstructs_membership(spark, old, new):
    """The diff's added/removed/changed sets exactly explain how to get
    from the old snapshot's key-value map to the new one."""
    from mura_spark.operators.upsert import snapshot_diff
    mk = lambda d: spark.createDataFrame(  # noqa: E731
        [(k, v) for k, v in d.items()] or [(None, None)],
        "k int, v int").filter(F.col("k").isNotNull())
    got = {r["k"]: r["change"]
           for r in snapshot_diff(mk(old), mk(new), ["k"], ["v"]).collect()}
    expect = {}
    for k in set(old) | set(new):
        if k not in old:
            expect[k] = "added"
        elif k not in new:
            expect[k] = "removed"
        elif old[k] != new[k]:
            expect[k] = "changed"
    assert got == expect


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.lists(st.tuples(st.integers(0, 10), st.integers(0, 10)),
                      min_size=1, max_size=30),
       k=st.integers(1, 3))
def test_kcore_rounds_converge_to_fixpoint(spark, edges, k):
    """Enough peeling rounds reach the true k-core (sequential peeling
    fixpoint); extra rounds change nothing."""
    from mura_spark.operators.graph import kcore_prune
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    # sequential fixpoint
    cur = set(und)
    while True:
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            break
        cur = nxt
    expect = {}
    for a, b in cur:
        expect[a] = expect.get(a, 0) + 1
        expect[b] = expect.get(b, 0) + 1
    if und:
        df = spark.createDataFrame(sorted(und), "src long, dst long")
        rounds = 12  # >= graph diameter worth of peeling for n<=11
        got = {r["node"]: r["degree"]
               for r in kcore_prune(df, k=k, rounds=rounds).collect()}
        assert got == expect
