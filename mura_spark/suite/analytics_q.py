"""Round-5 analytics queries (batches 5g-5l): full-text retrieval (BM25,
rank fusion), graph structure mining (triangle counting, k-core),
statistics (exact-moment correlation, grouped OLS, chi-square, explicit
order-statistic percentiles), corpus composition (diversity, divergence,
vocabulary coverage, unigram-LM scoring), growth/decay features,
data-quality audits (referential integrity, snapshot diff, Benford),
classifier evaluation, conversion-window funnels, and embedding outlier
screening.

All oracled (hash-comparable). Determinism posture per query: anything
passing through a transcendental (ln/exp/pow/log10) quantizes per row
to integer micro-units BEFORE aggregation (functions/quantize.micro --
JVM ``Math.log`` vs libm differ in the last ulp); everything else is
exact integer/decimal arithmetic combined with only IEEE
correctly-rounded operations, with the exact expression tree mirrored
subexpression-for-subexpression in the SQL twin -- see the operator
modules' docstrings for the specific arguments.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mura_spark.suite.common import dsum, sql_tokens, table

SPARK_QUERIES = {}
ORACLE_SQL = {}


def q(name, oracle=None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


_TOKS = sql_tokens("text")

# ---------------------------------------------------------------- retrieval

_BM25_TERMS = ["hash", "join", "vector"]
_FUSE_TERMS = ["filter", "scan"]


def _sql_bm25(terms: list[str], k: int) -> str:
    """DuckDB rendering of operators.search.bm25_topk — expression tree
    mirrored subexpression-for-subexpression (association order changes
    double low bits; the per-term floor then absorbs only ulp-level libm
    drift, not reordering)."""
    in_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return (
        f"WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents), "
        "lens AS (SELECT doc_id, len(tk) AS dl FROM toks), "
        "stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS tot "
        "FROM lens), "
        "tok AS (SELECT doc_id, unnest(tk) AS term FROM toks), "
        "tf AS (SELECT doc_id, term, COUNT(*) AS tfc FROM tok "
        f"WHERE term IN ({in_list}) GROUP BY 1, 2), "
        "dfreq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY 1), "
        "scored AS (SELECT tf.doc_id, CAST(floor("
        "ln(1.0 + (n - dfc + 0.5) / (dfc + 0.5)) * CAST(tfc AS DOUBLE) "
        "* 2.2 / (CAST(tfc AS DOUBLE) + 1.2 * (0.25 + "
        "(0.75 * CAST(dl AS DOUBLE)) "
        "/ (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))) "
        "* 1000000.0 + 0.5) AS BIGINT) AS s "
        "FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) "
        "CROSS JOIN stats), "
        "total AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_micro "
        "FROM scored GROUP BY 1) "
        "SELECT doc_id, score_micro, CAST(ROW_NUMBER() OVER (ORDER BY "
        "score_micro DESC, doc_id ASC) AS INT) AS rank FROM total "
        f"ORDER BY score_micro DESC, doc_id ASC LIMIT {k}")


@q("search_bm25_topk", _sql_bm25(_BM25_TERMS, 10))
def search_bm25_topk(spark, sf):
    """Top-10 documents for the query {hash, join, vector} under BM25
    (k1=1.2, b=0.75). Query-term filter runs BEFORE the tf shuffle; the
    final top-k is TakeOrderedAndProject, not a global window — see
    operators.search.bm25_topk for the full 100 TB plan shape."""
    from mura_spark.operators.search import bm25_topk
    d = table(spark, sf, "documents")
    return bm25_topk(d, "doc_id", "text", _BM25_TERMS, k=10)


@q("search_rrf_fusion",
   "WITH bm AS (" + _sql_bm25(_FUSE_TERMS, 20) + "), "
   "ln_rank AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY "
   "n_chars DESC, doc_id ASC) AS INT) AS rank FROM documents "
   "ORDER BY n_chars DESC, doc_id ASC LIMIT 20), "
   "contrib AS ("
   "SELECT doc_id, CAST(floor(1000000.0 / (60.0 + CAST(rank AS DOUBLE)) "
   "+ 0.5) AS BIGINT) AS c FROM bm "
   "UNION ALL SELECT doc_id, CAST(floor(1000000.0 / "
   "(60.0 + CAST(rank AS DOUBLE)) + 0.5) AS BIGINT) AS c FROM ln_rank), "
   "total AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf_micro "
   "FROM contrib GROUP BY 1) "
   "SELECT doc_id, rrf_micro, CAST(ROW_NUMBER() OVER (ORDER BY "
   "rrf_micro DESC, doc_id ASC) AS INT) AS rank FROM total "
   "ORDER BY rrf_micro DESC, doc_id ASC LIMIT 10")
def search_rrf_fusion(spark, sf):
    """Reciprocal-rank fusion (k0=60) of two top-20 rankings — BM25
    relevance for {filter, scan} fused with a document-length prior —
    the standard way multi-retriever curation merges candidate lists.
    Per-ranking reciprocals quantize per row, then fuse by exact integer
    sum (operators.search.rrf_fuse)."""
    from mura_spark.operators.search import _rank_topk, bm25_topk, rrf_fuse
    d = table(spark, sf, "documents")
    bm = bm25_topk(d, "doc_id", "text", _FUSE_TERMS, k=20)
    by_len = _rank_topk(d.select("doc_id", "n_chars"),
                        "doc_id", "n_chars", 20)
    return rrf_fuse([bm, by_len], "doc_id", k=10)


# ------------------------------------------------------------------- graph

_SUPPORTED_EDGES_CTE = (
    "base AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i "
    "FROM lineitem), "
    "und AS (SELECT a.i AS a, b.i AS b FROM base a JOIN base b "
    "ON a.g = b.g AND a.i < b.i GROUP BY 1, 2 HAVING COUNT(*) >= 2)")


@q("graph_triangle_counts",
   f"WITH {_SUPPORTED_EDGES_CTE}, "
   "deg AS (SELECT node, COUNT(*) AS dg FROM (SELECT a AS node FROM und "
   "UNION ALL SELECT b AS node FROM und) GROUP BY 1), "
   "keyed AS (SELECT a, b, da.dg AS dga, db.dg AS dgb FROM und "
   "JOIN deg da ON und.a = da.node JOIN deg db ON und.b = db.node), "
   "oriented AS (SELECT "
   "CASE WHEN (dga, a) < (dgb, b) THEN a ELSE b END AS u, "
   "CASE WHEN (dga, a) < (dgb, b) THEN b ELSE a END AS v, "
   "CASE WHEN (dga, a) < (dgb, b) THEN dgb ELSE dga END AS dv "
   "FROM keyed), "
   "wedges AS (SELECT e1.u AS u, e1.v AS v, e2.v AS w "
   "FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u "
   "AND (e1.dv, e1.v) < (e2.dv, e2.v)), "
   "tri AS (SELECT wedges.u AS u, wedges.v AS v, wedges.w AS w "
   "FROM wedges JOIN oriented o ON wedges.v = o.u AND wedges.w = o.v), "
   "corners AS (SELECT unnest([u, v, w]) AS node FROM tri) "
   "SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY 1")
def graph_triangle_counts(spark, sf):
    """Per-part triangle counts over the support-≥2 co-purchase graph —
    degree-ordered (compact-forward) orientation bounds the wedge join at
    O(|E|^1.5) regardless of hub skew; the (degree, id) total order makes
    the whole computation deterministic (operators.graph.triangle_counts)."""
    from mura_spark.operators.graph import (cooccurrence_edges_supported,
                                            triangle_counts)
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    edges = cooccurrence_edges_supported(li, "l_orderkey", "l_partkey",
                                         min_support=2)
    return triangle_counts(edges)


# ----------------------------------------------------------------- profiling

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _sql_corr() -> str:
    cols = _CORR_COLS
    # scaled-integer moments mirroring operators.profile.corr_pairs:
    # per-row products in BIGINT, accumulation in DECIMAL(38,0)
    d = lambda c: f"CAST(round(CAST({c} AS DOUBLE) * 100.0) AS BIGINT)"  # noqa: E731
    moments = ["COUNT(*) AS n"]
    for c in cols:
        moments.append(f"SUM(CAST({d(c)} AS DECIMAL(38,0))) AS s_{c}")
        moments.append(f"SUM(CAST({d(c)} * {d(c)} AS DECIMAL(38,0))) "
                       f"AS q_{c}")
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1:]]
    for x, y in pairs:
        moments.append(f"SUM(CAST({d(x)} * {d(y)} AS DECIMAL(38,0))) "
                       f"AS p_{x}_{y}")
    selects = []
    for x, y in pairs:
        den = (f"(CAST(n AS DOUBLE) * CAST(q_{x} AS DOUBLE) "
               f"- CAST(s_{x} AS DOUBLE) * CAST(s_{x} AS DOUBLE)) "
               f"* (CAST(n AS DOUBLE) * CAST(q_{y} AS DOUBLE) "
               f"- CAST(s_{y} AS DOUBLE) * CAST(s_{y} AS DOUBLE))")
        rho = (f"(CAST(n AS DOUBLE) * CAST(p_{x}_{y} AS DOUBLE) "
               f"- CAST(s_{x} AS DOUBLE) * CAST(s_{y} AS DOUBLE)) "
               f"/ sqrt({den})")
        selects.append(
            f"SELECT '{x}' AS col_x, '{y}' AS col_y, "
            f"CASE WHEN {den} > 0.0 THEN "
            f"CAST(floor({rho} * 1000000.0 + 0.5) AS BIGINT) END "
            "AS corr_micro FROM m")
    return ("WITH m AS (SELECT " + ", ".join(moments) + " FROM lineitem) "
            + " UNION ALL ".join(selects))


@q("stats_corr_lineitem", _sql_corr())
def stats_corr_lineitem(spark, sf):
    """Pearson correlation matrix over lineitem's numeric measures from
    exact decimal moments in ONE scan — F.corr's streaming co-moments are
    partition-order-dependent in their low bits and not reproducible
    (operators.profile.corr_pairs has the full argument)."""
    from mura_spark.operators.profile import corr_pairs
    li = table(spark, sf, "lineitem")
    return corr_pairs(li, _CORR_COLS, scale=2)


# ------------------------------------------------------------------ corpus

@q("text_simpson_by_lang",
   f"WITH tok AS (SELECT lang, unnest({_TOKS}) AS term FROM documents), "
   "cnt AS (SELECT lang, term, COUNT(*) AS c FROM tok GROUP BY 1, 2), "
   "per AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens, "
   "SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS s2 "
   "FROM cnt GROUP BY 1) "
   "SELECT lang, n_tokens, CAST(floor((1.0 - CAST(s2 AS DOUBLE) "
   "/ (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))) "
   "* 1000000.0 + 0.5) AS BIGINT) AS simpson_micro FROM per")
def text_simpson_by_lang(spark, sf):
    """Per-language Simpson lexical diversity (probability two random
    tokens differ) — the boilerplate-collapse monitor. Exact integer
    counts only; squares in DECIMAL(38,0) because a 100 TB slice's token
    count squared overflows int64 (operators.corpus.simpson_diversity)."""
    from mura_spark.operators.corpus import simpson_diversity
    d = table(spark, sf, "documents")
    return simpson_diversity(d, "lang", "text")


@q("text_tvd_by_source",
   f"WITH tok AS (SELECT source, unnest({_TOKS}) AS term FROM documents), "
   "cnt AS (SELECT source AS grp, term, COUNT(*) AS c FROM tok "
   "GROUP BY 1, 2), "
   "g AS (SELECT term, CAST(SUM(c) AS BIGINT) AS gc FROM cnt GROUP BY 1), "
   "tg AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS tgc FROM cnt GROUP BY 1), "
   "t AS (SELECT CAST(SUM(c) AS BIGINT) AS tc FROM cnt), "
   "j AS (SELECT grp, c, gc, tgc, tc FROM cnt JOIN g USING (term) "
   "JOIN tg USING (grp) CROSS JOIN t), "
   "inside AS (SELECT grp, SUM(abs(CAST(c AS DECIMAL(19,0)) "
   "* CAST(tc AS DECIMAL(19,0)) - CAST(gc AS DECIMAL(19,0)) "
   "* CAST(tgc AS DECIMAL(19,0)))) AS s_in, "
   "CAST(SUM(gc) AS BIGINT) AS c_in, ANY_VALUE(tgc) AS tgc, "
   "ANY_VALUE(tc) AS tc FROM j GROUP BY 1) "
   "SELECT grp AS source, CAST(floor(CAST(s_in + CAST(tc - c_in "
   "AS DECIMAL(19,0)) * CAST(tgc AS DECIMAL(19,0)) AS DOUBLE) "
   "/ (2.0 * CAST(tgc AS DOUBLE) * CAST(tc AS DOUBLE)) "
   "* 1000000.0 + 0.5) AS BIGINT) AS tvd_micro FROM inside")
def text_tvd_by_source(spark, sf):
    """Per-source total-variation distance from the corpus unigram
    distribution — the new-source drift monitor. Exact over the common
    denominator T_s·T, with the absent-term mass closed in O(1) per
    group instead of a full-vocabulary outer join
    (operators.corpus.total_variation)."""
    from mura_spark.operators.corpus import total_variation
    d = table(spark, sf, "documents")
    return total_variation(d, "source", "text")


# ------------------------------------------------------- round-5h additions

@q("stats_ols_value_by_hour", None)  # oracle attached below (built string)
def stats_ols_value_by_hour(spark, sf):
    """Per-event-type linear trend of value over hour-of-day — the
    telemetry drift diagnostic. Exact fixed-point moments in ONE
    map-side-combined groupBy, closed-form slope/intercept
    (operators.stats.group_ols)."""
    from mura_spark.operators.stats import group_ols
    ev = table(spark, sf, "events")
    base = ev.select("event_type", F.hour("ts").alias("hr"), "value")
    return group_ols(base, ["event_type"], "hr", "value")


def _ols_oracle() -> str:
    from mura_spark.operators.stats import sql_group_ols
    return sql_group_ols(
        "(SELECT event_type, EXTRACT(hour FROM ts) AS hr, value "
        "FROM events)",
        ["event_type"], "hr", "value")


ORACLE_SQL["stats_ols_value_by_hour"] = _ols_oracle()


@q("stats_chi2_lang_source",
   "WITH cells AS (SELECT lang AS r, source AS c, COUNT(*) AS observed "
   "FROM documents GROUP BY 1, 2), "
   "rt AS (SELECT r, CAST(SUM(observed) AS BIGINT) AS rtv "
   "FROM cells GROUP BY 1), "
   "ct AS (SELECT c, CAST(SUM(observed) AS BIGINT) AS ctv "
   "FROM cells GROUP BY 1), "
   "t AS (SELECT CAST(SUM(observed) AS BIGINT) AS tv FROM cells) "
   "SELECT r AS lang, c AS source, observed, "
   "CAST(floor(CAST(rtv AS DOUBLE) * CAST(ctv AS DOUBLE) "
   "/ CAST(tv AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS expected_micro, "
   "CAST(floor((CAST(observed AS DOUBLE) - CAST(rtv AS DOUBLE) "
   "* CAST(ctv AS DOUBLE) / CAST(tv AS DOUBLE)) "
   "* (CAST(observed AS DOUBLE) - CAST(rtv AS DOUBLE) "
   "* CAST(ctv AS DOUBLE) / CAST(tv AS DOUBLE)) "
   "/ (CAST(rtv AS DOUBLE) * CAST(ctv AS DOUBLE) / CAST(tv AS DOUBLE)) "
   "* 1000000.0 + 0.5) AS BIGINT) AS chi2_micro "
   "FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN t")
def stats_chi2_lang_source(spark, sf):
    """Chi-square independence cells for language × source over the
    corpus — is the language mix uniform across sources? Marginals are
    groupBys over the already-aggregated cells; the grand statistic is
    the exact integer sum of chi2_micro (operators.stats)."""
    from mura_spark.operators.stats import chi2_contingency
    d = table(spark, sf, "documents")
    return chi2_contingency(d, "lang", "source")


@q("emb_centroid_cosine",
   "WITH ex AS (SELECT label, "
   "unnest(list_zip(CAST(embedding AS DOUBLE[]), "
   "range(0, len(embedding)))) AS z FROM embeddings), "
   "cent AS (SELECT label, CAST(z[2] AS INT) AS pos, "
   "CAST(SUM(CAST(floor(z[1] * 1e9) AS HUGEINT)) AS DOUBLE) / 1e9 "
   "/ COUNT(*) AS c FROM ex GROUP BY 1, 2), "
   "dots AS (SELECT a.label AS la, b.label AS lb, "
   "SUM(CAST(floor(a.c * b.c * 1e12) AS DECIMAL(38,0))) AS dot "
   "FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label "
   "GROUP BY 1, 2), "
   "norms AS (SELECT label, "
   "SUM(CAST(floor(c * c * 1e12) AS DECIMAL(38,0))) AS n2 "
   "FROM cent GROUP BY 1) "
   "SELECT la AS label_a, lb AS label_b, "
   "CASE WHEN na.n2 > 0 AND nb.n2 > 0 THEN "
   "CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) "
   "* CAST(nb.n2 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) END AS cos_micro "
   "FROM dots JOIN norms na ON dots.la = na.label "
   "JOIN norms nb ON dots.lb = nb.label")
def emb_centroid_cosine(spark, sf):
    """Pairwise cosine between per-label embedding centroids — the
    class-separation matrix. Per-dimension products quantize to 1e12
    fixed point before the integer sum; the scales cancel in
    dot/sqrt(na*nb) (operators.similarity.centroid_cosine)."""
    from mura_spark.operators.similarity import centroid_cosine
    e = table(spark, sf, "embeddings")
    return centroid_cosine(e)


@q("events_path_trigrams",
   "WITH g AS (SELECT concat_ws('>', event_type, "
   "lead(event_type, 1) OVER w, lead(event_type, 2) OVER w) AS path, "
   "event_type IS NOT NULL AND lead(event_type, 1) OVER w IS NOT NULL "
   "AND lead(event_type, 2) OVER w IS NOT NULL AS fl FROM events "
   "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
   "SELECT path, COUNT(*) AS n_paths FROM g WHERE fl GROUP BY 1 "
   "ORDER BY n_paths DESC, path ASC LIMIT 20")
def events_path_trigrams(spark, sf):
    """Top-20 three-step user journeys (consecutive event-type paths per
    user timeline, ties broken by event_id then path) — sequence mining
    via lead windows, no self-joins; top-k is TakeOrderedAndProject
    (operators.funnel.path_ngrams)."""
    from mura_spark.operators.funnel import path_ngrams
    ev = table(spark, sf, "events")
    return path_ngrams(ev, "user_id", ["ts", "event_id"], "event_type",
                       n=3, k=20)


@q("text_quality_qnorm",
   f"WITH q AS (SELECT doc_id, source, "
   f"CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}) AS v "
   "FROM documents) "
   "SELECT doc_id, source, CAST(floor(percent_rank() OVER ("
   "PARTITION BY source ORDER BY v ASC, doc_id ASC) * 1e6 + 0.5) "
   "AS BIGINT) AS pr_micro FROM q")
def text_quality_qnorm(spark, sf):
    """Percent-rank quality normalization within each source — raw
    quality scores aren't comparable across sources, so mixture
    planning selects on the within-source rank instead
    (operators.profile.quantile_normalize); doc_id tiebreak keeps equal
    scores hash-stable."""
    from mura_spark.functions import text as TX
    from mura_spark.operators.profile import quantile_normalize
    d = table(spark, sf, "documents")
    base = d.select("doc_id", "source",
                    TX.distinct_token_ratio(F.col("text")).alias("v"))
    return quantile_normalize(base, "source", "v", "doc_id")


# ------------------------------------------------------- round-5i additions

_AUDIT_ACTIVE = "c_acctbal >= 0"


def _audit_block(name: str, child: str, fk: str, parent_sql: str,
                 pk: str) -> str:
    return (
        f"SELECT '{name}' AS relationship, "
        f"(SELECT COUNT(*) FROM {child}) AS n_child, "
        f"(SELECT COUNT(*) FROM {child} ch WHERE NOT EXISTS "
        f"(SELECT 1 FROM {parent_sql} p WHERE p.{pk} = ch.{fk})) "
        "AS n_orphan, "
        f"(SELECT COUNT(*) FROM {parent_sql} p WHERE NOT EXISTS "
        f"(SELECT 1 FROM {child} ch WHERE ch.{fk} = p.{pk})) "
        "AS n_unreferenced")


@q("audit_referential",
   _audit_block("orders_active_customer", "orders", "o_custkey",
                f"(SELECT * FROM customer WHERE {_AUDIT_ACTIVE})",
                "c_custkey")
   + " UNION ALL "
   + _audit_block("events_active_customer", "events", "user_id",
                  f"(SELECT * FROM customer WHERE {_AUDIT_ACTIVE})",
                  "c_custkey")
   + " UNION ALL "
   + _audit_block("lineitem_part", "lineitem", "l_partkey",
                  "part", "p_partkey"))
def audit_referential(spark, sf):
    """Referential-integrity audit: orders and events against the
    in-good-standing customer set (negative balances excluded — the
    retention-cleanup scenario, so orphans really occur), plus the clean
    lineitem→part relationship as the control row. Anti-join per
    direction, counts only (operators.profile.referential_audit)."""
    from mura_spark.operators.profile import referential_audit
    cust = table(spark, sf, "customer").filter(F.col("c_acctbal") >= 0)
    return referential_audit([
        ("orders_active_customer", table(spark, sf, "orders"),
         "o_custkey", cust, "c_custkey"),
        ("events_active_customer", table(spark, sf, "events"),
         "user_id", cust, "c_custkey"),
        ("lineitem_part", table(spark, sf, "lineitem"),
         "l_partkey", table(spark, sf, "part"), "p_partkey"),
    ])


_SNAP_A = "TIMESTAMP '1998-01-01'"
_SNAP_B = "TIMESTAMP '2000-01-01'"


@q("events_snapshot_diff",
   f"WITH a AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders "
   f"WHERE o_orderdate < {_SNAP_A} GROUP BY 1), "
   f"b AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders "
   f"WHERE o_orderdate < {_SNAP_B} GROUP BY 1) "
   "SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey, "
   "CASE WHEN a.o_custkey IS NULL THEN 'added' "
   "WHEN b.o_custkey IS NULL THEN 'removed' "
   "WHEN a.n_orders <> b.n_orders THEN 'changed' END AS change "
   "FROM a FULL JOIN b ON a.o_custkey = b.o_custkey "
   "WHERE (CASE WHEN a.o_custkey IS NULL THEN 'added' "
   "WHEN b.o_custkey IS NULL THEN 'removed' "
   "WHEN a.n_orders <> b.n_orders THEN 'changed' END) IS NOT NULL")
def events_snapshot_diff(spark, sf):
    """Snapshot diff of the per-customer order rollup at two cutoff
    dates — which customers appeared (added) or accumulated more orders
    (changed) between snapshots. One full-outer key shuffle with
    null-safe column comparison (operators.upsert.snapshot_diff)."""
    from mura_spark.operators.upsert import snapshot_diff
    orders = table(spark, sf, "orders")

    def snap(cutoff):
        return (orders.filter(F.col("o_orderdate") < F.lit(cutoff))
                      .groupBy("o_custkey")
                      .agg(F.count(F.lit(1)).alias("n_orders")))
    return snapshot_diff(snap("1998-01-01"), snap("2000-01-01"),
                         ["o_custkey"], ["n_orders"])


def _kcore_oracle() -> str:
    from mura_spark.operators.graph import sql_kcore_prune
    cte = (_SUPPORTED_EDGES_CTE.replace(
        "und AS (", "und AS MATERIALIZED (")
        + ", edges AS (SELECT a AS src, b AS dst FROM und)")
    return sql_kcore_prune(cte, 3, 3)


@q("graph_kcore_prune", _kcore_oracle())
def graph_kcore_prune(spark, sf):
    """Three rounds of degree-<3 pruning toward the 3-core of the
    support-≥2 co-purchase graph — the dense-substructure extractor
    (community seeds, spam-cluster detection). Per round one degree
    groupBy + two node-keyed semi-joins; fixed rounds keep it
    oracle-expressible, fixpoint looping is the same plan driven by a
    per-round scalar (operators.graph.kcore_prune)."""
    from mura_spark.operators.graph import (cooccurrence_edges_supported,
                                            kcore_prune)
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    edges = cooccurrence_edges_supported(li, "l_orderkey", "l_partkey",
                                         min_support=2)
    return kcore_prune(edges, k=3, rounds=3)


# ------------------------------------------------------- round-5j additions

@q("text_vocab_coverage",
   "WITH cnt AS (SELECT term, COUNT(*) AS cnt FROM "
   f"(SELECT unnest({_TOKS}) AS term FROM documents) GROUP BY 1), "
   "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM cnt), "
   "top AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) "
   "AS rn FROM cnt ORDER BY cnt DESC, term ASC LIMIT 50), "
   "perk AS (SELECT k, CAST(SUM(cnt) AS BIGINT) AS n_covered "
   "FROM top, (SELECT unnest([10, 25, 50]) AS k) ks "
   "WHERE rn <= k GROUP BY 1) "
   "SELECT k, n_covered, CAST(floor(CAST(n_covered AS DOUBLE) "
   "/ CAST(t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
   "AS coverage_micro FROM perk CROSS JOIN tot")
def text_vocab_coverage(spark, sf):
    """Vocabulary-budget curve: token-occurrence coverage of the top
    {10, 25, 50} most frequent tokens — the tokenizer-size planning
    query. Top-k is distributed partial top-k; every per-k sum runs
    over that bounded frame (operators.corpus.vocab_coverage)."""
    from mura_spark.operators.corpus import vocab_coverage
    d = table(spark, sf, "documents")
    return vocab_coverage(d, "text", [10, 25, 50])


@q("text_unigram_logloss",
   f"WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term "
   "FROM documents), "
   "cnt AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1), "
   "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt), "
   "sup AS (SELECT term, CAST(floor(ln(CAST(t AS DOUBLE) "
   "/ CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS s "
   "FROM cnt CROSS JOIN tot), "
   "perdoc AS (SELECT doc_id, COUNT(*) AS n_tokens, "
   "CAST(SUM(s) AS BIGINT) AS sm FROM tok JOIN sup USING (term) "
   "GROUP BY 1) "
   "SELECT doc_id, n_tokens, CAST(floor(CAST(sm AS DOUBLE) "
   "/ CAST(n_tokens AS DOUBLE)) AS BIGINT) AS logloss_micro "
   "FROM perdoc")
def text_unigram_logloss(spark, sf):
    """Per-document unigram LM surprisal (CCNet-style LM quality
    filter): mean corpus surprisal of the document's tokens, quantized
    per term before any sum. High = gibberish/rare-language leak, low =
    boilerplate (operators.corpus.unigram_logloss)."""
    from mura_spark.operators.corpus import unigram_logloss
    d = table(spark, sf, "documents")
    return unigram_logloss(d, "doc_id", "text")


@q("events_cumulative_users",
   "WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events "
   "GROUP BY 1), "
   "d AS (SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS bucket_start, "
   "COUNT(*) AS n_new FROM f GROUP BY 1) "
   "SELECT bucket_start, n_new, CAST(SUM(n_new) OVER (ORDER BY "
   "bucket_start ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
   "AS BIGINT) AS cum_total FROM d")
def events_cumulative_users(spark, sf):
    """Audience-growth curve: first-time users per day + running
    distinct-user total — the scalable first-touch formulation (min-ts
    per user, never an expanding COUNT DISTINCT); the running sum
    windows over the calendar-sized bucket table only
    (operators.rolling.cumulative_users)."""
    from mura_spark.operators.rolling import cumulative_users
    ev = table(spark, sf, "events")
    return cumulative_users(ev, "user_id", "ts", "DAY")


@q("events_decayed_value",
   "WITH ref AS (SELECT MAX(ts) AS r FROM events) "
   "SELECT user_id, CAST(SUM(CAST(floor(CAST(value AS DOUBLE) "
   "* pow(2.0, -(CAST(epoch_us(r) - epoch_us(ts) AS DOUBLE) "
   "/ 3600000000.0) / 168.0) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) "
   "AS decayed_micro FROM events CROSS JOIN ref GROUP BY 1")
def events_decayed_value(spark, sf):
    """Recency-weighted engagement per user (one-week half-life,
    referenced to the newest event): per-event exponential decay
    quantizes to micro-units BEFORE the per-user sum, keeping the
    engine-ulp-sensitive pow out of any float aggregation
    (operators.rolling.decayed_value)."""
    from mura_spark.operators.rolling import decayed_value
    ev = table(spark, sf, "events")
    return decayed_value(ev, "user_id", "ts", "value",
                         half_life_hours=168.0)


def _knn_confusion_oracle() -> str:
    from mura_spark.suite import similarity_q
    knn = similarity_q.ORACLE_SQL["emb_knn_classify"]
    return (
        "SELECT c.true_label, c.pred_label, c.n, "
        "CAST(floor(CAST(c.n AS DOUBLE) / CAST(rt.rt AS DOUBLE) "
        "* 1000000.0 + 0.5) AS BIGINT) AS recall_micro "
        f"FROM (SELECT true_label, pred_label, COUNT(*) AS n FROM ({knn}) "
        "GROUP BY 1, 2) c "
        f"JOIN (SELECT true_label, COUNT(*) AS rt FROM ({knn}) "
        "GROUP BY 1) rt ON c.true_label = rt.true_label")


@q("emb_knn_confusion", _knn_confusion_oracle())
def emb_knn_confusion(spark, sf):
    """Confusion matrix + per-cell recall share over the 10-NN
    classifier's predictions — the evaluation rollup closing the
    embedding-classification loop (operators.similarity
    .confusion_matrix on knn_classify's output)."""
    from mura_spark.operators.similarity import (confusion_matrix,
                                                 knn_classify)
    e = table(spark, sf, "embeddings")
    pred = knn_classify(e.filter(F.col("vec_id") < 50),
                        e.filter(F.col("vec_id") >= 50), 10)
    return confusion_matrix(pred)


@q("audit_benford",
   "WITH cells AS (SELECT CAST(substr(CAST(CAST(floor("
   "CAST(o_totalprice AS DOUBLE)) AS BIGINT) AS VARCHAR), 1, 1) AS INT) "
   "AS dg, COUNT(*) AS obs FROM orders WHERE o_totalprice >= 1 "
   "GROUP BY 1), "
   "tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells), "
   "cellsg AS (SELECT g.digit, CAST(coalesce(c.obs, 0) AS BIGINT) "
   "AS observed FROM (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit) g "
   "LEFT JOIN cells c ON g.digit = c.dg) "
   "SELECT digit, observed, "
   "CAST(floor(CAST(n AS DOUBLE) * log10(1.0 + 1.0 "
   "/ CAST(digit AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) "
   "AS expected_micro, "
   "CAST(floor((CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) "
   "* log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) "
   "* (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) "
   "* log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) "
   "/ (CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) "
   "* 1000000.0 + 0.5) AS BIGINT) AS chi2_micro "
   "FROM cellsg CROSS JOIN tot")
def audit_benford(spark, sf):
    """First-digit Benford audit of order totals — the fabricated-
    numbers screen. Nine groups, broadcast total, per-row quantized
    log10 expectation (operators.profile.benford_audit)."""
    from mura_spark.operators.profile import benford_audit
    o = table(spark, sf, "orders")
    return benford_audit(o, "o_totalprice")


def _pctl_oracle() -> str:
    from mura_spark.operators.stats import sql_group_percentiles
    return sql_group_percentiles("events", ["event_type"], "value",
                                 [0.5, 0.95], ["p50", "p95"])


@q("events_value_p50_p95_by_type", _pctl_oracle())
def events_value_p50_p95_by_type(spark, sf):
    """Exact interpolated p50/p95 per event type — the per-segment SLO
    rollup, computed from EXPLICIT order statistics mirrored verbatim in
    the oracle (engine percentile aggregates interpolate with an
    unspecified association order, so their raw doubles are not
    hash-safe — operators.stats.group_percentiles). The approximate
    sketch twin is sketch_value_percentiles."""
    from mura_spark.operators.stats import group_percentiles
    ev = table(spark, sf, "events")
    return group_percentiles(ev, ["event_type"], "value",
                             [0.5, 0.95], ["p50", "p95"])


# ------------------------------------------------------- round-5l additions

_SPAN_SEC = lambda c: f"CAST(floor(epoch({c})) AS BIGINT)"  # noqa: E731


@q("events_funnel_1h",
   f"WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
   "WHERE event_type = 'view' GROUP BY user_id), "
   "s2 AS (SELECT e.user_id, MIN(t1) AS t1, MIN(ts) AS t2 "
   "FROM events e JOIN s1 ON e.user_id = s1.user_id "
   "WHERE event_type = 'click' AND ts > t1 "
   f"AND {_SPAN_SEC('ts')} <= {_SPAN_SEC('t1')} + 3600 "
   "GROUP BY e.user_id), "
   "s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e "
   "JOIN s2 ON e.user_id = s2.user_id "
   "WHERE event_type = 'purchase' AND ts > t2 "
   f"AND {_SPAN_SEC('ts')} <= {_SPAN_SEC('t1')} + 3600 "
   "GROUP BY e.user_id) "
   "SELECT 1 AS step, 'view' AS step_name, "
   "(SELECT COUNT(*) FROM s1) AS n_users "
   "UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2) "
   "UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)")
def events_funnel_1h(spark, sf):
    """Horizon-bounded funnel: view → click → purchase where every later
    step must land within one hour of the user's first view — the
    conversion-window semantics product analytics actually uses
    (operators.funnel.funnel_counts with max_span_seconds; the span
    compares floor-seconds on both engines)."""
    from mura_spark.operators.funnel import funnel_counts
    ev = table(spark, sf, "events")
    return funnel_counts(ev, "user_id", "event_type", "ts",
                         ["view", "click", "purchase"],
                         max_span_seconds=3600)


_CENT_CTE = (
    "ex AS (SELECT label, "
    "unnest(list_zip(CAST(embedding AS DOUBLE[]), "
    "range(0, len(embedding)))) AS z FROM embeddings), "
    "cent AS (SELECT label, CAST(z[2] AS INT) AS pos, "
    "CAST(SUM(CAST(floor(z[1] * 1e9) AS HUGEINT)) AS DOUBLE) / 1e9 "
    "/ COUNT(*) AS c FROM ex GROUP BY 1, 2)")


@q("emb_outlier_distance",
   f"WITH {_CENT_CTE}, "
   "comp AS (SELECT vec_id, label, "
   "unnest(list_zip(CAST(embedding AS DOUBLE[]), "
   "range(0, len(embedding)))) AS z FROM embeddings), "
   "dist AS (SELECT vec_id, comp.label, "
   "CAST(SUM(CAST(floor((z[1] - c) * (z[1] - c) * 1e12) "
   "AS DECIMAL(38,0))) AS BIGINT) AS dist2_fp "
   "FROM comp JOIN cent ON comp.label = cent.label "
   "AND CAST(z[2] AS INT) = cent.pos GROUP BY 1, 2), "
   "ranked AS (SELECT label, dist2_fp, "
   "CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY dist2_fp) - 1 "
   "AS BIGINT) AS i, COUNT(*) OVER (PARTITION BY label) AS n FROM dist), "
   "agg AS (SELECT label, ANY_VALUE(n) AS n, "
   "MAX(CASE WHEN i = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.95) "
   "AS BIGINT) THEN dist2_fp END) AS lo, "
   "MAX(CASE WHEN i = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.95) "
   "AS BIGINT) + 1 THEN dist2_fp END) AS hi FROM ranked GROUP BY 1), "
   "thr AS (SELECT label, CAST(lo AS DOUBLE) "
   "+ (CAST(coalesce(hi, lo) AS DOUBLE) - CAST(lo AS DOUBLE)) "
   "* (CAST(n - 1 AS DOUBLE) * 0.95 "
   "- floor(CAST(n - 1 AS DOUBLE) * 0.95)) AS t FROM agg) "
   "SELECT vec_id, dist.label AS label, dist2_fp FROM dist "
   "JOIN thr ON dist.label = thr.label "
   "WHERE CAST(dist2_fp AS DOUBLE) > t")
def emb_outlier_distance(spark, sf):
    """Per-label embedding outliers: vectors beyond their class's exact
    p95 centroid distance — the mislabel screen before training on
    labeled embeddings. Fixed-point distance sums + explicit
    order-statistics threshold (operators.similarity.centroid_outliers)."""
    from mura_spark.operators.similarity import centroid_outliers
    e = table(spark, sf, "embeddings")
    return centroid_outliers(e, p=0.95)


# ------------------------------------------------------- round-5m additions

@q("events_time_to_convert",
   "WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events "
   "WHERE event_type = 'view' GROUP BY 1), "
   "p AS (SELECT e.user_id, MIN(ts) AS tp FROM events e "
   "JOIN v ON e.user_id = v.user_id "
   "WHERE event_type = 'purchase' AND ts > tv GROUP BY e.user_id), "
   "d AS (SELECT CAST(floor(CAST(epoch_us(tp) - epoch_us(tv) AS DOUBLE) "
   "/ 60000000.0) AS BIGINT) AS mins FROM v JOIN p USING (user_id)) "
   "SELECT CAST(mins - mins % 10 AS BIGINT) AS bucket_min, "
   "COUNT(*) AS n_users FROM d GROUP BY 1")
def events_time_to_convert(spark, sf):
    """Time-to-convert distribution: minutes between a user's first view
    and first subsequent purchase, bucketed to 10-minute bins — the
    latency histogram behind funnel decisions. Two |users|-row
    aggregates, one join, pure integer bucket math."""
    ev = table(spark, sf, "events")
    v = (ev.filter(F.col("event_type") == "view")
           .groupBy("user_id").agg(F.min("ts").alias("tv")))
    p = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", F.col("ts").alias("__ts"))
           .join(v, "user_id")
           .filter(F.col("__ts") > F.col("tv"))
           .groupBy("user_id").agg(F.min("__ts").alias("tp")))
    mins = F.floor((F.unix_micros("tp") - F.unix_micros("tv"))
                   .cast("double") / F.lit(60000000.0))
    d = v.join(p, "user_id").select(mins.alias("mins"))
    return (d.select((F.col("mins") - F.col("mins") % 10)
                     .cast("bigint").alias("bucket_min"))
             .groupBy("bucket_min")
             .agg(F.count(F.lit(1)).alias("n_users")))


def _langid_conf_oracle() -> str:
    from mura_spark.functions.text import LANG_STOPWORDS
    hits = {lang: (f"len(list_filter({_TOKS}, t -> list_contains("
                   f"[{', '.join(repr(w) for w in words)}], t)))")
            for lang, words in sorted(LANG_STOPWORDS.items())}
    total = " + ".join(hits.values())
    top = "greatest(" + ", ".join(hits.values()) + ")"
    return (
        f"WITH h AS (SELECT doc_id, {total} AS hits_total, "
        f"{top} AS top_hits FROM documents) "
        "SELECT doc_id, CAST(hits_total AS BIGINT) AS hits_total, "
        "CAST(floor(CAST(top_hits AS DOUBLE) "
        "/ CAST(hits_total AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
        "AS top_share_micro, "
        "CAST(top_hits AS DOUBLE) / CAST(hits_total AS DOUBLE) < 0.6 "
        "AS is_ambiguous FROM h WHERE hits_total >= 4")


@q("text_langid_confidence", _langid_conf_oracle())
def text_langid_confidence(spark, sf):
    """Language-ID confidence screen: per doc, the dominant language's
    share of all stopword hits across the five language lists — docs
    under 60% are ambiguous (mixed-language or boilerplate), the rows a
    curation pass routes to review. Pure JVM expressions over the shared
    tokenizer, one scan, no shuffle before the verifying aggregate."""
    from mura_spark.functions import text as TX
    d = table(spark, sf, "documents")
    toks = TX.tokens(F.col("text"))
    hits = {lang: TX.stopword_count(toks, words)
            for lang, words in sorted(TX.LANG_STOPWORDS.items())}
    from mura_spark.functions.quantize import micro
    # single-pass counting: explode the tokens ONCE and take all five
    # language counts as conditional sums in one map-side-combined
    # aggregate. The single-select HOF form evaluates the tokenizer once
    # per referencing expression (CollapseProject inlines any staging
    # projection, so Spark never CSEs the chains) — measured ~10
    # tokenizations per row; counts are exact ints, so the oracle's
    # independent per-list filters still hash-match.
    tok = d.select("doc_id", F.explode(toks).alias("__t"))
    cnts = tok.groupBy("doc_id").agg(*[
        F.sum(F.col("__t").isin(*words).cast("int")).alias(f"__h_{lang}")
        for lang, words in sorted(TX.LANG_STOPWORDS.items())])
    vals = [F.col(f"__h_{lang}") for lang in sorted(TX.LANG_STOPWORDS)]
    total = vals[0]
    for v in vals[1:]:
        total = total + v
    top = F.greatest(*vals)
    share = F.col("__top").cast("double") / F.col("hits_total").cast("double")
    return (cnts.select("doc_id", total.alias("hits_total"),
                        top.alias("__top"))
                .filter(F.col("hits_total") >= 4)
                .select("doc_id",
                        F.col("hits_total").cast("bigint")
                         .alias("hits_total"),
                        micro(share).alias("top_share_micro"),
                        (share < F.lit(0.6)).alias("is_ambiguous")))


# ------------------------------------------------------- round-5n additions

@q("text_dedup_rate_by_source",
   "WITH h AS (SELECT source, md5(text) AS hh FROM documents), "
   "c AS (SELECT hh, COUNT(*) AS n FROM h GROUP BY 1) "
   "SELECT source, COUNT(*) AS n_docs, "
   "CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) "
   "AS n_dup_docs, "
   "CAST(floor(CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE) "
   "/ CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
   "AS dup_rate_micro "
   "FROM h JOIN c USING (hh) GROUP BY 1")
def text_dedup_rate_by_source(spark, sf):
    """Corpus-health rollup: per source, how many documents share their
    exact text with ANY other document (corpus-wide duplicate clusters,
    MD5 content key — the portable hash convention). One content-hash
    shuffle for cluster sizes, joined back on the hash; the rate is an
    exact-int division, micro-floored."""
    from mura_spark.functions.quantize import micro
    d = table(spark, sf, "documents")
    h = d.select("source", F.md5(F.col("text")).alias("hh"))
    c = h.groupBy("hh").agg(F.count(F.lit(1)).alias("n"))
    dup = F.sum((F.col("n") > 1).cast("int")).cast("bigint")
    rate = dup.cast("double") / F.count(F.lit(1)).cast("double")
    return (h.join(c, "hh")
             .groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  dup.alias("n_dup_docs"),
                  micro(rate).alias("dup_rate_micro")))


@q("events_dau_wau",
   "WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id "
   "FROM events), "
   "days AS (SELECT DISTINCT d AS day FROM du), "
   "wau AS (SELECT days.day, COUNT(DISTINCT du.user_id) AS wau "
   "FROM days JOIN du ON du.d <= days.day "
   "AND du.d >= days.day - INTERVAL 6 DAY GROUP BY 1), "
   "dau AS (SELECT d AS day, COUNT(*) AS dau FROM du GROUP BY 1) "
   "SELECT dau.day, dau, wau FROM dau JOIN wau USING (day)")
def events_dau_wau(spark, sf):
    """Daily + trailing-7-day active users — THE engagement dashboard
    pair. Rolling DISTINCT cannot ride a running-sum window, so the WAU
    side joins the deduplicated (day, user) table against the
    BROADCAST day grid (≤7 grid rows match per day-user row — bounded
    fanout, calendar-sized build side) and de-counts once per window.
    The raw event stream reduces to day-user pairs first; nothing
    bigger ever shuffles."""
    ev = table(spark, sf, "events")
    du = (ev.select(F.date_trunc("DAY", "ts").alias("d"), "user_id")
            .distinct())
    days = du.select(F.col("d").alias("day")).distinct()
    wau = (du.join(F.broadcast(days),
                   (F.col("d") <= F.col("day"))
                   & (F.col("d") >= F.col("day")
                      - F.expr("INTERVAL 6 DAYS")))
             .groupBy("day")
             .agg(F.countDistinct("user_id").alias("wau")))
    dau = (du.groupBy(F.col("d").alias("day"))
             .agg(F.count(F.lit(1)).alias("dau")))
    return dau.join(wau, "day").select("day", "dau", "wau")


@q("parts_abc_pareto",
   "WITH rev AS (SELECT l_partkey, "
   "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) "
   "AS DECIMAL(28,4)) AS r FROM lineitem GROUP BY 1), "
   "tot AS (SELECT CAST(SUM(r) AS DOUBLE) AS t FROM rev), "
   "c AS (SELECT l_partkey, r, CAST(SUM(r) OVER (ORDER BY r DESC, "
   "l_partkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
   "AS DOUBLE) AS cum FROM rev), "
   "cls AS (SELECT CASE WHEN cum / t <= 0.8 THEN 'A' "
   "WHEN cum / t <= 0.95 THEN 'B' ELSE 'C' END AS abc_class, r "
   "FROM c CROSS JOIN tot) "
   "SELECT abc_class, COUNT(*) AS n_parts, "
   "CAST(SUM(CAST(r AS DECIMAL(28,4))) AS DOUBLE) AS revenue "
   "FROM cls GROUP BY 1")
def parts_abc_pareto(spark, sf):
    """ABC / Pareto inventory classification: parts ranked by revenue,
    classified by cumulative share (A ≤ 80%, B ≤ 95%, C rest). The
    running sum is exact decimal over the PART-level rollup (the window
    input is dimension-sized, not fact-sized — the single-partition
    ordering is bounded by the part count); class boundaries compare
    deterministic doubles derived from exact decimal sums."""
    li = table(spark, sf, "lineitem")
    from pyspark.sql import Window
    rev = (li.groupBy("l_partkey")
             .agg(F.sum((F.col("l_extendedprice")
                         * (F.lit(1) - F.col("l_discount")))
                        .cast("decimal(18,4)"))
                   .cast("decimal(28,4)").alias("r")))
    tot = rev.agg(F.sum("r").cast("double").alias("t"))
    w = (Window.orderBy(F.col("r").desc(), F.col("l_partkey").asc())
               .rowsBetween(Window.unboundedPreceding, 0))
    c = rev.select("l_partkey", "r",
                   F.sum("r").over(w).cast("double").alias("cum"))
    share = F.col("cum") / F.col("t")
    cls = (c.crossJoin(F.broadcast(tot))
            .select(F.when(share <= 0.8, "A")
                     .when(share <= 0.95, "B")
                     .otherwise("C").alias("abc_class"), "r"))
    return (cls.groupBy("abc_class")
               .agg(F.count(F.lit(1)).alias("n_parts"),
                    F.sum(F.col("r").cast("decimal(28,4)"))
                     .cast("double").alias("revenue")))


# ------------------------------------------------------- round-5o additions

_AB_BUCKET = ("CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) "
              "AS BIGINT) % 1000")


@q("stats_ab_ztest",
   f"WITH u AS (SELECT user_id, {_AB_BUCKET} % 2 AS variant, "
   "CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) "
   ">= 15 THEN 1 ELSE 0 END AS conv FROM events GROUP BY 1), "
   "v AS (SELECT variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c "
   "FROM u GROUP BY 1), "
   "w AS (SELECT MAX(CASE WHEN variant = 0 THEN n END) AS na, "
   "MAX(CASE WHEN variant = 0 THEN c END) AS ca, "
   "MAX(CASE WHEN variant = 1 THEN n END) AS nb, "
   "MAX(CASE WHEN variant = 1 THEN c END) AS cb FROM v) "
   "SELECT na, ca, nb, cb, "
   "CAST(floor(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) * 1000000.0 "
   "+ 0.5) AS BIGINT) AS rate_a_micro, "
   "CAST(floor(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) * 1000000.0 "
   "+ 0.5) AS BIGINT) AS rate_b_micro, "
   "CASE WHEN ca + cb > 0 AND ca + cb < na + nb THEN "
   "CAST(floor((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) "
   "- CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) "
   "/ sqrt(CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE) "
   "* (1.0 - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE)) "
   "* (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))) "
   "* 1000000.0 + 0.5) AS BIGINT) END AS z_micro FROM w")
def stats_ab_ztest(spark, sf):
    """Two-proportion z-test over a deterministic hash-bucketed A/B
    split of users (conversion = any purchase) — the experimentation
    readout. Assignment reuses the portable MD5 bucket convention;
    the statistic combines exact integer counts with one mirrored
    double expression (÷, √ only), micro-floored."""
    from mura_spark.functions.hashing import md5_hash48
    from mura_spark.functions.quantize import micro
    ev = table(spark, sf, "events")
    u = (ev.groupBy("user_id")
           .agg((F.sum((F.col("event_type") == "purchase").cast("int"))
                 >= 15).cast("int").alias("conv"))
           .select((md5_hash48(F.col("user_id").cast("string"))
                    % 1000 % 2).alias("variant"), "conv"))
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").cast("bigint").alias("c"))
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("ca"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("cb"))
    na, ca = F.col("na").cast("double"), F.col("ca").cast("double")
    nb, cb = F.col("nb").cast("double"), F.col("cb").cast("double")
    pool = (F.col("ca") + F.col("cb")).cast("double") \
        / (F.col("na") + F.col("nb")).cast("double")
    z = ((ca / na - cb / nb)
         / F.sqrt(pool * (F.lit(1.0) - pool)
                  * (F.lit(1.0) / na + F.lit(1.0) / nb)))
    tot_c = F.col("ca") + F.col("cb")
    tot_n = F.col("na") + F.col("nb")
    # degenerate pool (0% or 100% conversion) -> z undefined: NULL, not
    # a DIVIDE_BY_ZERO abort under ANSI
    return w.select("na", "ca", "nb", "cb",
                    micro(ca / na).alias("rate_a_micro"),
                    micro(cb / nb).alias("rate_b_micro"),
                    F.when((tot_c > 0) & (tot_c < tot_n),
                           micro(z)).alias("z_micro"))


@q("events_interarrival_stats",
   "WITH d AS (SELECT event_type, epoch_us(ts) "
   "- lag(epoch_us(ts)) OVER (PARTITION BY event_type "
   "ORDER BY ts, event_id) AS gap FROM events), "
   "m AS (SELECT event_type, COUNT(gap) AS n, "
   "CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s, "
   "SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS q "
   "FROM d WHERE gap IS NOT NULL GROUP BY 1) "
   "SELECT event_type, n, "
   "CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0 + 0.5) "
   "AS BIGINT) AS mean_ms, "
   "CAST(floor(sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE) "
   "- CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) "
   "/ (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 1000.0 + 0.5) "
   "AS BIGINT) AS std_ms FROM m")
def events_interarrival_stats(spark, sf):
    """Inter-arrival time mean/std per event type (burstiness monitor):
    lag deltas in exact epoch-microseconds, moments in exact DECIMAL,
    one mirrored closed form (÷, √) floored to milliseconds. One window
    shuffle on the type key + one reduced aggregate."""
    from pyspark.sql import Window
    ev = table(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    d = ev.select("event_type",
                  (us - F.lag(us).over(w)).alias("gap"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = (d.filter(F.col("gap").isNotNull())
          .groupBy("event_type")
          .agg(F.count("gap").alias("n"),
               F.sum(F.col("gap").cast("decimal(38,0)"))
                .cast("decimal(38,0)").alias("s"),
               F.sum(dec("gap") * dec("gap")).alias("q")))
    n, s, qq = (F.col("n").cast("double"), F.col("s").cast("double"),
                F.col("q").cast("double"))
    mean_ms = F.floor(s / n / F.lit(1000.0) + F.lit(0.5)).cast("bigint")
    std_ms = F.floor(
        F.sqrt((n * qq - s * s)
               / (n * (F.col("n") - F.lit(1)).cast("double")))
        / F.lit(1000.0) + F.lit(0.5)).cast("bigint")
    return m.select("event_type", "n", mean_ms.alias("mean_ms"),
                    std_ms.alias("std_ms"))


@q("audit_value_ranges",
   "SELECT 'value_nonnegative' AS rule, "
   "CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT) AS n_violations "
   "FROM events "
   "UNION ALL SELECT 'value_under_cap', "
   "CAST(COUNT(*) FILTER (WHERE value > 400) AS BIGINT) FROM events "
   "UNION ALL SELECT 'business_event_type', "
   "CAST(COUNT(*) FILTER (WHERE event_type NOT IN "
   "('view', 'click', 'purchase', 'signup')) AS BIGINT) FROM events")
def audit_value_ranges(spark, sf):
    """Data-contract audit: violation counts per declared rule
    (non-negative values, value cap, allowed business event types —
    'error' rows violate the contract by design). ONE scan: all rules
    ride as conditional counts in a single aggregate, then unpivot to
    (rule, n_violations) rows."""
    ev = table(spark, sf, "events")
    cnt = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    wide = ev.agg(
        cnt(F.col("value") < 0).alias("v_neg"),
        cnt(F.col("value") > 400).alias("v_cap"),
        cnt(~F.col("event_type").isin("view", "click", "purchase",
                                      "signup")).alias("v_type"))
    return wide.select(F.expr(
        "stack(3, 'value_nonnegative', v_neg, "
        "'value_under_cap', v_cap, "
        "'business_event_type', v_type) AS (rule, n_violations)"))


# ------------------------------------------------------- round-5p addition

@q("pipeline_corpus_health",
   "WITH h AS (SELECT source, md5(text) AS hh FROM documents), "
   "c AS (SELECT hh, COUNT(*) AS n FROM h GROUP BY 1), "
   "dup AS (SELECT source, COUNT(*) AS n_docs, "
   "CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup "
   "FROM h JOIN c USING (hh) GROUP BY 1), "
   "tok AS (SELECT doc_id, source, unnest("
   + sql_tokens("text") + ") AS term FROM documents), "
   "langc AS (SELECT doc_id, source, "
   + ", ".join(
       f"SUM(CASE WHEN list_contains([{', '.join(repr(w) for w in ws)}], "
       f"term) THEN 1 ELSE 0 END) AS h_{lg}"
       for lg, ws in [("de", ["der", "die", "und", "ein", "zu"]),
                      ("en", ["the", "a", "of", "and", "to"]),
                      ("es", ["el", "la", "de", "y", "que"]),
                      ("fr", ["le", "la", "et", "un", "que"]),
                      ("zh", ["的", "是", "了", "在", "我"])])
   + " FROM tok GROUP BY 1, 2), "
   "amb AS (SELECT source, COUNT(*) AS n_scored, "
   "CAST(SUM(CASE WHEN CAST(greatest(h_de, h_en, h_es, h_fr, h_zh) "
   "AS DOUBLE) / CAST(h_de + h_en + h_es + h_fr + h_zh AS DOUBLE) "
   "< 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_ambiguous FROM langc "
   "WHERE h_de + h_en + h_es + h_fr + h_zh >= 4 GROUP BY 1) "
   "SELECT dup.source, n_docs, "
   "CAST(floor(CAST(n_dup AS DOUBLE) / CAST(n_docs AS DOUBLE) "
   "* 1000000.0 + 0.5) AS BIGINT) AS dup_rate_micro, "
   "CAST(floor(CAST(n_ambiguous AS DOUBLE) / CAST(n_scored AS DOUBLE) "
   "* 1000000.0 + 0.5) AS BIGINT) AS ambiguous_rate_micro "
   "FROM dup JOIN amb ON dup.source = amb.source")
def pipeline_corpus_health(spark, sf):
    """End-to-end corpus-health report per source: exact-duplicate rate
    (corpus-wide MD5 clusters) joined with the mixed-language/ambiguous
    rate (dominant-language share < 60%) — the one-look dashboard a
    curation run checks before admitting a source. Composes the dedup
    and language-confidence pipelines; each side is one reduced shuffle
    and the final join is source-dimension-sized."""
    from mura_spark.functions import text as TX
    from mura_spark.functions.quantize import micro
    d = table(spark, sf, "documents")
    h = d.select("source", F.md5(F.col("text")).alias("hh"))
    csize = h.groupBy("hh").agg(F.count(F.lit(1)).alias("n"))
    dup = (h.join(csize, "hh")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n") > 1).cast("int")).cast("bigint")
                  .alias("n_dup")))
    tok = d.select("doc_id", "source",
                   F.explode(TX.tokens(F.col("text"))).alias("__t"))
    langc = tok.groupBy("doc_id", "source").agg(*[
        F.sum(F.col("__t").isin(*ws).cast("int")).alias(f"h_{lg}")
        for lg, ws in sorted(TX.LANG_STOPWORDS.items())])
    vals = [F.col(f"h_{lg}") for lg in sorted(TX.LANG_STOPWORDS)]
    total = vals[0]
    for v in vals[1:]:
        total = total + v
    share = F.greatest(*vals).cast("double") / total.cast("double")
    amb = (langc.filter(total >= 4)
                .groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_scored"),
                     F.sum((share < 0.6).cast("int")).cast("bigint")
                      .alias("n_ambiguous")))
    dup_rate = F.col("n_dup").cast("double") / F.col("n_docs").cast("double")
    amb_rate = (F.col("n_ambiguous").cast("double")
                / F.col("n_scored").cast("double"))
    return (dup.join(amb, "source")
               .select("source", "n_docs",
                       micro(dup_rate).alias("dup_rate_micro"),
                       micro(amb_rate).alias("ambiguous_rate_micro")))


# ------------------------------------------------------- round-5q additions

@q("supplier_concentration_hhi",
   "WITH sr AS (SELECT s_nationkey, l_suppkey, "
   "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
   "AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS r "
   "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
   "GROUP BY 1, 2), "
   "nt AS (SELECT s_nationkey, CAST(SUM(r) AS DOUBLE) AS t, "
   "COUNT(*) AS n_suppliers FROM sr GROUP BY 1) "
   "SELECT n_name AS nation, n_suppliers, "
   "CAST(SUM(CAST(floor(CAST(r AS DOUBLE) / t * (CAST(r AS DOUBLE) / t) "
   "* 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hhi_micro "
   "FROM sr JOIN nt USING (s_nationkey) "
   "JOIN nation ON s_nationkey = n_nationkey "
   "GROUP BY 1, 2")
def supplier_concentration_hhi(spark, sf):
    """Herfindahl-Hirschman supplier-concentration index per nation —
    the market-concentration monitor (monopolized supply chains light
    up toward 10⁶). Per-supplier revenue shares square per row and
    quantize to micro BEFORE the per-nation sum (exact integer
    aggregation); revenue itself is the exact DECIMAL(18,4) convention.
    Plan: fact rollup to supplier grain, nation totals over the rollup,
    broadcast dims."""
    from mura_spark.functions.quantize import micro
    li = table(spark, sf, "lineitem")
    sup = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf, "nation").select("n_nationkey", "n_name")
    sr = (li.join(F.broadcast(sup),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_nationkey", "l_suppkey")
            .agg(F.sum((F.col("l_extendedprice")
                        * (F.lit(1) - F.col("l_discount")))
                       .cast("decimal(18,4)"))
                  .cast("decimal(28,4)").alias("r")))
    nt = (sr.groupBy("s_nationkey")
            .agg(F.sum("r").cast("double").alias("t"),
                 F.count(F.lit(1)).alias("n_suppliers")))
    share = F.col("r").cast("double") / F.col("t")
    contrib = micro(share * share)
    return (sr.join(F.broadcast(nt), "s_nationkey")
              .join(F.broadcast(nat),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
              .agg(F.sum(contrib).cast("bigint").alias("hhi_micro")))


@q("text_ngram_novelty",
   "WITH sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[i:i+2], ' ') for i in range(1, greatest(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) - 2, 1) + 1)])) AS s "
   "FROM documents), "
   "df AS (SELECT s, COUNT(DISTINCT doc_id) AS d FROM sh GROUP BY 1) "
   "SELECT doc_id, COUNT(*) AS n_shingles, "
   "CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, "
   "CAST(floor(CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
   "/ CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
   "AS novelty_micro "
   "FROM sh JOIN df USING (s) GROUP BY 1")
def text_ngram_novelty(spark, sf):
    """Per-document shingle novelty: the share of a document's distinct
    3-gram shingles appearing in NO other document — the inverse of the
    boilerplate signal (novel-content scoring for dedup-adjacent
    curation). One shingle-keyed shuffle for document frequencies,
    joined back on the shingle; exact-int rate, micro-floored."""
    from mura_spark.functions.quantize import micro
    from mura_spark.operators.dedup import shingle_sets
    d = table(spark, sf, "documents")
    # Arrow-batched shingle kernel (~1% of the interpreted HOF's CPU;
    # output pinned identical in tests/test_text.py)
    sh = (shingle_sets(d, "doc_id", "text")
          .select("doc_id", F.explode("shset").alias("s")))
    dfreq = sh.groupBy("s").agg(F.countDistinct("doc_id").alias("d"))
    novel = F.sum((F.col("d") == 1).cast("int")).cast("bigint")
    rate = novel.cast("double") / F.count(F.lit(1)).cast("double")
    return (sh.join(dfreq, "s")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_shingles"),
                   novel.alias("n_novel"),
                   micro(rate).alias("novelty_micro")))


# ------------------------------------------------------- round-5r additions

def _ks_oracle() -> str:
    from mura_spark.operators.stats import sql_ks_2sample
    return sql_ks_2sample("events", "value", "event_type",
                          "click", "purchase")


@q("stats_ks_value", _ks_oracle())
def stats_ks_value(spark, sf):
    """Two-sample Kolmogorov–Smirnov D between click and purchase value
    distributions — the distribution-shift monitor a pipeline runs when
    an upstream schema/source change lands. Exact-integer ECDF numerator
    in DECIMAL, one terminal division micro-floored
    (operators.stats.ks_2sample); groupBy reduces to the bounded cents
    domain before the cumulative window."""
    from mura_spark.operators.stats import ks_2sample
    ev = table(spark, sf, "events")
    return ks_2sample(ev, "value", "event_type", "click", "purchase")


def _mwu_oracle() -> str:
    from mura_spark.operators.stats import sql_mannwhitney_u
    return sql_mannwhitney_u("events", "value", "event_type",
                             "click", "purchase")


@q("stats_mwu_value", _mwu_oracle())
def stats_mwu_value(spark, sf):
    """Mann–Whitney U (mid-rank ties) between click and purchase values:
    exact doubled-U integer, AUC effect size, tie-corrected z — the
    nonparametric A/B readout complementing stats_ab_ztest's
    proportions. Same reduced-domain plan as stats_ks_value
    (operators.stats.mannwhitney_u)."""
    from mura_spark.operators.stats import mannwhitney_u
    ev = table(spark, sf, "events")
    return mannwhitney_u(ev, "value", "event_type", "click", "purchase")


# ------------------------------------------------------- round-5s additions

@q("events_rfm_segments",
   "WITH ref AS (SELECT MAX(ts) AS r FROM events), "
   "u AS (SELECT user_id, CAST(floor(CAST(epoch_us(r) "
   "- epoch_us(MAX(ts)) AS DOUBLE) / 3600000000.0) AS BIGINT) AS rec_h, "
   "COUNT(*) AS freq, "
   "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS mon "
   "FROM events CROSS JOIN ref GROUP BY user_id, r), "
   "b AS (SELECT "
   "quantile_cont(CAST(rec_h AS DOUBLE), [i / 5.0 for i in range(1, 5)]) "
   "AS rb, "
   "quantile_cont(CAST(freq AS DOUBLE), [i / 5.0 for i in range(1, 5)]) "
   "AS fb, "
   "quantile_cont(CAST(mon AS DOUBLE), [i / 5.0 for i in range(1, 5)]) "
   "AS mb FROM u) "
   "SELECT len(list_filter(rb, x -> CAST(rec_h AS DOUBLE) > x)) AS r_bin, "
   "len(list_filter(fb, x -> CAST(freq AS DOUBLE) > x)) AS f_bin, "
   "CASE WHEN mon IS NULL THEN NULL "
   "ELSE len(list_filter(mb, x -> CAST(mon AS DOUBLE) > x)) END AS m_bin, "
   "COUNT(*) AS n_users, "
   "CAST(SUM(CAST(mon AS DECIMAL(18,2))) AS DOUBLE) AS monetary_total "
   "FROM u CROSS JOIN b GROUP BY 1, 2, 3")
def events_rfm_segments(spark, sf):
    """RFM customer segmentation (recency/frequency/monetary quintiles)
    — the classic lifecycle-marketing rollup. One shuffle to the
    per-user grain; each quintile assignment is a broadcast
    boundary-array filter-count (operators.sampling.quantile_bins —
    never a global ntile sort); recency in exact whole hours from the
    newest event, monetary as the exact-decimal value sum. Output is
    the ≤125-cell segment matrix."""
    from mura_spark.operators.sampling import quantile_bins
    ev = table(spark, sf, "events")
    ref = ev.agg(F.max("ts").alias("__ref"))
    u = (ev.groupBy("user_id")
           .agg(F.max("ts").alias("__last"),
                F.count(F.lit(1)).alias("freq"),
                dsum("value").alias("mon")))
    u = (u.crossJoin(F.broadcast(ref))
          .select(F.floor((F.unix_micros("__ref")
                           - F.unix_micros("__last")).cast("double")
                          / F.lit(3600000000.0)).cast("bigint")
                   .alias("rec_h"),
                  "freq", "mon"))
    u = quantile_bins(u, "rec_h", 5).withColumnRenamed("bin", "r_bin")
    u = quantile_bins(u, "freq", 5).withColumnRenamed("bin", "f_bin")
    u = quantile_bins(u, "mon", 5).withColumnRenamed("bin", "m_bin")
    return (u.groupBy("r_bin", "f_bin", "m_bin")
             .agg(F.count(F.lit(1)).alias("n_users"),
                  dsum("mon").alias("monetary_total")))


@q("events_hourly_autocorr",
   "WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo, "
   "date_trunc('hour', MAX(ts)) AS hi FROM events), "
   "grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) "
   "AS h FROM bounds), "
   "actual AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c "
   "FROM events GROUP BY 1), "
   "dense AS (SELECT g.h, coalesce(a.c, 0) AS c FROM grid g "
   "LEFT JOIN actual a ON a.h = g.h), "
   "p AS (SELECT c AS x, lead(c) OVER (ORDER BY h) AS y FROM dense), "
   "m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
   "SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS sxy, "
   "SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx, "
   "SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS syy "
   "FROM p WHERE y IS NOT NULL) "
   "SELECT CAST(n AS BIGINT) AS n_pairs, "
   "CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
   "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
   "* (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
   "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0 THEN "
   "CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
   "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
   "/ sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
   "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
   "* (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
   "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) "
   "* 1000000.0 + 0.5) AS BIGINT) END AS r_micro FROM m")
def events_hourly_autocorr(spark, sf):
    """Lag-1 autocorrelation of hourly event volume — the periodicity /
    burst-persistence diagnostic for ingest monitoring. The series is
    the ZERO-FILLED dense hour grid (sequence() over broadcast min/max
    bounds — gaps would otherwise splice non-adjacent hours into fake
    pairs); Pearson r over consecutive-hour pairs from exact integer
    moments (DECIMAL products of counts), one mirrored closed form,
    micro-floored, NULL when a side is constant. Everything after the
    one reducing groupBy is calendar-sized. (The closed form
    intentionally matches operators/profile.corr_pairs term-for-term —
    change them together.)"""
    from pyspark.sql import Window
    from mura_spark.functions.quantize import micro
    ev = table(spark, sf, "events")
    actual = (ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
                .agg(F.count(F.lit(1)).alias("c")))
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                    F.date_trunc("hour", F.max("ts")).alias("hi"))
    grid = (bounds.select(F.explode(F.sequence(
        "lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")))
    dense = (grid.join(actual, "h", "left")
                 .select("h", F.coalesce(F.col("c"),
                                         F.lit(0).cast("bigint"))
                          .alias("c")))
    w = Window.orderBy("h")
    p = (dense.select(F.col("c").alias("x"),
                      F.lead("c").over(w).alias("y"))
              .filter(F.col("y").isNotNull()))
    from mura_spark.functions.quantize import dec18
    d18 = lambda c: dec18(F.col(c))  # noqa: E731
    m = p.agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(d18("x") * d18("y")).alias("sxy"),
              F.sum(d18("x") * d18("x")).alias("sxx"),
              F.sum(d18("y") * d18("y")).alias("syy"))
    n, sx, sy = (F.col("n").cast("double"), F.col("sx").cast("double"),
                 F.col("sy").cast("double"))
    sxy, sxx, syy = (F.col("sxy").cast("double"),
                     F.col("sxx").cast("double"),
                     F.col("syy").cast("double"))
    var_prod = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r = (n * sxy - sx * sy) / F.sqrt(var_prod)
    return m.select(F.col("n").cast("bigint").alias("n_pairs"),
                    F.when(var_prod > F.lit(0.0),
                           micro(r)).alias("r_micro"))


# ------------------------------------------------------- round-5u additions

@q("orders_monthly_growth",
   "WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) "
   "AS month, "
   "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, "
   "COUNT(*) AS n_orders FROM orders GROUP BY 1), "
   "w AS (SELECT month, revenue, n_orders, "
   "lag(revenue) OVER (ORDER BY month) AS prev FROM m) "
   "SELECT month, revenue, n_orders, "
   "CASE WHEN prev <> 0.0 THEN CAST(floor((revenue - prev) / prev "
   "* 1000000.0 + 0.5) AS BIGINT) END AS mom_micro FROM w")
def orders_monthly_growth(spark, sf):
    """Month-over-month revenue growth — the core business time series.
    One reducing groupBy to the calendar grain (exact-decimal money
    sums), then a lag window over the month table only; the growth
    ratio is one mirrored division, micro-floored, NULL for the first
    month / zero base."""
    from pyspark.sql import Window
    from mura_spark.functions.quantize import micro
    o = table(spark, sf, "orders")
    m = (o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
          .agg(dsum("o_totalprice").alias("revenue"),
               F.count(F.lit(1)).alias("n_orders")))
    w = m.select("month", "revenue", "n_orders",
                 F.lag("revenue").over(Window.orderBy("month"))
                  .alias("__prev"))
    growth = (F.col("revenue") - F.col("__prev")) / F.col("__prev")
    return w.select("month", "revenue", "n_orders",
                    F.when(F.col("__prev") != F.lit(0.0),
                           micro(growth)).alias("mom_micro"))


# ------------------------------------------------------- round-5w addition

#: The recursion references only the pre-materialized daily rollup —
#: without that, each of the ~|days| recursion rounds re-runs the full
#: corpus groupBy (the BFS-edges / k-core re-evaluation trap; measured
#: 12s -> 0.7s at sf0.1 when materialized).
_EWMA_SQL = (
    "WITH RECURSIVE "
    "ew(rn, day, x, l) AS ("
    "SELECT rn, day, x, x FROM {rollup} WHERE rn = 1 "
    "UNION ALL "
    "SELECT r.rn, r.day, r.x, 0.3 * r.x + 0.7 * ew.l "
    "FROM ew JOIN {rollup} r ON r.rn = ew.rn + 1) "
    "SELECT day, x AS daily_value, "
    "CAST(floor(l * 1000000.0 + 0.5) AS BIGINT) AS ewma_micro FROM ew")

_EWMA_ROLLUP = (
    "(SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM "
    "(SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x "
    "FROM events GROUP BY 1))")

_EWMA_ORACLE = ("WITH RECURSIVE r AS MATERIALIZED " + _EWMA_ROLLUP + ", "
                + _EWMA_SQL.format(rollup="r")
                  .replace("WITH RECURSIVE ", "", 1))


@q("events_ewma_daily", _EWMA_ORACLE)
def events_ewma_daily(spark, sf):
    """Exponentially-weighted moving average of daily event value
    (α = 0.3) — the trend smoother behind anomaly baselines. The linear
    recurrence l_t = αx_t + (1−α)l_{t−1} is inherently sequential, so
    it runs as a WITH RECURSIVE step-join over the CALENDAR-SIZED daily
    rollup (≤ the day count regardless of corpus size; well under
    Spark's recursion depth limit) — the corpus reduces through one
    exact-decimal groupBy that is materialized BEFORE the recursion
    (eager localCheckpoint / AS MATERIALIZED, the BFS-edges pattern),
    so no recursion round ever re-touches the fact table. The per-step
    double expression is sequential by construction — no
    aggregation-order hazard."""
    from pyspark.sql import Window
    ev = table(spark, sf, "events")
    d = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
           .agg(dsum("value").alias("x")))
    r = (d.select("day", "x",
                  F.row_number().over(Window.orderBy("day")).alias("rn"))
          .localCheckpoint(eager=True))
    r.createOrReplaceTempView("__mura_ewma_rollup")
    return spark.sql(_EWMA_SQL.format(rollup="__mura_ewma_rollup"))


@q("profile_key_skew",
   "WITH c AS (SELECT l_partkey AS key, COUNT(*) AS n FROM lineitem "
   "GROUP BY 1), "
   "t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys "
   "FROM c) "
   "SELECT key, n, "
   "CAST(floor(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 1000000.0 "
   "+ 0.5) AS BIGINT) AS share_micro, "
   "CAST(floor(CAST(n AS DOUBLE) / (CAST(total AS DOUBLE) "
   "/ CAST(n_keys AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) "
   "AS vs_mean_micro "
   "FROM c CROSS JOIN t ORDER BY n DESC, key ASC LIMIT 10")
def profile_key_skew(spark, sf):
    """Join/shuffle-key skew diagnostic: the 10 heaviest l_partkey
    values with their corpus share and multiple-of-mean — the readout
    that decides whether a join needs the salting path
    (operators.skew). One map-side-combined groupBy to the key grain,
    broadcast singleton totals, distributed top-k with key tiebreak
    (TakeOrderedAndProject — never a global sort)."""
    from mura_spark.operators.topk import topk
    li = table(spark, sf, "lineitem")
    c = (li.groupBy(F.col("l_partkey").alias("key"))
           .agg(F.count(F.lit(1)).alias("n")))
    t = c.agg(F.sum("n").cast("bigint").alias("total"),
              F.count(F.lit(1)).alias("n_keys"))
    j = c.crossJoin(F.broadcast(t))
    n_d, tot_d = F.col("n").cast("double"), F.col("total").cast("double")
    mean = tot_d / F.col("n_keys").cast("double")
    from mura_spark.functions.quantize import micro
    out = j.select("key", "n",
                   micro(n_d / tot_d).alias("share_micro"),
                   micro(n_d / mean).alias("vs_mean_micro"))
    return topk(out, [F.col("n").desc(), F.col("key").asc()], 10)


# ------------------------------------------------------- round-5z additions

_TRGM_PATTERN = "gear"


@q("search_substring_trigram",
   f"SELECT p_partkey, p_name FROM part "
   f"WHERE contains(lower(p_name), '{_TRGM_PATTERN}')")
def search_substring_trigram(spark, sf):
    """%substring% search through trigram-posting candidate generation:
    names explode into character trigrams JVM-side, candidates must
    match EVERY pattern trigram (count-match on the distinct
    intersection), and a final ``contains`` verify makes the filter
    lossless — so the oracle is the plain LIKE scan. This is the
    pattern that replaces full-corpus regex scans once the posting
    list is materialized: candidate generation becomes an equi-join
    against the (tiny) pattern-trigram set, and the expensive verify
    touches candidates only."""
    pat = _TRGM_PATTERN
    pat_grams = sorted({pat[i:i + 3] for i in range(len(pat) - 2)})
    p = table(spark, sf, "part").select(
        "p_partkey", "p_name", F.lower("p_name").alias("__nm"))
    grams = p.select(
        "p_partkey",
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.greatest(
                F.length("__nm") - F.lit(2), F.lit(1))),
            lambda i: F.col("__nm").substr(i, F.lit(3))))).alias("g"))
    cand = (grams.filter(F.col("g").isin(pat_grams))
                 .groupBy("p_partkey")
                 .agg(F.countDistinct("g").alias("__hits"))
                 .filter(F.col("__hits") == len(pat_grams))
                 .select("p_partkey"))
    return (p.join(cand, "p_partkey")
             .filter(F.col("__nm").contains(pat))  # lossless verify
             .select("p_partkey", "p_name"))


@q("orders_cohort_ltv",
   "WITH fo AS (SELECT o_custkey AS cust, "
   "CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS cm "
   "FROM orders GROUP BY 1), "
   "j AS (SELECT fo.cm AS cohort_month, "
   "(year(o.o_orderdate) * 12 + month(o.o_orderdate)) "
   "- (year(fo.cm) * 12 + month(fo.cm)) AS month_offset, "
   "o.o_custkey AS cust, o.o_totalprice AS tp "
   "FROM orders o JOIN fo ON fo.cust = o.o_custkey) "
   "SELECT cohort_month, month_offset, "
   "CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_active, "
   "CAST(SUM(CAST(tp AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
   "FROM j GROUP BY 1, 2")
def orders_cohort_ltv(spark, sf):
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, revenue per month-offset — the revenue-weighted complement
    of events_retention's count matrix. First-touch via min-aggregate
    (never an expanding window), integer month arithmetic (identical
    on both engines — months_between's fractional form is not), exact
    decimal revenue. Two key-shuffles: the first-order rollup and the
    cohort join, both on the customer key."""
    o = table(spark, sf, "orders")
    fo = (o.groupBy(F.col("o_custkey").alias("cust"))
            .agg(F.date_trunc("month", F.min("o_orderdate")).alias("cm")))
    mo = ((F.year("o_orderdate") * 12 + F.month("o_orderdate"))
          - (F.year("cm") * 12 + F.month("cm")))
    return (o.join(fo, F.col("o_custkey") == F.col("cust"))
             .groupBy(F.col("cm").alias("cohort_month"),
                      mo.alias("month_offset"))
             .agg(F.countDistinct("cust").alias("n_active"),
                  dsum("o_totalprice").alias("revenue")))


# ------------------------------------------------------- round-5cc additions

def _iqr_oracle() -> str:
    from mura_spark.operators.stats import sql_group_percentiles
    # percentiles over the SAME NULL-filtered rows as the Spark side —
    # sql_group_percentiles ranks NULLS LAST and counts them in n, so an
    # unfiltered 'events' would shift every (n-1)*p position
    inner = sql_group_percentiles(
        "(SELECT * FROM events WHERE value IS NOT NULL)",
        ["event_type"], "value", [0.25, 0.75], ["q1", "q3"])
    return (
        f"WITH b AS ({inner}), "
        "f AS (SELECT e.event_type, "
        "CAST(floor(e.value * 1000000.0 + 0.5) AS BIGINT) AS vm, "
        "b.q1_micro AS q1, b.q3_micro AS q3 "
        "FROM events e JOIN b ON b.event_type = e.event_type "
        "WHERE e.value IS NOT NULL) "
        "SELECT event_type, COUNT(*) AS n, "
        "CAST(SUM(CASE WHEN 2 * vm < 2 * q1 - 3 * (q3 - q1) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_out_low, "
        "CAST(SUM(CASE WHEN 2 * vm > 2 * q3 + 3 * (q3 - q1) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_out_high, "
        "MIN(2 * q1 - 3 * (q3 - q1)) AS lo_bound_2micro, "
        "MIN(2 * q3 + 3 * (q3 - q1)) AS hi_bound_2micro "
        "FROM f GROUP BY 1")


@q("events_outlier_iqr", _iqr_oracle())
def events_outlier_iqr(spark, sf):
    """Tukey-fence robust outlier screen per event type: flag values
    outside [q1 − 1.5·IQR, q3 + 1.5·IQR] with EXACT arithmetic — the
    quartiles come from the explicit order-statistics machinery
    (operators.stats.group_percentiles, micro-quantized), and the
    1.5× fence runs in doubled micro-integers so no float comparison
    can straddle the boundary differently per engine. One window
    shuffle for quartiles, broadcast join back, one rollup."""
    from mura_spark.operators.stats import group_percentiles
    ev = table(spark, sf, "events").filter(F.col("value").isNotNull())
    b = group_percentiles(ev, ["event_type"], "value",
                          [0.25, 0.75], ["q1", "q3"])
    from mura_spark.functions.quantize import micro
    j = ev.join(F.broadcast(b), "event_type")
    vm = micro(F.col("value"))
    q1, q3 = F.col("q1_micro"), F.col("q3_micro")
    lo = 2 * q1 - 3 * (q3 - q1)
    hi = 2 * q3 + 3 * (q3 - q1)
    return (j.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum((2 * vm < lo).cast("int")).cast("bigint")
                   .alias("n_out_low"),
                  F.sum((2 * vm > hi).cast("int")).cast("bigint")
                   .alias("n_out_high"),
                  F.min(lo).alias("lo_bound_2micro"),
                  F.min(hi).alias("hi_bound_2micro")))


@q("events_bot_screen",
   "WITH u AS (SELECT user_id, COUNT(*) AS n, "
   "COUNT(DISTINCT event_type) AS n_types, "
   "epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us "
   "FROM events GROUP BY 1) "
   "SELECT user_id, n, n_types, "
   "CAST(floor(CAST(n AS DOUBLE) "
   "/ (CAST(span_us AS DOUBLE) / 3600000000.0) * 1000000.0 + 0.5) "
   "AS BIGINT) AS rate_per_hour_micro "
   "FROM u WHERE span_us > 0 "
   "AND CAST(n AS DOUBLE) / (CAST(span_us AS DOUBLE) / 3600000000.0) "
   ">= 0.1 AND n >= 60")
def events_bot_screen(spark, sf):
    """Bot/automation screen: users with sustained high event rate
    and enough volume to matter (type diversity rides along as a
    feature) — the abuse-filter composite a training pipeline runs
    before user-level sampling. ONE map-side-combined groupBy to the
    user grain (count, distinct types, exact µs span), then pure
    threshold predicates; the rate division is one mirrored double
    expression. Thresholds sit inside this corpus's heavy tail so the
    screen returns a non-trivial flagged set."""
    ev = table(spark, sf, "events")
    u = (ev.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.countDistinct("event_type").alias("n_types"),
                (F.unix_micros(F.max("ts"))
                 - F.unix_micros(F.min("ts"))).alias("span_us")))
    rate = (F.col("n").cast("double")
            / (F.col("span_us").cast("double") / F.lit(3600000000.0)))
    from mura_spark.functions.quantize import micro
    return (u.filter((F.col("span_us") > 0) & (rate >= 0.1)
                     & (F.col("n") >= 60))
             .select("user_id", "n", "n_types",
                     micro(rate).alias("rate_per_hour_micro")))


# ------------------------------------------------------- round-5dd additions

def _srm_oracle() -> str:
    from mura_spark.suite.common import sql_hash48
    return (
        "WITH u AS (SELECT DISTINCT user_id FROM events), "
        f"v AS (SELECT {sql_hash48('CAST(user_id AS VARCHAR)')} "
        "% 1000 % 2 AS variant FROM u), "
        "c AS (SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS na, "
        "CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS nb FROM v) "
        "SELECT na, nb, CAST(floor("
        "(CAST(na AS DOUBLE) - (CAST(na AS DOUBLE) "
        "+ CAST(nb AS DOUBLE)) / 2.0) "
        "* (CAST(na AS DOUBLE) - (CAST(na AS DOUBLE) "
        "+ CAST(nb AS DOUBLE)) / 2.0) "
        "/ ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / 2.0) * 2.0 "
        "* 1000000.0 + 0.5) AS BIGINT) AS chi2_micro, "
        "(CAST(na AS DOUBLE) - (CAST(na AS DOUBLE) "
        "+ CAST(nb AS DOUBLE)) / 2.0) "
        "* (CAST(na AS DOUBLE) - (CAST(na AS DOUBLE) "
        "+ CAST(nb AS DOUBLE)) / 2.0) "
        "/ ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / 2.0) * 2.0 "
        "> 3.841 AS srm_flag FROM c")


@q("events_ab_srm_check", _srm_oracle())
def events_ab_srm_check(spark, sf):
    """Sample-ratio-mismatch guardrail for the A/B split: chi-square of
    the observed variant counts against the designed 50/50 under the
    SAME deterministic MD5 bucket assignment stats_ab_ztest uses — the
    first thing to check before reading any experiment metric. One
    distinct-user reduction; the statistic is one mirrored closed
    form ((na−E)²/E doubled for two symmetric cells), flagged at the
    p<0.05 critical value."""
    from mura_spark.functions.hashing import md5_hash48
    from mura_spark.functions.quantize import micro
    ev = table(spark, sf, "events")
    u = ev.select("user_id").distinct()
    v = u.select((md5_hash48(F.col("user_id").cast("string"))
                  % 1000 % 2).alias("variant"))
    c = v.agg(
        F.sum((F.col("variant") == 0).cast("int")).cast("bigint")
         .alias("na"),
        F.sum((F.col("variant") == 1).cast("int")).cast("bigint")
         .alias("nb"))
    na_d, nb_d = F.col("na").cast("double"), F.col("nb").cast("double")
    e = (na_d + nb_d) / F.lit(2.0)
    chi2 = (na_d - e) * (na_d - e) / e * F.lit(2.0)
    return c.select("na", "nb", micro(chi2).alias("chi2_micro"),
                    (chi2 > F.lit(3.841)).alias("srm_flag"))


@q("sample_split_temporal",
   "WITH b AS (SELECT quantile_cont(CAST(epoch_us(ts) AS DOUBLE), "
   "[i / 3.0 for i in range(1, 3)]) AS bnds FROM events), "
   "s AS (SELECT CASE len(list_filter(bnds, "
   "x -> CAST(epoch_us(ts) AS DOUBLE) > x)) "
   "WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split, ts "
   "FROM events CROSS JOIN b) "
   "SELECT split, COUNT(*) AS n, MIN(ts) AS min_ts, MAX(ts) AS max_ts "
   "FROM s GROUP BY 1")
def sample_split_temporal(spark, sf):
    """Temporal train/val/test split at exact time terciles — the
    leakage-safe protocol for forecasting/sequence models (hash splits
    leak the future into training; a TIME cut cannot). Boundary
    assignment reuses the quantile_bins rule (count of boundaries
    strictly below — broadcast array, no sort of the corpus); output
    is the per-split audit row (count + actual time range)."""
    from mura_spark.operators.sampling import quantile_bins
    ev = (table(spark, sf, "events")
          .withColumn("__us", F.unix_micros("ts")))
    binned = quantile_bins(ev, "__us", 3)
    split = (F.when(F.col("bin") == 0, "train")
              .when(F.col("bin") == 1, "val").otherwise("test"))
    return (binned.groupBy(split.alias("split"))
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.min("ts").alias("min_ts"),
                       F.max("ts").alias("max_ts")))


@q("stats_bootstrap_ci",
   "WITH grp AS (SELECT unnest(generate_series(0, 9)) AS g), "
   "slt AS (SELECT unnest(generate_series(0, 9)) AS s), "
   "ev AS (SELECT event_id, "
   "CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v "
   "FROM events WHERE event_type = 'purchase'), "
   "hashed AS (SELECT v, g, md5(CAST(event_id AS VARCHAR) || ':' || "
   "CAST(g AS VARCHAR)) AS h FROM ev CROSS JOIN grp), "
   "wts AS (SELECT v, g * 10 + s AS b, "
   "CAST('0x' || substr(h, s * 3 + 1, 3) AS BIGINT) AS u "
   "FROM hashed CROSS JOIN slt), "
   "wtd AS (SELECT b, v, CASE WHEN u < 1507 THEN 0 "
   "WHEN u < 3014 THEN 1 WHEN u < 3767 THEN 2 WHEN u < 4018 THEN 3 "
   "WHEN u < 4081 THEN 4 WHEN u < 4094 THEN 5 ELSE 6 END AS w "
   "FROM wts) "
   "SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff, "
   "CAST(floor(CAST(SUM(CAST(w * v AS DECIMAL(38,0))) AS DOUBLE) "
   "/ CAST(SUM(w) AS DOUBLE) + 0.5) AS BIGINT) AS mean_micro "
   "FROM wtd GROUP BY b")
def stats_bootstrap_ci(spark, sf):
    """Poisson bootstrap (Chamandy et al. 2012 — the streaming-scale
    bootstrap: per-replicate multinomial counts approximated by
    independent Poisson(1) weights) over mean purchase value, 100
    replicates. The weight is DERIVED, not drawn: 100 replicates need
    only TEN MD5s per row — each 128-bit digest of (event_id, hash
    group) yields ten independent 12-bit slices, each mapped through
    the Poisson(1) cdf thresholds (×4096) — so both engines see
    identical resamples and the replicate means hash-match exactly
    (the naive one-MD5-per-replicate layout measured 2.0× slower at the
    30× probe; the digest is the largest per-row cost). The hash is computed in the
    projection BELOW the slot explode, so each digest is materialized
    once and fanned out, never recomputed per replicate. Scale shape:
    the B× row blowup is map-side-combined to B groups before any
    shuffle — no resample is ever materialized — and the weighted sums
    accumulate as exact DECIMAL(38,0) so replicate means are
    aggregation-order-free; O(B·n) work is inherent to a full-corpus
    bootstrap (probe: linear at 10×/30×, constant-bound by the 10
    digests). The 2.5%/97.5% envelope over the 100 replicate means is
    pinned in pytest (the CI itself is order statistics over 100
    rows)."""
    from mura_spark.functions.quantize import micro
    ev = (table(spark, sf, "events")
          .where(F.col("event_type") == "purchase")
          .select("event_id", micro(F.col("value")).alias("v")))
    grp = spark.range(10).select(F.col("id").alias("g"))
    hashed = ev.crossJoin(F.broadcast(grp)).select(
        "v", "g",
        F.md5(F.concat_ws(":", F.col("event_id").cast("string"),
                          F.col("g").cast("string"))).alias("h"))
    u_slices = F.array(*[
        F.conv(F.substring("h", s * 3 + 1, 3), 16, 10).cast("bigint")
        for s in range(10)])
    wts = hashed.select(
        "v", "g", F.posexplode(u_slices).alias("s", "u"))
    w = (F.when(F.col("u") < 1507, 0).when(F.col("u") < 3014, 1)
          .when(F.col("u") < 3767, 2).when(F.col("u") < 4018, 3)
          .when(F.col("u") < 4081, 4).when(F.col("u") < 4094, 5)
          .otherwise(6))
    wtd = wts.select((F.col("g") * 10 + F.col("s")).alias("b"),
                     "v", w.alias("w"))
    mean = (F.floor(F.sum((F.col("w") * F.col("v"))
                          .cast("decimal(38,0)")).cast("double")
                    / F.sum("w").cast("double") + F.lit(0.5))
             .cast("bigint"))
    return (wtd.groupBy("b")
               .agg(F.sum("w").cast("bigint").alias("n_eff"),
                    mean.alias("mean_micro")))


@q("emb_pair_cosine_histogram",
   "WITH pairs AS (SELECT a.vec_id AS id, "
   "CAST(a.embedding AS DOUBLE[]) AS ea, "
   "CAST(b.embedding AS DOUBLE[]) AS eb "
   "FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1), "
   "t AS (SELECT id, "
   "CAST(list_sum(list_transform(list_zip(ea, eb), "
   "z -> CAST(floor(z[1] * z[2] * 1e12) AS BIGINT))) AS BIGINT) AS dot, "
   "CAST(list_sum(list_transform(ea, "
   "x -> CAST(floor(x * x * 1e12) AS BIGINT))) AS BIGINT) AS na, "
   "CAST(list_sum(list_transform(eb, "
   "x -> CAST(floor(x * x * 1e12) AS BIGINT))) AS BIGINT) AS nb "
   "FROM pairs), "
   "c AS (SELECT CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) "
   "* CAST(nb AS DOUBLE)) AS cs FROM t WHERE na > 0 AND nb > 0), "
   "m AS (SELECT CAST(floor(CAST(floor(cs * 1000000.0 + 0.5) AS BIGINT) "
   "/ 100000.0) AS BIGINT) AS bin FROM c) "
   "SELECT bin, COUNT(*) AS n_pairs FROM m GROUP BY bin")
def emb_pair_cosine_histogram(spark, sf):
    """Random-pair cosine-similarity histogram — the isotropy / hubness
    diagnostic (a healthy embedding space puts random-pair cosine in a
    tight band near 0; a drifted or collapsed one skews positive). The
    deterministic 'random' pairing is consecutive vec_ids (an equi-join,
    no sampling RNG, one key shuffle); per-term products quantize to
    1e12 fixed point before the integer sums — the scales cancel in
    dot/√(na·nb) — and the per-pair cosine micro-quantizes BEFORE the
    0.1-wide binning so a last-ulp sqrt can't flip a bin. Per-row O(dim)
    JVM higher-order functions, histogram reduced map-side to ≤21
    groups."""
    from mura_spark.functions.quantize import micro
    e = table(spark, sf, "embeddings")
    to_d = lambda col: F.transform(col, lambda x: x.cast("double"))
    a = e.select("vec_id", to_d("embedding").alias("ea"))
    b = e.select((F.col("vec_id") - 1).alias("vec_id"),
                 to_d("embedding").alias("eb"))
    q12 = F.lit(1e12)
    zero = F.lit(0).cast("bigint")
    pairs = a.join(b, "vec_id")
    dot = F.aggregate(
        F.zip_with("ea", "eb",
                   lambda x, y: F.floor(x * y * q12).cast("bigint")),
        zero, lambda acc, x: acc + x)
    sq = lambda col: F.aggregate(
        F.transform(col, lambda x: F.floor(x * x * q12).cast("bigint")),
        zero, lambda acc, x: acc + x)
    t = pairs.select(dot.alias("dot"), sq("ea").alias("na"),
                     sq("eb").alias("nb"))
    cs = (F.col("dot").cast("double")
          / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")))
    c = (t.where((F.col("na") > 0) & (F.col("nb") > 0))
          .select(micro(cs).alias("cs_micro")))
    bin_ = F.floor(F.col("cs_micro") / F.lit(100000.0)).cast("bigint")
    return (c.groupBy(bin_.alias("bin"))
             .agg(F.count(F.lit(1)).alias("n_pairs")))


def _mad_oracle() -> str:
    from mura_spark.operators.stats import sql_group_percentiles
    med = sql_group_percentiles(
        "(SELECT event_type, value FROM events WHERE value IS NOT NULL)",
        ["event_type"], "value", [0.5], ["med"])
    dev = ("SELECT e.event_type, "
           "abs(CAST(floor(e.value * 1000000.0 + 0.5) AS BIGINT) "
           "- m.med_micro) / 1000000.0 AS d "
           "FROM events e JOIN med m USING (event_type) "
           "WHERE e.value IS NOT NULL")
    mad = sql_group_percentiles("dev", ["event_type"], "d", [0.5], ["mad"])
    return (f"WITH med AS ({med}), dev AS ({dev}) "
            f"SELECT m.event_type, m.med_micro, q.mad_micro "
            f"FROM med m JOIN ({mad}) q USING (event_type)")


@q("events_mad_by_type", _mad_oracle())
def events_mad_by_type(spark, sf):
    """Median absolute deviation per event type — the robust scale
    estimate (unlike stddev, one fat-fingered value can't move it; the
    robust twin of the IQR fence in `events_outlier_iqr`). Composed from
    the exact order-statistic percentile operator applied twice: the
    per-type median, then the median of |value − median| with the
    deviation anchored on the MICRO-quantized median so both engines
    interpolate over identical inputs. Two group-key window shuffles
    over value rows; the medians frame broadcast back (≤|types| rows)."""
    from mura_spark.functions.quantize import micro
    from mura_spark.operators.stats import group_percentiles
    ev = (table(spark, sf, "events")
          .where(F.col("value").isNotNull())
          .select("event_type", "value"))
    med = group_percentiles(ev, ["event_type"], "value", [0.5], ["med"])
    dev = (ev.join(F.broadcast(med), "event_type")
             .select("event_type",
                     (F.abs(micro(F.col("value")) - F.col("med_micro"))
                      / F.lit(1000000.0)).alias("d")))
    mad = group_percentiles(dev, ["event_type"], "d", [0.5], ["mad"])
    return med.join(mad, "event_type").select(
        "event_type", "med_micro", "mad_micro")


# ------------------------------------------------------- round-6p additions

@q("audit_k_anonymity",
   "WITH g AS (SELECT lang, source, n_chars // 100 AS nb, "
   "COUNT(*) AS gsz FROM documents GROUP BY 1, 2, 3), "
   "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents), "
   "bands AS (SELECT CASE WHEN gsz = 1 THEN '1_unique' "
   "WHEN gsz < 5 THEN '2_lt5' WHEN gsz < 20 THEN '3_lt20' "
   "ELSE '4_ge20' END AS k_band, COUNT(*) AS qi_groups, "
   "CAST(SUM(gsz) AS BIGINT) AS n_rows FROM g GROUP BY 1) "
   "SELECT k_band, qi_groups, n_rows, "
   "CAST(floor(CAST(n_rows AS DOUBLE) / CAST(n AS DOUBLE) "
   "* 1000000.0 + 0.5) AS BIGINT) AS pct_rows_micro "
   "FROM bands CROSS JOIN tot")
def audit_k_anonymity(spark, sf):
    """k-anonymity exposure audit over the corpus's quasi-identifiers
    (lang, source, length-bucket): what share of rows sit in QI groups
    small enough to re-identify (k=1, k<5, k<20)? The release gate run
    before publishing a training corpus (operators.profile
    .k_anonymity_bands). One QI shuffle; total rides broadcast."""
    from mura_spark.operators.profile import k_anonymity_bands
    d = table(spark, sf, "documents")
    qi = d.select("lang", "source",
                  F.expr("n_chars DIV 100").alias("nb"))
    return k_anonymity_bands(qi, ["lang", "source", "nb"])


def _join_card_oracle() -> str:
    blocks = []
    for name, lt, lk, rt, rk in [
            ("orders_lineitem", "orders", "o_orderkey",
             "lineitem", "l_orderkey"),
            ("customer_orders", "customer", "c_custkey",
             "orders", "o_custkey"),
            ("events_self_user", "events", "user_id",
             "events", "user_id")]:
        blocks.append(
            f"SELECT '{name}' AS join_name, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {lt}) AS n_left, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {rt}) AS n_right, "
            "CAST(COUNT(*) AS BIGINT) AS matched_keys, "
            "CAST(coalesce(SUM(ca * cb), 0) AS BIGINT) AS est_rows, "
            "CAST(coalesce(MAX(ca * cb), 0) AS BIGINT) AS max_key_rows, "
            "CASE WHEN coalesce(SUM(ca * cb), 0) > 0 THEN "
            "CAST(floor(CAST(MAX(ca * cb) AS DOUBLE) "
            "/ CAST(SUM(ca * cb) AS DOUBLE) * 1000000.0 + 0.5) "
            "AS BIGINT) ELSE 0 END AS skew_micro FROM "
            f"(SELECT {lk} AS k, CAST(COUNT(*) AS BIGINT) AS ca "
            f"FROM {lt} GROUP BY 1) la JOIN "
            f"(SELECT {rk} AS k, CAST(COUNT(*) AS BIGINT) AS cb "
            f"FROM {rt} GROUP BY 1) ra USING (k)")
    return " UNION ALL ".join(blocks)


@q("profile_join_cardinality", _join_card_oracle())
def profile_join_cardinality(spark, sf):
    """Exact join-output-size estimation from per-key counts — the
    pre-flight a 100 TB pipeline runs before committing to a shuffle
    join: Σ cnt_l·cnt_r per key gives the output rows the join WOULD
    produce, max_key_rows/skew_micro flag the salt-this-key hotspot,
    all without materializing a single joined row (operators.profile
    .join_cardinality_report)."""
    from mura_spark.operators.profile import join_cardinality_report
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    c = table(spark, sf, "customer")
    ev = table(spark, sf, "events")
    return join_cardinality_report([
        ("orders_lineitem", o, "o_orderkey", li, "l_orderkey"),
        ("customer_orders", c, "c_custkey", o, "o_custkey"),
        ("events_self_user", ev, "user_id", ev, "user_id")])


# ------------------------------------------------------- round-6r additions

@q("feature_target_encode_loo",
   "SELECT doc_id, lang, source, n_chars, "
   "CASE WHEN COUNT(*) OVER w > 1 THEN "
   "CAST(SUM(n_chars) OVER w - n_chars AS DOUBLE) "
   "/ CAST(COUNT(*) OVER w - 1 AS DOUBLE) END AS loo_nchars "
   "FROM documents WINDOW w AS (PARTITION BY lang, source)")
def feature_target_encode_loo(spark, sf):
    """Leakage-safe leave-one-out target encoding of (lang, source)
    against document length — each row's categorical feature is its
    group mean computed WITHOUT the row itself, the standard fix for
    group-mean encoding leaking the row's own label (operators.features
    .target_encode_loo). One window shuffle, row grain preserved."""
    from mura_spark.operators.features import target_encode_loo
    d = table(spark, sf, "documents")
    return target_encode_loo(
        d.select("doc_id", "lang", "source", "n_chars"),
        ["lang", "source"], "n_chars", "loo_nchars")


@q("stats_auc_length",
   "WITH cells AS (SELECT n_chars AS s, "
   "SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p, "
   "SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n "
   "FROM documents GROUP BY 1), "
   "pref AS (SELECT p, n, 2 * p * coalesce(SUM(n) OVER (ORDER BY s "
   "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + p * n AS c "
   "FROM cells), "
   "tot AS (SELECT CAST(SUM(p) AS BIGINT) AS n_pos, "
   "CAST(SUM(n) AS BIGINT) AS n_neg, SUM(c) AS auc2 FROM pref) "
   "SELECT n_pos, n_neg, CASE WHEN n_pos > 0 AND n_neg > 0 THEN "
   "CAST(floor(CAST(auc2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE) "
   "* CAST(n_neg AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) END "
   "AS auc_micro FROM tot")
def stats_auc_length(spark, sf):
    """Exact ROC AUC of document length as a predictor of lang='en' —
    the rank-formulation evaluation (P(score⁺>score⁻) + ½ ties) every
    quality-classifier loop needs, integer-exact until one final
    division (operators.features.rank_auc). Rows reduce to per-score
    counts before the domain-bounded prefix walk."""
    from mura_spark.operators.features import rank_auc
    d = table(spark, sf, "documents")
    return rank_auc(
        d.select("n_chars", (F.col("lang") == "en").alias("is_en")),
        "n_chars", "is_en")


@q("text_bigram_logloss",
   f"WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents), "
   "uni AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1), "
   "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS T FROM tok), "
   "st AS (SELECT doc_id, pr[1] AS prev, pr[2] AS cur FROM "
   "(SELECT doc_id, unnest([[t[i], t[i + 1]] "
   "for i in range(1, len(t))]) AS pr FROM "
   f"(SELECT doc_id, {_TOKS} AS t FROM documents))), "
   "bc AS (SELECT prev, cur, COUNT(*) AS cb FROM st GROUP BY 1, 2), "
   "sc AS (SELECT st.doc_id, CAST(floor(ln(1.0 / (0.7 "
   "* (CAST(cb AS DOUBLE) / CAST(u1.c AS DOUBLE)) + 0.3 "
   "* (CAST(u2.c AS DOUBLE) / CAST(T AS DOUBLE)))) * 1000000.0 + 0.5) "
   "AS BIGINT) AS s FROM st JOIN bc ON st.prev = bc.prev "
   "AND st.cur = bc.cur JOIN uni u1 ON u1.term = st.prev "
   "JOIN uni u2 ON u2.term = st.cur CROSS JOIN tot) "
   "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored, "
   "CAST(floor(CAST(SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) "
   "AS BIGINT) AS logloss_micro FROM sc GROUP BY 1")
def text_bigram_logloss(spark, sf):
    """Per-document interpolated bigram LM surprisal (Jelinek-Mercer
    λ=0.7 backoff to the unigram) — the context-aware LM quality filter
    that frequent-words-in-random-order documents cannot fool, unlike
    text_unigram_logloss (operators.cooccur.bigram_logloss)."""
    from mura_spark.operators.cooccur import bigram_logloss
    d = table(spark, sf, "documents")
    return bigram_logloss(d, "doc_id", "text")


@q("stats_mutual_information",
   "WITH cells AS (SELECT lang, source, COUNT(*) AS c FROM documents "
   "GROUP BY 1, 2), "
   "ra AS (SELECT lang, SUM(c) AS ca FROM cells GROUP BY 1), "
   "rb AS (SELECT source, SUM(c) AS cb FROM cells GROUP BY 1), "
   "tot AS (SELECT SUM(c) AS n FROM cells), "
   "per AS (SELECT n, CAST(floor((CAST(c AS DOUBLE) "
   "/ CAST(n AS DOUBLE)) * ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) "
   "/ (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) * 1000000.0 + 0.5) "
   "AS BIGINT) AS t FROM cells JOIN ra USING (lang) "
   "JOIN rb USING (source) CROSS JOIN tot) "
   "SELECT CAST(MAX(n) AS BIGINT) AS n, "
   "CAST(COUNT(*) AS BIGINT) AS n_cells, "
   "CAST(SUM(t) AS BIGINT) AS mi_micro FROM per")
def stats_mutual_information(spark, sf):
    """Mutual information between language and source in micro-nats —
    the information-theoretic association screen beside
    stats_chi2_lang_source: how much does knowing the source tell you
    about the language of a document? Per-cell ln terms quantized
    before the sum (operators.stats.mutual_information)."""
    from mura_spark.operators.stats import mutual_information
    d = table(spark, sf, "documents")
    return mutual_information(d, "lang", "source")


@q("audit_sequence_gaps",
   "WITH ids AS (SELECT DISTINCT event_id AS k FROM events), "
   "b AS (SELECT MIN(k) AS span_min, MAX(k) AS span_max, "
   "CAST(COUNT(*) AS BIGINT) AS n_ids FROM ids), "
   "g AS (SELECT a.k FROM ids a, b WHERE a.k < b.span_max "
   "AND NOT EXISTS (SELECT 1 FROM ids i WHERE i.k = a.k + 1)) "
   "SELECT n_ids, span_min, span_max, "
   "span_max - span_min + 1 - n_ids AS n_missing, "
   "(SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS n_gap_runs, "
   "(SELECT MIN(k) + 1 FROM g) AS first_missing FROM b")
def audit_sequence_gaps(spark, sf):
    """Dense-id integrity audit over event_id: missing mass in the
    [min,max] span and where the holes start — the dropped-batch
    detector for monotone upstream ids, computed as a successor-key
    ANTI join (never a global sort) — operators.profile
    .sequence_gaps."""
    from mura_spark.operators.profile import sequence_gaps
    ev = table(spark, sf, "events")
    return sequence_gaps(ev, "event_id")


@q("stats_weighted_median_spend",
   "WITH per AS (SELECT o_custkey, "
   "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) "
   "AS spend_cents, COUNT(*) AS n_orders FROM orders GROUP BY 1), "
   "j AS (SELECT c_mktsegment, spend_cents, n_orders FROM per "
   "JOIN customer ON c_custkey = o_custkey), "
   "cum AS (SELECT c_mktsegment, spend_cents, "
   "SUM(n_orders) OVER (PARTITION BY c_mktsegment ORDER BY spend_cents "
   "ASC ROWS UNBOUNDED PRECEDING) AS cw, "
   "SUM(n_orders) OVER (PARTITION BY c_mktsegment) AS wt FROM j) "
   "SELECT c_mktsegment, CAST(MAX(wt) AS BIGINT) AS w_total, "
   "CAST(MIN(spend_cents) AS BIGINT) AS median_value "
   "FROM cum WHERE 2 * cw >= wt GROUP BY 1")
def stats_weighted_median_spend(spark, sf):
    """Order-count-weighted median customer spend per market segment —
    the importance-weighted exact quantile (frequent buyers count
    more), integer cents and integer weights so the half-total
    threshold test is division-free (operators.stats
    .group_weighted_median)."""
    from mura_spark.operators.stats import group_weighted_median
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    per = (o.groupBy("o_custkey")
            .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  * 100).cast("bigint").alias("spend_cents"),
                 F.count(F.lit(1)).alias("n_orders")))
    j = (per.join(c.select(F.col("c_custkey").alias("o_custkey"),
                           "c_mktsegment"), "o_custkey")
            .select("c_mktsegment", "spend_cents", "n_orders"))
    return group_weighted_median(j, ["c_mktsegment"], "spend_cents",
                                 "n_orders")


@q("events_activity_streaks",
   "WITH days AS (SELECT DISTINCT user_id, "
   "CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d "
   "FROM events), "
   "isl AS (SELECT user_id, d - ROW_NUMBER() OVER (PARTITION BY "
   "user_id ORDER BY d) AS i FROM days), "
   "runs AS (SELECT user_id, i, COUNT(*) AS len FROM isl "
   "GROUP BY 1, 2), "
   "per AS (SELECT user_id, MAX(len) AS max_streak FROM runs "
   "GROUP BY 1) "
   "SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_users "
   "FROM per GROUP BY 1")
def events_activity_streaks(spark, sf):
    """Longest consecutive-active-day streak distribution across users
    — the habit/retention curve, via the canonical gaps-and-islands
    window (day − row_number constant on a run; no self-join) —
    operators.rolling.activity_streaks."""
    from mura_spark.operators.rolling import activity_streaks
    ev = table(spark, sf, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
         .cast("bigint").alias("dayix"))
    st = activity_streaks(days, "user_id", "dayix")
    return (st.groupBy("max_streak")
              .agg(F.count(F.lit(1)).alias("n_users")))


@q("graph_clustering_coeff",
   f"WITH {_SUPPORTED_EDGES_CTE}, "
   "deg AS (SELECT node, COUNT(*) AS dg FROM (SELECT a AS node FROM und "
   "UNION ALL SELECT b AS node FROM und) GROUP BY 1), "
   "keyed AS (SELECT a, b, da.dg AS dga, db.dg AS dgb FROM und "
   "JOIN deg da ON und.a = da.node JOIN deg db ON und.b = db.node), "
   "oriented AS (SELECT "
   "CASE WHEN (dga, a) < (dgb, b) THEN a ELSE b END AS u, "
   "CASE WHEN (dga, a) < (dgb, b) THEN b ELSE a END AS v, "
   "CASE WHEN (dga, a) < (dgb, b) THEN dgb ELSE dga END AS dv "
   "FROM keyed), "
   "wedges AS (SELECT e1.u AS u, e1.v AS v, e2.v AS w "
   "FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u "
   "AND (e1.dv, e1.v) < (e2.dv, e2.v)), "
   "tri AS (SELECT wedges.u AS u, wedges.v AS v, wedges.w AS w "
   "FROM wedges JOIN oriented o ON wedges.v = o.u AND wedges.w = o.v), "
   "corners AS (SELECT unnest([u, v, w]) AS node FROM tri), "
   "tc AS (SELECT node, COUNT(*) AS n_triangles FROM corners "
   "GROUP BY 1) "
   "SELECT d.node, CAST(d.dg AS BIGINT) AS degree, "
   "CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles, "
   "CAST(floor(2.0 * CAST(coalesce(tc.n_triangles, 0) AS DOUBLE) "
   "/ (CAST(d.dg AS DOUBLE) * CAST(d.dg - 1 AS DOUBLE)) "
   "* 1000000.0 + 0.5) AS BIGINT) AS cc_micro "
   "FROM deg d LEFT JOIN tc ON d.node = tc.node WHERE d.dg >= 2")
def graph_clustering_coeff(spark, sf):
    """Per-part local clustering coefficient over the support-≥2
    co-purchase graph — 2T/(d(d−1)), the how-cliquish-is-my-
    neighborhood community signal on top of the degree-ordered
    triangle machinery (operators.graph.clustering_coefficients)."""
    from mura_spark.operators.graph import (clustering_coefficients,
                                            cooccurrence_edges_supported)
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    edges = cooccurrence_edges_supported(li, "l_orderkey", "l_partkey",
                                         min_support=2)
    return clustering_coefficients(edges)


def _ols2_sql(tbl: str) -> str:
    """Two-regressor OLS (y=extendedprice¢ on quantity, discount%) via
    exact raw moments + Cramer's rule — ONE text, run verbatim by BOTH
    engines (Spark SQL over a temp view, DuckDB over its view), so the
    double expression trees cannot desynchronize. Moments are per-row
    BIGINT products summed in DECIMAL(38,0); everything after is
    IEEE-deterministic double arithmetic on identical inputs."""
    y = "CAST(round(CAST(l_extendedprice AS DOUBLE) * 100.0) AS BIGINT)"
    x1 = "CAST(l_quantity AS BIGINT)"
    x2 = "CAST(round(CAST(l_discount AS DOUBLE) * 100.0) AS BIGINT)"
    dec = lambda e: f"SUM(CAST({e} AS DECIMAL(38,0)))"  # noqa: E731
    return (
        "WITH m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST({dec(x1)} AS DOUBLE) AS s1, "
        f"CAST({dec(x2)} AS DOUBLE) AS s2, "
        f"CAST({dec(y)} AS DOUBLE) AS sy, "
        f"CAST({dec(f'{x1} * {x1}')} AS DOUBLE) AS q11, "
        f"CAST({dec(f'{x2} * {x2}')} AS DOUBLE) AS q22, "
        f"CAST({dec(f'{x1} * {x2}')} AS DOUBLE) AS q12, "
        f"CAST({dec(f'{x1} * {y}')} AS DOUBLE) AS p1y, "
        f"CAST({dec(f'{x2} * {y}')} AS DOUBLE) AS p2y, "
        f"CAST({dec(f'{y} * {y}')} AS DOUBLE) AS syy "
        f"FROM {tbl}), "
        "d AS (SELECT n_rows, n, sy, p1y, p2y, syy, "
        "n * (q11 * q22 - q12 * q12) - s1 * (s1 * q22 - q12 * s2) "
        "+ s2 * (s1 * q12 - q11 * s2) AS det, "
        "sy * (q11 * q22 - q12 * q12) - s1 * (p1y * q22 - q12 * p2y) "
        "+ s2 * (p1y * q12 - q11 * p2y) AS det0, "
        "n * (p1y * q22 - p2y * q12) - sy * (s1 * q22 - q12 * s2) "
        "+ s2 * (s1 * p2y - p1y * s2) AS det1, "
        "n * (q11 * p2y - q12 * p1y) - s1 * (s1 * p2y - p1y * s2) "
        "+ sy * (s1 * q12 - q11 * s2) AS det2 FROM m), "
        "f AS (SELECT n_rows, n, sy, p1y, p2y, syy, "
        "det0 / det AS b0, det1 / det AS b1, det2 / det AS b2 FROM d) "
        "SELECT n_rows, "
        "CAST(floor(b0 * 1000000.0 + 0.5) AS BIGINT) AS b0_micro, "
        "CAST(floor(b1 * 1000000.0 + 0.5) AS BIGINT) AS b1_micro, "
        "CAST(floor(b2 * 1000000.0 + 0.5) AS BIGINT) AS b2_micro, "
        "CAST(floor((1.0 - (syy - b0 * sy - b1 * p1y - b2 * p2y) "
        "/ (syy - sy * sy / n)) * 1000000.0 + 0.5) AS BIGINT) "
        "AS r2_micro FROM f")


@q("stats_ols2_lineitem", _ols2_sql("lineitem"))
def stats_ols2_lineitem(spark, sf):
    """Two-regressor least squares (revenue¢ ~ quantity + discount%)
    from exact raw moments and Cramer's rule — multiple regression in
    one aggregation pass (no iterative solver), the multivariate
    sibling of stats_ols_value_by_hour. The SAME SQL text runs on both
    engines, so the closed-form double arithmetic is mirrored by
    construction."""
    li = table(spark, sf, "lineitem")
    li.createOrReplaceTempView("mura_ols2_lineitem")
    return spark.sql(_ols2_sql("mura_ols2_lineitem"))


@q("orders_quartile_migration",
   "WITH per AS (SELECT o_custkey, CAST(year(o_orderdate) AS INT) "
   "AS yr, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
   "AS BIGINT) AS spend_cents FROM orders GROUP BY 1, 2), "
   "tiled AS (SELECT o_custkey, yr, NTILE(4) OVER (PARTITION BY yr "
   "ORDER BY spend_cents ASC, o_custkey ASC) AS tile FROM per) "
   "SELECT CAST(a.tile AS INT) AS tile_from, "
   "CAST(b.tile AS INT) AS tile_to, "
   "CAST(COUNT(*) AS BIGINT) AS n_moves FROM tiled a JOIN tiled b "
   "ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1 GROUP BY 1, 2")
def orders_quartile_migration(spark, sf):
    """Year-over-year spend-quartile migration matrix: which quartile
    customers land in next year given this year's — the segment-
    movement flow (upgrades on the upper triangle, churn-toward-Q1 on
    the lower). Deterministic NTILE with a (value, key) tiebreak;
    key-grain self-join on (customer, year+1) — operators.features
    .quartile_migration."""
    from mura_spark.operators.features import quartile_migration
    o = table(spark, sf, "orders")
    per = (o.groupBy("o_custkey",
                     F.year("o_orderdate").alias("yr"))
            .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  * 100).cast("bigint").alias("spend_cents")))
    mig = quartile_migration(per, "o_custkey", "yr", "spend_cents")
    return mig.select(F.col("tile_from").cast("int").alias("tile_from"),
                      F.col("tile_to").cast("int").alias("tile_to"),
                      "n_moves")


_CUPED_CUT = "TIMESTAMP '2024-01-16 00:00:00'"


@q("events_ab_cuped",
   "WITH u AS (SELECT user_id, "
   f"CAST(coalesce(SUM(CASE WHEN ts < {_CUPED_CUT} THEN "
   "CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS pre, "
   f"CAST(coalesce(SUM(CASE WHEN ts >= {_CUPED_CUT} THEN "
   "CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS post "
   "FROM events GROUP BY 1), "
   "m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
   "CAST(SUM(CAST(pre AS DECIMAL(38,0))) AS DOUBLE) AS sp, "
   "CAST(SUM(CAST(post AS DECIMAL(38,0))) AS DOUBLE) AS sq, "
   "CAST(SUM(CAST(pre * post AS DECIMAL(38,0))) AS DOUBLE) AS spq, "
   "CAST(SUM(CAST(pre * pre AS DECIMAL(38,0))) AS DOUBLE) AS spp, "
   "CAST(SUM(CAST(post * post AS DECIMAL(38,0))) AS DOUBLE) AS sqq "
   "FROM u), "
   "t AS (SELECT n, sp, "
   "CASE WHEN (n * spp - sp * sp) > 0 THEN "
   "(n * spq - sp * sq) / (n * spp - sp * sp) ELSE 0 END AS theta, "
   "CASE WHEN (n * spp - sp * sp) > 0 AND (n * sqq - sq * sq) > 0 "
   "THEN (n * spq - sp * sq) * (n * spq - sp * sq) "
   "/ ((n * spp - sp * sp) * (n * sqq - sq * sq)) ELSE 0 END AS rho2 "
   "FROM m), "
   f"y AS (SELECT {_AB_BUCKET} % 2 AS variant, post, rho2, "
   "CAST(floor((CAST(post AS DOUBLE) - theta "
   "* (CAST(pre AS DOUBLE) - sp / n)) * 1000000.0 + 0.5) AS BIGINT) "
   "AS ym FROM u CROSS JOIN t) "
   "SELECT CAST(variant AS INT) AS variant, "
   "CAST(COUNT(*) AS BIGINT) AS n_users, "
   "CAST(floor(CAST(SUM(CAST(post AS DECIMAL(38,0))) AS DOUBLE) "
   "/ CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
   "AS raw_mean_micro, "
   "CAST(floor(CAST(SUM(CAST(ym AS DECIMAL(38,0))) AS DOUBLE) "
   "/ CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS adj_mean_micro, "
   "CAST(floor(MAX(rho2) * 1000000.0 + 0.5) AS BIGINT) "
   "AS var_reduction_micro FROM y GROUP BY 1")
def events_ab_cuped(spark, sf):
    """CUPED-adjusted A/B readout: each user's post-period spend is
    shifted by θ·(pre − mean_pre) with θ = cov/var from the pooled
    pre-period — the standard experimentation variance-reduction
    transform (rho² ≈ the variance removed). Exact moments in
    DECIMAL(38,0); the per-user adjusted metric is quantized BEFORE
    the variant sum; assignment reuses the portable MD5 bucket."""
    from mura_spark.functions.hashing import md5_hash48
    ev = table(spark, sf, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    dec = F.col("value").cast("decimal(18,2)")
    u = (ev.groupBy("user_id")
           .agg((F.coalesce(F.sum(F.when(F.col("ts") < cut, dec)),
                            F.lit(0)) * 100).cast("bigint").alias("pre"),
                (F.coalesce(F.sum(F.when(F.col("ts") >= cut, dec)),
                            F.lit(0)) * 100).cast("bigint")
                .alias("post")))
    d38 = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = u.agg(F.count(F.lit(1)).cast("double").alias("n"),
              d38(F.col("pre")).alias("sp"),
              d38(F.col("post")).alias("sq"),
              d38(F.col("pre") * F.col("post")).alias("spq"),
              d38(F.col("pre") * F.col("pre")).alias("spp"),
              d38(F.col("post") * F.col("post")).alias("sqq"))
    n, sp, sq = F.col("n"), F.col("sp"), F.col("sq")
    spq, spp, sqq = F.col("spq"), F.col("spp"), F.col("sqq")
    varp = n * spp - sp * sp
    theta = F.when(varp > 0,
                   (n * spq - sp * sq) / varp).otherwise(F.lit(0.0))
    rho2 = F.when((varp > 0) & ((n * sqq - sq * sq) > 0),
                  (n * spq - sp * sq) * (n * spq - sp * sq)
                  / (varp * (n * sqq - sq * sq))).otherwise(F.lit(0.0))
    t = m.select(n.alias("n"), sp.alias("sp"), theta.alias("theta"),
                 rho2.alias("rho2"))
    ym = F.floor((F.col("post").cast("double") - F.col("theta")
                  * (F.col("pre").cast("double")
                     - F.col("sp") / F.col("n"))) * F.lit(1000000.0)
                 + F.lit(0.5)).cast("bigint")
    y = (u.crossJoin(F.broadcast(t))
          .select((md5_hash48(F.col("user_id").cast("string"))
                   % 1000 % 2).cast("int").alias("variant"),
                  "post", "rho2", ym.alias("ym")))
    return (y.groupBy("variant")
             .agg(F.count(F.lit(1)).alias("n_users"),
                  F.floor(F.sum(F.col("post").cast("decimal(38,0)"))
                           .cast("double")
                          / F.count(F.lit(1)).cast("double")
                          * F.lit(1000000.0) + F.lit(0.5))
                   .cast("bigint").alias("raw_mean_micro"),
                  F.floor(F.sum(F.col("ym").cast("decimal(38,0)"))
                           .cast("double")
                          / F.count(F.lit(1)).cast("double"))
                   .cast("bigint").alias("adj_mean_micro"),
                  F.floor(F.max("rho2") * F.lit(1000000.0)
                          + F.lit(0.5)).cast("bigint")
                   .alias("var_reduction_micro")))


def _sql_anova(cells: str, group: str, value: str) -> str:
    """DuckDB rendering of operators.stats.oneway_anova over integer
    values — mirrored term-for-term (quantize-to-units before any
    cross-group sum)."""
    return (
        f"WITH g AS (SELECT {group} AS grp, COUNT(*) AS ng, "
        f"SUM(CAST({value} AS DECIMAL(38,0))) AS sg, "
        f"SUM(CAST({value} * {value} AS DECIMAL(38,0))) AS qg "
        f"FROM {cells} GROUP BY 1), "
        "t AS (SELECT ng, sg, qg, CAST(floor(CAST(sg AS DOUBLE) "
        "* CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) + 0.5) "
        "AS DECIMAL(38,0)) AS tm FROM g), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, "
        "CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(tm) AS DECIMAL(38,0)) "
        "AS a, SUM(sg) AS s, SUM(qg) AS q FROM t), "
        "d AS (SELECT k, n, greatest(a - CAST(floor(CAST(s AS DOUBLE) "
        "* CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) "
        "AS DECIMAL(38,0)), 0) AS ssb, "
        "CAST(q AS DOUBLE) - CAST(a AS DOUBLE) AS ssw FROM m) "
        "SELECT k, n, CASE WHEN k > 1 AND ssw > 0 THEN "
        "CAST(floor((CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE)) "
        "/ (ssw / CAST(n - k AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) "
        "END AS f_micro, CASE WHEN k > 1 AND ssw > 0 THEN "
        "CAST(floor(CAST(ssb AS DOUBLE) / (CAST(ssb AS DOUBLE) + ssw) "
        "* 1000000.0 + 0.5) AS BIGINT) END AS eta2_micro FROM d")


@q("stats_anova_value_by_type",
   _sql_anova("(SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) "
              "* 100 AS BIGINT) AS cents FROM events)",
              "event_type", "cents"))
def stats_anova_value_by_type(spark, sf):
    """One-way ANOVA: do mean event values differ across the five
    event types? F statistic + η² effect size from exact decimal
    moments, group terms quantized to integer cents² before any
    cross-group float sum (operators.stats.oneway_anova)."""
    from mura_spark.operators.stats import oneway_anova
    ev = table(spark, sf, "events")
    cells = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
         .alias("cents"))
    return oneway_anova(cells, "event_type", "cents")


def _bf_oracle() -> str:
    from mura_spark.operators.stats import sql_group_percentiles
    med = sql_group_percentiles(
        "(SELECT event_type, value FROM events "
        "WHERE value IS NOT NULL)", ["event_type"], "value",
        [0.5], ["med"])
    # deviations rescaled to 100-micro units: the ANOVA terms S_g²/n_g
    # must stay below 2⁶³ THROUGH Spark's floor(double)->LONG (micro
    # units put S²/n at ~10¹⁹ and wrap silently — caught by the oracle
    # gate on first run)
    dev = ("(SELECT e.event_type, CAST(floor(abs(CAST(floor(value "
           "* 1000000.0 + 0.5) AS BIGINT) - med_micro) / 10000.0) "
           "AS BIGINT) AS d FROM events e "
           f"JOIN ({med}) m ON e.event_type = m.event_type "
           "WHERE e.value IS NOT NULL)")
    return _sql_anova(dev, "event_type", "d")


@q("stats_brown_forsythe", _bf_oracle())
def stats_brown_forsythe(spark, sf):
    """Brown-Forsythe variance-homogeneity test: one-way ANOVA on
    absolute deviations from each type's MEDIAN (robust to heavy
    tails, unlike Levene-on-means) — do the event types differ in
    SPREAD, not just level? Composed from the exact order-statistic
    median and the same quantize-then-sum ANOVA core."""
    from mura_spark.functions.quantize import micro
    from mura_spark.operators.stats import (group_percentiles,
                                            oneway_anova)
    ev = (table(spark, sf, "events")
          .where(F.col("value").isNotNull())
          .select("event_type", "value"))
    med = group_percentiles(ev, ["event_type"], "value", [0.5], ["med"])
    dev = (ev.join(F.broadcast(med), "event_type")
             .select("event_type",
                     F.floor(F.abs(micro(F.col("value"))
                                   - F.col("med_micro"))
                             / F.lit(10000.0)).cast("bigint")
                      .alias("d")))
    return oneway_anova(dev, "event_type", "d")


@q("stats_spearman_qty_discount",
   "WITH r AS (SELECT 2 * RANK() OVER (ORDER BY l_quantity) "
   "+ COUNT(*) OVER (PARTITION BY l_quantity) - 1 AS rx, "
   "2 * RANK() OVER (ORDER BY l_discount) "
   "+ COUNT(*) OVER (PARTITION BY l_discount) - 1 AS ry "
   "FROM lineitem), "
   "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx, "
   "CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy, "
   "CAST(SUM(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy, "
   "CAST(SUM(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx, "
   "CAST(SUM(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy "
   "FROM r) "
   "SELECT n, CASE WHEN sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) "
   "* (CAST(n AS DOUBLE) * syy - sy * sy)) > 0 THEN "
   "CAST(floor((CAST(n AS DOUBLE) * sxy - sx * sy) "
   "/ sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) "
   "* (CAST(n AS DOUBLE) * syy - sy * sy)) * 1000000.0 + 0.5) "
   "AS BIGINT) END AS rho_micro FROM m")
def stats_spearman_qty_discount(spark, sf):
    """Spearman rank correlation between quantity and discount — the
    monotone-association screen beside the Pearson pair matrix
    (stats_corr_lineitem): doubled average ranks are pure integers,
    so only the final division is floating point (operators.stats
    .spearman_corr)."""
    from mura_spark.operators.stats import spearman_corr
    li = table(spark, sf, "lineitem")
    return spearman_corr(li.select("l_quantity", "l_discount"),
                         "l_quantity", "l_discount")


@q("stats_power_analysis",
   "WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
   "SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s, "
   "SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) "
   "* CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) "
   "AS DECIMAL(38,0))) AS q FROM events), "
   "v AS (SELECT n, (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) "
   "* CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
   "/ CAST(n - 1 AS DOUBLE) AS var_cents, "
   "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents FROM m) "
   "SELECT n, CAST(floor(mean_cents + 0.5) AS BIGINT) AS mean_cents, "
   "CAST(floor(sqrt(var_cents) + 0.5) AS BIGINT) AS sd_cents, "
   "CAST(ceil(2.0 * ((1.959964 + 0.841621) * (1.959964 + 0.841621)) "
   "* var_cents / ((0.02 * mean_cents) * (0.02 * mean_cents))) "
   "AS BIGINT) AS n_per_arm_mde2pct, "
   "CAST(ceil(2.0 * ((1.959964 + 0.841621) * (1.959964 + 0.841621)) "
   "* var_cents / ((0.05 * mean_cents) * (0.05 * mean_cents))) "
   "AS BIGINT) AS n_per_arm_mde5pct FROM v")
def stats_power_analysis(spark, sf):
    """A/B sample-size planner: users-per-arm needed to detect a 2% /
    5% lift of mean event value at α=.05, power=.80 — the closed-form
    2(z_α/2+z_β)²σ²/δ² every experimentation platform runs before
    launch, with σ² measured from the corpus (exact decimal moments,
    z constants as shared literals, mirrored ceil)."""
    ev = table(spark, sf, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    m = ev.agg(F.count(F.lit(1)).alias("n"),
               F.sum(cents).alias("s"),
               F.sum((cents * cents).cast("decimal(38,0)")).alias("q"))
    nD = F.col("n").cast("double")
    var = ((F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / nD)
           / (F.col("n") - F.lit(1)).cast("double"))
    mean = F.col("s").cast("double") / nD
    z2 = (F.lit(1.959964) + F.lit(0.841621)) \
        * (F.lit(1.959964) + F.lit(0.841621))
    arm = lambda f: F.ceil(F.lit(2.0) * z2 * var  # noqa: E731
                           / ((F.lit(f) * mean) * (F.lit(f) * mean))) \
        .cast("bigint")
    return m.select(
        "n",
        F.floor(mean + F.lit(0.5)).cast("bigint").alias("mean_cents"),
        F.floor(F.sqrt(var) + F.lit(0.5)).cast("bigint")
         .alias("sd_cents"),
        arm(0.02).alias("n_per_arm_mde2pct"),
        arm(0.05).alias("n_per_arm_mde5pct"))


@q("stats_simpson_screen",
   "WITH c AS (SELECT source, "
   "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt, "
   "SUM(CASE WHEN lang = 'en' THEN CAST(n_chars AS DECIMAL(38,0)) "
   "ELSE CAST(0 AS DECIMAL(38,0)) END) AS st, "
   "CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nc, "
   "SUM(CASE WHEN lang <> 'en' THEN CAST(n_chars AS DECIMAL(38,0)) "
   "ELSE CAST(0 AS DECIMAL(38,0)) END) AS sc "
   "FROM documents GROUP BY 1), "
   "o AS (SELECT SUM(nt) AS ont, SUM(st) AS ost, "
   "SUM(nc) AS onc, SUM(sc) AS osc FROM c) "
   "SELECT source, nt AS n_treat, nc AS n_ctrl, "
   "CASE WHEN nt > 0 AND nc > 0 THEN "
   "CAST(CASE WHEN st * nc - sc * nt > 0 THEN 1 "
   "WHEN st * nc - sc * nt < 0 THEN -1 ELSE 0 END AS INT) END "
   "AS stratum_sign, "
   "CAST(CASE WHEN ost * onc - osc * ont > 0 THEN 1 "
   "WHEN ost * onc - osc * ont < 0 THEN -1 ELSE 0 END AS INT) "
   "AS overall_sign, "
   "CASE WHEN nt > 0 AND nc > 0 THEN "
   "CAST((CASE WHEN st * nc - sc * nt > 0 THEN 1 "
   "WHEN st * nc - sc * nt < 0 THEN -1 ELSE 0 END) "
   "* (CASE WHEN ost * onc - osc * ont > 0 THEN 1 "
   "WHEN ost * onc - osc * ont < 0 THEN -1 ELSE 0 END) = -1 AS INT) END "
   "AS is_reversed "
   "FROM c CROSS JOIN o")
def stats_simpson_screen(spark, sf):
    """Simpson's-paradox screen: is English text longer than
    non-English INSIDE each source the same way it is in the pooled
    corpus? Per-source sign of the mean-length gap vs the aggregate
    sign, with a reversal flag — the confounding check (source mix can
    flip a pooled comparison) run before trusting any corpus-level A/B
    readout. Exact integer cross-multiplication signs, zero divisions
    (operators.stats.simpson_screen)."""
    from mura_spark.operators.stats import simpson_screen
    d = table(spark, sf, "documents")
    return simpson_screen(d, "source", F.col("lang") == "en", "n_chars")


@q("stats_cmh_odds",
   "WITH c AS (SELECT hour(ts) AS stratum, "
   "CAST(SUM(CASE WHEN isodow(ts) >= 6 AND event_type = 'purchase' "
   "THEN 1 ELSE 0 END) AS BIGINT) AS a, "
   "CAST(SUM(CASE WHEN isodow(ts) >= 6 AND event_type <> 'purchase' "
   "THEN 1 ELSE 0 END) AS BIGINT) AS b, "
   "CAST(SUM(CASE WHEN isodow(ts) < 6 AND event_type = 'purchase' "
   "THEN 1 ELSE 0 END) AS BIGINT) AS cc, "
   "CAST(SUM(CASE WHEN isodow(ts) < 6 AND event_type <> 'purchase' "
   "THEN 1 ELSE 0 END) AS BIGINT) AS dd "
   "FROM events GROUP BY 1), "
   "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata, "
   "SUM(CASE WHEN a + b + cc + dd > 0 THEN "
   "CAST(floor(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE) "
   "/ CAST(a + b + cc + dd AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
   "ELSE 0 END) AS s_ad, "
   "SUM(CASE WHEN a + b + cc + dd > 0 THEN "
   "CAST(floor(CAST(b AS DOUBLE) * CAST(cc AS DOUBLE) "
   "/ CAST(a + b + cc + dd AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
   "ELSE 0 END) AS s_bc FROM c) "
   "SELECT n_strata, CAST(s_ad AS BIGINT) AS sum_ad_micro, "
   "CAST(s_bc AS BIGINT) AS sum_bc_micro, "
   "CASE WHEN s_bc > 0 THEN CAST(floor(CAST(s_ad AS DOUBLE) "
   "/ CAST(s_bc AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) END "
   "AS or_micro FROM t")
def stats_cmh_odds(spark, sf):
    """Cochran–Mantel–Haenszel pooled odds ratio: is a purchase more
    likely on weekends, CONTROLLING for hour-of-day? — the inferential
    sibling of stats_simpson_screen (that one flags confounding; this
    one gives the stratum-adjusted effect). 2×2 cells per hour stratum
    from one conditional rollup; each stratum's a·d/n and b·c/n terms
    are micro-floored BEFORE the sums (the convention for per-stratum
    rationals — float sums would be order-dependent); one terminal
    division for the pooled OR."""
    ev = table(spark, sf, "events")
    wkend = F.expr("weekday(ts)") >= 5
    purch = F.col("event_type") == "purchase"
    cell = lambda p: F.sum(F.when(p, 1).otherwise(0))  # noqa: E731
    c = (ev.groupBy(F.hour("ts").alias("stratum"))
           .agg(cell(wkend & purch).alias("a"),
                cell(wkend & ~purch).alias("b"),
                cell(~wkend & purch).alias("cc"),
                cell(~wkend & ~purch).alias("dd")))
    n = (F.col("a") + F.col("b") + F.col("cc") + F.col("dd"))
    term = lambda x, y: F.when(  # noqa: E731
        n > 0,
        F.floor(F.col(x).cast("double") * F.col(y).cast("double")
                / n.cast("double") * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    t = c.agg(F.count(F.lit(1)).alias("n_strata"),
              F.sum(term("a", "dd")).alias("s_ad"),
              F.sum(term("b", "cc")).alias("s_bc"))
    orm = (F.floor(F.col("s_ad").cast("double")
                   / F.col("s_bc").cast("double")
                   * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    return t.select("n_strata",
                    F.col("s_ad").alias("sum_ad_micro"),
                    F.col("s_bc").alias("sum_bc_micro"),
                    F.when(F.col("s_bc") > 0, orm).alias("or_micro"))


@q("stats_runs_test_daily",
   "WITH daily AS (SELECT epoch_us(date_trunc('day', ts)) "
   "// 86400000000 AS d, "
   "SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s "
   "FROM events WHERE value IS NOT NULL GROUP BY 1), "
   "dif AS (SELECT d, s - LAG(s) OVER (ORDER BY d) AS df FROM daily), "
   "sgn AS (SELECT d, CASE WHEN df > 0 THEN 1 ELSE -1 END AS sg "
   "FROM dif WHERE df IS NOT NULL AND df <> 0), "
   "rn AS (SELECT sg, CASE WHEN LAG(sg) OVER (ORDER BY d) IS NULL "
   "OR LAG(sg) OVER (ORDER BY d) <> sg THEN 1 ELSE 0 END AS brk "
   "FROM sgn), "
   "m AS (SELECT CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) "
   "AS BIGINT) AS n_up, "
   "CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down, "
   "CAST(SUM(brk) AS BIGINT) AS n_runs FROM rn) "
   "SELECT n_up, n_down, n_runs, "
   "CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 1 "
   "AND 2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) "
   "* (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) "
   "- CAST(n_up + n_down AS DOUBLE)) > 0 THEN "
   "CAST(floor((CAST(n_runs AS DOUBLE) "
   "- (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) "
   "/ CAST(n_up + n_down AS DOUBLE) + 1.0)) "
   "/ sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) "
   "* (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) "
   "- CAST(n_up + n_down AS DOUBLE)) "
   "/ (CAST(n_up + n_down AS DOUBLE) * CAST(n_up + n_down AS DOUBLE) "
   "* CAST(n_up + n_down - 1 AS DOUBLE))) * 1000000.0 + 0.5) "
   "AS BIGINT) END AS z_micro FROM m")
def stats_runs_test_daily(spark, sf):
    """Wald–Wolfowitz runs test on the up/down sequence of daily total
    event value: too FEW runs = momentum/trend, too MANY = mean
    reversion — the randomness check run on any KPI series before
    fitting trend models to it. Exact daily decimal sums, integer
    run/sign counts on the tiny day frame; z is one mirrored
    closed-form expression (μ = 2n₊n₋/n + 1, σ² =
    2n₊n₋(2n₊n₋−n)/(n²(n−1))), micro-floored."""
    from pyspark.sql import Window
    ev = table(spark, sf, "events").where(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (ev.groupBy(F.expr("unix_micros(date_trunc('DAY', ts)) "
                               "div 86400000000").alias("d"))
               .agg(F.sum(cents).alias("s")))
    wd = Window.orderBy("d")
    dif = daily.select("d", (F.col("s") - F.lag("s").over(wd)).alias("df"))
    sgn = (dif.filter(F.col("df").isNotNull() & (F.col("df") != 0))
              .select("d", F.when(F.col("df") > 0, 1).otherwise(-1)
                            .alias("sg")))
    lagsg = F.lag("sg").over(wd)
    rn = sgn.select("sg", F.when(lagsg.isNull() | (lagsg != F.col("sg")),
                                 1).otherwise(0).alias("brk"))
    m = rn.agg(
        F.sum(F.when(F.col("sg") == 1, 1).otherwise(0)).alias("n_up"),
        F.sum(F.when(F.col("sg") == -1, 1).otherwise(0)).alias("n_down"),
        F.sum("brk").alias("n_runs"))
    nu = F.col("n_up").cast("double")
    nd = F.col("n_down").cast("double")
    n = (F.col("n_up") + F.col("n_down")).cast("double")
    nm1 = (F.col("n_up") + F.col("n_down") - F.lit(1)).cast("double")
    two_ud = F.lit(2.0) * nu * nd
    var_num = two_ud * (two_ud - n)
    z = ((F.col("n_runs").cast("double") - (two_ud / n + F.lit(1.0)))
         / F.sqrt(var_num / (n * n * nm1)))
    ok = ((F.col("n_up") > 0) & (F.col("n_down") > 0)
          & (F.col("n_up") + F.col("n_down") > 1) & (var_num > 0))
    return m.select("n_up", "n_down", "n_runs",
                    F.when(ok, F.floor(z * F.lit(1000000.0) + F.lit(0.5))
                               .cast("bigint")).alias("z_micro"))


@q("audit_order_totals",
   "WITH l AS (SELECT l_orderkey, "
   "SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) "
   "AS line_cents FROM lineitem GROUP BY 1), "
   "j AS (SELECT o.o_orderkey, "
   "CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
   "AS order_cents, l.line_cents FROM orders o "
   "LEFT JOIN l ON o.o_orderkey = l.l_orderkey) "
   "SELECT CAST(COUNT(*) AS BIGINT) AS n_orders, "
   "CAST(SUM(CASE WHEN line_cents IS NULL THEN 1 ELSE 0 END) "
   "AS BIGINT) AS n_no_lines, "
   "CAST(SUM(CASE WHEN line_cents = order_cents THEN 1 ELSE 0 END) "
   "AS BIGINT) AS n_matched, "
   "CAST(SUM(CASE WHEN line_cents IS NOT NULL "
   "AND line_cents <> order_cents THEN 1 ELSE 0 END) AS BIGINT) "
   "AS n_mismatched, "
   "CAST(MAX(CASE WHEN line_cents IS NOT NULL "
   "THEN abs(order_cents - line_cents) END) AS BIGINT) "
   "AS max_abs_diff_cents, "
   "CAST(SUM(CASE WHEN line_cents IS NOT NULL "
   "THEN abs(order_cents - line_cents) ELSE 0 END) AS BIGINT) "
   "AS total_abs_diff_cents FROM j")
def audit_order_totals(spark, sf):
    """Cross-table reconciliation: does each order's header total equal
    the exact-decimal sum of its line extended prices? — the
    finance-grade consistency audit (the totals sibling of
    audit_referential's key checks), reported as a one-row discrepancy
    summary rather than assumed. Header-side LEFT join keeps
    line-less orders visible; all arithmetic in exact cents."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100) \
        .cast("bigint")  # noqa: E731
    l = (li.groupBy("l_orderkey")
           .agg(F.sum(cents("l_extendedprice")).alias("line_cents")))
    j = (o.select("o_orderkey", cents("o_totalprice").alias("order_cents"))
          .join(l, o["o_orderkey"] == l["l_orderkey"], "left"))
    has = F.col("line_cents").isNotNull()
    diff = F.abs(F.col("order_cents") - F.col("line_cents"))
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(~has, 1).otherwise(0)).alias("n_no_lines"),
        F.sum(F.when(F.col("line_cents") == F.col("order_cents"), 1)
               .otherwise(0)).alias("n_matched"),
        F.sum(F.when(has & (F.col("line_cents") != F.col("order_cents")),
                     1).otherwise(0)).alias("n_mismatched"),
        F.max(F.when(has, diff)).alias("max_abs_diff_cents"),
        F.sum(F.when(has, diff).otherwise(0))
         .alias("total_abs_diff_cents"))


@q("stats_eb_shrinkage",
   "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k "
   "FROM documents GROUP BY 1), "
   "p AS (SELECT source, n, k, CAST(floor(CAST(k AS DOUBLE) "
   "/ CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS pm FROM c), "
   "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS ng, "
   "CAST(floor(CAST(SUM(pm) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) "
   "AS mbar FROM p), "
   "v AS (SELECT g.ng, g.mbar, SUM((pm - mbar) * (pm - mbar)) AS ss "
   "FROM p CROSS JOIN g GROUP BY 1, 2) "
   "SELECT p.source, p.n AS n_docs, p.k AS n_pos, p.pm AS raw_micro, "
   "CASE WHEN v.ng > 1 AND v.ss > 0 "
   "AND (CAST(v.mbar AS DOUBLE) / 1000000.0) "
   "* (1.0 - CAST(v.mbar AS DOUBLE) / 1000000.0) "
   "/ (CAST(v.ss AS DOUBLE) / CAST(v.ng - 1 AS DOUBLE) "
   "/ 1000000000000.0) - 1.0 > 0 THEN "
   "CAST(floor((CAST(p.k AS DOUBLE) "
   "+ (CAST(v.mbar AS DOUBLE) / 1000000.0) "
   "* ((CAST(v.mbar AS DOUBLE) / 1000000.0) "
   "* (1.0 - CAST(v.mbar AS DOUBLE) / 1000000.0) "
   "/ (CAST(v.ss AS DOUBLE) / CAST(v.ng - 1 AS DOUBLE) "
   "/ 1000000000000.0) - 1.0)) "
   "/ (CAST(p.n AS DOUBLE) "
   "+ ((CAST(v.mbar AS DOUBLE) / 1000000.0) "
   "* (1.0 - CAST(v.mbar AS DOUBLE) / 1000000.0) "
   "/ (CAST(v.ss AS DOUBLE) / CAST(v.ng - 1 AS DOUBLE) "
   "/ 1000000000000.0) - 1.0)) * 1000000.0 + 0.5) AS BIGINT) "
   "ELSE p.pm END AS shrunk_micro "
   "FROM p CROSS JOIN v")
def stats_eb_shrinkage(spark, sf):
    """Empirical-Bayes shrinkage of per-source English rates toward the
    corpus prior (beta-binomial method of moments: prior strength s =
    m̄(1−m̄)/v − 1, posterior (k + m̄·s)/(n + s)) — how a pipeline
    scores SPARSE domains without trusting 3-document rates. The
    between-source variance is computed on per-source MICRO-QUANTIZED
    rates (exact integer Σdev², order-independent — a raw float sum
    over groups would not be); the shrink itself is one mirrored
    double expression per source; sources where v ≥ m̄(1−m̄) (no
    evidence of overdispersion) pass through unshrunk."""
    d = table(spark, sf, "documents")
    c = (d.groupBy("source")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
                .alias("k")))
    pm = (F.floor(F.col("k").cast("double") / F.col("n").cast("double")
                  * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    p = c.select("source", "n", "k", pm.alias("pm"))
    g = p.agg(F.count(F.lit(1)).alias("ng"),
              F.floor(F.sum("pm").cast("double") / F.count(F.lit(1))
                      + F.lit(0.5)).cast("bigint").alias("mbar"))
    v = (p.crossJoin(F.broadcast(g))
          .groupBy("ng", "mbar")
          .agg(F.sum((F.col("pm") - F.col("mbar"))
                     * (F.col("pm") - F.col("mbar"))).alias("ss")))
    mb = F.col("mbar").cast("double") / F.lit(1000000.0)
    var = (F.col("ss").cast("double")
           / (F.col("ng") - F.lit(1)).cast("double")
           / F.lit(1000000000000.0))
    s = mb * (F.lit(1.0) - mb) / var - F.lit(1.0)
    shrunk = (F.floor((F.col("k").cast("double") + mb * s)
                      / (F.col("n").cast("double") + s)
                      * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    ok = (F.col("ng") > 1) & (F.col("ss") > 0) & (s > 0)
    return (p.crossJoin(F.broadcast(v))
             .select("source", F.col("n").alias("n_docs"),
                     F.col("k").alias("n_pos"),
                     F.col("pm").alias("raw_micro"),
                     F.when(ok, shrunk).otherwise(F.col("pm"))
                      .alias("shrunk_micro")))


def _adf_sql(tbl: str) -> str:
    """Augmented Dickey–Fuller (one lagged difference, constant, no
    trend) on the daily value series — ONE portable SQL text run
    verbatim by BOTH engines (the _ols2_sql posture): Δy on
    (1, y₋₁, Δy₋₁) via exact decimal moments + Cramer's rule, then
    t(b₁) = b₁ / √(σ̂²·[(X'X)⁻¹]₁₁). Only portable functions
    (date_trunc, LAG, CAST, floor, sqrt) appear."""
    dec = lambda a, b: (f"SUM(CAST({a} AS DECIMAL(19,0)) "  # noqa: E731
                        f"* CAST({b} AS DECIMAL(19,0)))")
    return (
        "WITH daily AS (SELECT date_trunc('day', ts) AS d, "
        "SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y "
        f"FROM {tbl} WHERE value IS NOT NULL GROUP BY 1), "
        "l AS (SELECT d, y, LAG(y) OVER (ORDER BY d) AS yl FROM daily), "
        "r AS (SELECT d, CAST(y - yl AS BIGINT) AS dy, yl, "
        "LAG(y - yl) OVER (ORDER BY d) AS dyl FROM l "
        "WHERE yl IS NOT NULL), "
        "obs AS (SELECT dy AS yv, yl AS x1, dyl AS x2 FROM r "
        "WHERE dyl IS NOT NULL), "
        "m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS n_obs, "
        f"CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1, "
        f"CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2, "
        f"CAST(SUM(CAST(yv AS DECIMAL(38,0))) AS DOUBLE) AS sy, "
        f"CAST({dec('x1', 'x1')} AS DOUBLE) AS q11, "
        f"CAST({dec('x2', 'x2')} AS DOUBLE) AS q22, "
        f"CAST({dec('x1', 'x2')} AS DOUBLE) AS q12, "
        f"CAST({dec('x1', 'yv')} AS DOUBLE) AS p1y, "
        f"CAST({dec('x2', 'yv')} AS DOUBLE) AS p2y, "
        f"CAST({dec('yv', 'yv')} AS DOUBLE) AS syy FROM obs), "
        "dt AS (SELECT n_obs, n, sy, p1y, p2y, syy, q22, s2, "
        "n * (q11 * q22 - q12 * q12) - s1 * (s1 * q22 - q12 * s2) "
        "+ s2 * (s1 * q12 - q11 * s2) AS det, "
        "sy * (q11 * q22 - q12 * q12) - s1 * (p1y * q22 - q12 * p2y) "
        "+ s2 * (p1y * q12 - q11 * p2y) AS det0, "
        "n * (p1y * q22 - p2y * q12) - sy * (s1 * q22 - q12 * s2) "
        "+ s2 * (s1 * p2y - p1y * s2) AS det1, "
        "n * (q11 * p2y - q12 * p1y) - s1 * (s1 * p2y - p1y * s2) "
        "+ sy * (s1 * q12 - q11 * s2) AS det2 FROM m), "
        "f AS (SELECT n_obs, n, det, q22, s2, "
        "det0 / det AS b0, det1 / det AS b1, det2 / det AS b2, "
        "syy - det0 / det * sy - det1 / det * p1y - det2 / det * p2y "
        "AS rss FROM dt) "
        "SELECT n_obs, "
        "CAST(floor(b1 * 1000000.0 + 0.5) AS BIGINT) AS b1_micro, "
        "CASE WHEN n_obs > 3 AND det <> 0.0 "
        "AND rss / (n - 3.0) * ((n * q22 - s2 * s2) / det) > 0.0 THEN "
        "CAST(floor(b1 / sqrt(rss / (n - 3.0) "
        "* ((n * q22 - s2 * s2) / det)) * 1000000.0 + 0.5) AS BIGINT) "
        "END AS adf_micro, "
        "CASE WHEN n_obs > 3 AND det <> 0.0 "
        "AND rss / (n - 3.0) * ((n * q22 - s2 * s2) / det) > 0.0 THEN "
        "CAST(b1 / sqrt(rss / (n - 3.0) "
        "* ((n * q22 - s2 * s2) / det)) < -2.86 AS INT) END "
        "AS is_stationary FROM f")


@q("stats_adf_value_daily", _adf_sql("events"))
def stats_adf_value_daily(spark, sf):
    """Augmented Dickey–Fuller unit-root test on the daily value
    series: is the KPI stationary (adf < −2.86, the 5% critical
    value) or a random walk that trend models will hallucinate on? —
    the pre-flight every forecasting pipeline owes its users. Same
    one-text SQL on both engines (_ols2_sql posture); exact decimal
    moments, Cramer closed form, one sqrt."""
    ev = table(spark, sf, "events")
    ev.createOrReplaceTempView("mura_adf_events")
    return spark.sql(_adf_sql("mura_adf_events"))


@q("orders_backlog_aging",
   "WITH ref AS (SELECT MAX(o_orderdate) AS mx FROM orders), "
   "a AS (SELECT o_orderstatus, "
   "CASE WHEN epoch_us(mx) - epoch_us(o_orderdate) "
   "<= 30 * 86400000000 THEN '0-30d' "
   "WHEN epoch_us(mx) - epoch_us(o_orderdate) "
   "<= 90 * 86400000000 THEN '31-90d' "
   "WHEN epoch_us(mx) - epoch_us(o_orderdate) "
   "<= 365 * 86400000000 THEN '91-365d' ELSE '>365d' END AS age_bucket, "
   "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
   "FROM orders CROSS JOIN ref WHERE o_orderstatus <> 'F') "
   "SELECT o_orderstatus, age_bucket, CAST(COUNT(*) AS BIGINT) "
   "AS n_orders, CAST(SUM(cents) AS BIGINT) AS backlog_cents "
   "FROM a GROUP BY 1, 2")
def orders_backlog_aging(spark, sf):
    """Open-order backlog aging: non-finalized orders bucketed by age
    from the newest order date (0-30/31-90/91-365/>365 days), with
    exact-cents value at risk per (status, bucket) — the operational
    WIP report every order system runs nightly. Broadcast max-date
    singleton; one conditional rollup; age in exact µs integers."""
    o = table(spark, sf, "orders")
    ref = o.agg(F.max("o_orderdate").alias("mx"))
    age_us = F.unix_micros("mx") - F.unix_micros("o_orderdate")
    day = 86400000000
    bucket = (F.when(age_us <= 30 * day, "0-30d")
               .when(age_us <= 90 * day, "31-90d")
               .when(age_us <= 365 * day, "91-365d")
               .otherwise(">365d"))
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100) \
        .cast("bigint")
    return (o.filter(F.col("o_orderstatus") != "F")
             .crossJoin(F.broadcast(ref))
             .groupBy("o_orderstatus", bucket.alias("age_bucket"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.sum(cents).alias("backlog_cents")))


_PK_SPECS = [
    ("region", "CAST(r_regionkey AS VARCHAR)"),
    ("nation", "CAST(n_nationkey AS VARCHAR)"),
    ("customer", "CAST(c_custkey AS VARCHAR)"),
    ("supplier", "CAST(s_suppkey AS VARCHAR)"),
    ("part", "CAST(p_partkey AS VARCHAR)"),
    ("orders", "CAST(o_orderkey AS VARCHAR)"),
    ("lineitem", "CAST(l_orderkey AS VARCHAR) || '|' "
                 "|| CAST(l_linenumber AS VARCHAR)"),
    ("events", "CAST(event_id AS VARCHAR)"),
    ("documents", "CAST(doc_id AS VARCHAR)"),
    ("embeddings", "CAST(vec_id AS VARCHAR)"),
]

_PK_KEYS = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"], "events": ["event_id"],
    "documents": ["doc_id"], "embeddings": ["vec_id"],
}


@q("audit_primary_keys",
   " UNION ALL ".join(
       f"SELECT '{t}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows, "
       f"CAST(COUNT(DISTINCT {k}) AS BIGINT) AS n_distinct_pk, "
       f"CAST(COUNT(*) - COUNT(DISTINCT {k}) AS BIGINT) AS n_dup_pk "
       f"FROM {t}" for t, k in _PK_SPECS))
def audit_primary_keys(spark, sf):
    """Primary-key contract audit across the whole star schema: row
    count vs distinct key count per table (composite key for
    lineitem) — the uniqueness half of audit_referential's FK checks,
    run as one unioned report so a single driver row guards every
    table's key contract. Each leg is one count-distinct rollup; the
    union is 10 single-row frames."""
    parts = []
    for t, _k in _PK_SPECS:
        df = table(spark, sf, t)
        keys = [F.col(c).cast("string") for c in _PK_KEYS[t]]
        key = keys[0] if len(keys) == 1 else F.concat_ws("|", *keys)
        parts.append(df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(key).alias("n_distinct_pk"))
            .select(F.lit(t).alias("tbl"), "n_rows", "n_distinct_pk",
                    (F.col("n_rows") - F.col("n_distinct_pk"))
                    .alias("n_dup_pk")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@q("supplier_return_rate_lcb",
   "WITH c AS (SELECT l.l_suppkey AS s_suppkey, "
   "CAST(COUNT(*) AS BIGINT) AS n_lines, "
   "CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) "
   "AS BIGINT) AS n_returns FROM lineitem l GROUP BY 1) "
   "SELECT s_suppkey, n_lines, n_returns, "
   "CAST(floor(CAST(n_returns AS DOUBLE) / CAST(n_lines AS DOUBLE) "
   "* 1000000.0 + 0.5) AS BIGINT) AS rate_micro, "
   "CAST(floor((CAST(n_returns AS DOUBLE) / CAST(n_lines AS DOUBLE) "
   "+ 1.959964 * 1.959964 / (2.0 * CAST(n_lines AS DOUBLE)) "
   "- 1.959964 * sqrt(CAST(n_returns AS DOUBLE) "
   "/ CAST(n_lines AS DOUBLE) * (1.0 - CAST(n_returns AS DOUBLE) "
   "/ CAST(n_lines AS DOUBLE)) / CAST(n_lines AS DOUBLE) "
   "+ 1.959964 * 1.959964 / (4.0 * CAST(n_lines AS DOUBLE) "
   "* CAST(n_lines AS DOUBLE)))) "
   "/ (1.0 + 1.959964 * 1.959964 / CAST(n_lines AS DOUBLE)) "
   "* 1000000.0 + 0.5) AS BIGINT) AS lcb_micro FROM c")
def supplier_return_rate_lcb(spark, sf):
    """Supplier return-rate ranking by Wilson LOWER confidence bound —
    the small-sample-safe ranking rule (Evan Miller's 'how not to
    sort by average rating', here: which suppliers are provably bad,
    not just unlucky on 3 lines). One supplier rollup; the Wilson
    bound is one mirrored closed-form double expression per supplier,
    micro-floored. Complements stats_wilson_error_rate (global) and
    stats_eb_shrinkage (Bayesian smoothing) as the frequentist
    per-group guard."""
    li = table(spark, sf, "lineitem")
    c = (li.groupBy(F.col("l_suppkey").alias("s_suppkey"))
           .agg(F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.when(F.col("l_returnflag") == "R", 1)
                       .otherwise(0)).alias("n_returns")))
    nD = F.col("n_lines").cast("double")
    p = F.col("n_returns").cast("double") / nD
    z = F.lit(1.959964)
    lcb = ((p + z * z / (F.lit(2.0) * nD)
            - z * F.sqrt(p * (F.lit(1.0) - p) / nD
                         + z * z / (F.lit(4.0) * nD * nD)))
           / (F.lit(1.0) + z * z / nD))
    mic = lambda x: F.floor(x * F.lit(1000000.0)  # noqa: E731
                            + F.lit(0.5)).cast("bigint")
    return c.select("s_suppkey", "n_lines", "n_returns",
                    mic(p).alias("rate_micro"),
                    mic(lcb).alias("lcb_micro"))


@q("stats_paired_ttest",
   "WITH per AS (SELECT o_custkey, "
   "SUM(CASE WHEN year(o_orderdate) = 1999 THEN "
   "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
   "ELSE 0 END) AS s1, "
   "SUM(CASE WHEN year(o_orderdate) = 1999 THEN 1 ELSE 0 END) AS n1, "
   "SUM(CASE WHEN year(o_orderdate) = 2000 THEN "
   "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
   "ELSE 0 END) AS s2, "
   "SUM(CASE WHEN year(o_orderdate) = 2000 THEN 1 ELSE 0 END) AS n2 "
   "FROM orders WHERE year(o_orderdate) IN (1999, 2000) GROUP BY 1), "
   "d AS (SELECT CAST(s2 - s1 AS BIGINT) AS df FROM per "
   "WHERE n1 > 0 AND n2 > 0), "
   "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, "
   "CAST(SUM(CAST(df AS DECIMAL(38,0))) AS DOUBLE) AS sd, "
   "CAST(SUM(CAST(df AS DECIMAL(19,0)) * CAST(df AS DECIMAL(19,0))) "
   "AS DOUBLE) AS sdd FROM d) "
   "SELECT n_pairs, "
   "CAST(floor(sd / CAST(n_pairs AS DOUBLE) + 0.5) AS BIGINT) "
   "AS mean_diff_cents, "
   "CASE WHEN n_pairs > 1 AND sdd - sd * sd / CAST(n_pairs AS DOUBLE) "
   "> 0.0 THEN CAST(floor(sd / CAST(n_pairs AS DOUBLE) "
   "/ sqrt((sdd - sd * sd / CAST(n_pairs AS DOUBLE)) "
   "/ CAST(n_pairs - 1 AS DOUBLE) / CAST(n_pairs AS DOUBLE)) "
   "* 1000000.0 + 0.5) AS BIGINT) END AS t_micro FROM m")
def stats_paired_ttest(spark, sf):
    """Paired t-test on per-customer annual spend (1999 vs 2000,
    customers active BOTH years): t = d̄ / √(s²_d/n) — the
    within-subject design that cancels between-customer variance the
    unpaired z-test (stats_ab_ztest) cannot. One customer-grain
    conditional rollup; exact decimal moments of the integer cent
    diffs; one mirrored closed form."""
    o = table(spark, sf, "orders")
    y = F.year("o_orderdate")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100) \
        .cast("bigint")
    per = (o.filter(y.isin(1999, 2000))
            .groupBy("o_custkey")
            .agg(F.sum(F.when(y == 1999, cents).otherwise(0)).alias("s1"),
                 F.sum(F.when(y == 1999, 1).otherwise(0)).alias("n1"),
                 F.sum(F.when(y == 2000, cents).otherwise(0)).alias("s2"),
                 F.sum(F.when(y == 2000, 1).otherwise(0)).alias("n2")))
    d = (per.filter((F.col("n1") > 0) & (F.col("n2") > 0))
            .select((F.col("s2") - F.col("s1")).alias("df")))
    m = d.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("df").cast("decimal(38,0)")).cast("double")
         .alias("sd"),
        F.sum(F.col("df").cast("decimal(19,0)")
              * F.col("df").cast("decimal(19,0)")).cast("double")
         .alias("sdd"))
    nD = F.col("n_pairs").cast("double")
    var_num = F.col("sdd") - F.col("sd") * F.col("sd") / nD
    t = (F.col("sd") / nD
         / F.sqrt(var_num / (F.col("n_pairs") - F.lit(1)).cast("double")
                  / nD))
    return m.select(
        "n_pairs",
        F.floor(F.col("sd") / nD + F.lit(0.5)).cast("bigint")
         .alias("mean_diff_cents"),
        F.when((F.col("n_pairs") > 1) & (var_num > 0),
               F.floor(t * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
         .alias("t_micro"))


def _pinball_oracle() -> str:
    from mura_spark.operators.stats import sql_group_percentiles
    med = sql_group_percentiles(
        "(SELECT event_type, value FROM events WHERE value IS NOT NULL)",
        ["event_type"], "value", [0.5, 0.9], ["p50", "p90"])
    return (
        f"WITH q AS ({med}), "
        "e AS (SELECT e.event_type, "
        "CAST(floor(e.value * 1000000.0 + 0.5) AS BIGINT) AS vm, "
        "q.p50_micro, q.p90_micro FROM events e "
        "JOIN q ON e.event_type = q.event_type "
        "WHERE e.value IS NOT NULL) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(greatest(5 * (vm - p50_micro), "
        "-5 * (vm - p50_micro))) AS BIGINT) AS pinball_p50_x10, "
        "CAST(SUM(greatest(9 * (vm - p90_micro), "
        "-1 * (vm - p90_micro))) AS BIGINT) AS pinball_p90_x10 "
        "FROM e GROUP BY 1")


@q("stats_pinball_quantile_eval", _pinball_oracle())
def stats_pinball_quantile_eval(spark, sf):
    """Pinball (quantile) loss of the exact p50/p90 per-type values as
    constant quantile forecasts — the eval every quantile-forecasting
    pipeline reports (and the check that the claimed quantile actually
    MINIMIZES its own pinball loss). Kept exact end-to-end: per-row
    micro values, losses as 10×-scaled integers (q=.5 → 5·|d|;
    q=.9 → max(9d, −d)), summed as exact BIGINTs — no floats
    anywhere past the percentile's own quantization."""
    from mura_spark.functions.quantize import micro
    from mura_spark.operators.stats import group_percentiles
    ev = (table(spark, sf, "events")
          .where(F.col("value").isNotNull())
          .select("event_type", "value"))
    qs = group_percentiles(ev, ["event_type"], "value",
                           [0.5, 0.9], ["p50", "p90"])
    e = (ev.join(F.broadcast(qs), "event_type")
           .select("event_type",
                   (micro(F.col("value")) - F.col("p50_micro"))
                   .alias("d50"),
                   (micro(F.col("value")) - F.col("p90_micro"))
                   .alias("d90")))
    return (e.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.greatest(5 * F.col("d50"), -5 * F.col("d50")))
                   .cast("bigint").alias("pinball_p50_x10"),
                  F.sum(F.greatest(9 * F.col("d90"),
                                   F.lit(-1) * F.col("d90")))
                   .cast("bigint").alias("pinball_p90_x10")))


@q("stats_dispersion_orders",
   "WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k "
   "FROM lineitem GROUP BY 1), "
   "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(k) AS BIGINT) AS s, "
   "CAST(SUM(CAST(k AS DECIMAL(19,0)) * CAST(k AS DECIMAL(19,0))) "
   "AS DOUBLE) AS q FROM c) "
   "SELECT n, "
   "CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 "
   "+ 0.5) AS BIGINT) AS mean_micro, "
   "CASE WHEN n > 1 AND s > 0 THEN "
   "CAST(floor(((q - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) "
   "/ CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) "
   "/ (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) "
   "AS BIGINT) END AS dispersion_micro, "
   "CASE WHEN n > 1 AND s > 0 THEN "
   "CAST(floor((((q - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) "
   "/ CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) "
   "/ (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0) "
   "* sqrt(CAST(n - 1 AS DOUBLE) / 2.0) * 1000000.0 + 0.5) "
   "AS BIGINT) END AS z_micro FROM m")
def stats_dispersion_orders(spark, sf):
    """Index of dispersion (variance-to-mean ratio) of lines-per-order
    with its normal-approximation z — the Poissonness check run before
    modeling count data (D≈1 Poisson, D>1 overdispersed → negative
    binomial territory; z = (D−1)·√((n−1)/2)). One orderkey rollup to
    the count frame; exact decimal moments; one mirrored closed
    form."""
    li = table(spark, sf, "lineitem")
    c = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    m = c.agg(F.count(F.lit(1)).alias("n"),
              F.sum("k").alias("s"),
              F.sum(F.col("k").cast("decimal(19,0)")
                    * F.col("k").cast("decimal(19,0)")).cast("double")
               .alias("q"))
    nD = F.col("n").cast("double")
    sD = F.col("s").cast("double")
    mean = sD / nD
    var = (F.col("q") - sD * sD / nD) / (F.col("n") - F.lit(1)) \
        .cast("double")
    disp = var / mean
    z = (disp - F.lit(1.0)) * F.sqrt((F.col("n") - F.lit(1))
                                     .cast("double") / F.lit(2.0))
    ok = (F.col("n") > 1) & (F.col("s") > 0)
    mic = lambda x: F.floor(x * F.lit(1000000.0)  # noqa: E731
                            + F.lit(0.5)).cast("bigint")
    return m.select("n", mic(mean).alias("mean_micro"),
                    F.when(ok, mic(disp)).alias("dispersion_micro"),
                    F.when(ok, mic(z)).alias("z_micro"))


@q("stats_mann_kendall_daily",
   "WITH daily AS (SELECT epoch_us(date_trunc('day', ts)) "
   "// 86400000000 AS d, "
   "SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y "
   "FROM events WHERE value IS NOT NULL GROUP BY 1), "
   "s AS (SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1 "
   "WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS mk_s "
   "FROM daily a JOIN daily b ON b.d > a.d), "
   "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily), "
   "ties AS (SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) "
   "AS BIGINT), 0) AS tie_term FROM "
   "(SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY y) "
   "WHERE t > 1) "
   "SELECT n_days, mk_s, "
   "CASE WHEN n_days > 2 AND (CAST(n_days AS DOUBLE) "
   "* CAST(n_days - 1 AS DOUBLE) * CAST(2 * n_days + 5 AS DOUBLE) "
   "- CAST(tie_term AS DOUBLE)) / 18.0 > 0.0 THEN "
   "CAST(floor((CASE WHEN mk_s > 0 THEN CAST(mk_s - 1 AS DOUBLE) "
   "WHEN mk_s < 0 THEN CAST(mk_s + 1 AS DOUBLE) ELSE 0.0 END) "
   "/ sqrt((CAST(n_days AS DOUBLE) * CAST(n_days - 1 AS DOUBLE) "
   "* CAST(2 * n_days + 5 AS DOUBLE) - CAST(tie_term AS DOUBLE)) "
   "/ 18.0) * 1000000.0 + 0.5) AS BIGINT) END AS z_micro "
   "FROM s CROSS JOIN n CROSS JOIN ties")
def stats_mann_kendall_daily(spark, sf):
    """Mann–Kendall trend test on daily total value: S = Σ sign(yⱼ−yᵢ)
    over all day pairs, tie-corrected variance, continuity-corrected
    z — the NONPARAMETRIC significance companion to the Theil–Sen
    slope (same robustness, now with an accept/reject). The pair join
    runs on the tiny day frame (≤ days² pairs); S and the tie term
    are exact integers; one mirrored closed form."""
    ev = table(spark, sf, "events").where(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (ev.groupBy(F.expr("unix_micros(date_trunc('DAY', ts)) "
                               "div 86400000000").alias("d"))
               .agg(F.sum(cents).alias("y")))
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    s = (a.join(b, F.col("db") > F.col("da"))
          .agg(F.sum(F.when(F.col("yb") > F.col("ya"), 1)
                      .when(F.col("yb") < F.col("ya"), -1)
                      .otherwise(0)).alias("mk_s")))
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    ties = (daily.groupBy("y").agg(F.count(F.lit(1)).alias("t"))
                 .filter(F.col("t") > 1)
                 .agg(F.coalesce(
                     F.sum(F.col("t") * (F.col("t") - 1)
                           * (2 * F.col("t") + 5)),
                     F.lit(0).cast("bigint")).alias("tie_term")))
    ndD = F.col("n_days").cast("double")
    var = ((ndD * (F.col("n_days") - F.lit(1)).cast("double")
            * (F.lit(2) * F.col("n_days") + F.lit(5)).cast("double")
            - F.col("tie_term").cast("double")) / F.lit(18.0))
    num = (F.when(F.col("mk_s") > 0,
                  (F.col("mk_s") - F.lit(1)).cast("double"))
            .when(F.col("mk_s") < 0,
                  (F.col("mk_s") + F.lit(1)).cast("double"))
            .otherwise(F.lit(0.0)))
    ok = (F.col("n_days") > 2) & (var > 0)
    z = F.floor(num / F.sqrt(var) * F.lit(1000000.0) + F.lit(0.5)) \
         .cast("bigint")
    return (s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
             .select("n_days", "mk_s", F.when(ok, z).alias("z_micro")))


@q("stats_hill_tail_index",
   "WITH v AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 "
   "AS BIGINT) AS c FROM events WHERE value IS NOT NULL "
   "AND CAST(value AS DECIMAL(18,2)) > 0), "
   "cells AS (SELECT c, COUNT(*) AS k FROM v GROUP BY 1), "
   "cum AS (SELECT c, k, SUM(k) OVER (ORDER BY c DESC) AS gc "
   "FROM cells), "
   "xk AS (SELECT MAX(c) AS xkc FROM cum WHERE gc >= 101), "
   "t AS (SELECT cum.c, GREATEST(0, LEAST(100 - (gc - k), k)) AS w "
   "FROM cum CROSS JOIN xk WHERE cum.c > xk.xkc), "
   "s AS (SELECT CAST(SUM(w * CAST(floor(ln(CAST(c AS DOUBLE) "
   "/ CAST((SELECT xkc FROM xk) AS DOUBLE)) * 1000000.0 + 0.5) "
   "AS BIGINT)) AS BIGINT) AS hsum FROM t) "
   "SELECT CAST(100 AS BIGINT) AS k_order, "
   "(SELECT CAST(xkc AS BIGINT) FROM xk) AS xk_cents, "
   "CAST(floor(CAST(hsum AS DOUBLE) / 100.0 + 0.5) AS BIGINT) "
   "AS hill_micro, "
   "CASE WHEN hsum > 0 THEN CAST(floor(1000000000000.0 "
   "/ (CAST(floor(CAST(hsum AS DOUBLE) / 100.0 + 0.5) AS DOUBLE)) "
   "+ 0.5) AS BIGINT) END AS alpha_micro FROM s")
def stats_hill_tail_index(spark, sf):
    """Hill estimator of the value distribution's tail index over the
    top-100 order statistics (α = 1/mean ln(x₍ᵢ₎/x₍ₖ₊₁₎)) — the
    heavy-tail diagnosis that decides whether means/variances are even
    meaningful for this KPI (α ≤ 2 → infinite variance). Order
    statistics by exact integer rank on the cents cells; one ln per
    DISTINCT value, micro-quantized before the exact weighted sum;
    two terminal divisions."""
    from pyspark.sql import Window
    ev = (table(spark, sf, "events")
          .where(F.col("value").isNotNull()
                 & (F.col("value").cast("decimal(18,2)") > 0)))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    cells = (ev.select(cents.alias("c"))
               .groupBy("c").agg(F.count(F.lit(1)).alias("k")))
    cum = cells.select(
        "c", "k",
        F.sum("k").over(Window.orderBy(F.desc("c"))
                        .rowsBetween(Window.unboundedPreceding, 0))
         .alias("gc"))
    xk = cum.filter(F.col("gc") >= 101).agg(F.max("c").alias("xkc"))
    t = (cum.crossJoin(F.broadcast(xk))
            .filter(F.col("c") > F.col("xkc"))
            .select("c", "xkc",
                    F.greatest(F.lit(0),
                               F.least(F.lit(100)
                                       - (F.col("gc") - F.col("k")),
                                       F.col("k"))).alias("w")))
    lnq = (F.floor(F.log(F.col("c").cast("double")
                         / F.col("xkc").cast("double"))
                   * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    s = t.agg(F.sum(F.col("w") * lnq).alias("hsum"))
    hill = F.floor(F.col("hsum").cast("double") / F.lit(100.0)
                   + F.lit(0.5)).cast("bigint")
    alpha = (F.floor(F.lit(1000000000000.0) / hill.cast("double")
                     + F.lit(0.5)).cast("bigint"))
    return (s.crossJoin(F.broadcast(xk))
             .select(F.lit(100).cast("bigint").alias("k_order"),
                     F.col("xkc").cast("bigint").alias("xk_cents"),
                     hill.alias("hill_micro"),
                     F.when(F.col("hsum") > 0, alpha)
                      .alias("alpha_micro")))


@q("stats_tost_equivalence",
   f"WITH u AS (SELECT user_id, {_AB_BUCKET} % 2 AS variant, "
   "SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s "
   "FROM events WHERE value IS NOT NULL GROUP BY 1), "
   "v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(CAST(s AS DECIMAL(38,0))) AS DOUBLE) AS sv, "
   "CAST(SUM(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))) "
   "AS DOUBLE) AS qv FROM u GROUP BY 1), "
   "w AS (SELECT MAX(CASE WHEN variant = 0 THEN n END) AS na, "
   "MAX(CASE WHEN variant = 0 THEN sv END) AS sa, "
   "MAX(CASE WHEN variant = 0 THEN qv END) AS qa, "
   "MAX(CASE WHEN variant = 1 THEN n END) AS nb, "
   "MAX(CASE WHEN variant = 1 THEN sv END) AS sb, "
   "MAX(CASE WHEN variant = 1 THEN qv END) AS qb FROM v), "
   "m AS (SELECT na, nb, "
   "sa / CAST(na AS DOUBLE) AS ma, sb / CAST(nb AS DOUBLE) AS mb, "
   "((qa - sa * sa / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE)) "
   "/ CAST(na AS DOUBLE) "
   "+ ((qb - sb * sb / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE)) "
   "/ CAST(nb AS DOUBLE) AS se2 FROM w), "
   "t AS (SELECT na, nb, mb - ma AS diff, sqrt(se2) AS se, "
   "0.05 * ma AS margin FROM m) "
   "SELECT na, nb, CAST(floor(diff + 0.5) AS BIGINT) AS diff_cents, "
   "CASE WHEN se > 0 THEN CAST(floor((diff + margin) / se "
   "* 1000000.0 + 0.5) AS BIGINT) END AS z_lower_micro, "
   "CASE WHEN se > 0 THEN CAST(floor((margin - diff) / se "
   "* 1000000.0 + 0.5) AS BIGINT) END AS z_upper_micro, "
   "CASE WHEN se > 0 THEN CAST((diff + margin) / se > 1.644854 "
   "AND (margin - diff) / se > 1.644854 AS INT) END AS is_equivalent "
   "FROM t")
def stats_tost_equivalence(spark, sf):
    """TOST equivalence test (two one-sided z-tests at α=.05): is the
    B variant's mean user spend within ±5% of A — the 'prove it's NOT
    worse' question a non-inferiority launch review asks, which a
    failed superiority test can never answer. Exact decimal moments
    of per-user cent sums; Welch SE; both one-sided z's mirrored;
    equivalent iff min(z₁,z₂) > 1.645."""
    from mura_spark.operators.sampling import hash_bucket
    ev = table(spark, sf, "events").where(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    u = (ev.groupBy("user_id")
           .agg(F.sum(cents).alias("s"))
           .select((hash_bucket(F.col("user_id")) % 2).alias("variant"),
                   "s"))
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("s").cast("decimal(38,0)")).cast("double")
         .alias("sv"),
        F.sum(F.col("s").cast("decimal(19,0)")
              * F.col("s").cast("decimal(19,0)")).cast("double")
         .alias("qv"))
    pick = lambda c, var: F.max(  # noqa: E731
        F.when(F.col("variant") == var, F.col(c)))
    w = v.agg(pick("n", 0).alias("na"), pick("sv", 0).alias("sa"),
              pick("qv", 0).alias("qa"), pick("n", 1).alias("nb"),
              pick("sv", 1).alias("sb"), pick("qv", 1).alias("qb"))
    naD = F.col("na").cast("double")
    nbD = F.col("nb").cast("double")
    ma = F.col("sa") / naD
    mb = F.col("sb") / nbD
    se2 = (((F.col("qa") - F.col("sa") * F.col("sa") / naD)
            / (F.col("na") - F.lit(1)).cast("double")) / naD
           + ((F.col("qb") - F.col("sb") * F.col("sb") / nbD)
              / (F.col("nb") - F.lit(1)).cast("double")) / nbD)
    diff = mb - ma
    se = F.sqrt(se2)
    margin = F.lit(0.05) * ma
    zl = (diff + margin) / se
    zu = (margin - diff) / se
    mic = lambda x: F.floor(x * F.lit(1000000.0)  # noqa: E731
                            + F.lit(0.5)).cast("bigint")
    return w.select(
        "na", "nb",
        F.floor(diff + F.lit(0.5)).cast("bigint").alias("diff_cents"),
        F.when(se > 0, mic(zl)).alias("z_lower_micro"),
        F.when(se > 0, mic(zu)).alias("z_upper_micro"),
        F.when(se > 0, ((zl > 1.644854) & (zu > 1.644854)).cast("int"))
         .alias("is_equivalent"))


_TWO_PI = "6.283185307179586"


@q("stats_circular_time_of_day",
   "WITH a AS (SELECT event_type, "
   "CAST(epoch_us(ts) % 86400000000 AS DOUBLE) / 86400000000.0 "
   f"* {_TWO_PI} AS th FROM events), "
   "qz AS (SELECT event_type, "
   "CAST(floor(sin(th) * 1000000.0 + 0.5) AS BIGINT) AS s, "
   "CAST(floor(cos(th) * 1000000.0 + 0.5) AS BIGINT) AS c FROM a), "
   "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(s) AS DOUBLE) AS ss, CAST(SUM(c) AS DOUBLE) AS sc "
   "FROM qz GROUP BY 1) "
   "SELECT event_type, n, "
   "CAST(floor((CASE WHEN atan2(ss, sc) < 0 THEN atan2(ss, sc) "
   f"+ {_TWO_PI} ELSE atan2(ss, sc) END) / {_TWO_PI} * 24.0 "
   "* 1000000.0 + 0.5) AS BIGINT) AS mean_hour_micro, "
   "CAST(floor(sqrt(ss * ss + sc * sc) / (1000000.0 "
   "* CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS r_micro "
   "FROM m")
def stats_circular_time_of_day(spark, sf):
    """Circular (directional) statistics of event time-of-day per
    type: the circular mean hour and the resultant length R (1 =
    perfectly peaked daily habit, 0 = uniform around the clock) —
    the CORRECT average for clock data, where the arithmetic mean of
    23:00 and 01:00 is noon. Per-row sin/cos micro-quantized before
    the exact integer sums (the transcendental convention); atan2 and
    R are one mirrored terminal expression per type."""
    ev = table(spark, sf, "events")
    th = (F.expr("CAST(unix_micros(ts) % 86400000000 AS DOUBLE)")
          / F.lit(86400000000.0) * F.lit(6.283185307179586))
    qz = ev.select(
        "event_type",
        F.floor(F.sin(th) * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").alias("s"),
        F.floor(F.cos(th) * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").alias("c"))
    m = qz.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").cast("double").alias("ss"),
        F.sum("c").cast("double").alias("sc"))
    ang = F.atan2(F.col("ss"), F.col("sc"))
    ang = F.when(ang < 0, ang + F.lit(6.283185307179586)).otherwise(ang)
    mean_hour = (F.floor(ang / F.lit(6.283185307179586) * F.lit(24.0)
                         * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    r = (F.floor(F.sqrt(F.col("ss") * F.col("ss")
                        + F.col("sc") * F.col("sc"))
                 / (F.lit(1000000.0) * F.col("n").cast("double"))
                 * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    return m.select("event_type", "n",
                    mean_hour.alias("mean_hour_micro"),
                    r.alias("r_micro"))


@q("stats_cohens_d_value",
   "WITH v AS (SELECT event_type, "
   "CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) "
   "AS DOUBLE) AS s, "
   "CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) "
   "AS DECIMAL(19,0)) * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 "
   "AS BIGINT) AS DECIMAL(19,0))) AS DOUBLE) AS q "
   "FROM events WHERE value IS NOT NULL "
   "AND event_type IN ('click', 'purchase') GROUP BY 1), "
   "w AS (SELECT MAX(CASE WHEN event_type = 'click' THEN n END) AS na, "
   "MAX(CASE WHEN event_type = 'click' THEN s END) AS sa, "
   "MAX(CASE WHEN event_type = 'click' THEN q END) AS qa, "
   "MAX(CASE WHEN event_type = 'purchase' THEN n END) AS nb, "
   "MAX(CASE WHEN event_type = 'purchase' THEN s END) AS sb, "
   "MAX(CASE WHEN event_type = 'purchase' THEN q END) AS qb FROM v) "
   "SELECT na, nb, "
   "CASE WHEN na > 1 AND nb > 1 AND (qa - sa * sa "
   "/ CAST(na AS DOUBLE) + qb - sb * sb / CAST(nb AS DOUBLE)) "
   "/ CAST(na + nb - 2 AS DOUBLE) > 0.0 THEN "
   "CAST(floor((sb / CAST(nb AS DOUBLE) - sa / CAST(na AS DOUBLE)) "
   "/ sqrt((qa - sa * sa / CAST(na AS DOUBLE) + qb - sb * sb "
   "/ CAST(nb AS DOUBLE)) / CAST(na + nb - 2 AS DOUBLE)) "
   "* 1000000.0 + 0.5) AS BIGINT) END AS cohens_d_micro FROM w")
def stats_cohens_d_value(spark, sf):
    """Cohen's d standardized effect size between click and purchase
    values (pooled-SD mean difference) — the magnitude companion every
    significance test in the suite owes its reader (a 'significant'
    z with d = 0.02 ships nothing). Exact decimal moments; one
    mirrored closed form."""
    ev = (table(spark, sf, "events")
          .where(F.col("value").isNotNull()
                 & F.col("event_type").isin("click", "purchase")))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    v = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("double").alias("s"),
        F.sum(cents.cast("decimal(19,0)")
              * cents.cast("decimal(19,0)")).cast("double").alias("q"))
    pick = lambda c, t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, F.col(c)))
    w = v.agg(pick("n", "click").alias("na"),
              pick("s", "click").alias("sa"),
              pick("q", "click").alias("qa"),
              pick("n", "purchase").alias("nb"),
              pick("s", "purchase").alias("sb"),
              pick("q", "purchase").alias("qb"))
    naD, nbD = F.col("na").cast("double"), F.col("nb").cast("double")
    ssa = F.col("qa") - F.col("sa") * F.col("sa") / naD
    ssb = F.col("qb") - F.col("sb") * F.col("sb") / nbD
    pooled = (ssa + ssb) / (F.col("na") + F.col("nb") - F.lit(2)) \
        .cast("double")
    d = ((F.col("sb") / nbD - F.col("sa") / naD) / F.sqrt(pooled))
    ok = (F.col("na") > 1) & (F.col("nb") > 1) & (pooled > 0)
    return w.select("na", "nb",
                    F.when(ok, F.floor(d * F.lit(1000000.0)
                                       + F.lit(0.5)).cast("bigint"))
                     .alias("cohens_d_micro"))


@q("stats_qini_curve",
   f"WITH u AS (SELECT user_id, {_AB_BUCKET} % 2 AS variant, "
   "SUM(CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 "
   "AS BIGINT)) AS sp, "
   "CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) "
   ">= 15 THEN 1 ELSE 0 END AS conv FROM events GROUP BY 1), "
   "cells AS (SELECT sp, COUNT(*) AS k FROM u GROUP BY 1), "
   "nn AS (SELECT SUM(k) AS n FROM cells), "
   "cum AS (SELECT sp, SUM(k) OVER (ORDER BY sp) AS gc FROM cells), "
   "th AS (SELECT i, (SELECT MIN(sp) FROM cum CROSS JOIN nn "
   "WHERE gc >= (i * n + 9) // 10) AS bv FROM range(1, 10) t(i)), "
   "tl AS (SELECT list(bv ORDER BY i) AS bl FROM th), "
   "a AS (SELECT len(list_filter(bl, x -> sp > x)) AS decile, "
   "variant, conv FROM u CROSS JOIN tl), "
   "g AS (SELECT decile, "
   "CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) "
   "AS n_t, "
   "CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) "
   "AS n_c, "
   "CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) "
   "AS conv_t, "
   "CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) "
   "AS conv_c FROM a GROUP BY 1), "
   "c AS (SELECT decile, n_t, n_c, conv_t, conv_c, "
   "SUM(n_t) OVER (ORDER BY decile DESC) AS ct_n, "
   "SUM(n_c) OVER (ORDER BY decile DESC) AS cc_n, "
   "SUM(conv_t) OVER (ORDER BY decile DESC) AS ct_c, "
   "SUM(conv_c) OVER (ORDER BY decile DESC) AS cc_c FROM g) "
   "SELECT CAST(decile AS BIGINT) AS decile, n_t, n_c, conv_t, "
   "conv_c, CASE WHEN cc_n > 0 THEN "
   "CAST(floor((CAST(ct_c AS DOUBLE) - CAST(cc_c AS DOUBLE) "
   "* CAST(ct_n AS DOUBLE) / CAST(cc_n AS DOUBLE)) * 1000000.0 "
   "+ 0.5) AS BIGINT) END AS qini_micro FROM c")
def stats_qini_curve(spark, sf):
    """Qini uplift curve: reading spend deciles from the top, the
    cumulative incremental conversions of the treated arm over the
    control arm's rate-matched expectation — the uplift-modeling eval
    that tells you WHOM to treat, which the plain A/B z-test cannot.
    Hash-bucket variants (the stats_ab_ztest convention); decile
    boundaries by exact integer rank; exact counts with one mirrored
    expression per decile."""
    from pyspark.sql import Window
    from mura_spark.operators.sampling import hash_bucket
    ev = table(spark, sf, "events")
    cents = (F.coalesce(F.col("value").cast("decimal(18,2)"),
                        F.lit(0).cast("decimal(18,2)")) * 100) \
        .cast("bigint")
    u = (ev.groupBy("user_id")
           .agg(F.sum(cents).alias("sp"),
                F.when(F.sum(F.when(F.col("event_type") == "purchase",
                                    1).otherwise(0)) >= 15, 1)
                 .otherwise(0).alias("conv"))
           .select((hash_bucket(F.col("user_id")) % 2).alias("variant"),
                   "sp", "conv"))
    cells = u.groupBy("sp").agg(F.count(F.lit(1)).alias("k"))
    nn = cells.agg(F.sum("k").alias("n"))
    cum = cells.select(
        "sp", F.sum("k").over(Window.orderBy("sp")
                              .rowsBetween(Window.unboundedPreceding, 0))
              .alias("gc"))
    th = (cum.crossJoin(F.broadcast(nn))
             .crossJoin(F.broadcast(
                 ev.sparkSession.range(1, 10).select(
                     F.col("id").alias("i"))))
             .filter(F.col("gc") >= F.expr("(i * n + 9) div 10"))
             .groupBy("i").agg(F.min("sp").alias("bv")))
    tl = th.agg(F.array_sort(F.collect_list(
        F.struct("i", "bv"))).alias("__s")).select(
        F.transform("__s", lambda x: x["bv"]).alias("bl"))
    a = (u.crossJoin(F.broadcast(tl))
          .select(F.size(F.filter(F.col("bl"),
                                  lambda x: F.col("sp") > x))
                   .alias("decile"), "variant", "conv"))
    cnt = lambda var, c: F.sum(  # noqa: E731
        F.when(F.col("variant") == var, c).otherwise(0))
    g = a.groupBy("decile").agg(
        cnt(1, F.lit(1)).alias("n_t"), cnt(0, F.lit(1)).alias("n_c"),
        cnt(1, F.col("conv")).alias("conv_t"),
        cnt(0, F.col("conv")).alias("conv_c"))
    wd = Window.orderBy(F.desc("decile")) \
               .rowsBetween(Window.unboundedPreceding, 0)
    c = g.select("decile", "n_t", "n_c", "conv_t", "conv_c",
                 F.sum("n_t").over(wd).alias("ct_n"),
                 F.sum("n_c").over(wd).alias("cc_n"),
                 F.sum("conv_t").over(wd).alias("ct_c"),
                 F.sum("conv_c").over(wd).alias("cc_c"))
    qini = (F.floor((F.col("ct_c").cast("double")
                     - F.col("cc_c").cast("double")
                     * F.col("ct_n").cast("double")
                     / F.col("cc_n").cast("double"))
                    * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    return c.select(F.col("decile").cast("bigint").alias("decile"),
                    "n_t", "n_c", "conv_t", "conv_c",
                    F.when(F.col("cc_n") > 0, qini).alias("qini_micro"))


@q("stats_mahalanobis_outliers",
   "WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x, "
   "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y "
   "FROM lineitem), "
   "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx, "
   "CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy, "
   "CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) "
   "AS DOUBLE) AS sxx, "
   "CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) "
   "AS DOUBLE) AS syy, "
   "CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) "
   "AS DOUBLE) AS sxy FROM b), "
   "c AS (SELECT n, sx / CAST(n AS DOUBLE) AS mx, "
   "sy / CAST(n AS DOUBLE) AS my, "
   "(sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS vx, "
   "(syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS vy, "
   "(sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS cxy "
   "FROM m), "
   "d AS (SELECT c.n, "
   "SUM(CASE WHEN (vy * (x - mx) * (x - mx) "
   "- 2.0 * cxy * (x - mx) * (y - my) "
   "+ vx * (y - my) * (y - my)) / (vx * vy - cxy * cxy) > 5.991465 "
   "THEN 1 ELSE 0 END) AS n_out95, "
   "SUM(CASE WHEN (vy * (x - mx) * (x - mx) "
   "- 2.0 * cxy * (x - mx) * (y - my) "
   "+ vx * (y - my) * (y - my)) / (vx * vy - cxy * cxy) > 9.21034 "
   "THEN 1 ELSE 0 END) AS n_out99 "
   "FROM b CROSS JOIN c GROUP BY 1) "
   "SELECT n AS n_rows, CAST(n_out95 AS BIGINT) AS n_out95, "
   "CAST(n_out99 AS BIGINT) AS n_out99 FROM d")
def stats_mahalanobis_outliers(spark, sf):
    """Bivariate Mahalanobis outlier screen on (quantity, price):
    points beyond the χ²₂ 95%/99% ellipses — the MULTIVARIATE anomaly
    detector that catches jointly-weird rows (high qty at low price)
    every univariate fence (IQR/MAD) misses. Exact decimal moments;
    the 2×2 inverse is a closed form, one mirrored per-row double
    expression; exact counts out."""
    li = table(spark, sf, "lineitem")
    b = li.select(
        F.col("l_quantity").cast("bigint").alias("x"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("y"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = b.agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.col("x").cast("decimal(38,0)")).cast("double")
               .alias("sx"),
              F.sum(F.col("y").cast("decimal(38,0)")).cast("double")
               .alias("sy"),
              F.sum(d19("x") * d19("x")).cast("double").alias("sxx"),
              F.sum(d19("y") * d19("y")).cast("double").alias("syy"),
              F.sum(d19("x") * d19("y")).cast("double").alias("sxy"))
    nD = F.col("n").cast("double")
    nm1 = (F.col("n") - F.lit(1)).cast("double")
    c = m.select(
        "n",
        (F.col("sx") / nD).alias("mx"), (F.col("sy") / nD).alias("my"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / nD) / nm1)
        .alias("vx"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / nD) / nm1)
        .alias("vy"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / nD) / nm1)
        .alias("cxy"))
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    md2 = ((F.col("vy") * dx * dx - F.lit(2.0) * F.col("cxy") * dx * dy
            + F.col("vx") * dy * dy)
           / (F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy")))
    return (b.crossJoin(F.broadcast(c))
             .groupBy("n")
             .agg(F.sum(F.when(md2 > 5.991465, 1).otherwise(0))
                   .cast("bigint").alias("n_out95"),
                  F.sum(F.when(md2 > 9.21034, 1).otherwise(0))
                   .cast("bigint").alias("n_out99"))
             .select(F.col("n").alias("n_rows"), "n_out95", "n_out99"))


def _pcorr_sql() -> str:
    """One-text partial-correlation SQL (the _ols2_sql posture): run
    verbatim by BOTH engines over a view named by the caller."""
    x = "CAST(l_quantity AS BIGINT)"
    y = "CAST(round(CAST(l_extendedprice AS DOUBLE) * 100.0) AS BIGINT)"
    z = "CAST(round(CAST(l_discount AS DOUBLE) * 100.0) AS BIGINT)"
    dec = lambda a, b: (f"SUM(CAST({a} AS DECIMAL(19,0)) "  # noqa: E731
                        f"* CAST({b} AS DECIMAL(19,0)))")
    corr = (lambda sab, sa, sb, qa, qb:
            f"(n * {sab} - {sa} * {sb}) "
            f"/ sqrt((n * {qa} - {sa} * {sa}) * (n * {qb} - {sb} * {sb}))")
    return (
        "WITH m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(SUM(CAST({x} AS DECIMAL(38,0))) AS DOUBLE) AS sx, "
        f"CAST(SUM(CAST({y} AS DECIMAL(38,0))) AS DOUBLE) AS sy, "
        f"CAST(SUM(CAST({z} AS DECIMAL(38,0))) AS DOUBLE) AS sz, "
        f"CAST({dec(x, x)} AS DOUBLE) AS qx, "
        f"CAST({dec(y, y)} AS DOUBLE) AS qy, "
        f"CAST({dec(z, z)} AS DOUBLE) AS qz, "
        f"CAST({dec(x, y)} AS DOUBLE) AS sxy, "
        f"CAST({dec(x, z)} AS DOUBLE) AS sxz, "
        f"CAST({dec(y, z)} AS DOUBLE) AS syz "
        "FROM {tbl}), "
        "r AS (SELECT n_rows, "
        f"{corr('sxy', 'sx', 'sy', 'qx', 'qy')} AS rxy, "
        f"{corr('sxz', 'sx', 'sz', 'qx', 'qz')} AS rxz, "
        f"{corr('syz', 'sy', 'sz', 'qy', 'qz')} AS ryz FROM m) "
        "SELECT n_rows, "
        "CAST(floor(rxy * 1000000.0 + 0.5) AS BIGINT) AS rxy_micro, "
        "CASE WHEN (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0.0 THEN "
        "CAST(floor((rxy - rxz * ryz) "
        "/ sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) * 1000000.0 "
        "+ 0.5) AS BIGINT) END AS partial_rxy_z_micro FROM r")


@q("stats_partial_corr", _pcorr_sql().replace("{tbl}", "lineitem"))
def stats_partial_corr(spark, sf):
    """Partial correlation of quantity and price CONTROLLING for
    discount: (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) — the
    continuous-variable confounder adjustment completing the
    Simpson-screen / CMH family (those handle categorical strata;
    this nets out a numeric covariate). All ten moments in one exact
    decimal pass; same SQL text runs on both engines."""
    li = table(spark, sf, "lineitem")
    li.createOrReplaceTempView("mura_pcorr_lineitem")
    return spark.sql(_pcorr_sql().replace("{tbl}",
                                          "mura_pcorr_lineitem"))


def _deming_sql() -> str:
    """One-text Deming regression (λ=1) — slope from centered moments:
    ((Syy−Sxx) + √((Syy−Sxx)² + 4·Sxy²)) / (2·Sxy)."""
    x = "CAST(l_quantity AS BIGINT)"
    y = "CAST(round(CAST(l_extendedprice AS DOUBLE) * 100.0) AS BIGINT)"
    dec = lambda a, b: (f"SUM(CAST({a} AS DECIMAL(19,0)) "  # noqa: E731
                        f"* CAST({b} AS DECIMAL(19,0)))")
    return (
        "WITH m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(SUM(CAST({x} AS DECIMAL(38,0))) AS DOUBLE) AS sx, "
        f"CAST(SUM(CAST({y} AS DECIMAL(38,0))) AS DOUBLE) AS sy, "
        f"CAST({dec(x, x)} AS DOUBLE) AS qx, "
        f"CAST({dec(y, y)} AS DOUBLE) AS qy, "
        f"CAST({dec(x, y)} AS DOUBLE) AS qxy "
        "FROM {tbl}), "
        "c AS (SELECT n_rows, n, "
        "(qx - sx * sx / n) / n AS cxx, "
        "(qy - sy * sy / n) / n AS cyy, "
        "(qxy - sx * sy / n) / n AS cxy, "
        "sx / n AS mx, sy / n AS my FROM m) "
        "SELECT n_rows, "
        "CASE WHEN cxy <> 0.0 THEN "
        "CAST(floor(((cyy - cxx) + sqrt((cyy - cxx) * (cyy - cxx) "
        "+ 4.0 * cxy * cxy)) / (2.0 * cxy) * 1000000.0 + 0.5) "
        "AS BIGINT) END AS slope_micro, "
        "CASE WHEN cxy <> 0.0 THEN "
        "CAST(floor((my - ((cyy - cxx) + sqrt((cyy - cxx) * (cyy - cxx) "
        "+ 4.0 * cxy * cxy)) / (2.0 * cxy) * mx) * 1000000.0 + 0.5) "
        "AS BIGINT) END AS intercept_micro FROM c")


@q("stats_deming_qty_price", _deming_sql().replace("{tbl}", "lineitem"))
def stats_deming_qty_price(spark, sf):
    """Deming regression (errors in BOTH variables, λ=1) of extended
    price (cents) on quantity — the calibration-grade line for when x
    is as noisy as y and OLS's attenuation bias is unacceptable (instrument
    cross-calibration, sensor reconciliation). Closed form from five
    exact decimal moments; same SQL text runs verbatim on both
    engines (the _ols2_sql posture)."""
    li = table(spark, sf, "lineitem")
    li.createOrReplaceTempView("mura_deming_lineitem")
    return spark.sql(_deming_sql().replace("{tbl}",
                                           "mura_deming_lineitem"))


@q("stats_kendall_tau_daily",
   "WITH daily AS (SELECT epoch_us(date_trunc('day', ts)) "
   "// 86400000000 AS d, "
   "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
   "AS BIGINT) AS xc, "
   "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
   "AS BIGINT) AS yc FROM events GROUP BY 1), "
   "p AS (SELECT CAST(SUM(CASE WHEN (b.xc - a.xc) * (b.yc - a.yc) > 0 "
   "THEN 1 ELSE 0 END) AS BIGINT) AS conc, "
   "CAST(SUM(CASE WHEN (b.xc - a.xc) * (b.yc - a.yc) < 0 THEN 1 "
   "ELSE 0 END) AS BIGINT) AS disc, "
   "CAST(SUM(CASE WHEN b.xc = a.xc OR b.yc = a.yc THEN 1 ELSE 0 END) "
   "AS BIGINT) AS ties, "
   "CAST(COUNT(*) AS BIGINT) AS n_pairs "
   "FROM daily a JOIN daily b ON b.d > a.d) "
   "SELECT n_pairs, conc, disc, ties, "
   "CASE WHEN n_pairs > 0 THEN "
   "CAST(floor(CAST(conc - disc AS DOUBLE) "
   "/ CAST(n_pairs AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) END "
   "AS tau_a_micro FROM p")
def stats_kendall_tau_daily(spark, sf):
    """Kendall's τ-a between the daily click and purchase count
    series: (concordant − discordant) / C(n,2) over all day pairs —
    the rank-association member completing the correlation family
    (Pearson = stats_corr_lineitem, Spearman =
    stats_spearman_qty_discount; τ is the most outlier-proof of the
    three). Exact integer pair classification on the tiny day frame;
    one terminal division."""
    ev = table(spark, sf, "events")
    daily = (ev.groupBy(F.expr("unix_micros(date_trunc('DAY', ts)) "
                               "div 86400000000").alias("d"))
               .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                           .otherwise(0)).alias("xc"),
                    F.sum(F.when(F.col("event_type") == "purchase", 1)
                           .otherwise(0)).alias("yc")))
    a = daily.select(F.col("d").alias("da"), F.col("xc").alias("xa"),
                     F.col("yc").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("xc").alias("xb"),
                     F.col("yc").alias("yb"))
    prod = (F.col("xb") - F.col("xa")) * (F.col("yb") - F.col("ya"))
    p = (a.join(b, F.col("db") > F.col("da"))
          .agg(F.sum(F.when(prod > 0, 1).otherwise(0)).alias("conc"),
               F.sum(F.when(prod < 0, 1).otherwise(0)).alias("disc"),
               F.sum(F.when((F.col("xb") == F.col("xa"))
                            | (F.col("yb") == F.col("ya")), 1)
                      .otherwise(0)).alias("ties"),
               F.count(F.lit(1)).alias("n_pairs")))
    tau = (F.floor((F.col("conc") - F.col("disc")).cast("double")
                   / F.col("n_pairs").cast("double")
                   * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"))
    return p.select("n_pairs", "conc", "disc", "ties",
                    F.when(F.col("n_pairs") > 0, tau)
                     .alias("tau_a_micro"))


@q("stats_ljung_box_daily",
   "WITH daily AS (SELECT epoch_us(date_trunc('day', ts)) "
   "// 86400000000 AS d, "
   "SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y "
   "FROM events WHERE value IS NOT NULL GROUP BY 1), "
   "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
   "CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s FROM daily), "
   "c AS (SELECT d, CAST(y AS DOUBLE) - s / CAST(n AS DOUBLE) AS e "
   "FROM daily CROSS JOIN nn), "
   "v AS (SELECT SUM(e * e) AS c0 FROM c), "
   "l AS (SELECT k, SUM(a.e * b.e) AS ck FROM "
   "(SELECT CAST(i AS INT) AS k FROM range(1, 6) t(i)) ks "
   "JOIN c a ON TRUE JOIN c b ON b.d = a.d + ks.k GROUP BY 1), "
   "r AS (SELECT l.k, CAST(floor(l.ck / v.c0 * 1000000.0 + 0.5) "
   "AS BIGINT) AS rk FROM l CROSS JOIN v), "
   "q AS (SELECT CAST(SUM(CAST(floor(CAST(rk AS DOUBLE) "
   "* CAST(rk AS DOUBLE) / CAST((SELECT n FROM nn) - k AS DOUBLE) "
   "+ 0.5) AS BIGINT)) AS BIGINT) AS qsum FROM r) "
   "SELECT nn.n AS n_days, "
   "CAST(floor(CAST(nn.n AS DOUBLE) * CAST(nn.n + 2 AS DOUBLE) "
   "* CAST(q.qsum AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) "
   "AS q_micro, CAST(5 AS INT) AS df, "
   "CAST(CAST(nn.n AS DOUBLE) * CAST(nn.n + 2 AS DOUBLE) "
   "* CAST(q.qsum AS DOUBLE) / 1000000.0 < 11070500.0 AS INT) "
   "AS is_white_noise FROM nn CROSS JOIN q")
def stats_ljung_box_daily(spark, sf):
    """Ljung–Box portmanteau whiteness test on the daily value series
    (lags 1–5): Q = n(n+2)·Σ r²ₖ/(n−k) vs the χ²₅ 5% critical value —
    the autocorrelation-based residual check that complements the
    runs test (runs sees sign patterns; Q sees linear memory at any
    of 5 lags). Exact daily sums; per-lag autocorrelations quantized
    to micro BEFORE the Q sum (each term floor-quantized, so the sum
    is exact integers); one mirrored terminal scaling. q_micro and the
    whiteness comparison are BOTH in micro units: rk is r·1e6 so each
    Q-sum term carries 1e12, and dividing by 1e6 once leaves Q·1e6 —
    hence the χ²₅ 5% critical value is 11.0705e6 on this scale."""
    from pyspark.sql import Window
    ev = table(spark, sf, "events").where(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (ev.groupBy(F.expr("unix_micros(date_trunc('DAY', ts)) "
                               "div 86400000000").alias("d"))
               .agg(F.sum(cents).alias("y")))
    nn = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double")
         .alias("s"))
    c = (daily.crossJoin(F.broadcast(nn))
              .select("d", "n",
                      (F.col("y").cast("double")
                       - F.col("s") / F.col("n").cast("double"))
                      .alias("e")))
    v = c.agg(F.sum(F.col("e") * F.col("e")).alias("c0"))
    ks = ev.sparkSession.range(1, 6).select(F.col("id").cast("int")
                                            .alias("k"))
    a = c.select(F.col("d").alias("da"), F.col("e").alias("ea"))
    b = c.select(F.col("d").alias("db"), F.col("e").alias("eb"))
    l = (a.crossJoin(F.broadcast(ks))
          .join(b, F.col("db") == F.col("da") + F.col("k"))
          .groupBy("k")
          .agg(F.sum(F.col("ea") * F.col("eb")).alias("ck")))
    r = (l.crossJoin(F.broadcast(v))
          .select("k", F.floor(F.col("ck") / F.col("c0")
                               * F.lit(1000000.0) + F.lit(0.5))
                       .cast("bigint").alias("rk")))
    q = (r.crossJoin(F.broadcast(nn.select("n")))
          .select(F.floor(F.col("rk").cast("double")
                          * F.col("rk").cast("double")
                          / (F.col("n") - F.col("k")).cast("double")
                          + F.lit(0.5)).cast("bigint").alias("t"))
          .agg(F.sum("t").alias("qsum")))
    nD = F.col("n").cast("double")
    qv = (nD * (F.col("n") + F.lit(2)).cast("double")
          * F.col("qsum").cast("double") / F.lit(1000000.0))
    return (nn.crossJoin(F.broadcast(q))
              .select(F.col("n").alias("n_days"),
                      F.floor(qv + F.lit(0.5)).cast("bigint")
                       .alias("q_micro"),
                      F.lit(5).cast("int").alias("df"),
                      (qv < F.lit(11070500.0)).cast("int")
                       .alias("is_white_noise")))
