"""Text-function unit tests on hand-built strings (the oracle differential
covers the full corpus; these pin edge semantics)."""

import pytest
from pyspark.sql import functions as F

from mura_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick  brown fox"),
        (2, "the the the a a of"),
        (3, "der hund und die katze und der vogel"),
        (4, "el perro y la casa de que"),
        (5, "xyzzy plugh"),
        (6, "one"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def _one(df, col, id_):
    return df.filter(F.col("id") == id_).select(col.alias("v")).first().v


def test_normalize_and_tokens(docs):
    assert _one(docs, TX.normalize(F.col("text")), 1) == "the quick brown fox"
    assert _one(docs, TX.token_count(F.col("text")), 1) == 4
    assert _one(docs, TX.token_count(F.col("text")), 6) == 1


def test_shingles_and_short_doc(docs):
    sh = _one(docs, TX.shingles(TX.tokens(F.col("text")), 3), 1)
    assert sorted(sh) == ["quick brown fox", "the quick brown"]
    # doc shorter than n → single whole-text shingle
    assert _one(docs, TX.shingles(TX.tokens(F.col("text")), 3), 6) == ["one"]


def test_shingle_udf_matches_native(spark, sf_dir):
    """The Arrow-batched shingle kernel must equal the native HOF expression
    element-for-element (order included) on the real corpus."""
    from mura_spark.suite.common import table
    d = table(spark, sf_dir, "documents")
    both = d.select(
        TX.shingles(TX.tokens(F.col("text")), 3).alias("native"),
        TX.shingle_text_udf(3)(F.col("text")).alias("udf"))
    assert both.filter(F.col("native") != F.col("udf")).count() == 0
    # edge cases: short doc, empty-ish doc, repeated-gram doc
    edge = spark.createDataFrame(
        [(1, "one"), (2, "a b"), (3, "x y z x y z x y z"), (4, "  ")],
        ["id", "text"])
    rows = edge.select(
        TX.shingles(TX.tokens(F.col("text")), 3).alias("native"),
        TX.shingle_text_udf(3)(F.col("text")).alias("udf")).collect()
    for r in rows:
        assert r.native == r.udf


def test_quality_metrics(docs):
    assert _one(docs, TX.distinct_token_ratio(F.col("text")), 2) == 0.5
    assert _one(docs, TX.stopword_ratio(F.col("text")), 2) == 1.0
    assert _one(docs, TX.avg_token_len(F.col("text")), 6) == 3.0


def test_punct_and_digit_ratio(spark):
    df = spark.createDataFrame([(1, "ab, cd! 12")], ["id", "text"])
    assert _one(df, TX.punct_ratio(F.col("text")), 1) == 0.2
    assert _one(df, TX.digit_ratio(F.col("text")), 1) == 0.2


def test_lang_id(docs):
    assert _one(docs, TX.lang_id(F.col("text")), 1) == "en"
    assert _one(docs, TX.lang_id(F.col("text")), 3) == "de"
    assert _one(docs, TX.lang_id(F.col("text")), 4) == "es"
    assert _one(docs, TX.lang_id(F.col("text")), 5) == "und"  # no stopwords


def test_lang_id_tie_breaks_to_smallest_code(spark):
    # 'la' is in both es and fr lists → tie → lexicographically smallest: es
    df = spark.createDataFrame([(1, "la la")], ["id", "text"])
    assert _one(df, TX.lang_id(F.col("text")), 1) == "es"


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta beta")],
        ["id", "text"])
    fps = [r.fp for r in
           df.select(TX.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]  # same distinct-token set → same fingerprint


def test_rolling_hash_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "Alpha  beta")],
        ["id", "text"])
    hs = {r.id: r.h for r in
          df.select("id", TX.rolling_hash(F.col("text")).alias("h")).collect()}
    assert hs[1] != hs[2]      # order-sensitive
    assert hs[1] == hs[3]      # normalization-insensitive


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world42!")], ["id", "text"])
    # pieces: hello , world 42 ! → 5
    assert _one(df, TX.bpe_ish_token_count(F.col("text")), 1) == 5


def test_split_by_hash_partitions_exactly(spark, sf_dir):
    """Splits are disjoint, exhaustive (fractions summing to 1), stable."""
    from mura_spark.operators.sampling import split_by_hash
    from mura_spark.suite.common import table
    d = table(spark, sf_dir, "documents").select("doc_id")
    splits = split_by_hash(d, "doc_id", {"train": 0.8, "val": 0.1,
                                         "test": 0.1})
    ids = {k: {r.doc_id for r in v.collect()} for k, v in splits.items()}
    n = d.count()
    assert sum(len(v) for v in ids.values()) == n          # exhaustive
    assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
    again = split_by_hash(d, "doc_id", {"train": 0.8, "val": 0.1,
                                        "test": 0.1})
    assert {r.doc_id for r in again["val"].collect()} == ids["val"]  # stable
    # roughly proportional
    assert 0.7 * n < len(ids["train"]) < 0.9 * n


def test_heavy_hitters_exact_and_partition_invariant(spark):
    """Matches the exact groupBy answer (threshold inclusive, integer
    cross-multiplication) on a skewed corpus, under any partitioning, and
    the boundary value (count == exactly num/den of total) is kept."""
    from mura_spark.operators.frequent import heavy_hitters
    # 100 rows: 'a'×40, 'b'×10 (exactly 10%), 'c'×9 (just under), rest unique
    vals = ["a"] * 40 + ["b"] * 10 + ["c"] * 9 + [f"u{i}" for i in range(41)]
    df = spark.createDataFrame([(v,) for v in vals], ["term"])
    for d in (df, df.repartition(17), df.coalesce(1)):
        got = {r.term: r.n_occ
               for r in heavy_hitters(d, "term", 10, 100).collect()}
        assert got == {"a": 40, "b": 10}


def test_cap_per_group_keeps_first_n_per_domain(spark, sf_dir):
    """Keeps exactly the n lowest doc_ids per (lang, source), is stable
    under input repartitioning, and the plan pre-reduces below the
    shuffle (Partial WindowGroupLimit — the scale guarantee)."""
    from mura_spark.operators.sampling import cap_per_group
    from mura_spark.suite.common import table
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    capped = cap_per_group(d, ["lang", "source"], "doc_id", 5)
    got = {(r.lang, r.source): [] for r in capped.collect()}
    for r in sorted(capped.collect(), key=lambda r: r.doc_id):
        got[(r.lang, r.source)].append(r.doc_id)
    all_ids = {}
    for r in sorted(d.collect(), key=lambda r: r.doc_id):
        all_ids.setdefault((r.lang, r.source), []).append(r.doc_id)
    assert got == {k: v[:5] for k, v in all_ids.items() if v}
    # same result from a differently-partitioned input
    reshuffled = {r.doc_id for r in
                  cap_per_group(d.repartition(13), ["lang", "source"],
                                "doc_id", 5).collect()}
    assert reshuffled == {i for ids in got.values() for i in ids}
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_stratified_sample_per_stratum_fractions(spark, sf_dir):
    """Per-stratum fractions are honored, membership is stable, kept sets
    nest as fractions grow, and bad fractions are rejected."""
    import pytest

    from mura_spark.operators.sampling import stratified_sample
    from mura_spark.suite.common import table
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = stratified_sample(d, "lang", "doc_id",
                             {"en": 0.5, "zh": 1.0}, default=0.2)
    by_lang = {r.lang: r.n for r in
               d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.lang: r.n for r in
           kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["zh"] == by_lang["zh"]                      # keep-all exact
    assert 0.3 * by_lang["en"] < got["en"] < 0.7 * by_lang["en"]
    for lang in by_lang:
        if lang not in ("en", "zh"):
            assert got.get(lang, 0) < 0.45 * by_lang[lang]
    # stability + nesting: same call → same ids; fraction↑ → superset
    ids = {r.doc_id for r in kept.collect()}
    again = {r.doc_id for r in stratified_sample(
        d, "lang", "doc_id", {"en": 0.5, "zh": 1.0}, default=0.2).collect()}
    assert ids == again
    bigger = {r.doc_id for r in stratified_sample(
        d, "lang", "doc_id", {"en": 0.8, "zh": 1.0}, default=0.2).collect()}
    assert ids <= bigger
    with pytest.raises(ValueError):
        stratified_sample(d, "lang", "doc_id", {"en": 1.5})


def test_scrub_pii_planted(spark):
    """Email/IPv4 scrub + counts on planted rows, and cross-engine parity:
    DuckDB with the same patterns must render identical results."""
    from pyspark.sql import functions as F

    from mura_spark.functions import text as TX

    rows = [
        (1, "contact me at alice.smith+x@example.co.uk or 10.0.0.1 now"),
        (2, "no pii here"),
        (3, "two mails a@b.io c@d.org and ip 192.168.1.255"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {r.id: r for r in df.select(
        "id",
        TX.scrub_pii(F.col("t")).alias("s"),
        TX.pii_email_count(F.col("t")).alias("ne"),
        TX.pii_ipv4_count(F.col("t")).alias("ni")).collect()}
    assert out[1].s == "contact me at <EMAIL> or <IP> now"
    assert (out[1].ne, out[1].ni) == (1, 1)
    assert out[2].s == "no pii here" and (out[2].ne, out[2].ni) == (0, 0)
    assert out[3].s == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert (out[3].ne, out[3].ni) == (2, 1)

    import duckdb
    con = duckdb.connect()
    for rid, t in rows:
        s, ne, ni = con.execute(
            f"SELECT regexp_replace(regexp_replace($t, '{TX.EMAIL_RE}',"
            f" '<EMAIL>', 'g'), '{TX.IPV4_RE}', '<IP>', 'g'),"
            f" len(regexp_extract_all($t, '{TX.EMAIL_RE}')),"
            f" len(regexp_extract_all($t, '{TX.IPV4_RE}'))",
            {"t": t}).fetchone()
        assert (s, ne, ni) == (out[rid].s, out[rid].ne, out[rid].ni)


def test_global_shuffle_is_deterministic_permutation(documents, spark):
    """global_shuffle: same rows, reproducible order, seed changes order,
    and partition files replay the permutation (range-partitioned: every
    key in partition i sorts before every key in partition i+1)."""
    from pyspark.sql import functions as F

    from mura_spark.operators.sampling import global_shuffle, shuffle_key

    d = documents.select("doc_id")
    out = global_shuffle(d, "doc_id", seed=42, n_partitions=4)
    ordered = [r.doc_id for r in out.select(
        F.spark_partition_id().alias("p"), "doc_id").collect()]
    assert sorted(ordered) == sorted(r.doc_id for r in d.collect())
    # reproducible across runs…
    again = [r.doc_id for r in
             global_shuffle(d, "doc_id", seed=42, n_partitions=4).collect()]
    assert ordered == again
    # …and it IS the hash order: collect() returns partitions in order and
    # rows within each partition in order, so the collected sequence equals
    # the global sort by the seeded key (range partitions are disjoint)
    want = [r.doc_id for r in
            d.select("doc_id", shuffle_key(F.col("doc_id"), 42).alias("k"))
             .orderBy("k", "doc_id").collect()]
    assert ordered == want
    # a different seed yields a different permutation
    other = [r.doc_id for r in
             global_shuffle(d, "doc_id", seed=7, n_partitions=4).collect()]
    assert other != ordered


def test_weighted_sample_monotone_and_proportional(documents, spark):
    """Membership is monotone in the weight (raising a score never drops a
    row), clamped outside [0,1], and each weight cohort keeps ~weight of
    its rows."""
    from pyspark.sql import functions as F

    from mura_spark.operators.sampling import weighted_sample

    d = documents.select("doc_id")
    kept_30 = {r.doc_id for r in
               weighted_sample(d, "doc_id", F.lit(0.3)).collect()}
    kept_70 = {r.doc_id for r in
               weighted_sample(d, "doc_id", F.lit(0.7)).collect()}
    assert kept_30 <= kept_70                       # monotone
    n = d.count()
    assert abs(len(kept_30) / n - 0.3) < 0.1
    assert abs(len(kept_70) / n - 0.7) < 0.1
    assert weighted_sample(d, "doc_id", F.lit(1.5)).count() == n   # clamp
    assert weighted_sample(d, "doc_id", F.lit(-2.0)).count() == 0  # clamp


def test_sample_k_per_group_exact_and_seeded(documents, spark):
    """Exactly min(k, |group|) rows per group; a new seed redraws; the plan
    pre-reduces below the shuffle (Partial WindowGroupLimit)."""
    from mura_spark.operators.sampling import sample_k_per_group

    d = documents.select("doc_id", "lang")
    out = sample_k_per_group(d, ["lang"], "doc_id", 7, seed=1)
    per = {}
    for r in out.collect():
        per[r.lang] = per.get(r.lang, 0) + 1
    totals = {r.lang: r.n for r in
              d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {g: min(7, n) for g, n in totals.items()}
    other = {r.doc_id for r in
             sample_k_per_group(d, ["lang"], "doc_id", 7, seed=2).collect()}
    assert other != {r.doc_id for r in out.collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_remove_boilerplate_segments(spark):
    """Segment-level boilerplate removal: cross-doc segments vanish from
    every document, unique remainders keep their order, and an all-
    boilerplate document surfaces as an empty row, not a dropped one."""
    from mura_spark.operators.boilerplate import remove_frequent_segments

    A = " ".join(f"a{i}" for i in range(10))   # shared header (10 words)
    B = " ".join(f"b{i}" for i in range(10))
    C = " ".join(f"c{i}" for i in range(10))
    D = " ".join(f"d{i}" for i in range(4))    # short tail segment
    docs = spark.createDataFrame(
        [(1, f"{A} {B}"), (2, f"{A} {C}"), (3, f"{B[:0]}{D}"), (4, A)],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_frequent_segments(
        docs, "doc_id", "text", seg_words=10, min_docs=2).collect()}
    assert len(out) == 4
    assert out[1].clean_text == B and out[1].n_kept_segments == 1
    assert out[2].clean_text == C and out[2].n_kept_segments == 1
    assert out[3].clean_text == D and out[3].n_kept_segments == 1
    assert out[4].clean_text == "" and out[4].n_kept_segments == 0


def test_remove_boilerplate_preserves_order(spark):
    """Reassembly is position-ordered even when kept segments interleave
    with removed ones."""
    from mura_spark.operators.boilerplate import remove_frequent_segments

    S = lambda ch: " ".join(f"{ch}{i}" for i in range(10))
    shared = S("x")
    text1 = f"{S('p')} {shared} {S('q')} {shared} {S('r')}"
    docs = spark.createDataFrame(
        [(1, text1), (2, shared)], ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_frequent_segments(
        docs, "doc_id", "text", seg_words=10, min_docs=2).collect()}
    assert out[1].clean_text == f"{S('p')} {S('q')} {S('r')}"
    assert out[1].n_kept_segments == 3


def test_readability_orders_simple_before_dense(spark):
    from mura_spark.functions.text import (flesch_reading_ease,
                                           sentence_count, syllable_count)
    rows = [(1, "The cat sat. The dog ran. It was fun."),
            (2, "Institutional epistemological considerations necessitate "
                "multidimensional interdisciplinary contextualization.")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        sentence_count(F.col("text")).alias("s"),
        syllable_count(F.col("text")).alias("syl"),
        flesch_reading_ease(F.col("text")).alias("f")).collect()}
    assert out[1].s == 3
    assert out[2].s == 1  # floor at 1 for the single terminator
    assert out[1].f > out[2].f  # simple prose scores higher
    assert out[1].syl < out[2].syl


# ----------------------------------------- logistic quality scorer (5bb)

def test_quality_logistic_monotone_in_stopwords(spark, tmp_path):
    """More stopword mass (other features equal) must raise the score;
    scores live strictly inside (0, 1)."""
    rows = [(1, "the a of and to the a of and to", "en", "s", 10),
            (2, "zq wv xk jj qq pp mm nn bb cc", "en", "s", 10)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/documents.parquet")
    from mura_spark.suite import SPARK_QUERIES
    got = {r.doc_id: (r.score_micro, r.keep) for r in
           SPARK_QUERIES["text_quality_logistic"](spark, out).collect()}
    assert 0 < got[2][0] < got[1][0] < 1000000


def test_attrition_report_monotone_funnel(spark, sf_dir):
    """Stage counts must be monotone non-increasing per source and the
    dedup total must equal the corpus-wide distinct-text count."""
    from mura_spark.suite import SPARK_QUERIES
    from mura_spark.suite.common import table
    rows = SPARK_QUERIES["pipeline_attrition_report"](spark,
                                                      sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_dedup >= r.n_quality >= 0
        assert 0 <= r.keep_rate_micro <= 1000000
    d = table(spark, sf_dir, "documents")
    assert (sum(r.n_dedup for r in rows)
            == d.select("text").distinct().count())
