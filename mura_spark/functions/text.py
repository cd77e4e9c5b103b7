"""Text-analysis functions for large-scale document pipelines.

All pure ``pyspark.sql.functions`` compositions (JVM-side, codegen-friendly;
no Python UDFs in the hot path), and each has a 1:1 ANSI-SQL rendering used
by the DuckDB oracle (see ``mura_spark/oracle.py``): tokenization, n-gram
shingling, quality metrics, stopword-based language ID, fingerprinting.

The reference has no text functions at all (its ``ScalarFunction`` shell
names zero functions — /root/reference/src/planner/logicalplan.rs:63-71);
this module is part of the north-star extension surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mura_spark.functions.hashing import md5_hash48

#: Minimal per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small and hard-coded: the heuristic must be
#: reproducible in the SQL oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "ein", "zu"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "un", "que"],
    "zh": ["的", "是", "了", "在", "我"],
}


def normalize(text: Column) -> Column:
    """Lowercase + collapse runs of whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(normalize(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: count regex pieces (letter runs, digit
    runs, punctuation singletons), the standard pre-tokenizer shape used to
    approximate BPE token counts without a vocab."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return F.size(pieces)


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams (joined by a single space) → array<string>.

    Built from ``transform(sequence(...))`` + ``slice``; documents shorter
    than ``n`` tokens yield their full text as the single shingle.

    NOTE: higher-order-function expressions are interpreted (not codegen'd)
    and allocation-heavy — measured ~15 ms/doc under 32-way concurrency.
    Bulk pipelines should use :func:`shingle_text_udf` (Arrow-batched,
    identical output, ~100× cheaper); this native form remains the
    1:1 analog of the oracle-SQL rendering and the right choice inside
    small expression trees.
    """
    count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams)


def shingle_list(text, n: int = 3):
    """Plain-Python twin of ``shingles(tokens(text), n)`` — same normalize /
    whitespace-split / max(len-n+1, 1) window / first-occurrence distinct
    order. Shared by the Arrow-batched shingle and signature kernels."""
    import re
    if text is None:
        return None
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    count = max(len(toks) - (n - 1), 1)
    return list(dict.fromkeys(
        " ".join(toks[i:i + n]) for i in range(count)))


def ngram_list(text, n: int = 2):
    """Non-distinct word n-gram twin of :func:`shingle_list` (same
    normalize / whitespace-split / max(len-n+1, 1) window, **no** dedup) —
    repetition metrics need gram multiplicity."""
    import re
    if text is None:
        return None
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    count = max(len(toks) - (n - 1), 1)
    return [" ".join(toks[i:i + n]) for i in range(count)]


def shingle_text_udf(n: int = 3):
    """Arrow-batched pandas UDF: text → distinct word n-grams.

    Bit-identical output to ``shingles(tokens(text), n)`` (same normalize /
    whitespace-split / max(len-n+1, 1) window / first-occurrence distinct
    order) — pinned by test — but runs as vectorized Python instead of
    interpreted Catalyst HOFs: ~0.05 ms/doc vs ~15 ms/doc measured. Inputs
    here are ASCII; Python and Java ``\\s`` agree on ASCII whitespace.
    """
    import pandas as pd

    def kernel(texts):
        return texts.map(lambda t: shingle_list(t, n))

    # real type objects: `from __future__ import annotations` would leave
    # string hints pandas_udf cannot resolve
    kernel.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(kernel, "array<string>")


def distinct_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def avg_token_len(text: Column) -> Column:
    """Mean token length in characters (total non-space chars / tokens)."""
    norm = normalize(text)
    t = F.split(norm, " ")
    chars = F.length(F.regexp_replace(norm, " ", ""))
    return chars.cast("double") / F.size(t)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars — a standard quality signal.
    NULL for empty text (the 0/0 case): ANSI division would abort the
    whole query on one empty document, and the DuckDB oracle's
    division by zero yields NULL."""
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, p.cast("double") / n)


def digit_ratio(text: Column) -> Column:
    """Digit chars / total chars; NULL for empty text (see
    punct_ratio)."""
    n = F.length(text)
    d = n - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return F.when(n > 0, d.cast("double") / n)


def stopword_count(toks: Column, words: list[str]) -> Column:
    """Number of tokens that appear in ``words`` (multiset count)."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_ratio(text: Column, words: list[str] | None = None) -> Column:
    t = tokens(text)
    words = words if words is not None else LANG_STOPWORDS["en"]
    return stopword_count(t, words).cast("double") / F.size(t)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID signal)."""
    t = tokens(text)
    return {lang: stopword_count(t, words)
            for lang, words in LANG_STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """Predict language = argmax of stopword hits; ties break to the
    lexicographically-smallest language code; all-zero scores → 'und'
    (undetermined). Matches the oracle SQL rendering exactly."""
    return _lang_argmax(lang_scores(text))


def _lang_argmax(scores: dict[str, Column]) -> Column:
    """argmax with deterministic lexicographic tie-break, zero → 'und'."""
    m = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(scores, reverse=True):  # earliest code wins ties
        expr = F.when((m > 0) & (scores[lang] == m), F.lit(lang)).otherwise(expr)
    return expr


#: Portable PII regexes — character classes + \b only, identical semantics
#: in Java regex (Spark) and RE2 (DuckDB); no lookarounds.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Redact emails and IPv4 addresses with typed placeholders — the
    standard pre-release scrub pass of a training-data pipeline. Pure
    ``regexp_replace`` (JVM-side, codegen-friendly)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def pii_email_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))


def pii_ipv4_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0))


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: MD5 over the sorted distinct token
    list — invariant to word order and repetition (catches scramble-style
    near-dups as *exact* fingerprint collisions)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    # concat_ws never returns NULL (a NULL array folds to ''), which
    # would stamp every null document with md5('') — NULL-propagate
    return F.when(text.isNotNull(), F.md5(canon))


def rolling_hash(text: Column) -> Column:
    """Order-sensitive 48-bit content hash (normalized text) — the cheap
    exact-dup key."""
    return md5_hash48(normalize(text))


def sentence_count(text: Column) -> Column:
    """Terminator-run count ([.!?]+), floored at 1 — the denominator of
    every words-per-sentence readability formula (unterminated fragments
    count as one sentence)."""
    return F.greatest(F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1))


def syllable_count(text: Column) -> Column:
    """Vowel-group syllable estimate: runs of [aeiouy]+ in the lowercased
    text. The standard dictionary-free approximation (hyphenation-rule
    accuracy is not required for corpus-level quality scoring — only
    monotonicity in polysyllabic density)."""
    return F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+"))


def flesch_reading_ease(text: Column) -> Column:
    """Flesch reading ease = 206.835 - 1.015·(words/sentences)
    - 84.6·(syllables/words), with the vowel-group syllable estimate.

    Per-row IEEE double arithmetic in exactly this association order —
    deterministic and oracle-comparable (suite/common.py rules). Low
    scores flag boilerplate/legalese; high scores flag trivial or
    fragmentary text — both ends are standard pre-training quality cuts.
    """
    w = token_count(text).cast("double")
    s = sentence_count(text).cast("double")
    syl = syllable_count(text).cast("double")
    return F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (syl / w)
