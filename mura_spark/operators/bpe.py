"""Byte-Pair-Encoding tokenizer training and encoding over a corpus.

The repo's text stack estimates token counts with a regex
(``functions/text.py bpe_ish_token_count``); this module supplies the
real thing for the training-data pipeline: learn a BPE merge table
from the corpus and encode documents with it (vocab-fit checks,
fertility measurement, dataset token budgeting all need an actual
learned vocab, not an estimate).

Architecture is the standard two-phase trainer (what HuggingFace
``tokenizers`` and the original Sennrich implementation do), mapped to
Spark roles:

1. **Distributed word-frequency aggregation** — the only corpus-scale
   pass: pre-tokenize (letter runs / digit runs / punctuation
   singletons, the GPT-2-ish shape without byte fallback) and
   ``groupBy(word).count()``. 100 TB of text reduces to a vocab-sized
   frequency table (natural-language word frequency is Zipfian; the
   distinct-word count is millions at worst, bounded here by
   ``max_words`` taking the most frequent — exactly what reference
   trainers do with their min-frequency cutoffs).
2. **Driver-side merge loop on the frequency table** — BPE's merge
   recurrence is inherently sequential (merge i+1's pair counts depend
   on merge i), so no engine parallelizes it across the corpus;
   trainers iterate over the word-frequency dict. The collect is
   guarded by ``max_words`` (the same loud-budget discipline as
   operators/guards.py). Pair counts update incrementally: only words
   containing the merged pair are touched per iteration.
3. **Broadcast encode** — the learned merge ranks broadcast to
   executors; :func:`bpe_encode` applies them in an Arrow-vectorized
   ``mapInPandas`` kernel (greedy lowest-rank-first, the canonical BPE
   encode), emitting tokens or just per-doc token counts (fertility).

Determinism: ties in pair frequency break lexicographically, so the
same corpus always learns the same merge table on any cluster layout.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pre-tokenizer: letter runs, digit runs, single punctuation — the
#: same pieces bpe_ish_token_count counts (functions/text.py:46)
_PRETOKEN_RE = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"

# The encode kernel MUST pretokenize exactly like the JVM training
# pass or token counts diverge from the learned distribution. Java
# classes, precisely: \p{L}/\p{N} are the Unicode L*/N* categories and
# Java's \s is ASCII-only — so '_' is punctuation (stdlib re's \w
# would swallow it), '½'/'Ⅷ' are number runs (stdlib \d is Nd-only),
# and NBSP is punctuation, not whitespace. The `regex` module
# expresses this directly; a unicodedata walk is the exact fallback.
_ASCII_WS = " \t\n\x0b\f\r"
try:
    import regex as _regex
    _PRETOKEN_MATCHER = _regex.compile(
        r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}" + _ASCII_WS + r"]")

    def _pretokenize_py(text: str) -> list[str]:
        return _PRETOKEN_MATCHER.findall(text)
except ImportError:  # pragma: no cover - regex ships with this env
    import unicodedata

    def _pretokenize_py(text: str) -> list[str]:
        out: list[str] = []
        run: list[str] = []
        kind = None
        for ch in text:
            if ch in _ASCII_WS:
                if run:
                    out.append("".join(run))
                    run, kind = [], None
                continue
            cat = unicodedata.category(ch)[0]
            if cat in ("L", "N"):
                if cat == kind:
                    run.append(ch)
                else:
                    if run:
                        out.append("".join(run))
                    run, kind = [ch], cat
            else:
                if run:
                    out.append("".join(run))
                    run, kind = [], None
                out.append(ch)
        if run:
            out.append("".join(run))
        return out

#: end-of-word marker (Sennrich convention): distinguishes "er" inside
#: a word from "er</w>" ending one, so merges respect word boundaries
EOW = "</w>"


def pretokenize(text: Column) -> Column:
    """Corpus pre-tokenization as a JVM-side expression (no UDF):
    lowercase, then extract letter/digit/punct pieces."""
    return F.regexp_extract_all(F.lower(text), F.lit(_PRETOKEN_RE), 0)


def word_frequencies(df: DataFrame, text_col: str = "text",
                     max_words: int = 100_000) -> DataFrame:
    """The corpus-scale pass: ``(word, freq)`` for the ``max_words``
    most frequent pre-tokens. One shuffle on the word key; ties at the
    cutoff break lexicographically so the table is deterministic."""
    return (df.select(F.explode(pretokenize(F.col(text_col)))
                      .alias("word"))
              .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
              .orderBy(F.col("freq").desc(), F.col("word"))
              .limit(max_words))


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i, n = [], 0, len(sym)
    while i < n:
        if i + 1 < n and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 200,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table ``[(left, right), ...]`` (rank = position).

    The distributed part is :func:`word_frequencies`; the merge loop
    runs on the driver over that bounded table (see module docstring —
    this is the standard trainer architecture, and the collect is
    capped at ``max_words`` rows of short strings). Pair counts are
    maintained incrementally: each merge touches only the words that
    contain the pair."""
    rows = word_frequencies(df, text_col, max_words).collect()
    words: dict[tuple, int] = {}
    for r in rows:
        sym = tuple(list(r["word"]) + [EOW])
        words[sym] = words.get(sym, 0) + int(r["freq"])

    from collections import defaultdict
    pair_freq: dict[tuple, int] = defaultdict(int)
    pair_words: dict[tuple, set] = defaultdict(set)
    for sym, f in words.items():
        for a, b in zip(sym, sym[1:]):
            pair_freq[(a, b)] += f
            pair_words[(a, b)].add(sym)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_freq:
            break
        # deterministic: max frequency, lexicographic tiebreak
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break
        merges.append(best)
        for sym in list(pair_words[best]):
            f = words.pop(sym, None)
            if f is None:
                continue
            for a, b in zip(sym, sym[1:]):  # retract old pairs
                pair_freq[(a, b)] -= f
                if pair_freq[(a, b)] <= 0:
                    pair_freq.pop((a, b), None)
                pw = pair_words.get((a, b))
                if pw is not None:
                    pw.discard(sym)
            new = _merge_word(sym, best)
            words[new] = words.get(new, 0) + f
            for a, b in zip(new, new[1:]):  # add new pairs
                pair_freq[(a, b)] += f
                pair_words[(a, b)].add(new)
    return merges


def _encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Greedy lowest-rank-first merge application (canonical BPE)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        pairs = [(ranks.get((a, b)), i)
                 for i, (a, b) in enumerate(zip(sym, sym[1:]))
                 if (a, b) in ranks]
        if not pairs:
            break
        _r, i = min(pairs)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               tokens_out: bool = True) -> DataFrame:
    """Encode documents with a learned merge table. Returns
    ``(id, n_tokens[, tokens])`` — ``tokens_out=False`` keeps only the
    count (fertility measurement over a big corpus shouldn't ship the
    token arrays). The ranks broadcast inside the serialized kernel;
    per-word encodings are memoized per batch (Zipf makes the hit rate
    high), and only scalars/arrays leave the executor."""
    import pandas as pd
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_tokens int" + \
        (", tokens array<string>" if tokens_out else "")

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            ids, counts, toks = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                doc: list[str] = []
                for w in _pretokenize_py(str(text).lower()):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    doc.extend(enc)
                ids.append(i)
                counts.append(len(doc))
                if tokens_out:
                    toks.append(doc)
            out = {id_col: pd.Series(ids, dtype="object"),
                   "n_tokens": pd.Series(counts, dtype="int32")}
            if tokens_out:
                out["tokens"] = pd.Series(toks, dtype="object")
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(kernel,
                                                   schema=schema)


def detokenize(tokens: list[str]) -> str:
    """Inverse of the encode for roundtrip checks: join and split on
    the end-of-word markers."""
    return "".join(tokens).replace(EOW, " ").strip()
