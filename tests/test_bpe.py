"""BPE tokenizer training/encoding (operators/bpe.py): distributed
word-frequency pass + deterministic driver merge loop on the bounded
frequency table + Arrow-vectorized encode. The invariants that matter:
textbook merges on a known corpus, determinism under repartition,
lossless detokenize roundtrip, and fertility dropping as the vocab
grows."""

from __future__ import annotations

from pyspark.sql import functions as F

from mura_spark.operators.bpe import (EOW, bpe_encode, detokenize,
                                      pretokenize, train_bpe,
                                      word_frequencies)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string")


def test_textbook_merges_on_tiny_corpus(spark):
    # the classic BPE example: "low lower lowest" family — the first
    # merges must build the shared stem
    df = _docs(spark, ["low low low low low",
                       "lower lower newer newer newer newer",
                       "newest newest newest widest"])
    merges = train_bpe(df, num_merges=6)
    # (w,e) appears in lower(2) + newer(4) + newest(3) = 9, the max
    assert merges[0] == ("w", "e")
    assert ("l", "o") in merges[:4] and ("lo", "w") in merges[:6]
    # greedy encode with the learned table compresses "low" to one
    # token + EOW handling
    enc = {r.doc_id: r.tokens for r in
           bpe_encode(df, merges).collect()}
    assert enc["0"][:2] == ["low", EOW] or enc["0"][0] == f"low{EOW}"


def test_training_is_deterministic_under_layout(spark):
    texts = [f"alpha beta gamma delta epsilon zeta {i % 7}"
             for i in range(200)]
    a = train_bpe(_docs(spark, texts), num_merges=30)
    b = train_bpe(_docs(spark, texts).repartition(13), num_merges=30)
    assert a == b


def test_encode_roundtrip_is_lossless(spark):
    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "lower newest widest low low low"]
    df = _docs(spark, texts)
    merges = train_bpe(df, num_merges=50)
    rows = bpe_encode(df, merges).collect()
    by_id = {r.doc_id: r for r in rows}
    for i, t in enumerate(texts):
        got = detokenize(by_id[str(i)].tokens)
        assert got == t  # lowercase corpus: exact roundtrip
        assert by_id[str(i)].n_tokens == len(by_id[str(i)].tokens)


def test_fertility_drops_as_vocab_grows(spark):
    texts = ["internationalization localization tokenization " * 5,
             "organization optimization realization " * 5] * 10
    df = _docs(spark, texts)
    few = train_bpe(df, num_merges=5)
    many = train_bpe(df, num_merges=120)
    n_few = bpe_encode(df, few, tokens_out=False) \
        .agg(F.sum("n_tokens")).collect()[0][0]
    n_many = bpe_encode(df, many, tokens_out=False) \
        .agg(F.sum("n_tokens")).collect()[0][0]
    assert n_many < n_few  # more merges -> fewer tokens per doc
    # no-merge floor: every token is a single char or EOW-suffixed
    n_zero = bpe_encode(df, [], tokens_out=False) \
        .agg(F.sum("n_tokens")).collect()[0][0]
    assert n_few <= n_zero


def test_word_frequencies_is_jvm_side_and_bounded(spark):
    df = _docs(spark, ["a a a b b c d!  e", "a b c c c"])
    wf = {r.word: r.freq for r in
          word_frequencies(df, max_words=3).collect()}
    assert wf == {"a": 4, "c": 4, "b": 3}  # top-3, punct kept separate
    # pre-tokenizer splits punctuation into its own piece
    toks = (df.select(F.explode(pretokenize(F.col("text")))
                      .alias("w"))
            .where(F.col("w") == "!").count())
    assert toks == 1
    # the corpus pass is pure Catalyst: no python UDF in the plan
    plan = word_frequencies(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
