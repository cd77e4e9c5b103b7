"""Corpus-frequency boilerplate removal (segment-level exact dedup).

The C4/CCNet cleaning step the pair-mining dedup family doesn't cover:
text that repeats ACROSS many documents (navigation chrome, license
headers, templated paragraphs) is removed from every document while the
unique remainder is kept, in order. No reference analog (the reference has
no text surface at all — SURVEY.md §2.3); this is extension surface for
the pretraining pipeline alongside ``operators.dedup``.

Shape: documents are cut into consecutive non-overlapping ``seg_words``-word
segments; a segment is boilerplate when it occurs in at least ``min_docs``
distinct documents; all occurrences of boilerplate segments are dropped and
each document is reassembled from its surviving segments in position order.

Scale design (the 100 TB read):
- segmentation is a narrow per-row ``transform``/``slice`` over the split
  words — zero shuffle, whole-stage codegen;
- the document-frequency pass is ONE hash shuffle on the segment text with
  map-side partial aggregation (two-phase distinct count);
- the removal is a left-anti equi-join on segment text — AQE broadcasts
  the boilerplate side when it is small (it usually is: boilerplate is by
  definition the high-frequency head), and heavy boilerplate segments
  cost nothing extra because the anti-join probes, never expands;
- reassembly is one shuffle on the document id; per-group state is bounded
  by document length (collect_list of a doc's own segments, never corpus-
  wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment(df: DataFrame, id_col: str, text_col: str,
            seg_words: int = 10) -> DataFrame:
    """(id, pos, seg): consecutive non-overlapping ``seg_words``-word
    segments per document, in order. Tokenization contract: words are
    single-space separated (the corpus convention); the final segment may
    be short. Pure narrow expressions — no shuffle, no UDF."""
    words = F.split(F.col(text_col), " ")
    n_seg = (F.size(words) + F.lit(seg_words - 1)).cast("long") / F.lit(
        seg_words)
    n_seg = F.floor(n_seg).cast("int")  # exact: (n + S-1) div S
    idxs = F.sequence(F.lit(0), n_seg - 1)
    segs = F.transform(
        idxs, lambda i: F.struct(
            i.alias("pos"),
            F.array_join(F.slice(words, i * seg_words + 1, seg_words), " ")
             .alias("seg")))
    return (df.select(F.col(id_col), F.explode(segs).alias("s"))
              .select(id_col, F.col("s.pos").alias("pos"),
                      F.col("s.seg").alias("seg")))


def frequent_segments(segs: DataFrame, id_col: str,
                      min_docs: int) -> DataFrame:
    """Segments occurring in ≥ ``min_docs`` distinct documents, with their
    document frequency. One hash shuffle on the segment text."""
    return (segs.groupBy("seg")
                .agg(F.count_distinct(F.col(id_col)).alias("doc_freq"))
                .filter(F.col("doc_freq") >= min_docs))


def remove_frequent_segments(df: DataFrame, id_col: str, text_col: str,
                             seg_words: int = 10,
                             min_docs: int = 2) -> DataFrame:
    """Strip cross-document boilerplate from every document.

    Output: (id, clean_text, n_kept_segments) for EVERY input document —
    a document whose entire text was boilerplate surfaces with an empty
    string and 0 segments, not a dropped row. Deterministic: segment
    positions order the reassembly.
    """
    segs = segment(df, id_col, text_col, seg_words)
    boiler = frequent_segments(segs, id_col, min_docs).select("seg")
    kept = segs.join(boiler, "seg", "left_anti")
    clean = (kept.groupBy(id_col)
             .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "seg"))),
                         lambda s: s["seg"]),
                     " ").alias("clean_text"),
                  F.count(F.lit(1)).alias("n_kept_segments")))
    return (df.select(id_col).join(clean, id_col, "left")
              .select(id_col,
                      F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                      F.coalesce("n_kept_segments", F.lit(0).cast("long"))
                       .alias("n_kept_segments")))
