"""Relational + LLM-pipeline operators, each a DataFrame → DataFrame function.

Design stance (SURVEY.md §4/§7): operators are *library-level compositions*
of Spark's declarative API, not custom Catalyst nodes — Catalyst then owns
pushdown, join strategy, AQE re-planning. Python never touches the row path
except where explicitly noted (multimodal decode stubs).

- :mod:`mura_spark.operators.dedup` — exact / MinHash-LSH / SimHash /
  n-gram-Jaccard document deduplication, duplicate clustering
- :mod:`mura_spark.operators.similarity` — embedding cosine top-k
  (brute-force / hyperplane-LSH / IVF), embedding near-dup (blocked exact)
- :mod:`mura_spark.operators.asof` — as-of join, range (interval) join
- :mod:`mura_spark.operators.funnel` — strict-order funnels, cohort retention
- :mod:`mura_spark.operators.skew` — salted joins/aggregations for hot keys
- :mod:`mura_spark.operators.sampling` — deterministic hash-based splits,
  per-stratum sampling
- :mod:`mura_spark.operators.tfidf` — corpus TF-IDF keyword extraction
- :mod:`mura_spark.operators.topk` — order-by + limit (TakeOrderedAndProject)
- :mod:`mura_spark.operators.packing` — training-sequence packing
  (concat-and-chunk, whole-doc first-fit)
- :mod:`mura_spark.operators.upsert` — CDC keep-latest merge
"""

from mura_spark.operators import (  # noqa: F401
    asof,
    dedup,
    funnel,
    packing,
    sampling,
    similarity,
    skew,
    tfidf,
    topk,
    upsert,
)
