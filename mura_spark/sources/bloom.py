"""Per-file bloom filters for MuraTable manifests — point-lookup skipping.

Min/max footer stats (``table_format._file_meta``) prune RANGE predicates,
but they are useless for equality lookups on high-NDV unclustered columns:
every file's [min, max] spans essentially the whole domain, so a
``doc_id = X`` needle query still lists and opens every file. The fix is
the same one Parquet (split-block blooms, PARQUET-41) and Iceberg (puffin
blob metadata) ship: a small per-file bloom filter per lookup column, held
in table metadata, consulted BEFORE any file is listed or opened. At
100 TB this turns "find one document by id" from a full-table scan into
opening a handful of files.

Design choices, deliberately minimal:

- **Fixed-size blooms** (default 2^17 bits = 16 KiB per file-column,
  k = 7). Fixed sizing is what makes partial bitmaps OR-mergeable, which
  in turn lets the builder run as ONE narrow executor-side pass
  (``mapInPandas`` over each Arrow batch, emitting a 16 KiB partial
  bitmap) with no shuffle and no per-file buffering — the driver only
  ever sees bitmaps, never data. 16 KiB holds ~13 k distinct keys at
  ~1 % false-positive rate and degrades gracefully (never unsoundly)
  beyond that; tables with bigger files should compact or raise
  ``bloom_bits``. Parquet's own bloom columns size the same way from an
  NDV hint.
- **Soundness over power.** A bloom can only say "definitely absent" or
  "maybe present"; pruning drops a file only on "definitely absent", so
  false positives cost I/O, never correctness. A file with no bloom entry
  (written before the column existed, or by a writer that predates bloom
  tracking) is always kept.
- **Typed canonical hashing.** Values hash via a type-tagged canonical
  byte string (int/string/binary only — the equality-lookup types; float
  equality is a bug factory and is refused at table creation) through
  BLAKE2b double hashing, so executor and driver derive identical bit
  positions across processes and sessions.
"""

from __future__ import annotations

import base64
import hashlib
import os
import urllib.parse
from typing import Iterable

import numpy as np

DEFAULT_BITS = 1 << 17  # 16 KiB per (file, column)
DEFAULT_K = 7

#: Spark typeName()s a bloom column may have (equality-lookup types).
BLOOMABLE_TYPES = ("byte", "short", "integer", "long", "string", "binary")


def _canon(value) -> bytes:
    """Type-tagged canonical bytes of a lookup value. The tag prevents
    cross-type collisions (int 1 vs string "1"); unsupported types are
    a caller error, not a silent miss."""
    if isinstance(value, bool):  # bool is an int subclass — refuse
        raise TypeError("bloom lookup on bool values is not supported")
    if isinstance(value, (int, np.integer)):
        return b"i" + str(int(value)).encode()
    if isinstance(value, str):
        return b"s" + value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        return b"b" + bytes(value)
    raise TypeError(
        f"bloom filters support int/string/binary values, got "
        f"{type(value).__name__}")


def _bit_positions(value, m_bits: int, k: int) -> list[int]:
    """The k bit positions of ``value`` in an m-bit bloom (BLAKE2b
    double hashing: h_i = h1 + i*h2 mod m, h2 forced odd so the probe
    sequence walks the whole table when m is a power of two)."""
    d = hashlib.blake2b(_canon(value), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bitmap_of(values: Iterable, m_bits: int = DEFAULT_BITS,
              k: int = DEFAULT_K) -> np.ndarray:
    """Bloom bitmap (uint8 array of m_bits/8 bytes) of ``values``
    (nulls must be filtered by the caller; dedupe first for speed)."""
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    for v in values:
        for p in _bit_positions(v, m_bits, k):
            bm[p >> 3] |= np.uint8(1 << (p & 7))
    return bm


def _pack(bm: np.ndarray) -> str:
    """Manifest encoding of a bitmap: zlib + base64. Blooms loaded
    well under capacity are mostly zero bytes and compress from 16 KiB
    to ~100 bytes — the difference between manifests that stay
    readable at 10^4 files and ones that balloon."""
    import zlib
    return base64.b64encode(zlib.compress(bm.tobytes(), 6)) \
                 .decode("ascii")


def _unpack(b64_bitmap: str) -> np.ndarray:
    import zlib
    raw = base64.b64decode(b64_bitmap)
    try:
        raw = zlib.decompress(raw)
    except zlib.error:
        pass  # pre-compression manifests stored the bitmap raw
    return np.frombuffer(raw, dtype=np.uint8)


def might_contain(b64_bitmap: str, value, m_bits: int, k: int) -> bool:
    """False ONLY when the bloom proves ``value`` absent."""
    bm = _unpack(b64_bitmap)
    return all(bm[p >> 3] & (1 << (p & 7))
               for p in _bit_positions(value, m_bits, k))


def _rel_of_uri(file_uri: str, table_root: str) -> str:
    p = urllib.parse.unquote(urllib.parse.urlparse(file_uri).path)
    return os.path.relpath(os.path.abspath(p), os.path.abspath(table_root))


def build_blooms(spark, table_path: str, files: list[str],
                 bloom_cols: list[str], m_bits: int = DEFAULT_BITS,
                 k: int = DEFAULT_K) -> dict:
    """Executor-side bloom build over freshly committed files.

    One narrow scan of only the bloom columns (column-pruned parquet
    read), ``mapInArrow`` emitting a partial bitmap per (task, file,
    column) — fixed-size bitmaps OR-merge, so there is no shuffle,
    no groupBy, and no file ever has to fit in one task's memory. The
    driver receives only bitmaps (16 KiB each), never row data.
    Arrow (not pandas) batches are load-bearing for correctness: the
    pandas conversion coerces int64-with-nulls to float64, which both
    rejects NULLs (legal in a bloomable column) and would round ints
    past 2^53 before hashing.

    Returns ``{relpath: {col: base64-bitmap}}``.
    """
    from pyspark.sql import functions as F

    if not files or not bloom_cols:
        return {}
    by_base: dict[str, list[str]] = {}
    for rel in files:
        parts = rel.split(os.sep)
        base = os.path.join(table_path, *parts[:2])  # _data/<commit>
        by_base.setdefault(base, []).append(os.path.join(table_path, rel))

    merged: dict[tuple[str, str], np.ndarray] = {}
    for base, paths in sorted(by_base.items()):
        df = spark.read.option("basePath", base).parquet(*paths)
        cols = [c for c in bloom_cols if c in df.columns]
        if not cols:
            continue
        # every requested file starts at the all-zero bloom ("holds no
        # value") so zero-row files — which the scan never yields a
        # batch for — still get an entry and prune EVERY lookup
        for p in paths:
            rel = os.path.relpath(os.path.abspath(p),
                                  os.path.abspath(table_path))
            for c in cols:
                merged.setdefault((rel, c),
                                  np.zeros(m_bits // 8, dtype=np.uint8))
        sel = df.select(F.input_file_name().alias("__f"), *cols)

        def gen(it, cols=cols, m_bits=m_bits, k=k):
            # OR-merge across the WHOLE task before emitting, so the
            # driver collects (#tasks x cols) bitmaps, not one per
            # Arrow batch. ONE group_by pass per batch (a per-file
            # filter loop would rescan the batch once per distinct
            # file — tasks routinely coalesce many small files under
            # maxPartitionBytes). to_pylist keeps ints exact and
            # nulls as None — the pandas conversion would coerce
            # int64-with-nulls to float64.
            import pyarrow as pa
            acc: dict[tuple[str, str], np.ndarray] = {}
            for batch in it:
                tbl = pa.Table.from_batches([batch])
                agg = tbl.group_by("__f").aggregate(
                    [(c, "list") for c in cols])
                files = agg["__f"].to_pylist()
                for c in cols:
                    col_lists = agg[f"{c}_list"].to_pylist()
                    for fval, lst in zip(files, col_lists):
                        vals = {v for v in lst if v is not None}
                        bm = bitmap_of(vals, m_bits, k)
                        key = (fval, c)
                        if key in acc:
                            acc[key] = np.bitwise_or(acc[key], bm)
                        else:
                            acc[key] = bm
            if acc:
                yield pa.RecordBatch.from_pydict(
                    {"f": [f for f, _c in acc],
                     "c": [c for _f, c in acc],
                     "bits": [bm.tobytes() for bm in acc.values()]})

        for row in sel.mapInArrow(
                gen, schema="f string, c string, bits binary").collect():
            key = (_rel_of_uri(row["f"], table_path), row["c"])
            bm = np.frombuffer(row["bits"], dtype=np.uint8)
            if key in merged:
                merged[key] = np.bitwise_or(merged[key], bm)
            else:
                merged[key] = bm

    out: dict[str, dict[str, str]] = {}
    for (rel, c), bm in merged.items():
        out.setdefault(rel, {})[c] = _pack(bm)
    return out


def blooms_from_arrow(batches, bloom_cols: list[str],
                      m_bits: int = DEFAULT_BITS,
                      k: int = DEFAULT_K) -> dict[str, str]:
    """Bloom bitmaps straight from in-memory Arrow batches — the
    streaming-sink path, where the executor that just wrote a file
    still holds its batches and can hash them with zero extra I/O.
    Returns ``{col: base64-bitmap}``."""
    bms: dict[str, np.ndarray] = {}
    for b in batches:
        names = set(b.schema.names)
        for c in bloom_cols:
            if c not in names:
                continue
            vals = [v for v in b.column(c).to_pylist() if v is not None]
            bm = bitmap_of(set(vals), m_bits, k)
            bms[c] = np.bitwise_or(bms[c], bm) if c in bms else bm
    return {c: _pack(bm) for c, bm in bms.items()}
