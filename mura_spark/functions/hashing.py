"""Portable deterministic hashing.

Everything here is *engine-portable*: the same arithmetic is expressible in
Spark SQL and ANSI/DuckDB SQL, so hash-based operators (MinHash, SimHash,
fingerprints) can be verified value-for-value against a SQL oracle. That
rules out ``F.hash``/``xxhash64`` (Spark-private seeds) and DuckDB's
``hash()`` (different algorithm); the common denominator is MD5.

Base hash: the first 48 bits of MD5, read as a big-endian hex substring —
``cast(conv(substr(md5(s),1,12),16,10) as bigint)`` in Spark,
``cast('0x' || substr(md5(s),1,12) as bigint)`` in DuckDB. 48 bits keeps all
downstream modular arithmetic inside signed int64.

MinHash family: universal hashing h_i(x) = (a_i*x + b_i) mod p with
p = 4294967311 (smallest prime > 2^32) and fixed seeded (a_i, b_i). x is
first reduced mod p so a_i*x stays < 2^63. Identical constants are embedded
in the oracle SQL generator (``mura_spark/oracle.py``).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Smallest prime above 2^32 — MinHash universe modulus.
MERSENNE_P = 4294967311

#: Number of MinHash permutations (k = BANDS * ROWS_PER_BAND).
NUM_PERM = 32
#: LSH banding: 16 bands × 2 rows → candidate threshold ≈ (1/16)^(1/2) ≈ 0.25,
#: i.e. near-certain recall at Jaccard ≥ 0.8 (miss prob (1 − J²)¹⁶: ≈ 8e-8
#: at exactly J = 0.8, < 3e-12 from J ≥ 0.9) at the cost of more candidates
#: to verify. At larger scale, shift to 8×4.
BANDS = 16
ROWS_PER_BAND = 2

#: SimHash width in bits (fits the 48-bit base hash).
SIMHASH_BITS = 48


def _minhash_seeds(num_perm: int = NUM_PERM) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs; bounded by 2^30 so a·(x mod p) < 2^62
    never overflows signed int64 (both engines run strict/ANSI arithmetic).
    Seeded RNG so the DuckDB oracle generator reproduces identical constants."""
    rng = random.Random(42)
    return [(rng.randrange(1, 2 ** 30), rng.randrange(0, 2 ** 30))
            for _ in range(num_perm)]


MINHASH_SEEDS: list[tuple[int, int]] = _minhash_seeds()


def md5_hash48(expr: Column) -> Column:
    """48-bit integer hash of a string column (portable base hash)."""
    return F.conv(F.substring(F.md5(expr), 1, 12), 16, 10).cast("bigint")


def minhash_term(hash48: Column, a: int, b: int) -> Column:
    """One universal-hash application over a pre-hashed value."""
    reduced = hash48 % MERSENNE_P
    return (F.lit(a) * reduced + F.lit(b)) % MERSENNE_P


def simhash_from_hashes(hashes: Column) -> Column:
    """SimHash of an array<bigint> of 48-bit element hashes.

    Bit b of the signature is 1 iff, over all elements, bit b is set in more
    elements than not (strict majority; ties → 0). Pure column arithmetic:
    48 aggregate terms folded with ``F.aggregate`` — stays JVM-side.
    """
    sig = F.lit(0).cast("bigint")
    n = F.size(hashes)
    for bit in range(SIMHASH_BITS):
        ones = F.aggregate(
            hashes, F.lit(0).cast("bigint"),
            lambda acc, h, bit=bit: acc + F.shiftright(h, bit) % 2)
        sig = sig + F.when(ones * 2 > n, F.lit(2 ** bit).cast("bigint")
                           ).otherwise(F.lit(0).cast("bigint"))
    return sig


def hamming48(a: Column, b: Column) -> Column:
    """Hamming distance between two 48-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
