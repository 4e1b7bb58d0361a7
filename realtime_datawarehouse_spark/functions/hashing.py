"""Portable deterministic hashing for dedup/sketch operators.

The engine's sketch operators (MinHash, SimHash, LSH, fingerprints) must be
*oracle-checkable*: the driver re-runs every query in DuckDB and hash-compares
values (BASELINE.md §3). Spark's builtin ``hash``/``xxhash64`` have no DuckDB
equivalent, so sketches are built on a portable 60-bit hash derived from
``md5`` — identical in any engine that has md5 + hex→int:

    Spark : conv(substr(md5(s), 1, 15), 16, 10) :: bigint
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

15 hex digits = 60 bits, so the value fits signed int64 with no overflow.
MinHash permutations are the classic universal-hash family
``(a_i * h + b_i) mod p`` over that base hash (p = 2^61-1, a Mersenne prime),
with (a_i, b_i) drawn from a fixed seeded stream so Spark and the SQL oracle
agree exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61-1. Permutations run in pure int64 (no decimal): the
# base hash is masked to 32 bits and multipliers drawn below 2^29, so
# a*h32 + b < 2^62 — no overflow on either engine, and integer math is ~5×
# cheaper than decimal(38,0) in the hot minhash loop (measured at bench).
MERSENNE_P = (1 << 61) - 1
_A_MAX = 1 << 29
_H_MASK = 0xFFFFFFFF
_SEED = 0x5EED_CAFE


def permutation_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs shared by the Spark plan and the SQL oracle."""
    rng = random.Random(_SEED)
    return [
        (rng.randrange(1, _A_MAX), rng.randrange(0, MERSENNE_P))
        for _ in range(num_perm)
    ]


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (JVM-side, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash64` over SQL expression ``expr``."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def hash64_pair(col: Column | str) -> tuple[Column, Column]:
    """TWO independent portable 60-bit hashes from ONE md5 evaluation
    (hex chars 1-15 and 16-30) — for k=2 Bloom filters and double
    hashing, at half the digest cost of calling :func:`hash64` twice."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.md5(c)
    return (
        F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint"),
        F.conv(F.substring(d, 16, 15), 16, 10).cast("bigint"),
    )


def hash64_pair_sql(expr: str) -> tuple[str, str]:
    """DuckDB rendering of :func:`hash64_pair`."""
    return (
        f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)",
        f"CAST('0x' || substr(md5({expr}), 16, 15) AS BIGINT)",
    )


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation of a base hash value (pure int64)."""
    h32 = h.bitwiseAND(F.lit(_H_MASK))
    return (h32 * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perm_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB rendering of :func:`minhash_perm`."""
    return f"((({h_expr}) & {_H_MASK}) * {a} + {b}) % {MERSENNE_P}"


def minhash_signature(token_hash: Column, num_perm: int) -> list[Column]:
    """Min-aggregate columns for a MinHash signature.

    Use inside ``groupBy(doc).agg(*minhash_signature(...))``: element i is
    ``min((a_i*h + b_i) mod p)`` aliased ``mh{i}``.
    """
    return [
        F.min(minhash_perm(token_hash, a, b)).alias(f"mh{i}")
        for i, (a, b) in enumerate(permutation_params(num_perm))
    ]
