"""Portable (Spark == DuckDB) deterministic hashing primitives.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so cross-engine-checkable operators need a shared hash.
Both engines agree on md5 of a UTF-8 string; we fold its leading 15
hex digits (60 bits) into a non-negative int64:

  Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)

At production scale this hash is computed once per token/shingle and
is pure codegen'd JVM work — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit hash space
HASH_BITS = 60
# Mask used when a multiplication must stay within int64:
# (h % 2^40) * a  with a < 2^20 cannot overflow.
MASK_40 = (1 << 40) - 1
# FNV-1a 64 prime, < 2^41 — modulus for the minhash permutations.
MINHASH_PRIME = 1099511628211


def md5_long(c: Column) -> Column:
    """Portable 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_long`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_long_py(s: str) -> int:
    """Driver-side Python twin of :func:`md5_long` — for query
    planning that must agree with stored column values (e.g. the text
    index's probe-bucket computation). ONE definition per dialect
    lives in this module; never hand-roll a fourth."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# Spark SQL-expression-string twin (for use inside higher-order
# lambdas where Column objects can't reach).
def md5_long_expr(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def lcg_stream(seed: int):
    """The repo's ONE deterministic pseudo-random source: a 63-bit LCG
    whose outputs are baked into SQL as literal constants in both
    engines (minhash coefficients, LSH hyperplanes). Centralized so
    the constants can never drift apart between consumers."""
    x = seed
    while True:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield x


def minhash_perms(k: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficient lists for k minhash
    permutations h_i(x) = (a_i * (x & MASK_40) + b_i) % MINHASH_PRIME.

    a_i < 2^20 keeps a_i * (x & MASK_40) < 2^60 — no int64 overflow in
    either engine. Plain LCG expansion from the seed; no RNG state so
    both engines and any round re-run agree.
    """
    a, b = [], []
    rng = lcg_stream(seed)
    for _ in range(k):
        x = next(rng)
        a.append((x >> 20) % ((1 << 20) - 1) + 1)
        b.append(x % MINHASH_PRIME)
    return a, b
