"""Portable hash expressions.

The dedup / fingerprint / anonymization operators need hashes that are
(1) computable as JVM column expressions at scale and (2) reproducible by an
external ANSI-SQL oracle (DuckDB) for the correctness gate. ``xxhash64`` /
``hash`` are Spark-private, so the portable base is md5 truncated to 60 bits:

    h60(s) = int(substr(md5(s), 1, 15), 16)           # 60 bits, fits BIGINT

DuckDB equivalent: ``('0x' || substr(md5(s), 1, 15))::BIGINT``.

For pure-Spark hot paths (bench mode) every operator accepts
``hash_fn="xxhash64"`` which is ~an-order-of-magnitude cheaper; the md5 mode
exists for cross-engine verifiability. Seeded variants prefix the payload
with the seed, so "independent" hash functions need no 64-bit multiplication
(which would overflow differently per engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^60 upper bound of h60 — handy for normalizing to [0,1).
H60_SPACE = 1 << 60


def h60(col: Column) -> Column:
    """60-bit md5-based hash of a string column (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_seeded(col: Column, seed: int | str) -> Column:
    """Seeded 60-bit hash: h60(seed || '|' || value)."""
    return h60(F.concat(F.lit(f"{seed}|"), col))


def fast_hash(col: Column, seed: int | str | None = None) -> Column:
    """xxhash64-based hash for pure-Spark paths (not oracle-portable)."""
    if seed is None:
        return F.xxhash64(col)
    return F.xxhash64(F.lit(str(seed)), col)


def hash_expr(col: Column, seed: int | str | None, hash_fn: str) -> Column:
    """Dispatch between the portable md5 path and the fast xxhash64 path."""
    if hash_fn == "md5":
        return h60(col) if seed is None else h60_seeded(col, seed)
    if hash_fn == "xxhash64":
        return fast_hash(col, seed)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def h60_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`h60` over SQL expression ``expr``."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def h60_seeded_sql(expr: str, seed: int | str) -> str:
    return h60_sql(f"'{seed}|' || {expr}")
