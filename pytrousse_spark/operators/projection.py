"""Johnson–Lindenstrauss random projection for embedding columns.

Dimensionality reduction is the cheapest lever in a 100 TB similarity
stack: projecting ``array<float>`` embeddings from d to k ≪ d dims with a
random ±1 sign matrix preserves pairwise geometry to (1±ε) with
ε ~ sqrt(ln n / k) (Johnson & Lindenstrauss 1984; Achlioptas 2003 showed
the ±1 database-friendly variant suffices), shrinking every downstream
index — LSH signatures, IVF cells, PQ codebooks — and the shuffles that
build them by d/k.

Scale design: the sign matrix is DERIVED, not stored — entry (j, i) is
the parity of the portable 60-bit md5 hash of ``"rp|salt|j|i"`` — so
executors embed it as a nested literal and the projection is a PURE
MAP-SIDE expression (k index-ordered double folds per row, whole-stage
codegen, zero shuffles, zero Python). The DuckDB oracle replays the same
literal matrix and fold order, so projected values hash-match exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sign(salt: str, j: int, i: int) -> int:
    """±1 from the portable h60 parity (same 60-bit md5 truncation as
    functions/hashing.h60, computed driver-side — it feeds literals)."""
    h = int(hashlib.md5(f"rp|{salt}|{j}|{i}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def rp_signs(in_dim: int, out_dim: int, salt: str = "rp") -> list[list[int]]:
    """The out_dim × in_dim ±1 matrix both engines embed as a literal."""
    return [
        [_sign(salt, j, i) for i in range(in_dim)] for j in range(out_dim)
    ]


def _fold(vec: Column, signs: list[int]) -> Column:
    """Σ signs[i]·vec[i] as an index-ordered double fold (JVM-side)."""
    s = F.array(*[F.lit(float(x)) for x in signs])
    return F.aggregate(
        F.zip_with(vec, s, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def random_project(
    df: DataFrame,
    vec_col: str,
    in_dim: int,
    out_dim: int,
    salt: str = "rp",
    out_col: str = "projected",
) -> DataFrame:
    """Append ``out_col``: the k-dim ±1 projection scaled by 1/√k (the
    scaling that makes E[‖y‖²] = ‖x‖²). Zero shuffles — safe to run
    inline in any scan."""
    signs = rp_signs(in_dim, out_dim, salt)
    scale = 1.0 / (out_dim ** 0.5)
    v = F.col(vec_col)
    return df.withColumn(
        out_col,
        F.array(*[(_fold(v, signs[j]) * F.lit(scale)) for j in range(out_dim)]),
    )


def rp_component_sql(
    vec_expr: str, signs_row: list[int], in_dim: int, out_dim: int
) -> str:
    """DuckDB twin of one projected component: identical literal sign row,
    index-ordered fold, 1/√k scaling."""
    lits = "[" + ", ".join(str(float(s)) for s in signs_row) + "]"
    return (
        f"(list_sum(list_transform(range(1, {in_dim + 1}), "
        f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({lits}[i]))) "
        f"* (1.0 / sqrt({out_dim})))"
    )
