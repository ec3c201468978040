"""Vector math over ``array<float>`` embedding columns.

JVM-side expressions (``aggregate``/``zip_with``) — no Python UDF, so the
similarity operators stay inside whole-stage codegen. Each helper has a
DuckDB-SQL twin emitting the same left-to-right double-precision fold so the
oracle hash-matches (sums are order-sensitive in floating point; both engines
fold the array in index order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dlit(v: float) -> str:
    """SQL text of one double literal, bit-exact: ``repr(float)`` is the
    shortest round-tripping decimal and both Python's and the JVM's
    string→double parses are correctly rounded, so the parsed literal is
    the identical IEEE double."""
    v = float(v)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v in (float("inf"), float("-inf")):
        return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
    return repr(v) + "D"


def lit_doubles(vals) -> Column:
    """``array<double>`` literal built in ONE py4j call via SQL text.

    The per-element ``F.array(*[F.lit(x) ...])`` form costs two JVM
    round-trips per element — ~0.6 s of driver time per 1k-element
    codebook/centroid matrix, re-paid on every expression build (guide
    §1: measured 6.2 s of py4j socket time in one IVF-PQ plan build).
    Parses to the same CreateArray(Literal...) tree (``sameSemantics``
    with the per-element form; pinned in tests/test_vectors.py)."""
    return F.expr("array(" + ",".join(_dlit(v) for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal in ONE py4j call (see
    :func:`lit_doubles`)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_dlit(v) for v in row) + ")" for row in rows
        )
        + ")"
    )


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] in double precision, index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def dot_sql(a: str, b: str, dim: int) -> str:
    """DuckDB: same index-ordered double fold (lists are 1-based)."""
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine_sql(a: str, b: str, dim: int) -> str:
    d = dot_sql(a, b, dim)
    na = f"sqrt({dot_sql(a, a, dim)})"
    nb = f"sqrt({dot_sql(b, b, dim)})"
    return (
        f"(CASE WHEN {na} > 0 AND {nb} > 0 THEN {d} / ({na} * {nb}) END)"
    )
