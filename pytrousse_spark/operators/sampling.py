"""Deterministic sampling / splitting (beyond-reference).

Training-data curation needs samples and splits that are REPRODUCIBLE
across runs, engines, and repartitioning — ``df.sample`` / ``randomSplit``
are none of those (partition-seeded RNG). The operators here derive every
decision from a portable content hash of a row id (the standard hash-mod
split used by large-scale data pipelines), so the same row always lands in
the same split on any engine — including the DuckDB oracle.

All pure map-side expressions; ``hash_topk_per_group`` adds one window
shuffle keyed by the group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql

#: hash buckets per unit probability — 1e6 gives ppm-resolution fractions.
_BUCKETS = 1_000_000


def _bucket(id_col: str, salt: str):
    """Deterministic bucket in [0, 1e6) from the salted id hash."""
    return h60(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))) % _BUCKETS


def _bucket_sql(id_col: str, salt: str) -> str:
    h = h60_sql(f"'{salt}|' || CAST({id_col} AS VARCHAR)")
    return f"({h} % {_BUCKETS})"


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by the salted id hash —
    stable under reruns and repartitioning. Different salts give
    INDEPENDENT (decorrelated, overlapping) samples; for disjoint subsets
    use :func:`hash_split`, whose bucket ranges partition the id space."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(_bucket(id_col, salt) < int(round(fraction * _BUCKETS)))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by cumulative hash-bucket ranges —
    the reproducible train/val/test assignment (weights must sum to 1).

    Order of ``weights`` fixes the bucket ranges, so adding a split at the
    END leaves existing assignments stable.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    b = _bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out_col, expr)


def hash_split_sql(
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> str:
    """DuckDB CASE expression twin of :func:`hash_split`'s label column."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = _bucket_sql(id_col, salt)
    parts = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        parts.append(f"WHEN {b} < {int(round(acc * _BUCKETS))} THEN '{name}'")
    return f"(CASE {' '.join(parts)} ELSE '{names[-1]}' END)"


def hash_topk_per_group(
    df: DataFrame, group_cols: list[str], k: int, id_col: str
) -> DataFrame:
    """Deterministic ``k``-row downsample per group: the rows with the
    smallest salted id hash (ties by id). A reproducible, engine-portable
    stand-in for per-stratum random sampling — one window shuffle keyed by
    the group, no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        _bucket(id_col, "topk").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def hash_topk_per_group_sql(
    table: str, group_cols: list[str], k: int, id_col: str
) -> str:
    """DuckDB twin of :func:`hash_topk_per_group` (returns all columns)."""
    g = ", ".join(group_cols)
    b = _bucket_sql(id_col, "topk")
    return f"""
    SELECT * EXCLUDE (__rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {g} ORDER BY {b}, {id_col}
      ) AS __rn
      FROM {table}
    ) WHERE __rn <= {k}
    """
