"""Similarity search over embedding columns (beyond-reference).

Brute-force cosine top-k is the exact baseline (and the oracle target);
random-hyperplane LSH bucketing is the scale path — both with deterministic,
engine-portable math. Hyperplane matrices are generated from a seeded PRNG on
the driver and embedded as literals, so the DuckDB oracle can replay the
identical computation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sql


def _deterministic_planes(num_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return [
        [round(float(v), 6) for v in rng.standard_normal(dim)]
        for _ in range(num_planes)
    ]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by brute-force cosine.

    Plan: broadcast the (small) query set against the corpus — embarrassingly
    parallel map-side work, then a per-query top-k window. Deterministic
    selection: ties broken by neighbor id ascending on the ROUNDED score, so
    results are stable across engines and partitionings.
    """
    from ..functions.vectors import dot, norm

    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    cos = F.when(
        (F.col("__qn") > 0) & (F.col("__cn") > 0),
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cos, 6))
        .where(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_topk_sql(
    corpus: str,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`cosine_topk` with queries = rows matching
    ``query_filter`` in the same corpus table."""
    cs = cosine_sql(f"q.{vec_col}", f"c.{vec_col}", dim)
    return f"""
    WITH scored AS (
        SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
               round({cs}, 6) AS cos
        FROM {corpus} q, {corpus} c
        WHERE ({query_filter}) AND q.{id_col} <> c.{id_col}
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
        ) AS rank
        FROM scored WHERE cos IS NOT NULL
    )
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """LSH bucket id: sign-bit signature against fixed random hyperplanes
    (public SimHash-for-vectors construction)."""
    bits = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(p) for p in plane])
        d = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket join, exact cosine re-rank inside
    the bucket. At 100 TB the bucket join replaces the full cross product;
    recall is tunable via ``num_planes`` (fewer planes → bigger buckets).
    """
    from ..functions.vectors import dot, norm

    planes = _deterministic_planes(num_planes, dim, seed)
    sig = hyperplane_signature(F.col(vec_col), planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
        sig.alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
        sig.alias("__bucket"),
    )
    cos = F.when(
        (F.col("__qn") > 0) & (F.col("__cn") > 0),
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
    )
    scored = (
        c.join(F.broadcast(q), on="__bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cos, 6))
        .where(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
