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


def _probe_masks(num_planes: int, radius: int) -> list[int]:
    """All bit masks of popcount <= radius (multi-probe neighborhood)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(num_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    num_tables: int = 1,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket join, exact cosine re-rank over
    the candidate set. At 100 TB the bucket join replaces the full cross
    product. Recall knobs (standard LSH constructions, cf. Indyk-Motwani;
    multi-probe per Lv et al. 2007):

    - ``num_planes``: fewer planes → bigger buckets → higher recall;
    - ``num_tables``: independent hash tables (seeded ``seed+t``); candidates
      are unioned, recall ≈ 1-(1-p)^L for per-table collision rate p;
    - ``probe_hamming``: queries also probe corpus buckets within this
      Hamming distance of their own signature (recall without re-hashing the
      corpus — corpus rows still emit exactly ``num_tables`` bucket entries).

    Cost model: corpus explodes to ``num_tables`` rows; queries to
    ``num_tables · C(num_planes, <=probe_hamming)``; the candidate set is
    deduped before scoring so each (query, neighbor) is scored once.
    """
    from ..functions.vectors import dot, norm

    tables = [
        _deterministic_planes(num_planes, dim, seed + t)
        for t in range(num_tables)
    ]
    masks = _probe_masks(num_planes, probe_hamming)

    # Stage each table's signature as its own projected column BEFORE building
    # the probe arrays — array elements would otherwise each recompute the
    # full num_planes-aggregate signature (the HOF re-evaluation pitfall;
    # measured ~mask-count× slowdown at probe_hamming=2).
    def with_sigs(df: DataFrame, key: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(key), F.col(vec_col))
        return out.withColumns(
            {
                f"__sig{t}": hyperplane_signature(F.col(vec_col), tables[t])
                for t in range(num_tables)
            }
        )

    # corpus: one (table, bucket) entry per table
    c_keys = with_sigs(corpus, "neighbor_id").select(
        "neighbor_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws("_", F.lit(t), F.col(f"__sig{t}"))
                    for t in range(num_tables)
                ]
            )
        ).alias("__tb"),
    )
    # queries: probe every bucket within Hamming <= probe_hamming, per table
    q_keys = with_sigs(queries, "query_id").select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(t),
                        F.col(f"__sig{t}").bitwiseXOR(F.lit(m)).cast("int"),
                    )
                    for t in range(num_tables)
                    for m in masks
                ]
            )
        ).alias("__tb"),
    )
    candidates = (
        c_keys.join(F.broadcast(q_keys), on="__tb")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    cos = F.when(
        (F.col("__qn") > 0) & (F.col("__cn") > 0),
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
    )
    scored = (
        candidates.join(c_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
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
