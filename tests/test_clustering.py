"""k-means + SemDeDup semantics (oracle parity runs in test_oracle_parity)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pytrousse_spark.operators.clustering import (
    _init_centroids,
    kmeans,
    kmeans_fit,
    semantic_dedup,
    semantic_dedup_pairs,
)


def _toy(spark):
    # two tight planted clusters around (0,0) and (10,10), plus one outlier
    pts = [
        (1, [0.0, 0.1]), (2, [0.1, 0.0]), (3, [0.0, 0.0]),
        (4, [10.0, 10.1]), (5, [10.1, 10.0]), (6, [10.0, 10.0]),
        (7, [100.0, 100.0]),
    ]
    return spark.createDataFrame(pts, "vec_id long, embedding array<float>")


def test_lloyd_improves_inertia(spark):
    df = _toy(spark)

    def inertia(iters):
        rows = kmeans(df, k=2, iters=iters).collect()
        return sum(r["dist"] for r in rows)

    i1, i3 = inertia(1), inertia(3)
    assert i3 <= i1 + 1e-9


def test_planted_clusters_recovered(spark):
    df = _toy(spark).where(F.col("vec_id") < 7)
    rows = kmeans(df, k=2, iters=3).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert sorted(by_cluster.values(), key=min) == [{1, 2, 3}, {4, 5, 6}]


def test_assignment_stable_under_repartition(spark):
    df = _toy(spark)
    a = sorted((r["vec_id"], r["cluster"]) for r in kmeans(df, k=2, iters=2).collect())
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans(df.repartition(7), k=2, iters=2).collect()
    )
    assert a == b


def test_empty_cell_keeps_centroid(spark):
    # all points identical: every row lands in one cell; the other k-1
    # centroids must survive (not NaN out) and the fit must not raise
    pts = [(i, [1.0, 1.0]) for i in range(1, 6)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    cents = kmeans_fit(df, k=3, iters=2)
    assert len(cents) == 3
    assert all(all(x == x for x in c) for c in cents)  # no NaN
    rows = kmeans(df, k=3, iters=2).collect()
    assert len({r["cluster"] for r in rows}) == 1


def test_null_vectors_excluded(spark):
    pts = [(1, [0.0, 0.0]), (2, None), (3, [5.0, 5.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = kmeans(df, k=2, iters=1).collect()
    assert sorted(r["vec_id"] for r in rows) == [1, 3]


def test_semantic_dedup_drops_higher_id_twin(spark):
    # ids 4/5/6 are near-identical direction; 1/2/3 nearly orthogonal-ish
    # directions with low mutual cosine; tau high enough to pair only twins
    pts = [
        (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.2]),
        (4, [5.0, 5.0]), (5, [5.0, 5.01]), (6, [5.01, 5.0]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    pairs = semantic_dedup_pairs(df, k=2, iters=2, tau=0.999).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(4, 5), (4, 6), (5, 6)}
    surv = sorted(
        r["vec_id"] for r in semantic_dedup(df, k=2, iters=2, tau=0.999).collect()
    )
    assert surv == [1, 2, 3, 4]


def test_init_is_hash_deterministic(spark):
    df = _toy(spark)
    a = _init_centroids(df, "vec_id", "embedding", 3)
    b = _init_centroids(df.repartition(5), "vec_id", "embedding", 3)
    assert a == b


@pytest.mark.parametrize("k", [1, 8])
def test_k_bounds(spark, k):
    df = _toy(spark)
    rows = kmeans(df, k=k, iters=1).collect()
    assert len(rows) == 7
    assert all(1 <= r["cluster"] <= k for r in rows)


def test_cluster_cap_sample_caps_and_is_deterministic(spark):
    from pytrousse_spark.operators.clustering import cluster_cap_sample

    df = _toy(spark)
    out = cluster_cap_sample(df, k=2, iters=2, cap=2)
    rows = out.collect()
    ids = {r["vec_id"] for r in rows}
    assert ids <= {1, 2, 3, 4, 5, 6, 7}
    by_cluster: dict[int, int] = {}
    for r in rows:
        by_cluster[r["cluster"]] = by_cluster.get(r["cluster"], 0) + 1
    assert all(n <= 2 for n in by_cluster.values())
    # dense planted clusters are actually trimmed
    assert len(ids) < 7
    again = {r["vec_id"] for r in
             cluster_cap_sample(df.repartition(5), k=2, iters=2, cap=2).collect()}
    assert ids == again


# ---------------------------------------------------------------------------
# cluster-quality indices (round 7)
# ---------------------------------------------------------------------------
def test_cluster_quality_separated_beats_overlapping(spark):
    from pytrousse_spark.operators.clustering import cluster_quality

    def blob(cx, cy, n, start_id):
        # deterministic tight 2-d blob around (cx, cy)
        return [
            (start_id + i, [cx + (i % 5) * 0.01, cy + (i % 7) * 0.01])
            for i in range(n)
        ]

    # far-apart blobs -> silhouette near 1, small DB index
    far = blob(0.0, 0.0, 30, 0) + blob(100.0, 100.0, 30, 100)
    df = spark.createDataFrame(far, ["vec_id", "embedding"])
    rows = cluster_quality(df, "vec_id", "embedding", k=2, iters=2).collect()
    sil_far = rows[0]["silhouette"]
    db_far = rows[0]["db_index"]
    assert sil_far > 0.9
    assert db_far < 0.1

    # overlapping blobs -> much worse scores
    near = blob(0.0, 0.0, 30, 0) + blob(0.05, 0.05, 30, 100)
    df2 = spark.createDataFrame(near, ["vec_id", "embedding"])
    rows2 = cluster_quality(
        df2, "vec_id", "embedding", k=2, iters=2
    ).collect()
    assert rows2[0]["silhouette"] < sil_far - 0.3
    assert rows2[0]["db_index"] > db_far
    # silhouette always in [-1, 1]; per-cluster ns partition the input
    for r in rows + rows2:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
    assert sum(r["n"] for r in rows) == 60
