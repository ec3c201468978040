"""Grid-bucketed spatial radius join laws (operators/spatial.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pytrousse_spark.operators.spatial import grid_radius_join


def test_planted_neighbors_and_cell_boundaries(spark):
    """Exact-integer distance law on planted points, including pairs
    that straddle a cell boundary (the case a naive same-cell join
    misses) and a pair at EXACTLY the radius (closed ball)."""
    r = 10
    pts = [
        (1, 0, 0),
        (2, 3, 4),        # dist 5 from id 1 -> pair
        (3, 9, 12),       # dist 15 from id 1 -> no; dist 10 from id 2 -> EXACT r
        (4, 19, 0),       # cell (1,0); dist 19 from id 1 -> no
        (5, 11, 0),       # cell (1,0); dist 11 from id 1 -> no; dist 8 from id 4 -> pair
        (6, 9, 0),        # cell (0,0); dist 2 from id 5 ACROSS the boundary -> pair
        (7, 1000, 1000),  # isolated
    ]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    out = {
        (r_["id_a"], r_["id_b"]): r_["dist2"]
        for r_ in grid_radius_join(df, "id", "x", "y", r).collect()
    }
    assert out == {
        (1, 2): 25,
        (2, 3): 100,   # exactly r^2 -> included (closed ball)
        (2, 5): 80,
        (2, 6): 52,
        (4, 5): 64,
        (5, 6): 4,
        (1, 6): 81,
        (4, 6): 100,   # dist 10 exactly
    }


def test_matches_brute_force(spark):
    """Completeness + uniqueness vs an in-Spark brute-force join on a
    deterministic 200-point cloud."""
    from pytrousse_spark.functions.hashing import h60_seeded

    base = spark.range(200).select(
        F.col("id"),
        (h60_seeded(F.col("id").cast("string"), "bx") % 1000).alias("x"),
        (h60_seeded(F.col("id").cast("string"), "by") % 1000).alias("y"),
    )
    r = 60
    fast = grid_radius_join(base, "id", "x", "y", r)
    a = base.select(
        F.col("id").alias("id_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", d2)
        .where(F.col("dist2") <= r * r)
        .select("id_a", "id_b", "dist2")
    )
    fast_rows = set(map(tuple, fast.collect()))
    brute_rows = set(map(tuple, brute.collect()))
    assert fast_rows == brute_rows and len(fast_rows) == fast.count()
