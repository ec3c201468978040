"""Grid-bucketed spatial radius join (beyond-reference; the spatial
sibling of the FastSS q211 / containment q161 candidate-generation
joins — every geo-keyed pipeline's "all pairs within distance r"
primitive).

Scale design:
- points bucket into square cells of side == radius, so every true pair
  lies in the same or an 8-neighbor cell; candidates are a 9-offset
  equi-join on cell keys — NEVER a cross join. Shuffle is bounded by
  9 x points; per-task work by the densest cell's occupancy (the skew
  axis — same class as the LSH band buckets).
- the distance test is EXACT integer arithmetic on micro-unit
  coordinates (dx^2 + dy^2 <= r^2 in BIGINT): no floats anywhere, so
  the Spark plan and the DuckDB oracle agree bit-for-bit and the
  operator is safe under any float-mode cluster config.
- each surviving pair is emitted EXACTLY once without a distinct:
  the (a.id < b.id) orientation plus "b's home cell is unique and a
  probes it via one of its 9 offsets" make the match unique.

The test-data gate derives deterministic micro-unit coordinates from
customer keys (two coprime multipliers mod 1e6); a real deployment
feeds micro-degree GPS columns directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import rebalance_undersplit


def grid_radius_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All point pairs within Euclidean distance ``radius`` (micro-unit
    integer coordinates), via 9-offset cell bucketing.

    Returns ``(id_a, id_b, dist2)`` with ``id_a < id_b`` and
    ``dist2 = (xa-xb)^2 + (ya-yb)^2 <= radius^2`` exact in BIGINT.
    """
    r2 = radius * radius
    pts = rebalance_undersplit(
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(x_col).cast("long").alias("__x"),
            F.col(y_col).cast("long").alias("__y"),
        )
    ).withColumns(
        {
            "__cx": F.floor(F.col("__x") / F.lit(radius)).cast("long"),
            "__cy": F.floor(F.col("__y") / F.lit(radius)).cast("long"),
        }
    )
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx}L as dx, {dy}L as dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    probe = pts.select(
        F.col("__id").alias("id_a"),
        F.col("__x").alias("xa"),
        F.col("__y").alias("ya"),
        "__cx",
        "__cy",
        offsets.alias("__off"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("__cx") + F.col("__off.dx")).alias("pcx"),
        (F.col("__cy") + F.col("__off.dy")).alias("pcy"),
    )
    home = pts.select(
        F.col("__id").alias("id_b"),
        F.col("__x").alias("xb"),
        F.col("__y").alias("yb"),
        F.col("__cx").alias("hcx"),
        F.col("__cy").alias("hcy"),
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(
            home,
            (F.col("pcx") == F.col("hcx"))
            & (F.col("pcy") == F.col("hcy"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("dist2", dist2)
        .where(F.col("dist2") <= F.lit(r2))
        .select("id_a", "id_b", "dist2")
    )


def grid_radius_join_sql(
    table: str,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> str:
    """DuckDB twin of :func:`grid_radius_join` — deliberately the
    BRUTE-FORCE O(n^2) self-join with the identical exact-integer
    distance test, so parity certifies the cell decomposition's
    COMPLETENESS (zero false negatives), exactly as q211's
    brute-force oracle certifies the FastSS neighborhoods."""
    r2 = radius * radius
    return f"""
    WITH pts AS (
        SELECT CAST({id_col} AS BIGINT) AS __id,
               CAST({x_col} AS BIGINT) AS __x,
               CAST({y_col} AS BIGINT) AS __y
        FROM {table}
    )
    SELECT a.__id AS id_a, b.__id AS id_b,
           (a.__x - b.__x) * (a.__x - b.__x)
         + (a.__y - b.__y) * (a.__y - b.__y) AS dist2
    FROM pts a JOIN pts b ON a.__id < b.__id
    WHERE (a.__x - b.__x) * (a.__x - b.__x)
        + (a.__y - b.__y) * (a.__y - b.__y) <= {r2}
    """
