"""Count-Min sketch: bounded-memory frequency estimation (Cormode &
Muthukrishnan 2005).

At 100 TB a token-frequency table is itself huge (trillions of tokens,
billions of distinct); a Count-Min sketch replaces it with a fixed d x w
counter grid (e.g. 4 x 16384 = 64k cells) built in ONE map-side-combined
aggregation keyed by (row, cell) — the only shuffle is bounded by d*w
regardless of corpus size, and the resulting grid broadcasts anywhere a
frequency estimate is needed (heavy-hitter gates, importance weighting,
vocabulary pruning). Estimates NEVER underestimate: est(x) >= true(x), with
overestimation bounded by e*N/w at confidence 1-(1/2)^d. The portable h60
hash family keeps the grid reproducible by the DuckDB oracle bit-for-bit;
``hash_fn="xxhash64"`` is the cheap pure-Spark tier.

Spark's own ``df.stat.countMinSketch`` builds the same structure JVM-side
with engine-private hashing (not oracle-checkable, not composable as a
DataFrame); this one stays a plain DataFrame so estimation is a broadcast
join and the grid can be persisted/unioned/merged like any table (sketches
are mergeable by cell-wise sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import hash_expr


def _cell_cols(col: Column, w: int, d: int, hash_fn: str) -> Column:
    """Array of d cell positions for one key."""
    return F.array(
        *[F.pmod(hash_expr(col, f"cm{j}", hash_fn), F.lit(w)).cast("long") for j in range(d)]
    )


def count_min_build(
    df: DataFrame, col: str, w: int = 1 << 14, d: int = 4, hash_fn: str = "md5"
) -> DataFrame:
    """Build the sketch grid from one key per row (pre-explode multi-valued
    inputs). Returns (j, pos, c) with at most d*w rows; partial aggregation
    makes the shuffle carry only the grid, never the corpus.
    """
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.posexplode(_cell_cols(F.col(col), w, d, hash_fn)).alias("j", "pos")
        )
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def count_min_estimate(
    probe: DataFrame,
    col: str,
    sketch: DataFrame,
    w: int = 1 << 14,
    d: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Frequency estimate per probe row: min over the d cells.

    The grid broadcasts (<= d*w rows); missing cells count 0, so keys never
    seen by the build side estimate correctly as 0 when none of their cells
    collide.
    """
    pp = probe.select(
        "*", F.posexplode(_cell_cols(F.col(col), w, d, hash_fn)).alias("j", "pos")
    )
    return (
        pp.join(F.broadcast(sketch), ["j", "pos"], "left")
        .groupBy(*probe.columns)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate"))
    )


def count_min_build_sql(rows_subquery: str, key_expr: str, w: int, d: int) -> str:
    """DuckDB twin of :func:`count_min_build` over ``rows_subquery``."""
    return f"""
        SELECT g.gi AS j,
               (('0x' || substr(md5('cm' || g.gi || '|' || {key_expr}), 1, 15))::BIGINT) % {w} AS pos,
               count(*) AS c
        FROM ({rows_subquery}) b
        CROSS JOIN generate_series(0, {d - 1}) AS g(gi)
        WHERE {key_expr} IS NOT NULL
        GROUP BY 1, 2
    """
