"""Time-series regularization: resample + gap fill.

Event streams arrive irregular; downstream consumers (feature windows,
anomaly baselines, training curricula keyed by time) want a REGULAR grid
per key with explicit gap semantics. ``resample_gapfill`` buckets events
to a fixed interval, completes the per-key grid between each key's first
and last bucket, and carries the last observation forward across gaps —
the classic as-of/ffill semantic expressed in plain DataFrame ops.

Scale design
------------
* The observed aggregation is one (key, bucket)-keyed hash agg with
  map-side partials — shuffle bounded by keys x occupied buckets.
* The grid comes from ``sequence() + explode`` over each key's (min, max)
  bucket pair — generated map-side from a tiny per-key span table, never
  by joining a global calendar dimension.
* Fill is one per-key window (``last ignorenulls``) over the grid, which
  is bounded by keys x span-buckets regardless of raw event volume. Keys
  partition the window, so there is no global-window funnel; a pathological
  multi-year span per key is visible up front in the span table.

Reference parity: the reference has no temporal operators at all; this
extends the as-of family (operators/asof.py) the same way q51/q51b do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Regular per-key grid at ``interval`` with carry-forward fill.

    Returns one row per (key, bucket) for every bucket between the key's
    first and last observation: ``n_obs`` events in the bucket, ``v_sum``
    the bucket's observed mass (NULL on gaps), ``v_ff`` the carry-forward
    value, ``is_gap`` whether the bucket had no events. The first bucket
    of each key is by construction observed, so ``v_ff`` is never NULL.
    """
    unit = interval.split()[1].rstrip("s")
    h = F.date_trunc(unit, F.col(ts_col))
    obs = (
        df.groupBy(F.col(key_col).alias("k"), h.alias("h"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(F.col(value_col)).alias("v_sum"),
        )
    )
    spans = obs.groupBy("k").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "k",
        F.explode(
            F.sequence("h0", "h1", F.expr(f"interval {interval}"))
        ).alias("h"),
    )
    filled = grid.join(obs, ["k", "h"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col("k").alias(key_col),
        F.col("h").alias("bucket"),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        "v_sum",
        F.last("v_sum", ignorenulls=True).over(w).alias("v_ff"),
        F.col("n_obs").isNull().alias("is_gap"),
    )


def resample_gapfill_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: str = "1 hour",
) -> str:
    """DuckDB twin of :func:`resample_gapfill` — generate_series grid,
    identical bucket rule and carry-forward window."""
    unit = interval.split()[1].rstrip("s")
    return f"""
    WITH obs AS (
      SELECT {key_col} AS k, date_trunc('{unit}', {ts_col}) AS h,
             CAST(count(*) AS BIGINT) AS n_obs, sum({value_col}) AS v_sum
      FROM {table} GROUP BY 1, 2
    ), spans AS (
      SELECT k, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY k
    ), grid AS (
      SELECT k, unnest(generate_series(h0, h1, INTERVAL {interval})) AS h
      FROM spans
    ), filled AS (
      SELECT g.k, g.h, o.n_obs, o.v_sum
      FROM grid g LEFT JOIN obs o ON o.k = g.k AND o.h = g.h
    )
    SELECT k AS {key_col}, h AS bucket,
           coalesce(n_obs, 0) AS n_obs, v_sum,
           last_value(v_sum IGNORE NULLS) OVER (
             PARTITION BY k ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_ff,
           n_obs IS NULL AS is_gap
    FROM filled
    """
