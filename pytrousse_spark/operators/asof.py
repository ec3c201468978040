"""As-of (most-recent-match) join — an operator Spark lacks natively.

Composed from built-in DataFrame ops (SURVEY.md custom-operator policy (a)):
union the two sides tagged, sort within each key group by time, backward-fill
the right side's values with ``last(ignorenulls=True)``, keep left rows. One
shuffle on the key — the same cost profile as a regular sort-merge join, no
Python, no per-row loops.

Semantics: for each left row, attach the right row with the greatest
``right_time <= left_time`` in the same key group (``direction="backward"``;
ties on equal timestamps match). Public construction — the standard
union+window formulation of time-series as-of joins (cf. pandas
``merge_asof``, DuckDB ``ASOF JOIN``, which is also the correctness oracle in
__spark_entry__.q51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join of ``left`` with ``right`` on key ``on``.

    ``right_cols`` (default: all non-key, non-time right columns) appear in
    the output suffixed; rows with no prior right match keep NULLs.
    Right-side ties on (key, time) resolve to the row latest in the sort —
    callers needing a specific survivor should pre-deduplicate.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]

    # The whole matched right row travels as ONE struct so the backfill is
    # atomic: a NULL field in the most recent right row stays NULL in the
    # output instead of being filled from an older right row (which per-column
    # last(ignorenulls) would silently mix).
    fields = [f"{right_time}{suffix}", *[f"{c}{suffix}" for c in right_cols]]
    r_tag = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).alias(f"{right_time}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("__r"),
    )
    row_type = r_tag.schema["__r"].dataType

    l_tag = (
        left.withColumn("__t", F.col(left_time))
        .withColumn("__is_left", F.lit(1))
        .withColumn("__r", F.lit(None).cast(row_type))
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))

    union = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # right rows (__is_left=0) sort before left rows at equal timestamps, so
    # an exactly-simultaneous right row IS matched (backward-inclusive).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = union.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    out = filled.where(F.col("__is_left") == 1)
    out = out.withColumns({f: F.col("__r").getField(f) for f in fields})
    return out.drop("__t", "__is_left", "__r")
