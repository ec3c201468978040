"""As-of (most-recent-match) join — an operator Spark lacks natively.

Composed from built-in DataFrame ops (SURVEY.md custom-operator policy (a)):
union the two sides tagged, sort within each key group by time, fill the
right side's row-struct across the frame, keep left rows. One shuffle on the
key — the same cost profile as a regular sort-merge join, no Python, no
per-row loops.

Semantics (cf. pandas ``merge_asof``, DuckDB ``ASOF JOIN`` — the latter is
the correctness oracle in __spark_entry__.q51):

- ``direction="backward"``: greatest ``right_time <= left_time``;
- ``direction="forward"``: smallest ``right_time >= left_time``;
- ``direction="nearest"``: whichever of the two is closer in time, ties to
  the backward match (pandas tie rule);
- ``tolerance``: matches farther than this from the left time are dropped
  (NULLs attached). Units: seconds for timestamp time columns, plain column
  units for numerics.

Public construction — the standard union+window formulation of time-series
as-of joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join of ``left`` with ``right`` on key ``on``.

    ``right_cols`` (default: all non-key, non-time right columns) appear in
    the output suffixed; rows with no match in ``direction`` (and within
    ``tolerance``, if given) keep NULLs. Right-side ties on (key, time)
    resolve to the row latest in the sort — callers needing a specific
    survivor should pre-deduplicate.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]

    # The whole matched right row travels as ONE struct so the fill is
    # atomic: a NULL field in the matched right row stays NULL in the
    # output instead of being filled from another right row (which
    # per-column last(ignorenulls) would silently mix).
    t_field = f"{right_time}{suffix}"
    fields = [t_field, *[f"{c}{suffix}" for c in right_cols]]
    r_tag = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).alias(t_field),
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

    # Backward: right rows (__is_left=0) sort BEFORE left rows at equal
    # timestamps, so an exactly-simultaneous right row IS matched
    # (inclusive). Forward mirrors it: left first, right after, first() over
    # the following frame. Both windows share one partitioning → one shuffle
    # even when "nearest" computes both.
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    filled = union
    if direction in ("backward", "nearest"):
        filled = filled.withColumn(
            "__rb", F.last("__r", ignorenulls=True).over(w_back)
        )
    if direction in ("forward", "nearest"):
        filled = filled.withColumn(
            "__rf", F.first("__r", ignorenulls=True).over(w_fwd)
        )

    # DateType cannot cast to double directly; route date/timestamp through
    # timestamp (epoch seconds), numerics straight to double.
    t_dtype = dict(left.dtypes)[left_time]

    def seconds(c: Column) -> Column:
        if t_dtype in ("date", "timestamp", "timestamp_ntz"):
            return c.cast("timestamp").cast("double")
        return c.cast("double")

    def dist(matched: Column) -> Column:
        return F.abs(seconds(F.col("__t")) - seconds(matched[t_field]))

    if direction == "backward":
        picked = F.col("__rb")
    elif direction == "forward":
        picked = F.col("__rf")
    else:
        b, f_ = F.col("__rb"), F.col("__rf")
        picked = (
            F.when(b.isNull(), f_)
            .when(f_.isNull(), b)
            .when(dist(f_) < dist(b), f_)   # ties go backward (pandas rule)
            .otherwise(b)
        )

    out = filled.withColumn("__r", picked).where(F.col("__is_left") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__r",
            F.when(dist(F.col("__r")) <= F.lit(float(tolerance)), F.col("__r")),
        )
    out = out.withColumns({f: F.col("__r").getField(f) for f in fields})
    return out.drop("__t", "__is_left", "__rb", "__rf", "__r")
