"""Range (interval-containment) join — point-in-range matching.

Spark plans a raw ``l.v BETWEEN r.lo AND r.hi`` join as a nested-loop; that
is fine when one side broadcasts but quadratic for big-big. The bucketed
strategy here turns it into an equi-join (public technique, used by most
interval-join implementations):

1. choose a bucket width; each left point maps to bucket ``floor(v/w)``;
2. each right interval explodes to every bucket it covers (guarded by
   ``max_buckets_per_range``);
3. equi-join on the bucket id, then re-check the exact range predicate.

Shuffle is keyed by bucket id, so co-location replaces the cross product;
skew follows bucket population, tunable via the width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    bucket_width: float | None = None,
    max_buckets_per_range: int = 10_000,
) -> DataFrame:
    """Join left points to right intervals with ``lo <= point <= hi``.

    ``bucket_width=None`` → broadcast nested-loop (right side must be small).
    With a width, the bucketed equi-join strategy above (both sides large).
    ``how`` supports ``inner`` and ``left`` (unmatched points keep NULLs).
    """
    if how not in ("inner", "left"):
        raise ValueError("range_join supports how='inner' or 'left'")
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    if bucket_width is None:
        return left.join(F.broadcast(right), cond, how)

    w = float(bucket_width)
    l_src = left
    if how == "left":
        # row id so unmatched points re-attach exactly once per input row even
        # when the left side holds duplicate rows (a whole-row exceptAll would
        # be wrong on multiplicity and shuffles the full row width).
        # monotonically_increasing_id is (partition, offset)-deterministic, so
        # the two plan branches below recompute identical ids as long as
        # ``left`` is itself deterministic (scan/projection — the normal case).
        l_src = left.withColumn("__lid", F.monotonically_increasing_id())
    l_b = l_src.withColumn("__bucket", F.floor(F.col(point_col) / w).cast("long"))
    n_buckets = (
        F.floor(F.col(hi_col) / w) - F.floor(F.col(lo_col) / w) + 1
    ).cast("int")
    r_nb = right.withColumn("__nb", n_buckets)
    r_small = (
        r_nb.where(F.col("__nb") <= max_buckets_per_range)  # guard BEFORE explode
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / w).cast("long"),
                    F.floor(F.col(hi_col) / w).cast("long"),
                )
            ),
        )
        .drop("__nb")
    )
    # intervals spanning more buckets than the explode guard allows are NOT
    # dropped: they take the broadcast nested-loop path and union back in
    # (an interval that wide matches a huge point fraction anyway, so a
    # broadcast range predicate is the right plan for it).
    r_wide = r_nb.where(F.col("__nb") > max_buckets_per_range).drop("__nb")
    bucketed = (
        l_b.join(r_small, on="__bucket", how="inner").where(cond).drop("__bucket")
    )
    wide = l_b.drop("__bucket").join(F.broadcast(r_wide), cond, "inner")
    joined = bucketed.unionByName(wide)
    if how == "inner":
        return joined
    # left join: re-attach unmatched points via anti-join on the row id
    matched = joined.select("__lid").distinct()
    unmatched = l_b.drop("__bucket").join(matched, on="__lid", how="left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    return joined.unionByName(unmatched).drop("__lid")
