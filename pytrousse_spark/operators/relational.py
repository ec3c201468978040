"""Relational passthrough utilities beyond the Dataset methods (SURVEY.md
§2.3/§4): skew-aware joins and partitioned/bucketed sinks.

Catalyst + AQE already handle most physical decisions; these helpers cover
the two places a 100 TB pipeline still needs explicit intervention: joins on
heavily-skewed keys and layout-controlled output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with key salting for skewed left keys.

    The left (big, skewed) side gets a random salt in [0, salt_buckets); the
    right side is exploded ``salt_buckets``× so every (key, salt) pair
    matches. This splits a hot key's rows across ``salt_buckets`` tasks
    instead of one straggler.

    AQE's skew-join handling covers sort-merge cases automatically; salting
    remains necessary when a single key exceeds what one task can hold, or
    when AQE is unavailable (e.g. inside some streaming plans).

    Only columns from ``left`` plus ``right``'s non-key columns survive
    (standard equi-join projection).
    """
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(salted_right, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "error",
    max_records_per_file: int | None = None,
) -> None:
    """Partition-pruned parquet layout: downstream filters on
    ``partition_by`` columns skip whole directories."""
    writer = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    num_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates join keys so later joins on
    ``bucket_by`` skip the shuffle entirely (SortMergeJoin with no Exchange).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name, format="parquet")
