"""Snapshot diff + merge — incremental (CDC-style) dataset maintenance.

A 100 TB training corpus is not rebuilt from scratch per release; it is
maintained as snapshots, and every downstream consumer (dedup indexes,
quality gates, packed shards) wants the CHANGE SET between two snapshots:
which keys appeared, disappeared, or changed payload. ``snapshot_diff``
computes that change set with one co-partitioned full-outer join;
``merge_apply`` replays a change set onto the old snapshot and provably
reconstructs the new one (the round-trip law is pinned in
tests/test_cdc.py). Spark OSS has no MERGE INTO without a table format
that provides it; this pair expresses the same maintenance loop in plain
DataFrame ops.

Scale design
------------
* Each side is reduced MAP-SIDE to ``(key, fingerprint, payload)`` before
  the join, so the shuffle carries one hash instead of a wide row
  comparison, and the classification is a single hash equality.
* The diff is ONE shuffle per side, keyed by the snapshot key. At rest,
  write both snapshots bucketed by the key (see operators/relational
  bucketing / q108) and the diff becomes exchange-free.
* The fingerprint compares the two sides WITHIN one engine only (it is
  never emitted), so engine-specific value formatting cannot break
  cross-engine parity of the classification.
* ``merge_apply`` is an anti-join on the (delete ∪ update) keyset plus a
  union of the (insert ∪ update) new rows — when the change set is small
  relative to the snapshot (the steady-state case), AQE broadcasts it and
  the old snapshot never shuffles.

Reference parity: the reference has no incremental maintenance at all
(its datasets are eager in-memory frames, src/trousse/dataset.py) — this
module is part of the beyond-reference pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: unit separator / NUL sentinels for fingerprint serialization.
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: list[str]) -> Column:
    """md5 fingerprint of the named columns (order-significant).

    NULL maps to a NUL sentinel so (NULL) and ('') differ; values join on
    the unit separator so ('ab','c') and ('a','bc') differ. Only hash
    EQUALITY between rows of the same engine is meaningful — the digest
    is engine-portable for ints/strings/decimals but double formatting
    may differ across engines, so callers must not emit it for parity.
    """
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change set between two snapshots sharing a schema.

    Returns one row per changed key: the key columns, ``change_type`` in
    {'insert','delete','update'}, and the new-side payload columns (NULL
    for deletes). Unchanged keys are dropped in the join output filter —
    the steady-state 99% never leaves the shuffle reader.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    payload = compare_cols

    def _side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"{tag}_{k}") for k in key_cols],
            row_fingerprint(payload).alias(f"{tag}_fp"),
            *[F.col(c).alias(f"{tag}_{c}") for c in payload],
        )

    a = _side(old, "a")
    b = _side(new, "b")
    cond = None
    for k in key_cols:
        eq = a[f"a_{k}"] == b[f"b_{k}"]
        cond = eq if cond is None else cond & eq
    joined = a.join(b, cond, "full_outer")
    a_key0, b_key0 = F.col(f"a_{key_cols[0]}"), F.col(f"b_{key_cols[0]}")
    change = (
        F.when(a_key0.isNull(), F.lit("insert"))
        .when(b_key0.isNull(), F.lit("delete"))
        .when(F.col("a_fp") != F.col("b_fp"), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"b_{k}"), F.col(f"a_{k}")).alias(k)
                for k in key_cols
            ],
            "change_type",
            *[F.col(f"b_{c}").alias(c) for c in payload],
            *[F.col(f"a_{c}").alias(f"old_{c}") for c in payload],
        )
    )


def merge_apply(
    old: DataFrame, changes: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Replay a :func:`snapshot_diff` change set onto ``old``.

    new = (old ⟕̸ keys(delete ∪ update)) ∪ rows(insert ∪ update) — the
    anti side is the change keyset (small in steady state → broadcast),
    and the law ``merge_apply(A, snapshot_diff(A, B)) ≡ B`` holds
    row-for-row (pinned in tests/test_cdc.py).
    """
    payload = [c for c in old.columns if c not in key_cols]
    gone = changes.where(F.col("change_type").isin("delete", "update")).select(
        *key_cols
    )
    fresh = changes.where(F.col("change_type").isin("insert", "update")).select(
        *key_cols, *payload
    )
    return old.join(gone, key_cols, "left_anti").unionByName(fresh)


def snapshot_diff_sql(
    old_subquery: str,
    new_subquery: str,
    key_cols: list[str],
    compare_cols: list[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff` — same full-outer join, same
    NUL/US fingerprint serialization, same classification rule."""

    def fp(tag: str) -> str:
        parts = ", ".join(
            f"coalesce(CAST({tag}.{c} AS VARCHAR), chr(0))" for c in compare_cols
        )
        return f"md5(concat_ws(chr(31), {parts}))"

    on = " AND ".join(f"a.{k} = b.{k}" for k in key_cols)
    keys = ", ".join(
        f"coalesce(b.{k}, a.{k}) AS {k}" for k in key_cols
    )
    newp = ", ".join(f"b.{c} AS {c}" for c in compare_cols)
    oldp = ", ".join(f"a.{c} AS old_{c}" for c in compare_cols)
    return f"""
    SELECT {keys},
           CASE WHEN a.{key_cols[0]} IS NULL THEN 'insert'
                WHEN b.{key_cols[0]} IS NULL THEN 'delete'
                WHEN {fp('a')} <> {fp('b')} THEN 'update'
           END AS change_type,
           {newp}, {oldp}
    FROM ({old_subquery}) a FULL OUTER JOIN ({new_subquery}) b ON {on}
    WHERE a.{key_cols[0]} IS NULL OR b.{key_cols[0]} IS NULL
       OR {fp('a')} <> {fp('b')}
    """
