"""Snapshot diff / merge laws (operators/cdc.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pytrousse_spark.operators.cdc import merge_apply, snapshot_diff


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_diff_classifies_all_three_kinds(spark):
    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)], ["k", "s", "v"]
    )
    b = spark.createDataFrame(
        [(2, "y", 20.0), (3, "z", 99.0), (4, "w", 40.0)], ["k", "s", "v"]
    )
    got = {
        r["k"]: r
        for r in snapshot_diff(a, b, ["k"], ["s", "v"]).collect()
    }
    assert set(got) == {1, 3, 4}  # key 2 unchanged -> absent
    assert got[1]["change_type"] == "delete" and got[1]["v"] is None
    assert got[3]["change_type"] == "update" and got[3]["v"] == 99.0
    assert got[3]["old_v"] == 30.0
    assert got[4]["change_type"] == "insert" and got[4]["old_v"] is None


def test_null_vs_empty_payloads_differ(spark):
    """The NUL sentinel distinguishes NULL from '' and the separator
    distinguishes ('ab','c') from ('a','bc') — no silent 'unchanged'."""
    a = spark.createDataFrame([(1, None, "c"), (2, "ab", "c")], ["k", "s", "t"])
    b = spark.createDataFrame([(1, "", "c"), (2, "a", "bc")], ["k", "s", "t"])
    got = snapshot_diff(a, b, ["k"], ["s", "t"]).collect()
    assert {r["k"]: r["change_type"] for r in got} == {1: "update", 2: "update"}


def test_merge_apply_round_trip_law(spark):
    """merge_apply(A, snapshot_diff(A, B)) == B row-for-row, on a
    hash-mutated snapshot pair like the q106 gate's."""
    from pytrousse_spark.functions.hashing import h60_seeded

    a = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("s"),
    )
    m = h60_seeded(F.col("k").cast("string"), "law") % 4
    b = (
        a.withColumn("m", m)
        .where(F.col("m") != 0)
        .select(
            "k",
            F.when(F.col("m") == 1, F.col("v") + 0.5).otherwise(F.col("v")).alias("v"),
            "s",
        )
        .unionByName(
            a.withColumn("m", m)
            .where(F.col("m") == 2)
            .select((F.col("k") + 1000).alias("k"), "v", "s")
        )
    )
    diff = snapshot_diff(a, b, ["k"], ["v", "s"]).select(
        "k", "change_type", "v", "s"
    )
    rebuilt = merge_apply(a, diff, ["k"])
    assert _rows(rebuilt) == _rows(b)
    # and an empty diff is a no-op
    empty = snapshot_diff(a, a, ["k"], ["v", "s"]).select(
        "k", "change_type", "v", "s"
    )
    assert empty.count() == 0
    assert _rows(merge_apply(a, empty, ["k"])) == _rows(a)


def test_scd2_history_laws(spark):
    """Current rows reproduce the new snapshot exactly; each key has at
    most one open version; changed/deleted keys carry a closed t0 row."""
    from pytrousse_spark.operators.cdc import scd2_history

    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)], ["k", "s", "v"]
    )
    b = spark.createDataFrame(
        [(2, "y", 20.0), (3, "z", 99.0), (4, "w", 40.0)], ["k", "s", "v"]
    )
    h = scd2_history(a, b, ["k"], "2024-01-01", "2024-02-01")
    rows = h.collect()
    # law 1: current rows == new snapshot
    cur = sorted((r["k"], r["s"], r["v"]) for r in rows if r["is_current"])
    assert cur == _rows(b)
    # law 2: at most one open version per key
    open_per_key = {}
    for r in rows:
        if r["valid_to"] is None:
            open_per_key[r["k"]] = open_per_key.get(r["k"], 0) + 1
    assert all(v == 1 for v in open_per_key.values())
    # law 3: closed t0 versions for deleted (1) and updated (3) keys
    closed = {r["k"]: r for r in rows if r["valid_to"] is not None}
    assert set(closed) == {1, 3}
    assert str(closed[1]["valid_from"]) == "2024-01-01"
    assert str(closed[3]["valid_to"]) == "2024-02-01"
    assert closed[3]["v"] == 30.0  # the superseded payload
    # unchanged key 2: single open row from t0
    k2 = [r for r in rows if r["k"] == 2]
    assert len(k2) == 1 and str(k2[0]["valid_from"]) == "2024-01-01"
