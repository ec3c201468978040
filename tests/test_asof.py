"""As-of join semantics (backward, inclusive, per-key)."""

from __future__ import annotations

import datetime as dt

import pytest

from pytrousse_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00")),
            (2, "u1", _ts("2024-01-01 12:00")),
            (3, "u2", _ts("2024-01-01 11:00")),
            (4, "u3", _ts("2024-01-01 09:00")),
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts("2024-01-01 09:30")),
            (101, "u1", _ts("2024-01-01 11:00")),
            (102, "u2", _ts("2024-01-01 11:00")),   # exactly simultaneous
            (103, "u3", _ts("2024-01-01 10:00")),   # after left → no match
        ],
        "rid long, user string, rts timestamp",
    )
    out = asof_join(left, right, on="user", left_time="ts", right_time="rts")
    got = {r["event_id"]: r["rid_right"] for r in out.collect()}
    assert got[1] == 100          # only 09:30 precedes 10:00
    assert got[2] == 101          # latest preceding
    assert got[3] == 102          # equal timestamp matches (inclusive)
    assert got[4] is None         # nothing precedes → NULL


def test_asof_attaches_whole_row_with_nulls(spark):
    """A NULL field in the most recent matching right row must stay NULL —
    not be backfilled from an older right row (atomic-row semantics, matching
    pandas merge_asof / DuckDB ASOF JOIN)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 12:00"))],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts("2024-01-01 10:00"), 5.0, "old"),
            (101, "u1", _ts("2024-01-01 11:00"), None, "new"),
        ],
        "rid long, user string, rts timestamp, score double, tag string",
    )
    out = asof_join(left, right, on="user", left_time="ts", right_time="rts")
    row = out.collect()[0]
    assert row["rid_right"] == 101
    assert row["tag_right"] == "new"
    assert row["score_right"] is None      # NOT 5.0 from the older row


def test_asof_preserves_left_rows(spark):
    left = spark.createDataFrame(
        [(i, "u", _ts(f"2024-01-01 0{i}:00")) for i in range(1, 6)],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(9, "other_user", _ts("2024-01-01 00:00"))],
        "rid long, user string, rts timestamp",
    )
    out = asof_join(left, right, on="user", left_time="ts", right_time="rts")
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["rid_right"] is None for r in rows)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 90.0])
def test_asof_matches_pandas_merge_asof(spark, direction, tolerance):
    """pandas.merge_asof is the reference semantics for every direction and
    tolerance — randomized keys/times, deterministic seed, unique right
    (key, time) pairs (both engines' tie rule then coincide)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 120, 80
    lpd = pd.DataFrame({
        "k": rng.integers(0, 4, n_l).astype("int64"),
        "t": rng.integers(0, 3000, n_l).astype("int64"),
        "lv": np.arange(n_l, dtype="int64"),
    })
    rpd = pd.DataFrame({
        "k": rng.integers(0, 4, n_r).astype("int64"),
        "rt": rng.integers(0, 3000, n_r).astype("int64"),
        "rv": np.arange(n_r, dtype="int64"),
    }).drop_duplicates(["k", "rt"])

    kw = dict(tolerance=int(tolerance)) if tolerance is not None else {}
    want = pd.merge_asof(
        lpd.sort_values("t"), rpd.sort_values("rt"),
        left_on="t", right_on="rt", by="k", direction=direction, **kw,
    ).sort_values("lv")

    out = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        on="k", left_time="t", right_time="rt",
        direction=direction, tolerance=tolerance,
    ).toPandas().sort_values("lv")

    got = out["rv_right"].astype("float64").to_numpy()
    exp = want["rv"].astype("float64").to_numpy()
    assert len(got) == len(exp)
    assert ((got == exp) | (np.isnan(got) & np.isnan(exp))).all()


def test_asof_nearest_on_dates(spark):
    """direction='nearest' and tolerance must work on DateType time columns
    (dates route through timestamp for the distance arithmetic)."""
    left = spark.createDataFrame(
        [(1, "u", dt.date(2024, 1, 10))], "id long, user string, d date"
    )
    right = spark.createDataFrame(
        [(100, "u", dt.date(2024, 1, 7)), (200, "u", dt.date(2024, 1, 12))],
        "rid long, user string, rd date",
    )
    row = asof_join(
        left, right, on="user", left_time="d", right_time="rd",
        direction="nearest",
    ).collect()[0]
    assert row["rid_right"] == 200      # 2 days away beats 3 days
    row2 = asof_join(
        left, right, on="user", left_time="d", right_time="rd",
        direction="nearest", tolerance=86400.0,   # 1 day: neither qualifies
    ).collect()[0]
    assert row2["rid_right"] is None
