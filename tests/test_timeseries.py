"""resample_gapfill semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pytrousse_spark.operators.timeseries import resample_gapfill


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def test_gapfill_completes_grid_and_carries_forward(spark):
    rows = [
        # user 1: hours 0, 1, 4 observed -> 2 and 3 are gaps
        (1, _ts(0, 5), 10.0),
        (1, _ts(0, 40), 2.0),
        (1, _ts(1, 0), 5.0),
        (1, _ts(4, 59), 7.0),
        # user 2: single hour, no gaps
        (2, _ts(9, 30), 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r["user_id"], r["bucket"].hour): r
        for r in resample_gapfill(df, "user_id", "ts", "value").collect()
    }
    assert len(got) == 5 + 1  # hours 0..4 for user 1, hour 9 for user 2
    assert got[(1, 0)]["v_sum"] == 12.0 and not got[(1, 0)]["is_gap"]
    assert got[(1, 0)]["n_obs"] == 2
    assert got[(1, 2)]["is_gap"] and got[(1, 2)]["v_sum"] is None
    assert got[(1, 2)]["v_ff"] == 5.0  # carried from hour 1
    assert got[(1, 3)]["v_ff"] == 5.0
    assert got[(1, 4)]["v_ff"] == 7.0  # fresh observation resets
    assert got[(2, 9)]["n_obs"] == 1 and not got[(2, 9)]["is_gap"]
    # first bucket per key is always observed -> v_ff never NULL
    assert all(r["v_ff"] is not None for r in got.values())


def test_gapfill_grid_never_crosses_keys(spark):
    """Each key's grid spans only ITS OWN min..max; no global calendar."""
    rows = [(1, _ts(0), 1.0), (1, _ts(2), 1.0), (2, _ts(20), 1.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = resample_gapfill(df, "user_id", "ts", "value").collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["user_id"], []).append(r["bucket"].hour)
    assert sorted(per_key[1]) == [0, 1, 2]
    assert per_key[2] == [20]
