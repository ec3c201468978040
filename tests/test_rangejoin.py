"""Range-join strategies: broadcast nested-loop vs bucketed equi-join."""

from __future__ import annotations

import pytest

from pytrousse_spark.operators.rangejoin import range_join


@pytest.fixture
def points(spark):
    return spark.createDataFrame(
        [(i, float(i)) for i in range(50)], ["pid", "v"]
    )


@pytest.fixture
def ranges(spark):
    return spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 20.0), ("c", 45.0, 49.0)],
        ["name", "lo", "hi"],
    )


def _pairs(df):
    return sorted((r["pid"], r["name"]) for r in df.collect())


def test_bucketed_matches_broadcast(points, ranges):
    bc = range_join(points, ranges, "v", "lo", "hi")
    bk = range_join(points, ranges, "v", "lo", "hi", bucket_width=3.0)
    assert _pairs(bc) == _pairs(bk)
    got = _pairs(bk)
    assert (7, "a") in got and (7, "b") in got      # overlap matched twice
    assert (30, "a") not in got


def test_left_join_keeps_unmatched(points, ranges):
    out = range_join(points, ranges, "v", "lo", "hi", how="left", bucket_width=5.0)
    rows = out.collect()
    unmatched = [r["pid"] for r in rows if r["name"] is None]
    assert 30 in unmatched and 44 in unmatched
    # matched points appear once per matching range and not in unmatched
    assert sorted(r["pid"] for r in rows if r["name"] is not None and r["pid"] == 7) == [7, 7]


def test_guard_drops_oversized_ranges(spark, points):
    huge = spark.createDataFrame([("x", 0.0, 1e9)], ["name", "lo", "hi"])
    out = range_join(points, huge, "v", "lo", "hi", bucket_width=1.0,
                     max_buckets_per_range=100)
    assert out.count() == 0  # range excluded by the guard, not exploded
