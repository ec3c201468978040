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


def test_wide_ranges_route_through_broadcast_not_dropped(spark, points):
    """Intervals wider than the explode guard must still match (broadcast
    nested-loop path), never be silently dropped."""
    huge = spark.createDataFrame([("x", 0.0, 1e9)], ["name", "lo", "hi"])
    out = range_join(points, huge, "v", "lo", "hi", bucket_width=1.0,
                     max_buckets_per_range=100)
    assert out.count() == 50  # every point is inside [0, 1e9]


def test_mixed_small_and_wide_ranges(spark, points, ranges):
    wide = spark.createDataFrame([("w", -1.0, 1e9)], ["name", "lo", "hi"])
    both = ranges.unionByName(wide)
    out = range_join(points, both, "v", "lo", "hi", bucket_width=3.0,
                     max_buckets_per_range=50)
    ref = range_join(points, both, "v", "lo", "hi")  # broadcast NL oracle
    assert _pairs(out) == _pairs(ref)
    assert sum(1 for p in _pairs(out) if p[1] == "w") == 50


def test_left_join_duplicate_left_rows(spark, ranges):
    """Duplicate left rows must each re-attach independently — a whole-row
    exceptAll would collapse multiplicity."""
    pts = spark.createDataFrame(
        [(1, 7.0), (1, 7.0), (2, 30.0), (2, 30.0)], ["pid", "v"]
    )
    out = range_join(pts, ranges, "v", "lo", "hi", how="left", bucket_width=5.0)
    rows = out.collect()
    # each 7.0 copy matches ranges a and b → 4 matched rows
    assert sum(1 for r in rows if r["pid"] == 1 and r["name"] is not None) == 4
    # each 30.0 copy is unmatched → exactly 2 NULL rows, not 1
    assert sum(1 for r in rows if r["pid"] == 2) == 2
    assert all(r["name"] is None for r in rows if r["pid"] == 2)


def test_interval_join_matches_nested_loop(spark):
    """Bucketed interval-overlap join must equal the broadcast nested-loop
    ground truth — randomized intervals, widths that force both the
    canonical-bucket dedup and the wide-interval recovery paths."""
    import numpy as np

    from pytrousse_spark.operators.rangejoin import interval_join

    rng = np.random.default_rng(11)
    lrows = [
        (int(i), float(lo), float(lo + ln))
        for i, (lo, ln) in enumerate(
            zip(rng.uniform(0, 1000, 150), rng.uniform(0, 80, 150))
        )
    ]
    # a few very wide left and right intervals to exercise the guard
    lrows += [(900, 0.0, 990.0), (901, 10.0, 999.0)]
    rrows = [
        (int(1000 + i), float(lo), float(lo + ln))
        for i, (lo, ln) in enumerate(
            zip(rng.uniform(0, 1000, 100), rng.uniform(0, 60, 100))
        )
    ]
    rrows += [(1900, 5.0, 980.0)]
    l = spark.createDataFrame(lrows, "lid long, l_lo double, l_hi double")
    r = spark.createDataFrame(rrows, "rid long, r_lo double, r_hi double")

    truth = sorted(
        (row["lid"], row["rid"])
        for row in interval_join(
            l, r, "l_lo", "l_hi", "r_lo", "r_hi"
        ).collect()
    )
    for width, guard in ((10.0, 10_000), (10.0, 20), (37.0, 5)):
        got = sorted(
            (row["lid"], row["rid"])
            for row in interval_join(
                l, r, "l_lo", "l_hi", "r_lo", "r_hi",
                bucket_width=width, max_buckets_per_range=guard,
            ).collect()
        )
        assert got == truth, (width, guard)

    # left mode: every left row appears; matched multiplicity preserved
    left_out = interval_join(
        l, r, "l_lo", "l_hi", "r_lo", "r_hi",
        how="left", bucket_width=10.0, max_buckets_per_range=20,
    ).collect()
    n_matches = len(truth)
    matched_left = {a for a, _ in truth}
    unmatched = [row for row in left_out if row["rid"] is None]
    assert len(left_out) == n_matches + len(unmatched)
    assert {row["lid"] for row in unmatched} == (
        {row["lid"] for row in l.collect()} - matched_left
    )
