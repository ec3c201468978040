"""round_half_away must match the ENGINES' tie rule, not Python's
(ADVICE r3: an exact .5 tie fed different literals into the two engines)."""

from __future__ import annotations

import duckdb

from pytrousse_spark.functions.rounding import round_half_away


def test_ties_round_away_from_zero():
    assert round_half_away(0.5) == 1.0
    assert round_half_away(1.5) == 2.0      # banker's would give 2.0 too
    assert round_half_away(2.5) == 3.0      # banker's would give 2.0
    assert round_half_away(-2.5) == -3.0
    assert round_half_away(0.125, 2) == 0.13   # banker's: 0.12
    assert round_half_away(-0.125, 2) == -0.13


def test_matches_duckdb_round_on_ties_and_noise():
    vals = [0.5, 1.5, 2.5, -2.5, 0.125, -0.125, 3.14159, -2.71828,
            1234.56785, 0.0, -0.0, 1e-7]
    for nd in (0, 2, 4, 6):
        for v in vals:
            duck = duckdb.sql(
                f"SELECT round(CAST({v!r} AS DOUBLE), {nd})"
            ).fetchone()[0]
            assert round_half_away(v, nd) == duck, (v, nd)


def test_nan_inf_pass_through():
    import math

    assert math.isnan(round_half_away(float("nan")))
    assert round_half_away(float("inf")) == float("inf")
    assert round_half_away(float("-inf")) == float("-inf")
