"""Driver-side rounding that matches the engines' ``round``.

Python's built-in ``round`` is banker's rounding (ties to even); DuckDB's
``round(DOUBLE, n)`` and Spark's ``F.round`` break ties AWAY from zero.
Any driver-side round whose result is replayed by a SQL twin (k-means
centroid literals, PQ codebooks, sketch estimates) must use the engines'
rule, or an exact .5 tie feeds different literals into the two engines and
breaks bit-for-bit parity.

``round_half_away`` mirrors the scaled-multiply formulation the engines
use (round(x * 10^n) / 10^n with ties away from zero), so the driver sees
the same binary double the SQL twin computes.
"""

from __future__ import annotations

import math


def round_half_away(x: float, ndigits: int = 0) -> float:
    """Round ``x`` to ``ndigits`` decimals, ties away from zero.

    Matches DuckDB ``round(DOUBLE, n)`` / C ``std::round`` semantics:
    the value is scaled by 10^n in double precision, rounded half away
    from zero, and scaled back — NOT Python's banker's rounding and NOT
    decimal-string re-parsing.
    """
    if x != x or math.isinf(x):  # NaN / inf pass through
        return x
    scale = 10.0 ** ndigits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale
