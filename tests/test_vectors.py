"""Pins for functions/vectors literal builders (r12 optimization round).

``lit_doubles`` / ``lit_double_matrix`` exist purely to cut driver-side
py4j round-trips (guide §1: one IVF-PQ plan build spent 6.2 s in py4j
socket reads building per-element literals); they MUST be plan- and
bit-equivalent to the per-element ``F.array(*[F.lit(x) ...])`` form they
replaced, or every codebook/centroid consumer drifts.
"""

from __future__ import annotations

import math
import random
import struct

from pyspark.sql import functions as F

from pytrousse_spark.functions.vectors import lit_double_matrix, lit_doubles


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_lit_doubles_equivalent_to_per_element_lits(spark):
    random.seed(7)
    vals = [random.uniform(-1e6, 1e6) for _ in range(257)]
    vals += [0.0, -0.0, 1e-300, -1.7e308, 0.1, 2.0 / 3.0, 1.25e-17]
    df = spark.range(1)
    a = df.select(lit_doubles(vals).alias("v"))
    b = df.select(F.array(*[F.lit(float(x)) for x in vals]).alias("v"))
    # identical analyzed plan, not merely equal values
    assert a.sameSemantics(b)
    ra = a.collect()[0]["v"]
    rb = b.collect()[0]["v"]
    assert len(ra) == len(rb) == len(vals)
    assert all(_bits(x) == _bits(y) for x, y in zip(ra, rb))


def test_lit_double_matrix_equivalent(spark):
    random.seed(11)
    rows = [[random.gauss(0, 1) for _ in range(8)] for _ in range(16)]
    df = spark.range(1)
    a = df.select(lit_double_matrix(rows).alias("v"))
    b = df.select(
        F.array(
            *[F.array(*[F.lit(float(x)) for x in r]) for r in rows]
        ).alias("v")
    )
    assert a.sameSemantics(b)
    ra = a.collect()[0]["v"]
    rb = b.collect()[0]["v"]
    assert all(
        _bits(x) == _bits(y) for rx, ry in zip(ra, rb) for x, y in zip(rx, ry)
    )


def test_lit_doubles_specials(spark):
    vals = [float("inf"), float("-inf"), float("nan")]
    out = spark.range(1).select(lit_doubles(vals).alias("v")).collect()[0]["v"]
    assert out[0] == math.inf and out[1] == -math.inf and math.isnan(out[2])
