"""Bounded hierarchical prefix sums (operators/_prefix.py — r10 VERDICT
item 8): exclusive below-level cumulatives with every window partition
capped at 2^20 rows, bit-identical to the plain Window.orderBy form."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from pytrousse_spark.operators._prefix import exclusive_prefix_sums


def _reference(levels: list[tuple[int, int, int]]) -> dict[int, tuple[int, int]]:
    srt = sorted(levels)
    out, run1, run2 = {}, 0, 0
    for y, c1, c2 in srt:
        out[y] = (run1, run2)
        run1 += c1
        run2 += c2
    return out


def _check(spark, levels: list[tuple[int, int, int]]) -> None:
    """Both physical routes must reproduce the brute-force reference —
    the auto router only ever trades plan shape, never values."""
    df = spark.createDataFrame(levels, "y long, c1 long, c2 long")
    want = _reference(levels)
    for strategy in ("window", "hierarchy"):
        got = {
            r["y"]: (r["__below_c1"], r["__below_c2"])
            for r in exclusive_prefix_sums(
                df, "y", ("c1", "c2"), strategy=strategy
            ).collect()
        }
        assert got == want, strategy


def test_prefix_matches_plain_window_dense(spark):
    """Dense small domain — the common case (all levels share one b1)."""
    rng = random.Random(7)
    levels = [(y, rng.randint(0, 9), rng.randint(0, 9)) for y in range(-50, 50)]
    _check(spark, levels)


def test_prefix_cardinality_stress_full_domain(spark):
    """The adversarial case the construction exists for: levels spread
    across the FULL 63-bit signed domain, so b1, b2 and b3 all take many
    values, bucket boundaries fall between neighbors, and negative
    levels exercise the arithmetic-shift ordering."""
    rng = random.Random(41)
    ys = set()
    while len(ys) < 400:
        ys.add(rng.randint(-(2**61), 2**61))
    # adversarial adjacency: pairs straddling each bucket boundary
    for s in (20, 40, 60):
        ys.update({(1 << s) - 1, 1 << s, -(1 << s), -(1 << s) - 1})
    levels = [(y, rng.randint(0, 5), rng.randint(0, 5)) for y in sorted(ys)]
    _check(spark, levels)


def test_prefix_single_level_and_empty(spark):
    _check(spark, [(123456789, 3, 4)])
    df = spark.createDataFrame([], "y long, c1 long, c2 long")
    assert exclusive_prefix_sums(df, "y", ("c1", "c2")).count() == 0


def test_prefix_equals_global_window_on_random(spark):
    """Direct bit-equality against the single global window it replaces."""
    rng = random.Random(97)
    ys = rng.sample(range(-(10**12), 10**12), 300)
    levels = [(y, rng.randint(0, 99), rng.randint(0, 99)) for y in ys]
    df = spark.createDataFrame(levels, "y long, c1 long, c2 long")
    w = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    plain = df.select(
        "y",
        F.coalesce(F.sum("c1").over(w), F.lit(0)).alias("b1"),
        F.coalesce(F.sum("c2").over(w), F.lit(0)).alias("b2"),
    ).toPandas().sort_values("y").reset_index(drop=True)
    ours = (
        exclusive_prefix_sums(df, "y", ("c1", "c2"))
        .select("y", F.col("__below_c1").alias("b1"),
                F.col("__below_c2").alias("b2"))
        .toPandas().sort_values("y").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, ours)


def test_mann_whitney_unchanged_after_rewire(spark):
    """q297's operator must produce the identical single row it did with
    the plain level window — pinned against a brute-force pairwise
    computation on small data with ties and negatives."""
    from pytrousse_spark.operators.classifier import mann_whitney_u

    rng = random.Random(13)
    rows = [("a", round(rng.uniform(-3, 5), 2)) for _ in range(40)] + [
        ("b", round(rng.uniform(-4, 4), 2)) for _ in range(35)
    ]
    rows += [("a", 1.25), ("b", 1.25), ("a", 1.25)]  # forced ties
    df = spark.createDataFrame(rows, "g string, v double")
    got = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]

    xs = [int(round(v * 100)) for g, v in rows if g == "a"]
    ys = [int(round(v * 100)) for g, v in rows if g == "b"]
    wins = sum(1 for x in xs for y in ys if x > y)
    loss = sum(1 for x in xs for y in ys if x < y)
    ties = sum(1 for x in xs for y in ys if x == y)
    n1, n2 = len(xs), len(ys)
    u1 = wins + ties / 2.0
    assert got["n1"] == n1 and got["n2"] == n2
    assert abs(got["u1"] - u1) < 1e-6
    assert abs(got["cliffs_delta"] - (wins - loss) / (n1 * n2)) < 1e-6
    from collections import Counter

    tt = sum(t**3 - t for t in Counter(xs + ys).values())
    nn = n1 + n2
    var = n1 * n2 / 12.0 * (nn + 1 - tt / (nn * (nn - 1)))
    z = (u1 - n1 * n2 / 2.0) / var**0.5
    assert abs(got["z"] - z) < 1e-6


def test_prefix_property_random_domains(spark):
    """Property pin across structured random domains: clustered,
    sparse-huge, negative-heavy, and boundary-straddling level sets all
    reproduce the brute-force exclusive prefix sums exactly."""
    import random

    rng = random.Random(2024)
    # (generator, target distinct count) — each target must stay below
    # the generator's achievable distinct count or the sampling loop
    # never terminates: the boundary cluster yields exactly 27 values
    # (the 0/±1 bases overlap into {-3..3}, plus 5 around each of
    # ±2^20 and ±2^40)
    domains = [
        (lambda: rng.randint(-5, 5), 11),                     # dense tiny
        (lambda: rng.randint(-(2**63) + 1, 2**63 - 1), 120),  # full 64-bit
        (
            lambda: rng.choice(
                [0, 1, -1, 2**20, -(2**20), 2**40, -(2**40)]
            )
            + rng.randint(-2, 2),
            24,
        ),                                                    # boundary cluster
        (lambda: rng.randint(0, 2**62) * rng.choice([1, -1]), 120),
    ]
    for gen, target in domains:
        ys = set()
        while len(ys) < target:
            ys.add(gen())
        levels = [(y, rng.randint(0, 7), rng.randint(0, 7)) for y in ys]
        _check(spark, levels)


def test_next_level_matches_plain_lead(spark):
    """next_level must equal the global lead() it replaces, including
    across every bucket boundary and at the global max (NULL)."""
    from pytrousse_spark.operators._prefix import next_level

    rng = random.Random(61)
    ys = set()
    while len(ys) < 300:
        ys.add(rng.randint(-(2**61), 2**61))
    for s in (20, 40, 60):
        ys.update({(1 << s) - 1, 1 << s, (1 << s) + 1,
                   -(1 << s), -(1 << s) - 1})
    levels = sorted(ys)
    df = spark.createDataFrame([(y, 1, 1) for y in levels],
                               "y long, c1 long, c2 long")
    want = {y: (levels[i + 1] if i + 1 < len(levels) else None)
            for i, y in enumerate(levels)}
    for strategy in ("window", "hierarchy"):
        got = {
            r["y"]: r["__next"]
            for r in next_level(df, "y", strategy=strategy).collect()
        }
        assert got == want, strategy


def test_next_level_single_and_dense(spark):
    from pytrousse_spark.operators._prefix import next_level

    df = spark.createDataFrame([(42, 1, 1)], "y long, c1 long, c2 long")
    assert next_level(df, "y").collect()[0]["__next"] is None
    dense = spark.createDataFrame([(y, 1, 1) for y in range(-10, 10)],
                                  "y long, c1 long, c2 long")
    got = {r["y"]: r["__next"] for r in next_level(dense, "y").collect()}
    assert got == {y: (y + 1 if y < 9 else None) for y in range(-10, 10)}


def _grouped_levels(rng, groups):
    """Per-group level sets: full-domain spread + bucket-boundary
    straddlers, with DIFFERENT levels per group so cross-group bleed
    would be caught (a shared level with different counts per group)."""
    rows = []
    for gi, g in enumerate(groups):
        ys = set()
        while len(ys) < 80:
            ys.add(rng.randint(-(2**61), 2**61))
        for s in (20, 40, 60):
            ys.update({(1 << s) - 1, 1 << s, -(1 << s), -(1 << s) - 1})
        rows += [
            (g, y, rng.randint(0, 5) + gi, rng.randint(0, 5))
            for y in sorted(ys)
        ]
    return rows


def test_prefix_grouped_matches_per_group_reference(spark):
    """Grouped hierarchy == per-group brute force, both strategies —
    group keys threaded through every tier must isolate groups exactly
    (shared levels appear in several groups with different counts)."""
    from pytrousse_spark.operators._prefix import exclusive_prefix_sums

    rng = random.Random(303)
    rows = _grouped_levels(rng, ["a", "b", "c"])
    df = spark.createDataFrame(rows, "g string, y long, c1 long, c2 long")
    want = {}
    for g in ("a", "b", "c"):
        ref = _reference([(y, c1, c2) for gg, y, c1, c2 in rows if gg == g])
        want.update({(g, y): v for y, v in ref.items()})
    for strategy in ("window", "hierarchy"):
        got = {
            (r["g"], r["y"]): (r["__below_c1"], r["__below_c2"])
            for r in exclusive_prefix_sums(
                df, "y", ("c1", "c2"), strategy=strategy, group_cols=("g",)
            ).collect()
        }
        assert got == want, strategy


def test_next_level_grouped_matches_per_group_lead(spark):
    """Grouped next_level == per-group lead: each group's max is NULL
    (never the next group's min), bucket boundaries patch within the
    group only."""
    from pytrousse_spark.operators._prefix import next_level

    rng = random.Random(404)
    rows = _grouped_levels(rng, ["a", "b"])
    df = spark.createDataFrame(rows, "g string, y long, c1 long, c2 long")
    want = {}
    for g in ("a", "b"):
        ys = sorted(y for gg, y, _, _ in rows if gg == g)
        want.update({
            (g, y): (ys[i + 1] if i + 1 < len(ys) else None)
            for i, y in enumerate(ys)
        })
    for strategy in ("window", "hierarchy"):
        got = {
            (r["g"], r["y"]): r["__next"]
            for r in next_level(
                df, "y", strategy=strategy, group_cols=("g",)
            ).collect()
        }
        assert got == want, strategy


def test_grouped_route_counts_largest_group(spark):
    """Auto routing with groups decides on the LARGEST group's level
    count, not the total frame size."""
    from pytrousse_spark.operators import _prefix

    rows = [("a", y, 1, 1) for y in range(6)] + [
        ("b", y, 1, 1) for y in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, y long, c1 long, c2 long")
    assert _prefix.route_for(df, ("g",)) == "window"
    # shrink the budget so the 6-level group trips the hierarchy even
    # though no single group exceeds the real 2^20 budget
    orig = _prefix._AUTO_MAX_LEVELS
    _prefix._AUTO_MAX_LEVELS = 5
    try:
        assert _prefix.route_for(df, ("g",)) == "hierarchy"
    finally:
        _prefix._AUTO_MAX_LEVELS = orig
