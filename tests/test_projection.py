"""JL random projection laws (operators/projection.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pytrousse_spark.operators.projection import (
    random_project,
    rp_signs,
)


def test_sign_matrix_is_deterministic_and_balanced():
    a = rp_signs(64, 16, "s")
    assert a == rp_signs(64, 16, "s")
    assert a != rp_signs(64, 16, "t")
    flat = [x for row in a for x in row]
    assert set(flat) == {-1, 1}
    # parity of a decent hash: roughly half of 1024 entries are +1
    assert 400 < flat.count(1) < 624


def test_projection_preserves_norms_and_angles(spark):
    """E[|y|^2] = |x|^2 under the 1/sqrt(k) scaling: mean squared-norm
    ratio near 1 across vectors, every ratio in a wide JL band, and
    pairwise dot products correlate with the originals."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(64)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    proj = random_project(df, "embedding", 64, 16, salt="law")
    got = proj.select(
        "vec_id",
        F.aggregate(
            "projected", F.lit(0.0), lambda a, v: a + v * v
        ).alias("psq"),
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, v: a + v.cast("double") * v.cast("double"),
        ).alias("osq"),
    ).collect()
    ratios = [r["psq"] / r["osq"] for r in got]
    assert 0.85 < sum(ratios) / len(ratios) < 1.15
    assert all(0.2 < r < 2.5 for r in ratios)

    # angle preservation on a driver-side sample of pairs
    vecs = {r[0]: r[1] for r in rows}
    pvecs = {
        r["vec_id"]: r["projected"]
        for r in proj.select("vec_id", "projected").collect()
    }

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        return d / math.sqrt(
            sum(a * a for a in u) * sum(b * b for b in v)
        )

    # angle preservation needs pairs whose TRUE cosines span a range
    # (random gaussian pairs all sit near cos≈0, where JL noise ~1/√k
    # dominates): build pairs at known angles θ ∈ [0, π/2].
    angled = []
    for i in range(30):
        theta = (i / 29.0) * (math.pi / 2)
        u = vecs[2 * i]
        w = vecs[2 * i + 1]
        # orthogonalize w against u, then mix at angle theta
        du = sum(a * b for a, b in zip(u, w)) / sum(a * a for a in u)
        w_perp = [b - du * a for a, b in zip(u, w)]
        nu = math.sqrt(sum(a * a for a in u))
        nw = math.sqrt(sum(b * b for b in w_perp))
        v = [
            math.cos(theta) * a / nu + math.sin(theta) * b / nw
            for a, b in zip(u, w_perp)
        ]
        angled.append((1000 + i, u, v, math.cos(theta)))
    df2 = spark.createDataFrame(
        [(i, u) for i, u, _, _ in angled]
        + [(i + 500, v) for i, _, v, _ in angled],
        ["vec_id", "embedding"],
    )
    p2 = {
        r["vec_id"]: r["projected"]
        for r in random_project(df2, "embedding", 64, 16, salt="law")
        .select("vec_id", "projected")
        .collect()
    }
    errs = [
        abs(cos(p2[i], p2[i + 500]) - true_cos)
        for i, _, _, true_cos in angled
    ]
    assert sum(errs) / len(errs) < 0.15
    assert max(errs) < 0.45


def test_projection_plan_has_no_shuffle(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(j)) for j in range(64)]).alias("embedding"),
    )
    proj = random_project(df, "embedding", 64, 16)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca2_recovers_planted_direction(spark):
    """Points on the line y = 2x (+ tiny symmetric jitter in the
    orthogonal direction): the first component must align with
    (1,2)/sqrt(5) and explain ~all variance; a perfect circle-ish
    symmetric cloud -> evr ~ 0.5; constant input -> single bin 0 with
    NULL loadings."""
    from pytrousse_spark.operators.projection import pca2

    rows = []
    for i in range(-50, 51):
        t = float(i)
        # along (1,2) with +/- jitter along (-2,1)/sqrt(5)
        j = 0.01 if i % 2 == 0 else -0.01
        rows.append((t - 2 * j, 2 * t + j))
    df = spark.createDataFrame(rows, "x double, y double")
    out = pca2(df, "x", "y").collect()
    ux, uy, evr = out[0]["ux"], out[0]["uy"], out[0]["evr"]
    import math

    assert abs(ux - 1 / math.sqrt(5)) < 1e-3
    assert abs(uy - 2 / math.sqrt(5)) < 1e-3
    assert evr > 0.999
    # scores are mean-centred: weighted mean ~ 0
    tot = sum(r["n"] * r["mean_score"] for r in out)
    assert abs(tot) < 1.0
    # symmetric: vx == vy, cxy == 0 -> axis-aligned loadings, evr 0.5
    sym = spark.createDataFrame(
        [(1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0)],
        "x double, y double",
    )
    r = pca2(sym, "x", "y").collect()[0]
    assert (r["ux"], r["uy"]) == (1.0, 0.0) and r["evr"] == 0.5

    const = spark.createDataFrame(
        [(3.0, 4.0)] * 5, "x double, y double"
    )
    rows = pca2(const, "x", "y").collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0
    # degenerate cloud: conventional axis loading, NULL evr/score-scale
    assert (rows[0]["ux"], rows[0]["uy"]) == (1.0, 0.0)
    assert rows[0]["evr"] is None
