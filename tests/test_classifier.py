"""In-engine logistic regression trainer (operators/classifier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pytrousse_spark.operators.classifier import (
    logreg_quality_gate,
    logreg_train,
    quality_features,
)


def test_gd_learns_a_linear_boundary(spark):
    """On a separable synthetic set (y = x1 > 0.5 with noise features),
    GD puts the dominant positive weight on x1 and classifies well."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(400):
        x1 = rng.random()
        rows.append(
            (
                1.0 if x1 > 0.5 else 0.0,
                round(x1, 6),
                round(rng.random(), 6),
                round(rng.random(), 6),
            )
        )
    feat = spark.createDataFrame(rows, ["y", "x1", "x2", "x3"])
    w = logreg_train(feat, iters=25, lr=5.0)
    assert w[1] > 2.0  # signal feature dominates
    assert abs(w[2]) < w[1] / 3 and abs(w[3]) < w[1] / 3
    # decision boundary near x1 = 0.5: -w0/w1 within a loose band
    mid = -w[0] / w[1]
    assert 0.3 < mid < 0.7


def test_gate_trains_to_high_accuracy_on_documents(spark):
    from pytrousse_spark.io import read_parquet_df

    d = read_parquet_df(spark, "/root/testdata/sf0.01/documents.parquet")
    row = logreg_quality_gate(
        d, "text", (F.col("n_chars") > 300), iters=20, lr=5.0
    ).first()
    assert row["accuracy"] > 0.95
    assert row["w1"] > 1.0  # length feature carries the signal
    assert row["tp"] + row["fp"] + row["tn"] + row["fn"] == 500


def test_features_are_rounded_and_bounded(spark):
    d = spark.createDataFrame(
        [(1, "The quick brown fox and the dog", "en")],
        ["id", "text", "lang"],
    )
    r = quality_features(d, "text", (F.col("lang") == "en")).first()
    assert r["y"] == 1.0
    assert 0.0 <= r["x2"] <= 1.0 and 0.0 <= r["x3"] <= 1.0
    # 7 tokens / 100
    assert r["x1"] == 0.07


def test_ols_recovers_planted_linear_law(spark):
    """y = 3 + 2*x1 - 0.5*x2 exactly -> coefficients recovered, r2 = 1."""
    from pytrousse_spark.operators.classifier import ols_two_feature

    rows = [
        (float(i % 13), float((i * 7) % 11), 3.0 + 2.0 * (i % 13) - 0.5 * ((i * 7) % 11))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    r = ols_two_feature(df, "y", "x1", "x2").first()
    assert abs(r["b0"] - 3.0) < 1e-6
    assert abs(r["b1"] - 2.0) < 1e-6
    assert abs(r["b2"] + 0.5) < 1e-6
    assert r["r2"] == 1.0
    assert r["n"] == 200


def test_ols_singular_matrix_yields_nulls_on_both_engines(spark):
    """Round-5 ADVICE fix: constant/collinear features (det == 0) emit
    NULL coefficients — matching ols_grouped — instead of Spark-NULL vs
    DuckDB-Inf divergence."""
    import duckdb

    from pytrousse_spark.operators.classifier import (
        ols_two_feature,
        ols_two_feature_sql,
    )
    from tests.conftest import assert_df_matches_sql

    # x2 = 2*x1 -> perfectly collinear -> singular normal matrix
    rows = [(float(i % 7), 2.0 * (i % 7), float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    got = ols_two_feature(df, "y", "x1", "x2")
    r = got.first()
    assert r["b0"] is None and r["b1"] is None and r["b2"] is None
    assert r["r2"] is None and r["n"] == 50
    pdf = df.toPandas()  # noqa: F841 — registered by name below
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM pdf")
    assert_df_matches_sql(got, con, ols_two_feature_sql("t", "y", "x1", "x2"))
    con.close()


def test_chi2_hand_computed(spark):
    from pytrousse_spark.operators.classifier import chi2_feature_selection
    from pyspark.sql import functions as F

    # 4 docs; token "hit" in both positives only; "both" in one of each;
    # N=4, N1=2. For "hit": a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/16 = 4.
    rows = [
        (1, "hit both", "pos"),
        (2, "hit", "pos"),
        (3, "both miss", "neg"),
        (4, "miss", "neg"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string, cls string")
    out = {
        r["token"]: r
        for r in chi2_feature_selection(
            df, "text", "id", F.col("cls") == "pos", top_k=10, min_docs=1
        ).collect()
    }
    assert out["hit"]["chi2"] == 4.0
    assert out["hit"]["n_docs"] == 2 and out["hit"]["n_pos"] == 2
    # "both": a=1 b=1 c=1 d=1 -> det 0 -> chi2 0 (independence law)
    assert out["both"]["chi2"] == 0.0


def test_chi2_null_label_counts_negative(spark):
    from pytrousse_spark.operators.classifier import chi2_feature_selection
    from pyspark.sql import functions as F

    rows = [(1, "tok", "pos"), (2, "tok", None)]
    df = spark.createDataFrame(rows, "id bigint, text string, cls string")
    out = chi2_feature_selection(
        df, "text", "id", F.col("cls") == "pos", top_k=10, min_docs=1
    ).collect()
    (r,) = out
    assert r["n_docs"] == 2 and r["n_pos"] == 1  # NULL label -> negative


def test_ols_grouped_recovers_per_group_laws(spark):
    from pytrousse_spark.operators.classifier import ols_grouped

    rows = []
    # group A: y = 1 + 2*x1 + 3*x2 exactly; group B: y = -1 + 0.5*x1
    for i in range(30):
        x1, x2 = float(i % 7), float((i * 3) % 5)
        rows.append(("A", 1 + 2 * x1 + 3 * x2, x1, x2))
        rows.append(("B", -1 + 0.5 * x1 + 0.0 * x2, x1, x2))
    # group C: constant x1 (collinear with intercept) -> singular -> NULLs
    for i in range(5):
        rows.append(("C", float(i), 1.0, float(i)))
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    out = {r["grp"]: r for r in ols_grouped(df, "g", "y", "x1", "x2").collect()}
    a, b, c = out["A"], out["B"], out["C"]
    assert (a["b0"], a["b1"], a["b2"], a["r2"]) == (1.0, 2.0, 3.0, 1.0)
    assert (b["b0"], b["b1"], b["b2"], b["r2"]) == (-1.0, 0.5, 0.0, 1.0)
    assert c["b0"] is None and c["b1"] is None and c["b2"] is None
    assert a["n"] == 30 and c["n"] == 5


def test_calibration_bins_perfect_and_constant(spark):
    from pytrousse_spark.operators.classifier import calibration_bins

    # perfect classifier: p == y -> brier 0, gap 0 in populated bins
    rows = [(1.0, 1)] * 4 + [(0.0, 0)] * 6
    df = spark.createDataFrame(rows, ["p", "y"])
    out = calibration_bins(df, "p", "y", 10).collect()
    assert all(r["brier_total"] == 0.0 for r in out)
    pop = [r for r in out if r["n"] > 0]
    assert {r["bin"] for r in pop} == {0, 9}
    assert all(r["gap"] == 0.0 for r in pop)
    # constant 0.5 scorer: mean_pred 0.5, pos_rate = base rate,
    # brier = 0.25 everywhere
    df2 = spark.createDataFrame([(0.5, 1)] * 3 + [(0.5, 0)] * 7, ["p", "y"])
    out2 = [r for r in calibration_bins(df2, "p", "y", 10).collect() if r["n"] > 0]
    assert len(out2) == 1 and out2[0]["bin"] == 5
    assert out2[0]["mean_pred"] == 0.5
    assert out2[0]["pos_rate"] == 0.3
    assert out2[0]["brier"] == 0.25


def test_calibration_bins_edges_and_dense_frame(spark):
    from pytrousse_spark.operators.classifier import calibration_bins

    # bin-edge probabilities use floor semantics; p=1.0 clamps to the
    # last bin; empty bins present with n=0 and NULL rates
    rows = [(0.1, 0), (0.2, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, ["p", "y"])
    out = calibration_bins(df, "p", "y", 10).collect()
    assert len(out) == 10
    nz = {r["bin"]: r["n"] for r in out if r["n"] > 0}
    assert nz == {1: 1, 2: 1, 9: 1}
    empty = [r for r in out if r["n"] == 0]
    assert all(r["mean_pred"] is None and r["brier"] is None for r in empty)
    assert all(r["brier_total"] is not None for r in out)


def test_calibration_bins_rejects_bad_bins(spark):
    import pytest as _pytest

    from pytrousse_spark.operators.classifier import calibration_bins

    df = spark.createDataFrame([(0.5, 1)], ["p", "y"])
    with _pytest.raises(ValueError):
        calibration_bins(df, "p", "y", 1)


def test_auc_binned_laws(spark):
    """Rank-sum identity at bin granularity: perfect separation -> 1,
    reversed -> 0, constant scores -> 0.5 (all ties), degenerate label
    mix -> NULL, and the binned estimate tracks the exact pairwise AUC
    within the in-bin tie mass."""
    import random

    from pytrousse_spark.operators.classifier import auc_binned

    perfect = spark.createDataFrame(
        [(float(i), 1 if i >= 50 else 0) for i in range(100)], ["s", "y"]
    )
    r = auc_binned(perfect, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"], r["gini"]) == (50, 50, 1.0, 1.0)
    reverse = spark.createDataFrame(
        [(float(-i), 1 if i >= 50 else 0) for i in range(100)], ["s", "y"]
    )
    assert auc_binned(reverse, "s", "y").collect()[0]["auc"] == 0.0
    const = spark.createDataFrame(
        [(7.0, i % 2) for i in range(100)], ["s", "y"]
    )
    assert auc_binned(const, "s", "y").collect()[0]["auc"] == 0.5
    onesided = spark.createDataFrame([(1.0, 1), (2.0, 1)], ["s", "y"])
    r1 = auc_binned(onesided, "s", "y").collect()[0]
    assert r1["auc"] is None and r1["gini"] is None

    # vs exact pairwise AUC on noisy data
    rng = random.Random(7)
    rows = [
        (rng.gauss(1.0 if y else 0.0, 1.0), y)
        for y in (rng.random() < 0.4 for _ in range(2000))
    ]
    rows = [(s, 1 if y else 0) for s, y in rows]
    df = spark.createDataFrame(rows, ["s", "y"])
    got = auc_binned(df, "s", "y").collect()[0]["auc"]
    pos = sorted(s for s, y in rows if y == 1)
    neg = sorted(s for s, y in rows if y == 0)
    import bisect

    wins = sum(bisect.bisect_left(neg, s) for s in pos)
    ties = sum(
        bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s) for s in pos
    )
    exact = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(got - exact) < 2e-3  # in-bin tie mass at B=4096

    # NULL score / NULL label rows are excluded, not crashed on
    nd = spark.createDataFrame(
        [(None, 1), (1.0, None), (1.0, 1), (0.0, 0)],
        "s double, y int",
    )
    rn = auc_binned(nd, "s", "y").collect()[0]
    assert (rn["n_pos"], rn["n_neg"], rn["auc"]) == (1, 1, 1.0)


def test_roc_curve_binned_laws(spark):
    """The sweep's invariants: tp/fp cumulative from the strictest
    threshold down, tpr/fpr monotone non-decreasing as the threshold
    loosens, the loosest point is (1, 1), precision at the strictest
    occupied bin reflects its purity, and the trapezoid over the curve
    reproduces auc_binned at the same bin count."""
    import random

    from pytrousse_spark.operators.classifier import (
        auc_binned,
        roc_curve_binned,
    )

    rng = random.Random(3)
    rows = [
        (rng.gauss(1.5 if i % 3 == 0 else 0.0, 1.0), 1 if i % 3 == 0 else 0)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    pts = roc_curve_binned(df, "s", "y", 256).collect()
    # rows come strictest-first (descending bin)
    bins = [r["bin"] for r in pts]
    assert bins == sorted(bins, reverse=True)
    tprs = [r["tpr"] for r in pts]
    fprs = [r["fpr"] for r in pts]
    assert tprs == sorted(tprs) and fprs == sorted(fprs)
    assert tprs[-1] == 1.0 and fprs[-1] == 1.0
    # trapezoid integral of the curve == auc_binned at the same B
    auc = auc_binned(df, "s", "y", 256).collect()[0]["auc"]
    pts_xy = [(0.0, 0.0)] + [(r["fpr"], r["tpr"]) for r in pts]
    trap = sum(
        (x2 - x1) * (y1 + y2) / 2
        for (x1, y1), (x2, y2) in zip(pts_xy, pts_xy[1:])
    )
    assert abs(trap - auc) < 1e-6


def test_auc_binned_grouped_laws(spark):
    """Per-group AUC equals the scalar AUC computed on each group's
    slice; a NULL group key is a segment; degenerate groups carry NULL."""
    import random

    from pytrousse_spark.operators.classifier import (
        auc_binned,
        auc_binned_grouped,
    )

    rng = random.Random(5)
    rows = []
    for g, shift in (("a", 1.2), ("b", 0.3), (None, 2.0)):
        for _ in range(600):
            y = 1 if rng.random() < 0.4 else 0
            rows.append((g, rng.gauss(shift if y else 0.0, 1.0), y))
    rows.append(("onlypos", 1.0, 1))  # degenerate group
    df = spark.createDataFrame(rows, "g string, s double, y int")
    grouped = {
        r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_binned_grouped(df, "g", "s", "y").collect()
    }
    for g in ("a", "b", None):
        solo = auc_binned(df.where(
            df["g"].eqNullSafe(g)), "s", "y").collect()[0]
        assert grouped[g] == (solo["n_pos"], solo["n_neg"], solo["auc"]), g
    assert grouped["onlypos"][2] is None
    # separation ordering: stronger shift -> higher AUC
    assert grouped[None][2] > grouped["a"][2] > grouped["b"][2]


def test_conformal_interval_laws(spark):
    """Distribution-free guarantee: recounted coverage >= 1 - alpha on
    arbitrary residual distributions (the bin-edge rounding only
    widens); q_hat tracks the true residual quantile; degenerate
    (k > n) inputs yield NULL q_hat; perfect predictions give q_hat at
    the first bin edge with full coverage."""
    import random

    import pytest as _pytest

    from pytrousse_spark.operators.classifier import conformal_interval

    rng = random.Random(9)
    rows = [(0.0, rng.gauss(0, 2.0)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "pred double, actual double")
    r = conformal_interval(df, "pred", "actual", alpha=0.1).collect()[0]
    assert r["n"] == 2000
    assert r["coverage"] >= 0.9
    # q_hat near the N(0,2) 90th abs-quantile (~1.645*2), inflated by
    # at most one bin plus conformal finite-sample slack
    assert 3.0 < r["q_hat"] < 3.8, r["q_hat"]

    # perfect predictor: all residuals 0 -> hi == 0 -> bin 0, full cover
    perf = spark.createDataFrame(
        [(1.0, 1.0)] * 50, "pred double, actual double"
    )
    rp = conformal_interval(perf, "pred", "actual", alpha=0.1).collect()[0]
    assert rp["coverage"] == 1.0

    # k > n: 5 calibration points at alpha=0.1 -> infinite interval
    tiny = spark.createDataFrame(
        [(0.0, float(i)) for i in range(5)], "pred double, actual double"
    )
    rt = conformal_interval(tiny, "pred", "actual", alpha=0.1).collect()[0]
    assert rt["q_hat"] is None and rt["coverage"] is None
    with _pytest.raises(ValueError):
        conformal_interval(df, "pred", "actual", alpha=0.0)


def test_naive_bayes_separable_and_laws(spark):
    """NB laws: (1) fully separable vocabularies -> perfect diagonal and
    accuracy 1.0; (2) confusion counts conserve the doc count; (3) a
    doc symmetric between two classes tie-breaks to the smaller class
    string; (4) NULL text/label/id rows are dropped per contract."""
    from pytrousse_spark.operators.classifier import naive_bayes_confusion

    rows = []
    for i in range(20):
        rows.append((i, "apple banana cherry", "fruit"))
    for i in range(20, 45):
        rows.append((i, "carrot potato onion", "veg"))
    rows.append((99, None, "fruit"))
    rows.append((98, "apple", None))
    rows.append((None, "apple", "fruit"))
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = naive_bayes_confusion(df, "text", "lang", "doc_id").collect()
    by = {(r["actual"], r["predicted"]): r["n"] for r in out}
    assert by == {("fruit", "fruit"): 20, ("veg", "veg"): 25}
    assert all(r["accuracy"] == 1.0 for r in out)
    assert sum(r["n"] for r in out) == 45  # NULL rows dropped

    # symmetric two-class corpus: every doc scores identically under
    # both classes -> argmax tie-break predicts the smaller label 'a'
    sym = spark.createDataFrame(
        [(1, "x y", "a"), (2, "x y", "b")],
        "doc_id int, text string, lang string",
    )
    so = naive_bayes_confusion(sym, "text", "lang", "doc_id").collect()
    sby = {(r["actual"], r["predicted"]): r["n"] for r in so}
    assert sby == {("a", "a"): 1, ("b", "a"): 1}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        naive_bayes_confusion(df, "text", "lang", "doc_id", alpha=0)


def test_decision_stump_laws(spark):
    """Stump laws: (1) a perfectly separable feature reaches gini 0 and
    accuracy 1 with the threshold between the clusters; (2)
    n_left + n_right conserves n; (3) a constant feature has no valid
    split -> NULL split fields (degenerate contract, not an error);
    (4) NULL rows dropped."""
    from pytrousse_spark.operators.classifier import decision_stump

    rows = [(float(i), 0) for i in range(50)] + [
        (float(i), 1) for i in range(100, 150)
    ]
    rows += [(None, 1), (5.0, None)]
    df = spark.createDataFrame(rows, "x double, y int")
    r = decision_stump(df, "x", "y", 32).collect()[0]
    assert r["n"] == 100
    assert r["gini_split"] == 0.0 and r["accuracy"] == 1.0
    assert 49.0 < r["threshold"] < 101.0, r["threshold"]
    assert r["n_left"] + r["n_right"] == r["n"]
    assert r["pos_rate_left"] == 0.0 and r["pos_rate_right"] == 1.0
    assert r["gini_root"] == 50.0  # 2 * 50*50/100

    const = spark.createDataFrame(
        [(1.0, i % 2) for i in range(10)], "x double, y int"
    )
    rc = decision_stump(const, "x", "y", 32).collect()[0]
    assert rc["n"] == 10 and rc["split_bin"] is None
    assert rc["threshold"] is None and rc["gini_split"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decision_stump(df, "x", "y", 1)


# ---------------------------------------------------------------------------
# isotonic calibration (round 7)
# ---------------------------------------------------------------------------
def _pava_reference(groups):
    """Classic pool-adjacent-violators on (weight, sum_y) blocks:
    merge while the previous block mean >= the next block mean, then
    expand each merged block's mean back over its original groups."""
    merged = [list(groups[0])]
    for w, s in groups[1:]:
        merged.append([w, s])
        while len(merged) > 1 and (
            merged[-2][1] * merged[-1][0]
            >= merged[-1][1] * merged[-2][0]
        ):
            w2, s2 = merged.pop()
            merged[-1][0] += w2
            merged[-1][1] += s2
    res = []
    i = 0
    for w, s in merged:
        acc = 0
        while acc < w:
            acc += groups[i][0]
            res.append(s / w)
            i += 1
    return res


def test_isotonic_equals_classic_pava(spark):
    from pytrousse_spark.operators.classifier import isotonic_calibration

    # scores 0..9 land one per bin at num_bins=10; planted rate
    # sequence has multiple monotonicity violations
    rates = [0.2, 0.1, 0.4, 0.3, 0.3, 0.8, 0.5, 0.6, 0.9, 0.7]
    rows = []
    for b, rate in enumerate(rates):
        n = 20
        pos = int(rate * n)
        rows += [(float(b), 1)] * pos + [(float(b), 0)] * (n - pos)
    df = spark.createDataFrame(rows, ["score", "y"])
    got = sorted(
        isotonic_calibration(df, "score", "y", 10).collect(),
        key=lambda r: r["bin"],
    )
    groups = [(20, int(r * 20)) for r in rates]
    want = _pava_reference(groups)
    assert len(got) == 10
    for r, w in zip(got, want):
        assert abs(r["rate_isotonic"] - w) < 1e-6, (r, w)
    # monotone nondecreasing
    seq = [r["rate_isotonic"] for r in got]
    assert all(b >= a for a, b in zip(seq, seq[1:]))
    # PAVA conserves total mass: sum w*fit == sum y
    mass = sum(r["n"] * r["rate_isotonic"] for r in got)
    total = sum(int(r * 20) for r in rates)
    assert abs(mass - total) < 1e-2
    # already-monotone input is a fixed point
    rows2 = []
    for b, rate in enumerate([0.1, 0.3, 0.5, 0.9]):
        rows2 += [(float(b), 1)] * int(rate * 10)
        rows2 += [(float(b), 0)] * (10 - int(rate * 10))
    df2 = spark.createDataFrame(rows2, ["score", "y"])
    got2 = sorted(
        isotonic_calibration(df2, "score", "y", 4).collect(),
        key=lambda r: r["bin"],
    )
    for r in got2:
        assert r["rate_isotonic"] == r["rate_raw"]


def test_fairness_census_perfect_vs_biased_rule(spark):
    """Laws: (1) a PERFECT decision rule has TPR 1 / FPR 0 in every
    group and dp_ratio = base-rate ratio; (2) a rule that approves
    everyone in group A and no one in group B reads dp_ratio 0 for B
    (A is the larger reference) with tpr_gap -1; (3) counts are
    exact; groups with no positives get NULL tpr."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import fairness_census

    rows = []
    uid = 0
    # group A: 60 rows, 30 positive; group B: 40 rows, 10 positive
    for g, n, pos in (("A", 60, 30), ("B", 40, 10)):
        for i in range(n):
            rows.append((uid, g, 1 if i < pos else 0))
            uid += 1
    df = spark.createDataFrame(rows, ["uid", "grp", "y"])

    perfect = {
        r["group"]: r
        for r in fairness_census(
            df, "grp", F.col("y"), F.col("y")
        ).collect()
    }
    assert perfect["A"]["tpr"] == 1.0 and perfect["A"]["fpr"] == 0.0
    assert perfect["B"]["tpr"] == 1.0 and perfect["B"]["fpr"] == 0.0
    # selection = base rate: A 0.5, B 0.25 -> dp_ratio(B) = 0.5
    assert perfect["A"]["dp_ratio"] == 1.0
    assert perfect["B"]["dp_ratio"] == 0.5

    biased = {
        r["group"]: r
        for r in fairness_census(
            df, "grp", (F.col("grp") == "A").cast("int"), F.col("y")
        ).collect()
    }
    assert biased["A"]["selection_rate"] == 1.0
    assert biased["B"]["selection_rate"] == 0.0
    assert biased["B"]["dp_ratio"] == 0.0
    assert biased["B"]["tpr_gap"] == -1.0

    nopos = spark.createDataFrame(
        [(1, "A", 0), (2, "A", 0), (3, "B", 1)], ["uid", "grp", "y"]
    )
    rows2 = {
        r["group"]: r
        for r in fairness_census(
            nopos, "grp", F.lit(1), F.col("y")
        ).collect()
    }
    assert rows2["A"]["tpr"] is None


def test_optimal_threshold_separable_and_cost_tradeoff(spark):
    """Laws: (1) perfectly separable scores put the threshold at the
    lowest positive score with utility = utility_tp * P and fp = 0;
    (2) making false positives free (utility_fp = 0) moves the
    threshold DOWN to sweep in every positive, ties broken to the
    HIGHEST threshold; (3) utilities are exact integers."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import optimal_threshold

    rows = [(float(i), 0) for i in range(50)] + [
        (float(100 + i), 1) for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["score", "y"])
    sep = optimal_threshold(df, "score", F.col("y")).collect()[0]
    assert sep["threshold_cents"] == 10000     # lowest positive score
    assert sep["tp"] == 30 and sep["fp"] == 0
    assert sep["utility"] == 100 * 30

    free = optimal_threshold(
        df, "score", F.col("y"), utility_tp=100, utility_fp=0
    ).collect()[0]
    # every threshold <= 10000 gives utility 3000; tie -> highest
    assert free["threshold_cents"] == 10000
    assert free["utility"] == 3000

    # overlapping scores: positives at 10..39, negatives at 0..29 with
    # cost -150 per fp: cutting at 30 keeps 10 clean positives
    ov = [(float(i), 1) for i in range(10, 40)] + [
        (float(i), 0) for i in range(30)
    ]
    got = optimal_threshold(
        spark.createDataFrame(ov, ["score", "y"]),
        "score", F.col("y"), utility_tp=100, utility_fp=-150,
    ).collect()[0]
    assert got["threshold_cents"] == 3000
    assert got["fp"] == 0 and got["tp"] == 10


def test_ndcg_perfect_reversed_and_capped_ideal(spark):
    """Laws: (1) relevant docs ranked 1..R -> NDCG exactly 1; (2) the
    same hits pushed to the bottom of the k-window give the known
    closed-form ratio < 1; (3) R > k caps the ideal at k (NDCG can
    still reach 1); (4) a query ranked but with NO relevant docs emits
    an explicit (n_relevant=0, ndcg NULL) row — r7 ADVICE fix: it
    used to vanish from the eval entirely."""
    import math

    from pytrousse_spark.operators.classifier import ndcg_at_k

    ranking = spark.createDataFrame(
        # qa: 2 relevant at ranks 1,2 (perfect); qb: same 2 relevant
        # at ranks 9,10; qc: 15 relevant docs ranked 1..10 (R > k)
        [("qa", d, r) for r, d in enumerate([1, 2, 3, 4], 1)]
        + [("qb", d, r) for r, d in enumerate([3, 4, 5, 6, 7, 8, 9, 10, 1, 2], 1)]
        + [("qc", d, r) for r, d in enumerate(range(100, 110), 1)]
        + [("qd", d, r) for r, d in enumerate([1, 2, 3], 1)],
        ["query", "doc_id", "rank"],
    )
    relevance = spark.createDataFrame(
        [("qa", 1), ("qa", 2), ("qb", 1), ("qb", 2)]
        + [("qc", d) for d in range(100, 115)],
        ["query", "doc_id"],
    )
    out = {r["query"]: r for r in ndcg_at_k(ranking, relevance, k=10).collect()}
    assert out["qa"]["ndcg"] == 1.0
    want = (1 / math.log2(10) + 1 / math.log2(11)) / (
        1 / math.log2(2) + 1 / math.log2(3)
    )
    assert abs(out["qb"]["ndcg"] - want) < 1e-6
    assert out["qc"]["n_relevant"] == 15 and out["qc"]["ndcg"] == 1.0
    # zero-relevance query: explicit row, NULL ndcg (the documented
    # R = 0 branch is now reachable)
    assert out["qd"]["n_relevant"] == 0
    assert out["qd"]["hits_at_k"] == 0
    assert out["qd"]["dcg"] == 0.0 and out["qd"]["idcg"] == 0.0
    assert out["qd"]["ndcg"] is None


def test_brier_decomposition_identity_and_extremes(spark):
    """Laws: (1) the identity brier = reliability - resolution +
    uncertainty + within_bin_var holds to round-6 tolerance; (2) a
    PERFECT sharp forecaster (p = y exactly) has brier 0, reliability
    0, resolution = uncertainty; (3) the constant base-rate forecast
    has resolution 0 and brier = uncertainty (+ its own tiny
    reliability if the rate is off-grid)."""
    from pytrousse_spark.operators.classifier import brier_decomposition

    rows = [(1.0, 1)] * 30 + [(0.0, 0)] * 70
    perfect = brier_decomposition(
        spark.createDataFrame(rows, ["p", "y"]), "p", "y"
    ).collect()[0]
    assert perfect["brier"] == 0.0
    assert perfect["reliability"] == 0.0
    assert abs(perfect["resolution"] - perfect["uncertainty"]) < 1e-6
    assert abs(perfect["uncertainty"] - 0.3 * 0.7) < 1e-6

    const = brier_decomposition(
        spark.createDataFrame(
            [(0.3, 1)] * 30 + [(0.3, 0)] * 70, ["p", "y"]
        ),
        "p",
        "y",
    ).collect()[0]
    assert const["resolution"] == 0.0
    assert abs(const["brier"] - const["uncertainty"]) < 1e-6

    mixed = brier_decomposition(
        spark.createDataFrame(
            [(0.82, 1)] * 40 + [(0.78, 0)] * 10 + [(0.1, 0)] * 45
            + [(0.15, 1)] * 5,
            ["p", "y"],
        ),
        "p",
        "y",
    ).collect()[0]
    lhs = mixed["brier"]
    rhs = (
        mixed["reliability"] - mixed["resolution"]
        + mixed["uncertainty"] + mixed["within_bin_var"]
        - 2 * mixed["within_bin_cov"]
    )
    assert abs(lhs - rhs) < 5e-6


def test_cohens_kappa_identity_independence_complement(spark):
    """Laws: identical raters -> kappa 1; a rater vs its complement ->
    kappa strictly negative; statistically independent raters with
    50/50 marginals -> kappa 0 exactly on a balanced 2x2; constant
    raters (pe = 1) -> NULL."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import cohens_kappa

    rows = [(i, i % 2, (i // 2) % 2) for i in range(100)]
    df = spark.createDataFrame(rows, ["i", "a", "b"])

    same = cohens_kappa(df, F.col("a"), F.col("a")).collect()[0]
    assert same["kappa"] == 1.0 and same["po"] == 1.0

    comp = cohens_kappa(
        df, F.col("a"), (1 - F.col("a")).cast("int")
    ).collect()[0]
    assert comp["kappa"] < 0

    indep = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert indep["kappa"] == 0.0 and indep["pe"] == 0.5

    const = cohens_kappa(df, F.lit(1), F.lit(1)).collect()[0]
    assert const["kappa"] is None


def test_bradley_terry_laws(spark):
    """Laws: (1) 2-item closed form — the MM fixpoint has
    p_a/p_b = w_ab/w_ba; (2) symmetry — a balanced round-robin gives
    equal scores; (3) dominance ordering survives the fit; (4) an
    undefeated item is dropped (MLE divergence) together with its
    comparisons; (5) the >2M-pair guard raises."""
    from pytrousse_spark.operators.classifier import bradley_terry

    two = spark.createDataFrame(
        [("a", "b")] * 3 + [("b", "a")] * 1, ["w", "l"]
    )
    out = {r["item"]: r for r in bradley_terry(two, "w", "l", iters=40).collect()}
    assert abs(out["a"]["bt_score"] / out["b"]["bt_score"] - 3.0) < 1e-3
    assert out["a"]["rank"] == 1 and out["a"]["n_wins"] == 3
    assert out["a"]["n_games"] == out["b"]["n_games"] == 4

    sym = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"), ("c", "a")],
        ["w", "l"],
    )
    outs = bradley_terry(sym, "w", "l").collect()
    assert len({r["bt_score"] for r in outs}) == 1

    dom = spark.createDataFrame(
        [("a", "b")] * 9 + [("b", "a")] * 1
        + [("b", "c")] * 7 + [("c", "b")] * 3
        + [("a", "c")] * 8 + [("c", "a")] * 2,
        ["w", "l"],
    )
    ranks = {r["item"]: r["rank"] for r in bradley_terry(dom, "w", "l").collect()}
    assert ranks == {"a": 1, "b": 2, "c": 3}

    # undefeated "champ" never loses -> dropped; remaining a/b fit stays
    und = spark.createDataFrame(
        [("champ", "a")] * 5 + [("champ", "b")] * 5
        + [("a", "b")] * 2 + [("b", "a")] * 2,
        ["w", "l"],
    )
    out = {r["item"]: r for r in bradley_terry(und, "w", "l").collect()}
    assert "champ" not in out
    assert out["a"]["n_games"] == 4  # champ duels removed from counts
    assert out["a"]["bt_score"] == out["b"]["bt_score"]


def test_mcnemar_laws(spark):
    """Symmetry (swapping A and B swaps b/c, same statistic), perfect
    agreement -> NULL statistic, and the continuity-corrected value on
    a hand-computed frame."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import mcnemar_test

    # truth, a, b: 4 discordant-A-right, 1 discordant-B-right, 3 ties
    rows = (
        [(1, 1, 0)] * 4 + [(1, 0, 1)] * 1 + [(1, 1, 1)] * 2 + [(0, 0, 0)]
    )
    df = spark.createDataFrame(rows, "t int, a int, b int")
    r = mcnemar_test(
        df, F.col("t"), F.col("a"), F.col("b")
    ).collect()[0]
    assert (r["b_discordant"], r["c_discordant"]) == (4, 1)
    assert r["mcnemar_chi2"] == round((abs(4 - 1) - 1) ** 2 / 5, 6)
    swapped = mcnemar_test(
        df, F.col("t"), F.col("b"), F.col("a")
    ).collect()[0]
    assert (swapped["b_discordant"], swapped["c_discordant"]) == (1, 4)
    assert swapped["mcnemar_chi2"] == r["mcnemar_chi2"]
    # perfect agreement: no discordance, NULL statistic
    same = mcnemar_test(
        df, F.col("t"), F.col("a"), F.col("a")
    ).collect()[0]
    assert same["mcnemar_chi2"] is None
    assert same["b_discordant"] == same["c_discordant"] == 0


def test_split_conformal_coverage_guarantee(spark):
    """On sf-dir lineitem the test-split coverage must sit at or above
    ~(1 - alpha) (finite-sample guarantee, small tolerance for the
    test-split draw), the half-width must be monotone DECREASING in
    alpha, and the Spark result must equal the DuckDB twin exactly."""
    import duckdb

    from pyspark.sql import functions as F

    from pytrousse_spark import read_parquet_df
    from pytrousse_spark.operators.classifier import (
        split_conformal,
        split_conformal_sql,
    )
    from tests.conftest import SF_DIR

    li = read_parquet_df(spark, f"{SF_DIR}/lineitem.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    ident = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    got = {}
    for alpha in (0.1, 0.3):
        r = split_conformal(
            li, ident, "l_quantity", "l_extendedprice", alpha=alpha
        ).collect()[0]
        w = con.execute(
            split_conformal_sql(
                "lineitem", "l_orderkey * 8 + l_linenumber",
                "l_quantity", "l_extendedprice", alpha=alpha,
            )
        ).fetchall()[0]
        assert tuple(r) == tuple(w)
        assert r["coverage"] >= (1 - alpha) - 0.03
        got[alpha] = r["q_half_width_cents"]
    assert got[0.3] < got[0.1]


def test_krippendorff_alpha_textbook_and_laws(spark):
    """Pinned against an independent exact-Fraction computation of the
    textbook nominal formula on Krippendorff's 4-coder missing-data
    example; perfect agreement -> alpha exactly 1; single-rating units
    excluded; Spark == DuckDB twin exactly."""
    from fractions import Fraction

    import duckdb

    from pytrousse_spark.operators.classifier import (
        krippendorff_alpha,
        krippendorff_alpha_sql,
    )

    data = {
        1: [1, 1, 1], 2: [2, 2, 2, 2], 3: [3, 3, 3, 3], 4: [3, 3, 3, 3],
        5: [2, 2, 2, 2], 6: [1, 2, 3, 4], 7: [4, 4, 4, 4],
        8: [1, 1, 2, 1], 9: [2, 2, 2, 2], 10: [5, 5, 5], 11: [1, 1],
        12: [3],  # single rating -> excluded
    }
    rows = [(u, v) for u, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "u int, v int")
    r = krippendorff_alpha(df, "u", "v").collect()[0]

    # independent exact computation (pairable units only)
    from collections import Counter

    pair_units = {u: vs for u, vs in data.items() if len(vs) >= 2}
    cats = sorted({v for vs in pair_units.values() for v in vs})
    o = {(c, k): Fraction(0) for c in cats for k in cats}
    for vs in pair_units.values():
        m, n = len(vs), Counter(vs)
        for c in cats:
            for k in cats:
                o[(c, k)] += Fraction(
                    n[c] * n[k] - (n[c] if c == k else 0), m - 1
                )
    n_tot = sum(o.values())
    marg = {c: sum(o[(c, k)] for k in cats) for c in cats}
    do = sum(v for (c, k), v in o.items() if c != k)
    de = sum(
        marg[c] * marg[k] for c in cats for k in cats if c != k
    ) / (n_tot - 1)
    want = float(1 - do / de)
    assert abs(r["alpha"] - round(want, 6)) <= 2e-6
    assert r["n_units"] == 11 and r["n_ratings"] == 40

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ratings AS SELECT * FROM (VALUES "
        + ",".join(f"({u},{v})" for u, v in rows)
        + ") t(u, v)"
    )
    w = con.execute(
        krippendorff_alpha_sql("SELECT u, v FROM ratings", "u", "v")
    ).fetchall()[0]
    assert tuple(r) == tuple(w)

    perf = spark.createDataFrame(
        [(u, 1 + u % 3) for u in range(30) for _ in range(3)], "u int, v int"
    )
    assert krippendorff_alpha(perf, "u", "v").collect()[0]["alpha"] == 1.0


def test_cochran_q_textbook_and_mcnemar_identity(spark):
    """Q matches an independent computation of the textbook formula;
    k=2 reduces exactly to the UNCORRECTED McNemar (b-c)^2/(b+c);
    total agreement -> NULL; Spark == DuckDB twin."""
    import duckdb

    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import (
        cochran_q,
        cochran_q_sql,
        mcnemar_test,
    )

    rows = (
        [(1, 1, 0, 1)] * 6 + [(1, 0, 1, 1)] * 2 + [(1, 1, 1, 0)] * 3
        + [(1, 1, 1, 1)] * 5 + [(1, 0, 0, 0)] * 4
    )
    df = spark.createDataFrame(rows, "t int, a int, b int, c int")
    preds = [F.col("a"), F.col("b"), F.col("c")]
    r = cochran_q(df, F.col("t"), preds).collect()[0]

    G = [sum(x[j + 1] == x[0] for x in rows) for j in range(3)]
    L = [sum(x[j + 1] == x[0] for j in range(3)) for x in rows]
    T, k = sum(G), 3
    want = (k - 1) * sum((k * g - T) ** 2 for g in G) / (
        k * (k * T - sum(v * v for v in L))
    )
    assert r["q_stat"] == round(want, 6)
    assert [r["g0"], r["g1"], r["g2"]] == G

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(map(str, rows)) + ") x(t, a, b, c)"
    )
    w = con.execute(cochran_q_sql("d", "t", ["a", "b", "c"])).fetchall()[0]
    assert (r["n"], r["k"], r["g0"], r["g1"], r["g2"], r["q_stat"]) == (
        w[0], w[1], w[2], w[3], w[4], w[5],
    )

    r2 = cochran_q(df, F.col("t"), preds[:2]).collect()[0]
    m = mcnemar_test(df, F.col("t"), F.col("a"), F.col("b")).collect()[0]
    b_, c_ = m["b_discordant"], m["c_discordant"]
    assert r2["q_stat"] == round((b_ - c_) ** 2 / (b_ + c_), 6)

    same = cochran_q(df, F.col("t"), [F.col("a"), F.col("a")]).collect()[0]
    assert same["q_stat"] is None


def test_mann_whitney_brute_force_and_twin(spark):
    """U, tie-corrected z, and Cliff's delta match an O(n^2) brute
    force on the cent grid; Spark == DuckDB twin; empty-group and
    all-tied degenerate cases go NULL."""
    import math
    import random
    from collections import Counter

    import duckdb

    from pytrousse_spark.operators.classifier import (
        mann_whitney_u,
        mann_whitney_u_sql,
    )

    random.seed(3)
    xs = [round(random.gauss(10, 2), 2) for _ in range(40)]
    ys = [round(random.gauss(11, 2), 2) for _ in range(35)]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]

    xc = [round(v * 100) for v in xs]
    yc = [round(v * 100) for v in ys]
    wins = sum(1 for a in xc for b in yc if a > b)
    loss = sum(1 for a in xc for b in yc if a < b)
    ties = sum(1 for a in xc for b in yc if a == b)
    u1 = wins + ties / 2
    n1, n2 = len(xc), len(yc)
    nn = n1 + n2
    tt = sum(t ** 3 - t for t in Counter(xc + yc).values())
    var = n1 * n2 / 12 * ((nn + 1) - tt / (nn * (nn - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["u1"] - u1) < 1e-9
    assert abs(r["z"] - round(z, 6)) <= 2e-6
    assert abs(r["cliffs_delta"] - round((wins - loss) / (n1 * n2), 6)) <= 2e-6

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{g}',{v})" for g, v in rows)
        + ") x(g, v)"
    )
    w = con.execute(mann_whitney_u_sql("t", "g", "v", "a", "b")).fetchall()[0]
    assert tuple(r) == tuple(w)

    tied = spark.createDataFrame(
        [("a", 1.0)] * 5 + [("b", 1.0)] * 5, "g string, v double"
    )
    rt = mann_whitney_u(tied, "g", "v", "a", "b").collect()[0]
    assert rt["z"] is None and rt["u1"] == 12.5  # ties/2 only
    empty = mann_whitney_u(tied, "g", "v", "a", "zz").collect()[0]
    assert empty["u1"] is None and empty["cliffs_delta"] is None


def test_anova_bartlett_brute_force_and_twin(spark):
    """One-way F / eta^2 and Bartlett's chi2 match textbook formulas
    computed independently on the cent grid; Spark == DuckDB twins;
    n_g<2 groups drop from Bartlett only."""
    import math
    import random

    import duckdb

    from pytrousse_spark.operators.classifier import (
        anova_oneway,
        anova_oneway_sql,
        bartlett_test,
        bartlett_test_sql,
    )

    random.seed(7)
    groups = {
        "a": [round(random.gauss(10, 2), 2) for _ in range(40)],
        "b": [round(random.gauss(11, 2), 2) for _ in range(35)],
        "c": [round(random.gauss(9, 3), 2) for _ in range(30)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]

    cents = {g: [round(v * 100) for v in vs] for g, vs in groups.items()}
    allv = [v for vs in cents.values() for v in vs]
    n, k = len(allv), len(cents)
    gm = sum(allv) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in cents.values())
    ssw = sum(
        sum((v - sum(vs) / len(vs)) ** 2 for v in vs)
        for vs in cents.values()
    )
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r["k"], r["n"]) == (k, n)
    assert abs(r["f_stat"] - round(f_ref, 6)) <= 1e-4
    assert abs(r["eta_sq"] - round(ssb / (ssb + ssw), 6)) <= 1e-6

    b = bartlett_test(df, "g", "v").collect()[0]
    vars_ = {
        g: sum((v - sum(vs) / len(vs)) ** 2 for v in vs) / (len(vs) - 1)
        for g, vs in cents.items()
    }
    sp2 = sum((len(vs) - 1) * vars_[g] for g, vs in cents.items()) / (n - k)
    chi = (n - k) * math.log(sp2) - sum(
        (len(vs) - 1) * math.log(vars_[g]) for g, vs in cents.items()
    )
    corr = 1 + (
        sum(1 / (len(vs) - 1) for vs in cents.values()) - 1 / (n - k)
    ) / (3 * (k - 1))
    assert abs(b["chi2"] - round(chi / corr, 6)) <= 1e-4

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{g}',{v})" for g, v in rows)
        + ") x(g, v)"
    )
    wa = con.execute(anova_oneway_sql("t", "g", "v")).fetchall()[0]
    assert tuple(r) == tuple(wa)
    wb = con.execute(bartlett_test_sql("t", "g", "v")).fetchall()[0]
    assert tuple(b) == tuple(wb)

    # a singleton group drops from Bartlett (no variance), stays in ANOVA
    df2 = df.unionByName(
        spark.createDataFrame([("solo", 5.0)], "g string, v double")
    )
    assert bartlett_test(df2, "g", "v").collect()[0]["k"] == k
    assert anova_oneway(df2, "g", "v").collect()[0]["k"] == k + 1


def test_fleiss_kappa_textbook_and_twin(spark):
    """kappa matches an independent computation on a mixed-agreement
    panel; units with a deviant rating count are excluded; perfect
    agreement -> 1; Spark == DuckDB twin."""
    from collections import Counter, defaultdict

    import duckdb

    from pytrousse_spark.operators.classifier import (
        fleiss_kappa,
        fleiss_kappa_sql,
    )

    pats = [["x", "x", "y"], ["y", "y", "y"], ["x", "y", "z"]]
    units = [(u, c) for u in range(12) for c in pats[u % 3]]
    df = spark.createDataFrame(units, "u int, v string")
    r = fleiss_kappa(df, "u", "v", 3).collect()[0]

    mat = defaultdict(Counter)
    for u, c in units:
        mat[u][c] += 1
    rr, nu = 3, len(mat)
    pbar = sum(
        (sum(n * n for n in d.values()) - rr) / (rr * (rr - 1))
        for d in mat.values()
    ) / nu
    pj = Counter()
    for d in mat.values():
        pj.update(d)
    pe = sum((v / (nu * rr)) ** 2 for v in pj.values())
    assert r["n_units"] == nu and r["n_raters"] == 3
    assert abs(r["kappa"] - round((pbar - pe) / (1 - pe), 6)) <= 2e-6

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE rt AS SELECT * FROM (VALUES "
        + ",".join(f"({u},'{c}')" for u, c in units)
        + ") x(u, v)"
    )
    w = con.execute(fleiss_kappa_sql("rt", "u", "v", 3)).fetchall()[0]
    assert tuple(r) == tuple(w)

    # a unit with 4 ratings is excluded, not miscounted
    df2 = df.unionByName(spark.createDataFrame([(0, "x")], "u int, v string"))
    assert fleiss_kappa(df2, "u", "v", 3).collect()[0]["n_units"] == nu - 1

    perfect = spark.createDataFrame(
        [(u, c) for u in range(6) for c in ["x" if u % 2 else "y"] * 3],
        "u int, v string",
    )
    assert fleiss_kappa(perfect, "u", "v", 3).collect()[0]["kappa"] == 1.0

    import pytest as _pt

    with _pt.raises(ValueError, match=">= 2"):
        fleiss_kappa(df, "u", "v", 1)


def test_cochran_armitage_brute_force_and_twin(spark):
    """z matches the textbook trend statistic computed independently;
    a flat (single-score) design goes NULL; Spark == DuckDB twin."""
    import math
    import random

    import duckdb

    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import (
        cochran_armitage_trend,
        cochran_armitage_trend_sql,
    )

    random.seed(11)
    data = [
        (s, 1 if random.random() < 0.2 + 0.1 * s else 0)
        for s in (0, 1, 2, 3)
        for _ in range(50)
    ]
    df = spark.createDataFrame(data, "s int, r int")
    res = cochran_armitage_trend(
        df, F.col("s"), F.col("r") == 1
    ).collect()[0]

    n = len(data)
    rt = sum(r for _, r in data)
    pbar = rt / n
    sr = sum(s * r for s, r in data)
    sn = sum(s for s, _ in data)
    ssn = sum(s * s for s, _ in data)
    z = (sr - pbar * sn) / math.sqrt(
        pbar * (1 - pbar) * (ssn - sn * sn / n)
    )
    assert (res["k"], res["n"], res["n_success"]) == (4, n, rt)
    assert abs(res["z_trend"] - round(z, 6)) <= 2e-6

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(map(str, data))
        + ") x(s, r)"
    )
    w = con.execute(
        cochran_armitage_trend_sql("t", "s", "(r = 1)")
    ).fetchall()[0]
    assert tuple(res) == tuple(w)

    flat = spark.createDataFrame([(1, 1), (1, 0)], "s int, r int")
    assert (
        cochran_armitage_trend(flat, F.col("s"), F.col("r") == 1)
        .collect()[0]["z_trend"]
        is None
    )


def test_mrr_at_k_conventions_and_twin(spark):
    """First-hit reciprocal ranks in micro-units; no-hit queries stay
    in the denominator; rank > k hits don't count; Spark == DuckDB."""
    import duckdb

    from pytrousse_spark.operators.classifier import mrr_at_k, mrr_at_k_sql

    rank_rows = [
        ("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3),
        ("q2", 4, 1), ("q2", 5, 2), ("q3", 6, 1),
    ]
    rel_rows = [("q1", 2), ("q1", 3), ("q2", 9)]
    rk = spark.createDataFrame(rank_rows, "query string, doc_id int, rank int")
    rl = spark.createDataFrame(rel_rows, "query string, doc_id int")
    r = mrr_at_k(rk, rl, 2).collect()[0]
    # q1 first hit at rank 2 -> 0.5; q2/q3 no hit in top 2 -> 0
    assert (r["n_queries"], r["n_hit"]) == (3, 1)
    assert abs(r["mrr"] - round(0.5 / 3, 6)) <= 2e-6
    # at k=3 q1's min RELEVANT rank is still 2
    assert mrr_at_k(rk, rl, 3).collect()[0]["mrr"] == round(0.5 / 3, 6)

    con = duckdb.connect()
    rsq = (
        "SELECT * FROM (VALUES "
        + ",".join(f"('{q}',{d},{rr})" for q, d, rr in rank_rows)
        + ') x("query", doc_id, rank)'
    )
    vsq = (
        "SELECT * FROM (VALUES "
        + ",".join(f"('{q}',{d})" for q, d in rel_rows)
        + ') x("query", doc_id)'
    )
    w = con.execute(mrr_at_k_sql(rsq, vsq, 2)).fetchall()[0]
    assert tuple(r) == tuple(w)

    import pytest as _pt

    with _pt.raises(ValueError, match=">= 1"):
        mrr_at_k(rk, rl, 0)


def test_round10_stats_invariance_laws(spark):
    """Exact invariance laws for the round-10 statistics:
    - Mann-Whitney: U1(a,b) + U1(b,a) == n1*n2 (complement law),
      delta antisymmetric under group swap, U invariant under a
      constant value shift (integer-cent arithmetic makes these exact);
    - ANOVA F / eta^2 and Bartlett chi2 invariant under value shift;
    - Durbin-Watson invariant under value shift (the mean cancels in
      the numerator BY CONSTRUCTION — this law is the design)."""
    import random

    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import (
        anova_oneway,
        bartlett_test,
        mann_whitney_u,
    )
    from pytrousse_spark.operators.timeseries import durbin_watson

    random.seed(13)
    rows = [
        (g, i, round(random.gauss(10 + 2 * (g == "b"), 2 + (g == "c")), 2))
        for g in ("a", "b", "c")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    shifted = df.withColumn("v", F.col("v") + F.lit(137.0))

    mw = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    mw_sw = mann_whitney_u(df, "g", "v", "b", "a").collect()[0]
    assert mw["u1"] + mw_sw["u1"] == mw["n1"] * mw["n2"]
    assert mw["cliffs_delta"] == -mw_sw["cliffs_delta"]
    assert abs(mw["z"] + mw_sw["z"]) <= 2e-6
    mw_sh = mann_whitney_u(shifted, "g", "v", "a", "b").collect()[0]
    assert (mw["u1"], mw["cliffs_delta"]) == (mw_sh["u1"], mw_sh["cliffs_delta"])

    av, av_sh = (
        anova_oneway(d, "g", "v").collect()[0] for d in (df, shifted)
    )
    assert abs(av["f_stat"] - av_sh["f_stat"]) <= 1e-4
    assert abs(av["eta_sq"] - av_sh["eta_sq"]) <= 1e-6

    ba, ba_sh = (
        bartlett_test(d, "g", "v").collect()[0] for d in (df, shifted)
    )
    assert abs(ba["chi2"] - ba_sh["chi2"]) <= 1e-4

    dw, dw_sh = (
        durbin_watson(d, "g", "t", "v").collect()[0] for d in (df, shifted)
    )
    assert abs(dw["dw"] - dw_sh["dw"]) <= 1e-6


# ---------------------------------------------------------------------------
# round-11 nonparametric completions: Wilcoxon signed-rank (paired),
# Friedman (k paired, continuous — the Cochran-Q complement), and
# Brown-Forsythe (robust variance homogeneity — the Bartlett complement)
# ---------------------------------------------------------------------------


def _avg_ranks(vals):
    """Textbook average ranks with ties (1-based)."""
    srt = sorted(vals)
    ranks = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        avg = (i + 1 + j) / 2.0
        ranks[srt[i]] = avg
        i = j
    return [ranks[v] for v in vals]


def test_wilcoxon_signed_rank_brute_force(spark):
    """Pin against the textbook computation on data with zero diffs,
    |d| ties (same magnitude both signs), and negatives."""
    import random

    from pytrousse_spark.operators.classifier import wilcoxon_signed_rank

    rng = random.Random(5)
    pairs = [
        (round(rng.uniform(0, 9), 2), round(rng.uniform(0, 9), 2))
        for _ in range(60)
    ]
    pairs += [(2.5, 2.5), (3.0, 3.0)]          # zero diffs must drop
    pairs += [(4.0, 3.5), (3.5, 4.0)]           # |d| tie across signs
    df = spark.createDataFrame(pairs, "x double, y double")
    got = wilcoxon_signed_rank(df, "x", "y").collect()[0]

    ds = [
        int(round(x * 100)) - int(round(y * 100))
        for x, y in pairs
        if round(x * 100) != round(y * 100)
    ]
    ranks = _avg_ranks([abs(d) for d in ds])
    w_plus = sum(r for d, r in zip(ds, ranks) if d > 0)
    n = len(ds)
    assert got["n"] == n
    assert abs(got["w_plus"] - w_plus) < 1e-6
    from collections import Counter

    tt = sum(t**3 - t for t in Counter(abs(d) for d in ds).values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tt / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / var**0.5
    assert abs(got["z"] - z) < 1e-6


def test_wilcoxon_signed_rank_all_zero_diffs(spark):
    from pytrousse_spark.operators.classifier import wilcoxon_signed_rank

    df = spark.createDataFrame([(1.0, 1.0), (2.0, 2.0)], "x double, y double")
    got = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    assert got["w_plus"] is None and got["z"] is None


def test_friedman_brute_force(spark):
    """Pin against the tie-corrected Conover form on complete blocks
    with within-subject ties; an incomplete subject must be filtered."""
    import random

    from pytrousse_spark.operators.classifier import friedman_test

    rng = random.Random(11)
    rows = []
    k, n = 4, 25
    data = {}
    for s in range(n):
        vals = [round(rng.uniform(0, 5), 2) for _ in range(k)]
        if s % 7 == 0:
            vals[1] = vals[0]  # forced within-subject tie
        data[s] = vals
        rows += [(s, f"t{j}", v) for j, v in enumerate(vals)]
    rows.append((999, "t0", 1.23))  # incomplete subject -> filtered
    df = spark.createDataFrame(rows, "s long, tr string, v double")
    got = friedman_test(df, "s", "tr", "v").collect()[0]
    assert got["k"] == k and got["n"] == n

    # textbook: average ranks within each subject (on cents)
    rj = [0.0] * k
    a = 0.0
    for s in range(n):
        cents = [int(round(v * 100)) for v in data[s]]
        ranks = _avg_ranks(cents)
        for j, r in enumerate(ranks):
            rj[j] += r
            a += r * r
    c = n * k * (k + 1) ** 2 / 4.0
    num = sum((r - n * (k + 1) / 2.0) ** 2 for r in rj)
    chi2 = (k - 1) * num / (a - c)
    assert abs(got["chi2"] - chi2) < 1e-5


def test_friedman_no_complete_blocks(spark):
    from pytrousse_spark.operators.classifier import friedman_test

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "s long, tr string, v double"
    )
    got = friedman_test(df, "s", "tr", "v").collect()[0]
    assert got["n"] == 0 and got["chi2"] is None


def test_brown_forsythe_brute_force(spark):
    """Pin against the direct median-deviation ANOVA on groups with
    even/odd sizes (both median branches) and heavy tails."""
    import random
    import statistics

    from pytrousse_spark.operators.classifier import brown_forsythe

    rng = random.Random(23)
    rows = []
    groups = {"a": 31, "b": 40, "c": 27}
    data = {}
    for g, sz in groups.items():
        vals = [round(rng.gauss(5, 1 + 2 * (g == "c")), 2) for _ in range(sz)]
        vals[0] = round(vals[0] + 40, 2)  # heavy tail
        data[g] = vals
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = brown_forsythe(df, "g", "v").collect()[0]
    assert got["k"] == 3 and got["n"] == sum(groups.values())

    zs, zg = [], {}
    for g, vals in data.items():
        cents = [int(round(v * 100)) for v in vals]
        m2 = int(round(2 * statistics.median(cents)))
        zg[g] = [abs(2 * c - m2) for c in cents]
        zs += zg[g]
    ntot, ktot = len(zs), len(groups)
    gm = sum(zs) / ntot
    ssb = sum(len(z) * (sum(z) / len(z) - gm) ** 2 for z in zg.values())
    ssw = sum((x - sum(z) / len(z)) ** 2 for z in zg.values() for x in z)
    f = (ssb / (ktot - 1)) / (ssw / (ntot - ktot))
    assert abs(got["f_stat"] - f) < 1e-3


def test_brown_forsythe_constant_groups(spark):
    from pytrousse_spark.operators.classifier import brown_forsythe

    df = spark.createDataFrame(
        [("a", 1.0)] * 5 + [("b", 2.0)] * 5, "g string, v double"
    )
    got = brown_forsythe(df, "g", "v").collect()[0]
    assert got["f_stat"] is None  # zero within-group deviation SS


def test_mann_whitney_by_group_equals_corpus_level_per_group(spark):
    """Each group's row must equal mann_whitney_u run on that group's
    two filtered frames (relabelled as the two-group framing the
    corpus operator expects); empty-side groups yield NULL u1/z/delta;
    NULL groups are excluded."""
    import random

    from pyspark.sql import functions as F

    from pytrousse_spark.operators.classifier import (
        mann_whitney_by_group,
        mann_whitney_u,
    )

    rng = random.Random(37)
    rows_a, rows_b = [], []
    for g, lo, hi in (("x", 0, 10), ("y", 3, 13), ("z", -5, 5)):
        rows_a += [(g, round(rng.uniform(lo, hi), 2)) for _ in range(55)]
        rows_b += [(g, round(rng.uniform(lo + 1, hi + 1), 2)) for _ in range(45)]
    rows_a += [("x", 1.25), ("x", 1.25)]  # forced cross-frame ties
    rows_b += [("x", 1.25)]
    rows_a += [("only_a", 2.0), (None, 7.7)]
    df_a = spark.createDataFrame(rows_a, "g string, value double")
    df_b = spark.createDataFrame(rows_b, "g string, value double")

    rep = {
        r["group"]: r
        for r in mann_whitney_by_group(df_a, df_b, "value", "g").collect()
    }
    assert set(rep) == {"x", "y", "z", "only_a"}
    oa = rep["only_a"]
    assert oa["n_b"] == 0
    assert oa["u1"] is None and oa["z"] is None and oa["cliffs_delta"] is None

    for g in ("x", "y", "z"):
        both = (
            df_a.where(F.col("g") == g).select(
                F.lit("a").alias("side"), "value"
            )
        ).unionByName(
            df_b.where(F.col("g") == g).select(
                F.lit("b").alias("side"), "value"
            )
        )
        want = mann_whitney_u(both, "side", "value", "a", "b").collect()[0]
        got = rep[g]
        assert got["n_a"] == want["n1"] and got["n_b"] == want["n2"], g
        assert got["u1"] == want["u1"], g
        assert got["z"] == want["z"], g
        assert got["cliffs_delta"] == want["cliffs_delta"], g
