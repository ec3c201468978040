"""Deterministic sampling/splitting semantics (reproducibility guarantees)."""

from __future__ import annotations

import pytest

from pytrousse_spark import read_parquet_df
from pytrousse_spark.operators import sampling as sp
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet_df(spark, f"{SF_DIR}/documents.parquet")


def test_hash_sample_stable_under_repartition(docs):
    a = {r["doc_id"] for r in sp.hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in sp.hash_sample(docs.repartition(13), "doc_id", 0.3).collect()
    }
    assert a == b
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n   # ~fraction, not exact


def test_hash_sample_salts_decorrelated(docs):
    a = {r["doc_id"] for r in sp.hash_sample(docs, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in sp.hash_sample(docs, "doc_id", 0.5, salt="b").collect()}
    assert a != b
    n = docs.count()
    # independent halves overlap ~25% of the corpus
    assert 0.15 * n < len(a & b) < 0.35 * n


def test_hash_split_partitions_every_row_once(docs):
    out = sp.hash_split(docs, "doc_id")
    assert out.count() == docs.count()
    per = {r["split"]: r["n"] for r in out.groupBy("split").count()
           .withColumnRenamed("count", "n").collect()}
    assert set(per) == {"train", "val", "test"}
    n = docs.count()
    assert per["train"] > 0.8 * n
    # appending a split at the end keeps earlier assignments stable
    out4 = sp.hash_split(
        docs, "doc_id",
        weights={"train": 0.9, "val": 0.05, "test": 0.04, "extra": 0.01},
    )
    moved = (
        out.select("doc_id", "split")
        .join(out4.select("doc_id", out4["split"].alias("s4")), "doc_id")
        .where("split != s4")
    )
    # only rows in the old last range can change (into the appended split)
    assert moved.where("s4 != 'extra'").count() == 0


def test_hash_split_weights_validated(docs):
    with pytest.raises(ValueError):
        sp.hash_split(docs, "doc_id", weights={"a": 0.5, "b": 0.4})


def test_hash_topk_per_group_deterministic(docs):
    df = docs.withColumn("g", (docs["doc_id"] % 3).cast("int"))
    a = sorted(r["doc_id"] for r in sp.hash_topk_per_group(df, ["g"], 5, "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in sp.hash_topk_per_group(df.repartition(7), ["g"], 5, "doc_id").collect()
    )
    assert a == b and len(a) == 15


def test_target_mix_sample_proportions_and_drops(spark):
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.sampling import target_mix_sample

    rows = [(i, "en") for i in range(400)] + [(i + 1000, "de") for i in range(100)] \
        + [(i + 2000, "es") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = target_mix_sample(df, "lang", {"en": 0.8, "de": 0.2}, "doc_id")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # binding group: de (100 / 0.2 = 500 <= 400 / 0.8) -> targets en=400, de=100
    # hash selection keeps ~target (within sampling tolerance of the bucket hash)
    assert "es" not in got                      # unweighted group drops entirely
    assert got["de"] == 100                     # binding group kept in full... 
    assert 360 <= got["en"] <= 400              # ~400 target, hash-thinned
    # determinism under repartition
    out2 = target_mix_sample(df.repartition(7), "lang", {"en": 0.8, "de": 0.2}, "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in out2.collect())


def test_dsir_importance_separates_domains(spark):
    # target docs speak "aaa", the rest speak "zzz"; a target-looking doc
    # must out-weigh a source-only-looking one
    rows = [
        (1, "aaa aaa aaa aaa", "tgt"),
        (2, "aaa aaa aaa", "tgt"),
        (3, "zzz zzz zzz zzz", "web"),
        (4, "zzz zzz zzz", "web"),
        (5, "aaa zzz", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, domain string")
    out = {
        r["doc_id"]: r["log_weight"]
        for r in sp.dsir_importance(df, "text", "doc_id", "domain = 'tgt'").collect()
    }
    assert out[1] > out[5] > out[3]
    assert out[1] > 0 and out[3] < 0


def test_dsir_importance_stable_under_repartition(docs):
    a = {(r["doc_id"], r["log_weight"])
         for r in sp.dsir_importance(docs, "text", "doc_id", "lang = 'en'").collect()}
    b = {(r["doc_id"], r["log_weight"])
         for r in sp.dsir_importance(
             docs.repartition(17), "text", "doc_id", "lang = 'en'").collect()}
    assert a == b


def test_weighted_sample_biases_to_heavy_rows(docs):
    out = sp.weighted_sample(docs, "doc_id", "n_chars", k=50)
    rows = out.collect()
    assert len(rows) == 50
    sampled_mean = sum(r["n_chars"] for r in rows) / 50
    corpus = docs.select("n_chars").collect()
    corpus_mean = sum(r["n_chars"] for r in corpus) / len(corpus)
    assert sampled_mean > corpus_mean  # inclusion tracks weight


def test_weighted_sample_deterministic_and_repartition_stable(docs):
    a = {r["doc_id"] for r in sp.weighted_sample(docs, "doc_id", "n_chars", 40).collect()}
    b = {
        r["doc_id"]
        for r in sp.weighted_sample(docs.repartition(17), "doc_id", "n_chars", 40).collect()
    }
    assert a == b
    c = {r["doc_id"] for r in sp.weighted_sample(docs, "doc_id", "n_chars", 40, salt="other").collect()}
    assert a != c  # different salt, different draw


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -5.0), (4, None), (5, 2.0)],
        ["id", "w"],
    )
    got = {r["id"] for r in sp.weighted_sample(df, "id", "w", k=10).collect()}
    assert got == {1, 5}


def test_stratified_sample_equals_naive_window(spark):
    """The scale path (count-broadcast prefilter + rank over survivors)
    returns row-for-row the same sample as the whole-stratum window, and
    exactly k per stratum when strata are big enough."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.sampling import (
        hash_topk_per_group,
        stratified_sample,
    )

    d = read_parquet_df(spark, "/root/testdata/sf0.01/documents.parquet")
    fast = stratified_sample(d, ["source"], 12, "doc_id")
    naive = hash_topk_per_group(d, ["source"], 12, "doc_id")
    key = lambda df: sorted((r["source"], r["doc_id"]) for r in df.collect())
    assert key(fast) == key(naive)
    from collections import Counter

    per = Counter(s for s, _ in key(fast))
    from pyspark.sql import functions as F

    sizes = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for s, n in sizes.items():
        assert per[s] == min(12, n)


def test_stratified_sample_prefilter_bounds_window_input(spark):
    """The pre-filter is real: the plan filters on the hash bucket BELOW
    the window, and survivors are a small multiple of k per stratum."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.sampling import stratified_sample

    d = read_parquet_df(spark, "/root/testdata/sf0.01/documents.parquet")
    samp = stratified_sample(d, ["source"], 5, "doc_id")
    plan = samp._jdf.queryExecution().optimizedPlan().toString()
    # the threshold comparison must sit below the Window node
    below_window = plan.split("Window", 1)[1] if "Window" in plan else plan
    assert "conv" in below_window  # h60 bucket filter pushed under the rank


def test_bootstrap_mean_ci_laws(spark):
    """Poisson-bootstrap CI: deterministic per salt, contains the plain
    mean, brackets the TRUE mean of a known population, and narrows as
    n grows (sqrt-n law, loose factor)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.sampling import bootstrap_mean_ci

    df = spark.range(2000).select(
        F.col("id"), ((F.col("id") % 100) / 10.0).alias("v")
    )
    r1 = bootstrap_mean_ci(df, "v", "id", 100, "s").collect()[0]
    r2 = bootstrap_mean_ci(df, "v", "id", 100, "s").collect()[0]
    assert r1 == r2  # deterministic
    assert r1["n_rows"] == 2000 and r1["n_replicates"] == 100
    assert r1["ci_lo"] <= r1["mean_point"] <= r1["ci_hi"]
    true_mean = sum((i % 100) / 10.0 for i in range(2000)) / 2000
    assert r1["ci_lo"] <= true_mean <= r1["ci_hi"]
    # width shrinks with n (4x rows -> ~2x narrower; assert looser 1.4x)
    big = spark.range(8000).select(
        F.col("id"), ((F.col("id") % 100) / 10.0).alias("v")
    )
    rb = bootstrap_mean_ci(big, "v", "id", 100, "s").collect()[0]
    assert (rb["ci_hi"] - rb["ci_lo"]) < (r1["ci_hi"] - r1["ci_lo"]) / 1.4
    with _pytest.raises(ValueError):
        bootstrap_mean_ci(df, "v", "id", 1)
    with _pytest.raises(ValueError):
        bootstrap_mean_ci(df, "v", "id", 100, alpha=1.5)


def test_neyman_allocation_laws(spark):
    from pytrousse_spark.operators.sampling import (
        neyman_allocation_sample,
    )

    # stratum A: high variance; B: low variance; C: constant (sd 0)
    rows = []
    for i in range(200):
        rows.append((i, "A", float(100 + (i * 7919) % 500)))
    for i in range(200, 400):
        rows.append((i, "B", float(100 + (i % 3))))
    for i in range(400, 600):
        rows.append((i, "C", 42.0))
    df = spark.createDataFrame(rows, ["id", "st", "v"])
    got = {
        r["stratum"]: r
        for r in neyman_allocation_sample(
            df, "st", "v", "id", 100
        ).collect()
    }
    # allocations sum exactly to the budget (largest-remainder law)
    assert sum(r["n_alloc"] for r in got.values()) == 100
    # every allocation is honored exactly
    for r in got.values():
        assert r["n_sampled"] == r["n_alloc"]
    # high-variance stratum dominates; constant stratum gets nothing
    assert got["A"]["n_alloc"] > got["B"]["n_alloc"]
    assert got["C"]["n_alloc"] == 0 and got["C"]["sd"] == 0.0
    # equal-size equal-sd strata split the budget ~evenly
    rows2 = [(i, "X" if i % 2 == 0 else "Y", float(i % 50))
             for i in range(400)]
    got2 = {
        r["stratum"]: r
        for r in neyman_allocation_sample(
            spark.createDataFrame(rows2, ["id", "st", "v"]),
            "st", "v", "id", 99,
        ).collect()
    }
    assert abs(got2["X"]["n_alloc"] - got2["Y"]["n_alloc"]) <= 1
    assert got2["X"]["n_alloc"] + got2["Y"]["n_alloc"] == 99


def test_rake_weights_match_margins(spark):
    """Laws: after 4 sweeps the weighted COLUMN margins (last pass)
    match the population column totals to within the micro-floor
    granularity, and the row margins converge close; uniform
    undersampling rakes every weight to ~population/sample; a cell
    missing from the sample gets no row (its mass redistributes)."""
    rows_pop, rows_smp = [], []
    k = 0
    # population: 2 regions x 2 segments, 100 each; sample drops
    # region B segment Y entirely and halves everything else
    for r in ("A", "B"):
        for c in ("X", "Y"):
            for i in range(100):
                rows_pop.append((k, r, c))
                if not (r == "B" and c == "Y") and i < 50:
                    rows_smp.append((k, r, c))
                k += 1
    pop = spark.createDataFrame(rows_pop, ["uid", "reg", "seg"])
    smp = spark.createDataFrame(rows_smp, ["uid", "reg", "seg"])
    from pytrousse_spark.operators.sampling import rake_weights

    out = rake_weights(smp, pop, "reg", "seg").collect()
    cells = {(r["row_key"], r["col_key"]): r for r in out}
    assert ("B", "Y") not in cells            # absent cell stays absent
    # column margins (last pass) match population: X -> 200 and
    # Y -> 200 (all Y mass lands on the only sampled Y cell, (A, Y))
    colsum = {}
    for (r, c), row in cells.items():
        colsum[c] = colsum.get(c, 0) + row["weighted_count"]
    assert abs(colsum["X"] - 200) < 0.01
    assert abs(colsum["Y"] - 200) < 0.01
    assert cells[("A", "Y")]["weighted_count"] > 199.99
    # every sampled cell's weight >= 2 (uniform half-sampling) and the
    # B-row mass all lands on (B, X)
    assert cells[("B", "X")]["weighted_count"] > cells[("A", "X")]["weighted_count"]


def test_group_jackknife_hand_computed(spark):
    """Delete-a-group jackknife on 3 groups with known algebra:
    influence is the signed pull of each group on the global mean,
    pseudo-values average back to the jackknife point estimate, and
    se matches the closed-form (G-1)/G * sum dev^2 fold. An all-equal
    frame has zero influence and zero SE."""
    from pytrousse_spark.operators.sampling import group_jackknife

    rows = (
        [("a", 1.0)] * 2 + [("b", 2.0)] * 2 + [("c", 6.0)] * 2
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in group_jackknife(df, "g", "v").collect()}
    # global mean 3.0; leave-a: (2*2+6*2)/4 = 4, leave-b: 3.5, leave-c: 1.5
    assert out["a"]["theta_loo"] == 4.0
    assert out["b"]["theta_loo"] == 3.5
    assert out["c"]["theta_loo"] == 1.5
    assert out["a"]["influence"] == -1.0
    assert out["c"]["influence"] == 1.5
    # pseudo = G*theta - (G-1)*theta_loo
    assert out["a"]["pseudo_value"] == 3 * 3.0 - 2 * 4.0
    assert out["c"]["pseudo_value"] == 3 * 3.0 - 2 * 1.5
    import math

    tbar = (4.0 + 3.5 + 1.5) / 3
    sd2 = sum((t - tbar) ** 2 for t in (4.0, 3.5, 1.5))
    want_se = math.sqrt(2 / 3 * sd2)
    assert abs(out["a"]["se_jack"] - round(want_se, 6)) < 2e-6
    assert out["a"]["se_jack"] == out["b"]["se_jack"] == out["c"]["se_jack"]

    flat = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0)], "g string, v double"
    )
    fout = group_jackknife(flat, "g", "v").collect()
    assert all(r["influence"] == 0.0 and r["se_jack"] == 0.0 for r in fout)
