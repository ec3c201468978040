"""Bloom-filter membership sketch: probe-path parity + no-false-negative law."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pytrousse_spark import read_parquet_df
from pytrousse_spark.operators import bloom
from tests.conftest import SF_DIR

M, K = 4096, 5


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet_df(spark, f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def halves(docs):
    build = docs.where(F.col("doc_id") % 2 == 0)
    # plant guaranteed members: every 5th build text re-enters the probe
    # under a shifted id, so the no-false-negative law has teeth
    planted = build.where(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    probe = (
        docs.where((F.col("doc_id") % 2 == 1) & F.col("text").isNotNull())
        .unionByName(planted)
    )
    return build, probe


def _members(df):
    return {r["doc_id"]: r["bloom_member"] for r in df.collect()}


def test_bitset_and_join_probes_agree(halves):
    build, probe = halves
    pos = bloom.bloom_positions(build, "text", m=M, k=K)
    a = _members(bloom.bloom_probe_bitset(probe, "text", pos, m=M, k=K))
    b = _members(bloom.bloom_probe_join(probe, "text", pos, m=M, k=K))
    assert a == b
    assert len(a) == probe.count()


def test_no_false_negatives(halves):
    build, probe = halves
    pos = bloom.bloom_positions(build, "text", m=M, k=K)
    got = _members(bloom.bloom_probe_bitset(probe, "text", pos, m=M, k=K))
    build_texts = {r["text"] for r in build.select("text").distinct().collect()}
    true_members = {
        r["doc_id"] for r in probe.collect() if r["text"] in build_texts
    }
    assert true_members, "fixture must contain cross-half exact duplicates"
    for did in true_members:
        assert got[did], f"false negative on doc {did}"


def test_positions_bounded_by_m(halves):
    build, _ = halves
    pos = bloom.bloom_positions(build, "text", m=256, k=K)
    n = pos.count()
    assert 0 < n <= 256
    assert pos.where((F.col("pos") < 0) | (F.col("pos") >= 256)).count() == 0


def test_collect_guard(halves):
    build, probe = halves
    pos = bloom.bloom_positions(build, "text", m=M, k=K)
    with pytest.raises(ValueError, match="collect guard"):
        bloom.bitset_from_positions(pos, m=bloom.MAX_COLLECT_BITS * 2)


def test_shingle_screen_bounds_exact_overlap(spark, halves):
    """Screen hits >= exact overlap (no false negatives), with tiny FP slack."""
    from pytrousse_spark.functions.text import word_shingles

    build, probe = halves
    big_m = 1 << 22  # keep the FP term negligible for the equality check
    build_sh = build.select(F.explode(word_shingles(F.col("text"), 3)).alias("sh"))
    pos = bloom.bloom_positions(build_sh, "sh", m=big_m, k=K)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"])
        for r in bloom.bloom_shingle_screen(
            probe, word_shingles(F.col("text"), 3), pos, m=big_m, k=K
        ).collect()
    }
    build_set = {r["sh"] for r in build_sh.distinct().collect()}
    exact = {
        r["doc_id"]: sum(1 for s in r["sh"] if s in build_set)
        for r in probe.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert got.keys() == exact.keys()
    total_sh = sum(n for n, _ in got.values())
    slack = 0
    for did, (n_sh, hits) in got.items():
        assert hits >= exact[did], f"false negative on doc {did}"
        slack += hits - exact[did]
    assert slack <= max(1, total_sh // 100), f"implausible FP volume: {slack}"
    assert any(v > 0 for v in exact.values()), "fixture must overlap"


def test_xxhash_tier_runs(halves):
    build, probe = halves
    pos = bloom.bloom_positions(build, "text", m=M, k=K, hash_fn="xxhash64")
    got = bloom.bloom_probe_bitset(probe, "text", pos, m=M, k=K, hash_fn="xxhash64")
    assert got.where("bloom_member").count() > 0


def test_probe_join_duplicate_rows_not_false_negative(spark):
    """ADVICE r3 regression: fully-duplicate probe rows used to collapse
    into one group whose hit count reached 2k and failed the == k test —
    genuine members reported bloom_member=false."""
    build = spark.createDataFrame([(1, "alpha"), (2, "beta")],
                                  "doc_id bigint, text string")
    probe = spark.createDataFrame(
        [(10, "alpha"), (10, "alpha"), (11, "gamma"), (11, "gamma")],
        "doc_id bigint, text string",
    )
    pos = bloom.bloom_positions(build, "text", m=M, k=K)
    got = bloom.bloom_probe_join(probe, "text", pos, m=M, k=K).collect()
    by_text = {}
    for r in got:
        by_text.setdefault(r["text"], []).append(r["bloom_member"])
    assert all(by_text["alpha"]), "duplicate member rows must stay members"
    assert not any(by_text["gamma"])
    # one row per distinct probe row is the documented contract
    assert len(got) == 2
