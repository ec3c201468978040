"""Laws for the declarative expectations operator (operators/quality.py)."""

from __future__ import annotations

import pytest

from pytrousse_spark.operators.quality import expect


def test_expect_null_condition_is_violation(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,)], "v double"
    )
    out = {r["rule"]: r for r in expect(df, {"v_pos": "v > 0"}).collect()}
    r = out["v_pos"]
    assert r["n_rows"] == 3
    assert r["n_violations"] == 2  # NULL counts as violation
    assert r["violation_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["passed"] is False


def test_expect_uniqueness_rule(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1)], "a bigint, b bigint"
    )
    out = {
        r["rule"]: r
        for r in expect(
            df, {"a_pos": "a > 0"}, unique={"ab_unique": ["a", "b"]}
        ).collect()
    }
    assert out["ab_unique"]["n_violations"] == 1
    assert out["a_pos"]["passed"] is True


def test_expect_rejects_empty_and_duplicate_names(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError):
        expect(df, {})
    with pytest.raises(ValueError):
        expect(df, {"r": "a > 0"}, unique={"r": ["a"]})


def test_unicode_census_counts_mojibake_ctrl_and_overhead(spark):
    """Laws on a hand-built multi-script corpus: pure ASCII ->
    ascii_ratio 1, bytes_per_char 1; CJK -> 3 bytes/char, ratio 0;
    an astral (4-byte) char counts as ONE code point; U+FFFD and C0
    controls (tab/newline/CR exempt) are tallied; NULL texts are
    excluded from n_docs."""
    from pytrousse_spark.operators.quality import unicode_census

    rows = [
        ("clean", "hello world"),              # 11 ascii chars
        ("clean", "tab\tand\nnewline ok"),     # exempt controls
        ("cjk", "中文文本"),                    # 4 chars, 12 bytes
        ("bad", "a\x07b��"),                   # 1 ctrl + 2 U+FFFD
        ("bad", "\U0001D11E"),                 # astral: 1 char 4 bytes
        ("bad", None),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r["group"]: r for r in unicode_census(df, "source", "text").collect()}
    c = out["clean"]
    assert c["n_docs"] == 2
    assert c["ascii_ratio"] == 1.0
    assert c["bytes_per_char"] == 1.0
    assert c["ctrl_chars"] == 0                # \t \n exempt
    k = out["cjk"]
    assert (k["total_chars"], k["total_bytes"]) == (4, 12)
    assert k["ascii_ratio"] == 0.0
    assert k["bytes_per_char"] == 3.0
    b = out["bad"]
    assert b["n_docs"] == 2                    # NULL excluded
    assert b["ctrl_chars"] == 1
    assert b["replacement_chars"] == 2
    # 'a\x07b' = 3 ascii + 2 repl(3B) + astral(4B) = 5+1 chars, 3+6+4 bytes
    assert (b["total_chars"], b["total_bytes"]) == (6, 13)
