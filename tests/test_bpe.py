"""BPE tokenizer training laws (Sennrich 2016 semantics) + DuckDB
training-replay parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from pytrousse_spark.operators.bpe import (
    bpe_merge_table,
    bpe_segment,
    bpe_train,
    bpe_train_sql,
)


def test_bpe_hand_example(spark):
    """'low lower lowest low low' — by hand: pairs of 'low'x3 ('l','o')=3+..
    'lower': l o w e r; 'lowest': l o w e s t. (l,o) count 5, (o,w) 5,
    (w,e) 2 ... tie (l,o) vs (o,w) at 5 -> lexicographic picks (l,o).
    Step 2: ('lo','w') now 5 -> merges to 'low'."""
    df = spark.createDataFrame(
        [(1, "low lower lowest low low")], ["id", "text"]
    )
    rows = bpe_train(df, "text", 3)
    assert rows[0] == (1, "l", "o", "lo", 5)
    assert rows[1] == (2, "lo", "w", "low", 5)
    # after low is one symbol: pairs are (low,e)x2, (e,r), (e,s), (s,t)
    assert rows[2] == (3, "low", "e", "lowe", 2)


def test_bpe_greedy_left_to_right(spark):
    """'aaaa' with merge (a,a): greedy non-overlapping -> [aa, aa];
    'aaa' -> [aa, a]. The sentinel-wrapped replace must reproduce
    exactly this."""
    df = spark.createDataFrame([(1, "aaaa aaaa aaa")], ["id", "text"])
    rows = bpe_train(df, "text", 1)
    assert rows[0][1:4] == ("a", "a", "aa")
    seg = spark.createDataFrame([("aaaa",), ("aaa",), ("a",)], ["w"]).select(
        bpe_segment(F.col("w"), [("a", "a")]).alias("s")
    )
    got = [r["s"] for r in seg.collect()]
    assert got == [["aa", "aa"], ["aa", "a"], ["a"]]


def test_bpe_segmentation_roundtrip(spark):
    """Concatenating a word's BPE symbols (any merge list) reproduces
    the word — segmentation never loses or invents characters."""
    df = spark.createDataFrame(
        [(1, "the quick brownest brown fox foxes the the")], ["id", "text"]
    )
    merges = [(r[1], r[2]) for r in bpe_train(df, "text", 5)]
    words = spark.createDataFrame(
        [("brownest",), ("foxes",), ("the",), ("q",)], ["w"]
    )
    out = words.select(
        "w", F.concat_ws("", bpe_segment(F.col("w"), merges)).alias("j")
    ).collect()
    for r in out:
        assert r["j"] == r["w"]


def test_bpe_training_replay_parity(spark, duck):
    """The DuckDB twin re-derives the identical merge table from
    sf0.001 documents — training parity, not artifact shipping."""
    from pytrousse_spark.io import read_parquet_df

    from tests.conftest import SF_DIR

    df = read_parquet_df(spark, f"{SF_DIR}/documents.parquet")
    rows = [tuple(r) for r in bpe_merge_table(df, "text", 6).collect()]
    orc = duck.execute(bpe_train_sql("documents", "text", 6)).fetchall()
    assert rows == orc
    # counts are non-increasing is NOT a BPE law (merged symbols create
    # new pairs), but every selected count must be >= 1 and steps 1..6
    assert [r[0] for r in rows] == list(range(1, 7))
    assert all(r[4] >= 1 for r in rows)


def test_bpe_rejects_bad_params(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    with _pytest.raises(ValueError):
        bpe_train(df, "text", 0)
