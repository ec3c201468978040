"""S1 CSV ingestion → profile → repair → encode: the reference's primary
end-to-end flow (SURVEY.md §3 E1-E3) on a Sani-15300-shaped CSV
(FIXTURES.md §5: typo'd numeric exam columns + categorical metadata)."""

from __future__ import annotations

import pytest

from pytrousse_spark import read_csv
from pytrousse_spark.operators.encoding import encode_multi_categorical_columns
from pytrousse_spark.operators.repair import RowFix


@pytest.fixture(scope="module")
def vet_csv(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    p = d / "vet.csv"
    rows = ["BREED,SEX,AGE,TEMP,NOTES"]
    breeds = ["MONGREL"] * 30 + ["POODLE"] * 6
    for i, b in enumerate(breeds):
        temp = f"{38 + i % 3}.{i % 10}"
        if i % 7 == 0:
            # decimal-comma typo — quoted so it survives CSV parsing
            temp = '"' + temp.replace(".", ",") + '"'
        elif i % 11 == 0:
            temp = "---"                        # junk word
        elif i % 13 == 0:
            temp = f">{temp}"                   # out-of-scale
        rows.append(f"{b},{'M' if i % 2 else 'F'},{i % 15},{temp},note_{i}")
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_csv_profile_repair_encode(spark, vet_csv):
    ds = read_csv(spark, vet_csv, metadata_cols=("NOTES",))
    # all-strings ingestion: the profiler decides types from values
    prof = ds.profile
    assert "AGE" in prof.numerical_cols          # fully parseable strings
    assert "TEMP" in prof.mixed_type_cols        # partially parseable → fix me
    assert "BREED" in prof.str_categorical_cols
    assert "SEX" in prof.str_categorical_cols
    assert "NOTES" in prof.str_cols and "NOTES" not in prof.str_categorical_cols

    fix = RowFix()
    fixed = fix.fix_common_errors(ds)
    temps = [r["TEMP"] for r in fixed.df.collect()]
    assert all(t is None or isinstance(t, float) for t in temps)
    # decimal-comma and out-of-scale variants repaired, junk → NULL
    assert any(t is not None and t > 38 for t in temps)
    assert fix.report.after_count["TEMP"] == 0  # every typo fixable

    encoded = encode_multi_categorical_columns(fixed, columns=("BREED", "SEX"))
    assert {"BREED_enc", "SEX_enc"} <= set(encoded.columns)
    codes = {r["BREED"]: r["BREED_enc"] for r in encoded.df.collect()}
    assert codes["MONGREL"] != codes["POODLE"]
    names = [op.name for op in encoded.history]
    assert "fix_typos" in names and "encode_single_categorical_column" in names


def test_csv_missing_file_raises(spark):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        read_csv(spark, "/nonexistent/nope.csv").df.collect()


def test_jsonl_round_trip(spark, tmp_path_factory):
    """JSONL source/sink: write a corpus shard, read it back (schema'd and
    inferred), verify values and corrupt-line tolerance."""
    import json

    from pytrousse_spark.io import read_jsonl, write_jsonl

    d = tmp_path_factory.mktemp("jsonl")
    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "gamma delta", "de")],
        ["doc_id", "text", "lang"],
    )
    out = str(d / "shard")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, schema="doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.df.collect()}
    assert got == {1: ("alpha beta", "en"), 2: ("gamma delta", "de")}

    # inferred-schema read of a hand-written shard with one corrupt line:
    # PERMISSIVE mode must keep the good rows and not fail the scan
    p = d / "raw" ; p.mkdir()
    with open(p / "part-0.jsonl", "w") as fh:
        fh.write(json.dumps({"doc_id": 3, "text": "ok"}) + "\n")
        fh.write("{not valid json\n")
        fh.write(json.dumps({"doc_id": 4, "text": "fine"}) + "\n")
    loose = read_jsonl(spark, str(p))
    rows = loose.df.collect()
    good = {r["doc_id"] for r in rows if r["doc_id"] is not None}
    assert good == {3, 4}
    assert "_corrupt_record" in loose.df.columns


def test_orc_round_trip(spark, tmp_path_factory):
    """ORC source/sink: columnar round trip preserves values and schema."""
    from pytrousse_spark.io import read_orc, write_orc

    d = tmp_path_factory.mktemp("orc")
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -0.25)], ["id", "name", "score"]
    )
    out = str(d / "t.orc")
    write_orc(df, out)
    back = read_orc(spark, out)
    assert dict(back.df.dtypes) == dict(df.dtypes)
    got = sorted((r["id"], r["name"], r["score"]) for r in back.df.collect())
    assert got == [(1, "alpha", 1.5), (2, "beta", -0.25)]


def test_text_corpus_ids_stable_and_line_faithful(spark, tmp_path_factory):
    """Raw-text reader: every line one row, ids deterministic across
    re-ingests, duplicate lines share an id (exact-dup collapse)."""
    from pytrousse_spark.io import read_text_corpus

    d = tmp_path_factory.mktemp("rawtext")
    (d / "a.txt").write_text("first line\nsecond line\nfirst line\n")
    (d / "b.txt").write_text("first line\n")
    df = read_text_corpus(spark, str(d))
    rows = df.collect()
    assert len(rows) == 4
    by_text = {}
    for r in rows:
        by_text.setdefault((r["text"], r["source_file"].rsplit("/", 1)[-1]), set()).add(r["doc_id"])
    # same (file, text) -> same id; different file -> different id
    assert len(by_text[("first line", "a.txt")]) == 1
    assert by_text[("first line", "a.txt")] != by_text[("first line", "b.txt")]
    again = {r["doc_id"] for r in read_text_corpus(spark, str(d)).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_csv_roundtrip_hostile_content(spark, tmp_path_factory):
    """q102's write/read option set must survive embedded newlines, quotes,
    commas and NULLs — content the benign driver tables never exercise."""
    from pyspark.sql import types as T

    from pytrousse_spark.io import read_csv

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [
        (1, 'plain'),
        (2, 'comma, separated'),
        (3, 'quote " inside'),
        (4, 'line\nbreak\r\nand another'),
        (5, None),
        (6, ''),
    ]
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path_factory.mktemp("csv_hostile") / "out")
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(d)
    )
    back = read_csv(
        spark, d, schema=schema,
        options={"multiLine": "true", "escape": '"'},
    ).df
    got = {r["id"]: r["text"] for r in back.collect()}
    want = dict(rows)
    # Spark's CSV sink writes both NULL and '' as empty; the reader maps
    # empty back to NULL — the lossy corner is pinned here so q102's
    # signature columns (which hash only non-null text) stay faithful.
    want[6] = None
    assert got == want


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """Many tiny files -> few target-sized files; rows and values are
    preserved; the source dir is swapped atomically (no temp leftovers)."""
    import os

    from pytrousse_spark.io import compact_parquet, read_parquet_df

    p = str(tmp_path / "t")
    df = spark.range(0, 10000).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(p)
    before = sorted(r[0] for r in read_parquet_df(spark, p).collect())
    stats = compact_parquet(spark, p, target_bytes=10**9)
    assert stats["files_before"] >= 64 and stats["files_after"] == 1
    after = sorted(r[0] for r in read_parquet_df(spark, p).collect())
    assert before == after
    assert not [d for d in os.listdir(tmp_path) if "compact" in d]


def test_compact_parquet_sorted_restores_clustering(spark, tmp_path):
    from pytrousse_spark.io import compact_parquet, read_parquet_df

    p = str(tmp_path / "t2")
    spark.range(0, 5000).selectExpr("id", "id % 3 AS k").repartition(16).write.parquet(p)
    stats = compact_parquet(spark, p, target_bytes=15_000, sort_cols=["id"])
    assert stats["files_after"] > 1
    # range-partitioned output: per-file id ranges are disjoint
    import pyspark.sql.functions as F

    meta = (
        read_parquet_df(spark, p)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in meta)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
