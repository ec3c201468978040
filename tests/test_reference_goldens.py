"""Byte-wise golden reuse: every expectation CSV under the reference tree
(`/root/reference/tests/expectations/csv/`, 11 files) is loaded verbatim and
compared cell-for-cell against the corresponding operator output, with inputs
read from the reference's own fixture CSVs — provenance is the files
themselves, not a re-encoding (SURVEY.md §5)."""

from __future__ import annotations

import csv
import os

import pytest

from pytrousse_spark import from_df
from pytrousse_spark.operators.transforms import (
    OneHotEncoder,
    OrdinalEncoder,
    ReplaceStrings,
    ReplaceSubstrings,
)

FIXTURES = "/root/reference/tests/fixtures/csv"
EXPECTATIONS = "/root/reference/tests/expectations/csv"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(EXPECTATIONS), reason="reference tree not available"
)


def _read_csv(path: str) -> tuple[list[str], list[list[str]]]:
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def _fixture_ds(spark, name: str):
    header, rows = _read_csv(os.path.join(FIXTURES, name))
    data = [tuple(c if c != "" else None for c in row) for row in rows]
    return from_df(spark.createDataFrame(data, header))


def _cell(v) -> str:
    return "" if v is None else str(v)


#: expectation file → (input fixture, operator factory)
GOLDENS = {
    "generic-replaced-d-a-col0-inplace.csv": (
        "generic.csv", lambda: ReplaceStrings(["col0"], {"d": "a"})),
    "generic-replaced-d-a-col0-col4.csv": (
        "generic.csv",
        lambda: ReplaceStrings(["col0"], {"d": "a"}, derived_columns=["col4"])),
    "generic-replaced-substrings-r-c-col3-inplace.csv": (
        "generic.csv", lambda: ReplaceSubstrings(["col3"], {"r": "c"})),
    "generic-replaced-substrings-r-c-col3-col4.csv": (
        "generic.csv",
        lambda: ReplaceSubstrings(["col3"], {"r": "c"}, derived_columns=["col4"])),
    "generic-ordinal-encoded-col3-inplace.csv": (
        "generic.csv", lambda: OrdinalEncoder(["col3"])),
    "generic-ordinal-encoded-col3-col3_enc.csv": (
        "generic.csv",
        lambda: OrdinalEncoder(["col3"], derived_columns=["col3_enc"])),
    "generic-ordinal-encoded-col3-col4.csv": (
        "generic.csv", lambda: OrdinalEncoder(["col3"], derived_columns=["col4"])),
    "generic-one-hot-encoded-col3-enc.csv": (
        "generic.csv", lambda: OneHotEncoder(["col3"])),
    "generic-one-hot-encoded-col3-encoded.csv": (
        "generic.csv",
        lambda: OneHotEncoder(["col3"], derived_column_suffix="_encoded")),
    "generic-one-hot-encoded-col0-enc.csv": (
        "generic.csv", lambda: OneHotEncoder(["col0"])),
    "generic-na-one-hot-encoded-col4-enc.csv": (
        "generic-na.csv", lambda: OneHotEncoder(["col4"])),
}


@needs_reference
def test_all_expectation_files_mapped():
    assert sorted(os.listdir(EXPECTATIONS)) == sorted(GOLDENS)


@needs_reference
@pytest.mark.parametrize("expect_file", sorted(GOLDENS))
def test_reference_golden(spark, expect_file):
    fixture, make_op = GOLDENS[expect_file]
    ds = _fixture_ds(spark, fixture)
    out = make_op()(ds)
    header, expected = _read_csv(os.path.join(EXPECTATIONS, expect_file))
    assert out.df.columns == header
    got = [[_cell(row[c]) for c in header] for row in out.df.collect()]
    assert got == expected
