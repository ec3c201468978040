"""Error-injection round-trip tests (reference tests/datasim.py port,
FIXTURES.md §4).

Dirty values are injected at deterministic equally-spaced positions
(index = (step·k + col_id + bias) % n, step = n // error_count; biases:
NaN=0, invalid value=1, invalid substring=2 — datasim.py:10-56), then the
repair operator must restore the expected values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pytrousse_spark import from_df
from pytrousse_spark.operators.repair import RowFix

NAN_BIAS, VALUE_BIAS, SUBSTRING_BIAS = 0, 1, 2


def _injection_indices(n: int, error_count: int, col_id: int, bias: int) -> set[int]:
    step = n // error_count
    return {(step * k + col_id + bias) % n for k in range(error_count)}


def _build_case(n: int, col_id: int):
    """Clean float column + dirty twin with the three injection families."""
    clean = [float(i) + 0.5 for i in range(n)]
    dirty: list[str | None] = [str(v) for v in clean]
    expected: list[float | None] = list(clean)

    for i in _injection_indices(n, 4, col_id, NAN_BIAS):
        dirty[i] = None
        expected[i] = None
    # invalid whole values (replacement_map: junk word → NULL after fix)
    for i in _injection_indices(n, 4, col_id, VALUE_BIAS):
        if dirty[i] is not None:
            dirty[i] = "NV"
            expected[i] = None
    # invalid substrings ('.' → ',') — repair restores the original value
    for i in _injection_indices(n, 4, col_id, SUBSTRING_BIAS):
        if dirty[i] not in (None, "NV"):
            dirty[i] = dirty[i].replace(".", ",")
            # expected stays the clean value
    return dirty, expected


@pytest.mark.parametrize("col_id", [0, 1])
def test_injection_roundtrip(spark, col_id):
    n = 40
    dirty, expected = _build_case(n, col_id)
    df = spark.createDataFrame(
        [(i, d) for i, (d, _) in enumerate(zip(dirty, expected))],
        "idx int, v string",
    )
    fix = RowFix()
    out = fix.fix_typos(from_df(df), ("v",))
    got = {r["idx"]: r["v"] for r in out.df.collect()}
    for i, exp in enumerate(expected):
        if exp is None:
            assert got[i] is None, f"idx {i}: expected NULL, got {got[i]}"
        else:
            assert got[i] == pytest.approx(exp), f"idx {i}"
    # no unfixable errors in this corpus: every injected typo is repaired
    assert fix.report.after_count["v"] == 0


def test_injection_stride_rule():
    # pin the exact stride arithmetic of datasim.py:15-56
    assert _injection_indices(20, 4, 0, 0) == {0, 5, 10, 15}
    assert _injection_indices(20, 4, 0, 1) == {1, 6, 11, 16}
    assert _injection_indices(20, 4, 3, 2) == {5, 10, 15, 0}


def test_compose_multiple_columns(spark):
    """Compose-style: different injection families on different columns."""
    n = 30
    d0, e0 = _build_case(n, 0)
    d1, e1 = _build_case(n, 1)
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(zip(d0, d1))],
        "idx int, c0 string, c1 string",
    )
    out = RowFix().fix_typos(from_df(df), ("c0", "c1"))
    rows = {r["idx"]: r for r in out.df.collect()}
    for i in range(n):
        for col, exp in (("c0", e0[i]), ("c1", e1[i])):
            if exp is None:
                assert rows[i][col] is None
            else:
                assert rows[i][col] == pytest.approx(exp)
