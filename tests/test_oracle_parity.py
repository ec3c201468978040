"""Driver-gate rehearsal: run every __spark_entry__ query at sf0.01 and
compare against its DuckDB oracle (row count + columns + order-insensitive
values) — the same check CORRECTNESS_r{N}.json records."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_df_matches_sql

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for name in entrymod.TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{SF01}/{name}.parquet'")
    yield con
    con.close()


_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(spark, duck01, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = fn(spark, SF01)
    if sql is None:
        # driver records a weaker rows-only check for non-SQL-expressible ops
        assert len(df.collect()) >= 0
        return
    assert_df_matches_sql(df, duck01, sql)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "avg_qty", "avg_disc", "count_order",
    ]


def test_type_gate_rejects_hugeint(spark, duck01):
    """The declared-type gate itself: an oracle whose integer column
    widens to HUGEINT (DuckDB windowed/aggregate sum) must FAIL parity
    even when every value matches — the q11/q68 bug class."""
    import pytest as _pytest

    from tests.conftest import assert_df_matches_sql

    df = spark.range(1).selectExpr("CAST(3 AS BIGINT) AS s")
    good = "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT 3::INTEGER AS x)"
    bad = "SELECT sum(x) AS s FROM (SELECT 3::INTEGER AS x)"
    assert_df_matches_sql(df, duck01, good)
    with _pytest.raises(AssertionError, match="hugeint"):
        assert_df_matches_sql(df, duck01, bad)


def _driver_evidence_rounds() -> dict[str, int]:
    """Newest round with a driver CORRECTNESS row, per query, from the
    CORRECTNESS_r*.json history at the repo root."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (ValueError, OSError):
            continue
        for name in data:
            newest[name] = max(newest.get(name, 0), rnd)
    return newest


def test_registry_head_is_never_checked_then_oldest_evidence_first():
    """Driver-evidence freshness automation (r4 VERDICT item 7): the
    driver checks exactly the first 50 registered queries, so the head
    must contain ALL never-checked queries first, then the remaining
    slots filled strictly oldest-evidence-first. Computed from the
    CORRECTNESS_r*.json history, NOT hand-pinned — this test fails the
    moment a future round's head would leave a query staler than any
    query occupying a head slot."""
    newest = _driver_evidence_rounds()
    assert newest, "no CORRECTNESS_r*.json history found"
    names = list(entrymod.queries())
    head, tail = names[:50], names[50:]
    never = [n for n in names if n not in newest]
    if len(never) <= 50:
        missing = [n for n in never if n not in head]
        assert not missing, f"never-checked queries outside the head: {missing}"
        k = len(never)
        assert set(head[:k]) == set(never), (
            "never-checked queries must occupy the FIRST head slots: "
            f"expected {sorted(never)}, head starts {head[:k]}"
        )
    # no head slot may hold fresher evidence than anything in the tail
    head_checked = [n for n in head if n in newest]
    tail_checked = [n for n in tail if n in newest]
    if head_checked and tail_checked:
        worst_head = max(newest[n] for n in head_checked)
        best_tail = min(newest[n] for n in tail_checked)
        offenders = sorted(
            n for n in head_checked if newest[n] > best_tail
        )
        assert worst_head <= best_tail, (
            f"head holds evidence from round {worst_head} while the tail "
            f"still has round-{best_tail} queries waiting: {offenders}"
        )


def test_freshness_rotate_unit():
    """Unit-pin the self-rotating head (round-8 replacement for the
    per-round hand-pinned plan tests, which went red after every driver
    JSON landed): never-checked first in base order, then checked
    strictly ascending by newest evidence round, ties in base order."""
    base = {f"q{i}": (lambda s, d: None) for i in range(6)}
    fake = {"q0": 5, "q2": 3, "q3": 3, "q5": 2}
    import unittest.mock as mock

    with mock.patch.object(entrymod, "_evidence_rounds", return_value=fake):
        got = list(entrymod._freshness_rotate(base))
    assert got == ["q1", "q4", "q5", "q2", "q3", "q0"]


def test_registry_queries_are_rotation_of_oracle_keys():
    """queries() must be exactly the freshness rotation of the full key
    set — same keys as oracle_sql(), no drops or dups introduced by the
    rotation step."""
    qnames = list(entrymod.queries())
    assert len(qnames) == len(set(qnames))
    assert set(qnames) == set(entrymod.oracle_sql())


def test_head_budget_guard():
    """Head-size guard (VERDICT r7 item 7): round 7 added 70 gates in
    one round, pushing 20 of them past the driver's 50-budget and
    re-stranding q54. Fail at commit time when the never-checked gates
    plus the entire oldest-evidence tier can no longer fit in one
    driver head — i.e. cap in-round gate additions at 50 minus the
    stale backlog."""
    newest = _driver_evidence_rounds()
    assert newest, "no CORRECTNESS_r*.json history found"
    names = list(entrymod.queries())
    never = [n for n in names if n not in newest]
    checked_rounds = [newest[n] for n in names if n in newest]
    oldest_tier = (
        checked_rounds.count(min(checked_rounds)) if checked_rounds else 0
    )
    assert len(never) + oldest_tier <= 50, (
        f"{len(never)} never-checked gates + {oldest_tier} queries in the "
        "oldest evidence tier exceed the driver's 50-row budget; stop "
        "adding gates this round or evidence will be stranded again"
    )
