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


def test_registry_head_round6_plan():
    """Round-6 head pin (the r5 VERDICT's item 1): the four new gates
    with zero driver evidence lead, then ALL sixteen r2-evidence
    families q40-q54 (three rounds stale — the freshness alarm that was
    deliberately red at round-5 judge time), then 30 oldest-r3
    families. No r2-evidence query may remain past the head."""
    names = list(entrymod.queries())
    head = names[:50]
    n_new = 31
    assert head[:n_new] == [
        "q169_dataset_roundtrip", "q170_rank_transform_auto",
        "q171_png_rgb_roundtrip", "q172_k_anonymity_enforce",
        "q173_t_closeness", "q174_dp_counts", "q175_auc",
        "q176_record_linkage", "q177_linear_attribution_scalable",
        "q178_kaplan_meier", "q179_roc_curve", "q180_auc_grouped",
        "q181_bootstrap_ci", "q182_sq8_topk", "q183_conformal",
        "q184_km_grouped", "q185_logrank",
        "q186_ks_drift", "q187_cat_association",
        "q188_cuped", "q189_diff_in_diff",
        "q190_position_attribution", "q191_assortativity",
        "q192_pca2", "q193_seasonal_mase",
        "q194_position_attribution_scalable", "q195_rfm",
        "q196_ab_mde", "q197_segment_ab_bh",
        "q198_ratio_metric", "q199_rmst",
    ]
    r2 = {
        "q40_dedup_exact", "q41_dup_census", "q42_minhash",
        "q43_lsh_pairs", "q44_jaccard_pairs", "q45_simhash",
        "q46_embedding_neardup", "q46b_neardup_blas", "q47_cosine_topk",
        "q48_text_stats", "q49_media_meta", "q50_frame_sample",
        "q51_asof_join", "q52_range_join", "q53_group_zscore",
        "q54_near_dedup_pairs",
    }
    assert set(head[n_new:n_new + 16]) == r2
    newest = _driver_evidence_rounds()
    spilled = [n for n in names[50:] if newest.get(n, 99) <= 2]
    assert not spilled, f"r2-evidence queries past the head: {spilled}"
