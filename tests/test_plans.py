"""Physical-plan regression tests: the scale properties PLANS.md documents
must survive refactors — pushdown reaching scans, broadcasts on small sides,
top-k without global windows, no cartesian products outside declared
baselines."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
SF_DIR = "/root/testdata/sf0.01"


def _plan(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [" in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_q02_topk_without_global_window(spark):
    plan = _plan(spark, "q02_top_revenue_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_q28_fact_table_never_shuffles(spark):
    plan = _plan(spark, "q28_group_binning")
    assert "BroadcastHashJoin" in plan


def test_q64_corpus_side_broadcast_free(spark):
    plan = _plan(spark, "q64_contamination")
    # the benchmark index broadcasts; the corpus must NOT be broadcast-joined
    # the other way around, and no cartesian product may appear
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_no_cartesian_outside_declared_baselines(spark):
    declared = {
        # O(n^2) exact baselines by design (oracle anchors)
        "q46_embedding_neardup", "q46b_neardup_blas", "q47_cosine_topk",
        # broadcast nested-loop range predicates (small dim side)
        "q52_range_join", "q15_scalar_subquery",
    }
    for name, fn in entrymod.queries().items():
        if name in declared:
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_no_gate_output_is_array_map_or_struct(spark):
    """Registry-wide structural guard (r9 VERDICT item 1): the driver's
    oracle canonicalizer does a plain pandas sort_values over all output
    columns and CRASHES on list cells (`TypeError: unhashable type:
    'list'` — q294's r9 red row, the first array-typed gate output ever
    registered). No gate may emit ArrayType/MapType/StructType; flatten
    to scalar columns in both engines instead (cochran_q's g0..gk-1)."""
    from pyspark.sql import types as T

    offenders = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF_DIR).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "gate outputs with driver-uncanonicalizable complex columns: "
        f"{offenders}"
    )


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "q04_filter_agg")
    # ReadSchema shows only the columns the query touches, not the table
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert len(cols) <= 5, cols


def test_partitioned_write_prunes_partitions(spark, tmp_path_factory):
    """write_partitioned's layout must make a partition-column filter prune
    at the SCAN (PartitionFilters), not post-scan — the property that lets
    a 100 TB lake skip whole directories."""
    from pytrousse_spark import read_parquet_df
    from pytrousse_spark.operators.relational import write_partitioned

    li = read_parquet_df(spark, "/root/testdata/sf0.001/lineitem.parquet")
    d = str(tmp_path_factory.mktemp("part") / "li")
    write_partitioned(
        li.select("l_orderkey", "l_quantity", "l_returnflag"),
        d,
        ["l_returnflag"],
    )
    back = spark.read.parquet(d).where("l_returnflag = 'A'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters", 1)[1].split("]")[0]
    # pruning is real: only the A partition's rows are read
    a_rows = li.where("l_returnflag = 'A'").count()
    assert back.count() == a_rows


def test_q101_corpus_single_pass_and_broadcasts(spark):
    """q101's scale contract: the corpus side computes cell + PQ code in
    one projection pass (no self-join back to the corpus for scoring
    metadata), and the query-side tables (cells, LUT) broadcast."""
    plan = _plan(spark, "q101_ivf_pq")
    assert plan.count("BroadcastExchange") >= 2  # q_cells + LUT + re-rank qf
    assert "CartesianProduct" not in plan


def test_q108_bucketed_join_is_exchange_and_sort_free(spark):
    """The bucketed-join law: with broadcast disabled, the fact-fact join
    over the bucketed tables is a SortMergeJoin whose BOTH inputs come
    straight from bucketed scans — no Exchange; and with the sorted-scan
    ordering enabled (safe here: single_file_per_bucket=True) no Sort
    either — the shuffle AND the sort were pre-paid at write time."""
    import re

    # build the tables via the gate query once
    entrymod.queries()["q108_bucketed_join"](spark, SF_DIR)
    tag = re.sub(r"\W", "_", spark.sparkContext.applicationId) + "_sf0_01"
    ob = spark.table(f"pytrousse_buckets.orders_{tag}")
    lb = spark.table(f"pytrousse_buckets.li_{tag}")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Spark only trusts bucket sortedness for one-file buckets; the gate
    # writes them that way, so the ordering flag is sound.
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    try:
        j = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"]).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        # conf.get(key, None) is None when the threshold was never
        # EXPLICITLY set — restore must then unset, not skip, or the -1
        # leaks into every later test in the shared session
        if old is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Sort" not in join_part.replace("SortMergeJoin", "")


def test_q156_rank_sketch_has_no_sort_and_broadcasts(spark):
    """The sketch rank transform's whole point: NO per-group sort (the
    exact window's single-task funnel) — stats and the groups x B CDF
    ride broadcast joins."""
    plan = _plan(spark, "q156_rank_transform_sketch")
    import re

    # the only permitted Sort is the CDF window's, over the tiny
    # (group, bin) histogram frame — never over fact rows or a bare
    # group key (which would be the exact window's funnel)
    sorts = re.findall(r"Sort \[([^\]]*)\]", plan)
    for keys in sorts:
        # the group key may appear as the __hg alias or collapsed to the
        # source column by alias elimination; the invariant is that the
        # BIN key is always part of the sort — a group-only sort over
        # fact rows would be the exact window's funnel
        assert "__b" in keys or "__cb" in keys, (
            f"Sort over something other than the (group, bin) CDF: {keys}"
        )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q157_rolling_windows_are_bucket_partitioned(spark):
    """Every event-level window in the decomposition must partition by
    (key, bucket) — a window hash-partitioned on user_id ALONE would
    reintroduce the per-key funnel. The only key-only window runs over
    the bucket SERIES (rows = buckets per key, never events)."""
    df = entrymod.queries()["q157_rolling_window_scalable"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # every Window's partition spec: either [user_id..., __b/__gb...] or
    # the bucket-series window keyed [__k]
    specs = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no Window nodes found in the q157 plan"
    for spec in specs:
        cols = spec.split(",")[:2]
        head = ",".join(cols)
        assert (
            "__b" in head or "__gb" in head or "__k#" in head
        ), f"window partitioned on a bare key: {spec}"


def test_q158_k_anonymity_single_agg_no_join(spark):
    """The census must be ONE conditional aggregate over the class frame
    — no per-threshold rescan, no crossjoin against the classes."""
    plan = _plan(spark, "q158_k_anonymity")
    assert "CartesianProduct" not in plan
    assert "Union" not in plan  # stack generator, not union arms
    # exactly two aggregate levels: QI classes, then the one-row census
    assert plan.count("Exchange") <= 3


def test_q160_calibration_dense_frame_broadcast(spark):
    """Per-bin agg joins the dense bin range broadcast; the document
    scan aggregates map-side to <= num_bins rows before any exchange."""
    plan = _plan(spark, "q160_calibration")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q161_containment_no_cartesian_and_pinned_fanout(spark):
    """The asymmetric prefix join must stay a hash join on the shingle
    key (never a cartesian), and the verify stage keeps its pinned
    round-robin fan-out (the AQE-coalesce guard)."""
    plan = _plan(spark, "q161_containment")
    assert "CartesianProduct" not in plan
    assert "RoundRobinPartitioning" in plan


def test_q166_cusum_windows_on_bucket_grid(spark):
    """Every window/sort in the CUSUM plan runs AFTER the bucket
    aggregation — fact rows never pass through a window."""
    plan = _plan(spark, "q166_cusum")
    assert "CartesianProduct" not in plan
    # the plan's only exchanges: bucket hash agg + window partitioning
    assert plan.count("Exchange") <= 4


def test_q167_attribution_user_keyed_join(spark):
    """The touch join must be keyed on the user column (equi-join with
    range filters), never a cartesian/broadcast-nested-loop over facts."""
    plan = _plan(spark, "q167_linear_attribution")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_round6_privacy_and_eval_plan_shapes(spark):
    """Round-6 operators keep their declared shapes: the t-closeness
    grid rides broadcasts (class/value frames — never a fact-side
    shuffle join), the AUC/ROC family's only join is the ONE broadcast
    stats attachment, and nothing grows a cartesian product."""
    plan = _plan(spark, "q173_t_closeness")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stat attachments
    assert "BroadcastHashJoin" in plan        # null-safe grid cell join
    for name in ("q175_auc", "q179_roc_curve"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") == 1
        assert "SortMergeJoin" not in plan
    plan = _plan(spark, "q180_auc_grouped")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # per-group stats broadcast
    assert "SortMergeJoin" not in plan


def test_q177_no_pairwise_or_range_join(spark):
    """The scalable attribution's defining property: every join is an
    EQUI join (user / pid / bucket keys) — no range predicate inside
    any join condition (the pairwise operator's quadratic funnel) and
    no cartesian product. Touch-timestamp comparisons exist only in
    window frames, never as join conditions."""
    plan = _plan(spark, "q177_linear_attribution_scalable")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [l for l in plan.splitlines() if "Join [" in l or "Join (" in l]
    for j in joins:
        assert "<=" not in j and "<" not in j.replace("<=", ""), j


def test_q182_sq8_scoring_broadcasts_queries(spark):
    plan = _plan(spark, "q182_sq8_topk")
    # the query frame broadcasts; scoring is expression-only on top
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_round6_continuation_plan_shapes(spark):
    """Scale pins for the q186-q199 additions: KS never sorts the fact
    union globally (only the bounded bucket grid windows); the moment
    aggregations (CUPED / DiD / PCA / ratio) broadcast their tiny stat
    frames and never cartesian; RFM's three sketch-rank passes keep
    the user frame off SortMergeJoin."""
    plan = _plan(spark, "q186_ks_drift")
    assert "CartesianProduct" not in plan
    # stats attach via a 1-row broadcast, bucket offsets broadcast too
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    for name in ("q188_cuped", "q189_diff_in_diff", "q192_pca2",
                 "q198_ratio_metric"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name

    plan = _plan(spark, "q195_rfm")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # stats + CDF joins broadcast


def test_q194_no_pairwise_or_range_join(spark):
    """Same defining property as q177: the scalable position
    attribution joins only on equi keys — no range predicates inside
    join conditions, no cartesians, no nested-loop joins."""
    plan = _plan(spark, "q194_position_attribution_scalable")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [l for l in plan.splitlines() if "Join [" in l or "Join (" in l]
    for j in joins:
        assert "<=" not in j and "<" not in j.replace("<=", ""), j


def test_r12_inverse_cdf_lookups_are_hash_joins(spark):
    """r12 optimization pins: the two mass-range lookups that were
    BroadcastNestedLoopJoins over every bin now key on a rank/draw
    bucket and compile to broadcast HASH joins (the exact range
    predicate survives as the join filter, so results are pinned
    row-identical by the oracle-parity suite; this test pins the plan
    shape so a regression back to the nested loop is caught)."""
    # q165: the pooled inverse-CDF lookup joins on the rank bucket __mk
    plan = _plan(spark, "q165_quantile_normalize")
    hash_lines = [
        l for l in plan.splitlines() if "BroadcastHashJoin" in l
    ]
    assert any("__mk" in l for l in hash_lines), plan[:2000]
    # q258: the unigram^0.75 draw->word mapping joins on __kb
    plan = _plan(spark, "q258_skipgram_negatives")
    hash_lines = [
        l for l in plan.splitlines() if "BroadcastHashJoin" in l
    ]
    assert any("__kb" in l for l in hash_lines), plan[:2000]
