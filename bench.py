"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall-clock seconds.

Execution is measured with the noop sink (full plan runs, no driver
collect/serialization overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pytrousse_spark.session import get_spark

import __spark_entry__ as entrymod


def _build_10x_corpus(spark, sf_dir: str, tmp: str) -> None:
    """Materialize a 10x scale-up of documents/embeddings into ``tmp``.

    Replica construction: copy 0 is the original; copies 1-9 shift ids by a
    stride and suffix every 2nd token with a copy marker, which drops
    cross-copy 3-gram Jaccard to ~0.07 — BELOW the 0.2 near-dup threshold —
    so the corpus grows 10x in genuinely distinct documents instead of
    manufacturing quadratic duplicate cliques (that pathological variant is
    exercised separately; see PLANS.md). Embedding copies jitter each
    component by a deterministic +-0.03 so cell populations grow but planted
    neighborhoods survive.
    """
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df

    docs = read_parquet_df(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet_df(spark, f"{sf_dir}/embeddings.parquet")
    d_stride = docs.agg(F.max("doc_id")).first()[0] + 1
    e_stride = emb.agg(F.max("vec_id")).first()[0] + 1

    d_parts = [docs]
    for i in range(1, 10):
        mut = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, j: F.when(
                    j % 2 == 0, F.concat(w, F.lit(f"~{i}"))
                ).otherwise(w),
            ),
            " ",
        )
        d_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * d_stride))
            .withColumn("text", mut)
        )
    big_docs = d_parts[0]
    for p in d_parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    e_parts = [emb]
    for i in range(1, 10):
        jit = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + ((F.col("vec_id") % 13 + F.lit(i) + j) % 7 - 3)
                * F.lit(0.01)
            ).cast("float"),
        )
        e_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * e_stride))
            .withColumn("embedding", jit)
        )
    big_emb = e_parts[0]
    for p in e_parts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    # lineitem 10x for the mining-family headroom row (q132): baskets
    # replicate under shifted order keys while the part catalog stays
    # fixed — the pair space grows linearly with baskets, which is the
    # claim under test (basket-keyed self-join, not |items|^2)
    li = read_parquet_df(spark, f"{sf_dir}/lineitem.parquet")
    l_stride = li.agg(F.max("l_orderkey")).first()[0] + 1
    l_parts = [li] + [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * l_stride))
        for i in range(1, 10)
    ]
    big_li = l_parts[0]
    for p in l_parts[1:]:
        big_li = big_li.unionByName(p)
    big_li.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")

    # events 10x for the sketch/window-family headroom rows (q125) and the
    # skew stress: copies shift user_id AND event_id by strides and ts by
    # +i minutes, so the day grid stays identical while distinct users and
    # per-day volume both grow 10x (the trailing-HLL grid's scale axis)
    ev = read_parquet_df(spark, f"{sf_dir}/events.parquet")
    u_stride = ev.agg(F.max("user_id")).first()[0] + 1
    i_stride = ev.agg(F.max("event_id")).first()[0] + 1
    e10 = [ev] + [
        ev.withColumn("user_id", F.col("user_id") + F.lit(i * u_stride))
        .withColumn("event_id", F.col("event_id") + F.lit(i * i_stride))
        .withColumn("ts", F.col("ts") + F.expr(f"interval {i} minutes"))
        for i in range(1, 10)
    ]
    big_ev = e10[0]
    for p in e10[1:]:
        big_ev = big_ev.unionByName(p)
    big_ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")


    # customer/orders 10x for the round-7 headroom rows: customer
    # names REGENERATE from the shifted key (Customer#%09d), so the
    # edit-distance-1 neighborhood structure grows linearly instead of
    # manufacturing 10 exact copies of every name; orders shift their
    # order key only (the isotonic/lift gates read price/status).
    cu = read_parquet_df(spark, f"{sf_dir}/customer.parquet")
    c_stride = cu.agg(F.max("c_custkey")).first()[0] + 1
    c10 = [cu] + [
        cu.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * c_stride))
        .withColumn(
            "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
        )
        for i in range(1, 10)
    ]
    big_cu = c10[0]
    for p in c10[1:]:
        big_cu = big_cu.unionByName(p)
    big_cu.write.mode("overwrite").parquet(f"{tmp}/customer.parquet")

    o = read_parquet_df(spark, f"{sf_dir}/orders.parquet")
    o_stride = o.agg(F.max("o_orderkey")).first()[0] + 1
    o10 = [o] + [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * o_stride))
        for i in range(1, 10)
    ]
    big_o = o10[0]
    for p in o10[1:]:
        big_o = big_o.unionByName(p)
    big_o.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")


def _build_skewed_events(spark, tmp: str) -> None:
    """Zipfian-skew variant of the 10x events table (round-4 VERDICT
    item 6): ~20% of all events collapse onto ONE user (every 5th event
    re-keyed to user 0), the rest keep their 10x-spread keys. This is the
    adversarial distribution for every user-partitioned window/session
    gate; the skew battery times the same queries on the benign and the
    skewed table and records the ratio."""
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df

    ev = read_parquet_df(spark, f"{tmp}/events.parquet")
    skewed = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(0)).otherwise(
            F.col("user_id")
        ),
    )
    skewed.write.mode("overwrite").parquet(f"{tmp}/skewdir/events.parquet")


# Upper edge of each row's IDLE-HOST band (seconds at 10x), from the
# PLANS.md / VERDICT r3-r5 idle re-measures. A reading more than 2x its
# band is treated as host-load pollution (the r5 lesson: BENCH_r05's
# q132 24.9s / anchor 0.97 were taken on a post-pytest warm host and
# read as fake regressions until re-measured at 5.2-6.5s / 0.896): the
# row re-runs ONCE after a cooldown and BOTH readings are recorded.
_IDLE_BANDS_10X = {
    "q59_clean_corpus": 15.0,
    "q65_dup_clusters": 5.0,
    "q57_ivf_topk": 4.0,
    "q101_ivf_pq": 15.0,
    "q132_association_rules": 8.0,
    "q112_prefix_jaccard": 18.0,
    "q135_triangles": 9.0,
    "q125_hll_trailing": 6.5,
    "q161_containment": 16.0,
    "q163_winnow_overlap": 48.0,
    # round-6 rows (r5 VERDICT item 4) — bands set from this round's
    # idle measurements
    "q164_bpe_train": 12.0,
    "q165_quantile_normalize": 12.0,
    "q157_rolling_window_scalable": 15.0,
    # round-6: brute-force int8 scoring is linear in the corpus
    # (queries fixed) — the sq8 claim as a number
    "q182_sq8_topk": 20.0,
    # round-6 continuation: KS's distinct-value frame, the co-purchase
    # degree joins (edge growth ~ baskets, the q132/q135 axis), and the
    # one-pass PCA moment scan — bands from this session's idle 10x
    # measures (4.45 / 9.2 / 4.55 s)
    "q186_ks_drift": 6.0,
    "q191_assortativity": 12.0,
    "q192_pca2": 7.0,
    # round-7 rows — bands from this round's idle 10x measures
    # (7.2-7.9 / 5.3 / 1.2 / 3.3 / 3.1 / 0.9 / 5.4 s warm)
    "q211_fastss_neighbors": 12.0,
    "q215_cluster_quality": 9.0,
    "q216_isotonic_calibration": 4.0,
    "q217_textrank": 7.0,
    "q219_winsorized_stats": 6.0,
    "q220_kendall_tau": 3.0,
    "q221_spearman": 9.0,
    # round-7 continuation-3 rows — bands ~2x this session's idle 10x
    # measures (6.4 / 14.4 / 5.2 / 2.3 / 4.2 / 5.1 s; 1x refs 6.5 /
    # 4.8 / 2.3 / 1.4 / 3.7 / 3.1 s): gESD and Huber are
    # iteration-dominated and flat, LPA tracks edge growth (3.0x for
    # 10x baskets), skip-gram tracks the corpus (2.25x), dcor and the
    # 3-sequence frontier stay sublinear
    "q249_gesd_outliers": 10.0,
    "q250_label_propagation": 22.0,
    "q252_skipgram_pairs": 8.0,
    "q253_distance_correlation": 4.0,
    "q255_huber_trend": 7.0,
    "q257_triple_sequences": 8.0,
    # round-8 rows — bands ~2x this session's idle 10x measures
    # (3.4 / 1.7 / 10.0 s; 1x refs 4.2 / 1.9 / 9.4 s): all three are
    # ~FLAT at 10x — QL is postings-bounded like BM25, isotropy is one
    # (group, pos) agg, matching is GD-iteration-dominated with a
    # bounded level match
    "q277_dirichlet_ql_search": 7.0,
    "q278_embedding_isotropy": 4.0,
    "q279_propensity_matching": 20.0,
    # round-9 rows — bands ~2x this round's 10x measures (23.2 / 8.9 /
    # 6.6 s; 1x refs 10.5-14.9 / 4.6-5.4 / 3.7-4.0 s): all three run
    # SUB-2x wall at 10x data — HITS because the distinct (customer,
    # supplier) edge set saturates, conformal because the level frame
    # is residual-bounded, alpha because the coincidence matrix is
    # category-bounded
    "q287_hits": 46.0,
    "q289_conformal": 18.0,
    "q292_krippendorff_alpha": 13.0,
    # round-10 rows — bands ~2x this round's 10x measures (1.07 /
    # 1.21 s on a ~1.0-probe host): both are ~FLAT at 10x — the
    # Mann-Whitney level frame saturates at distinct cents, the DW
    # windows are key-partitioned with map-side moment partials
    # r11: the level cumulatives ride the auto-routed prefix helper
    # (checkpointed level frame + count-based window/hierarchy router);
    # idle sf0.1 steady walls 1.5-2.1 s post-routing, 10x reads 1.56
    "q297_mann_whitney": 3.0,
    "q302_durbin_watson": 3.0,
    # round-12 rows — bands ~2x this round's idle 10x measures
    # (q309 1.3-2.1 / q310 1.4-1.5 / q311 2.6-3.3 / q314 2.2-2.8 /
    # q306 1.8-2.1 s; 1x refs 1.2-4.6 s): the whole level-frame drift
    # family is ~FLAT at 10x — pooled cent levels saturate, the
    # grouped report rides (group, level) frames that saturate per
    # group, and every cumulative is auto-routed prefix
    "q306_wilcoxon_signed_rank": 4.5,
    "q309_cramer_von_mises": 5.0,
    "q310_wasserstein": 4.0,
    "q311_drift_by_group": 7.0,
    "q314_anderson_darling": 6.0,
}


#: per-query failure reasons, persisted in the payload (r11 VERDICT
#: item 1: a -1.0 wall with the exception only on stderr left the
#: q28 bench flake undiagnosable — no artifact captured the cause).
_QUERY_ERRORS: dict = {}


def _record_err(key: str, exc: BaseException) -> None:
    """Store a truncated failure reason under ``key`` (mirrors the
    CORRECTNESS row shape) AND print it to stderr; later failures of
    the same key append a counter so reruns don't overwrite the
    first cause."""
    if key in _QUERY_ERRORS:
        key = f"{key}#{sum(1 for k in _QUERY_ERRORS if k.split('#')[0] == key.split('#')[0])}"
    _QUERY_ERRORS[key] = {"err": str(exc)[:200]}
    print(f"bench: {key} failed: {exc}", file=sys.stderr)


def _timed_noop(fn, spark, d) -> float:
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _headroom_10x(spark, big_dir: str) -> dict:
    """Scale-factor headroom evidence (round-2 VERDICT item 7): time the
    shuffle-heaviest queries against the 10x corpus, so linear-scaling
    claims are recorded as numbers in BENCH_r{N}.json rather than prose.
    Load-guarded per _IDLE_BANDS_10X (r5 VERDICT item 2): a reading >2x
    its idle band re-runs once after a 20 s cooldown and the row records
    {"first": x, "rerun": y} instead of a scalar."""
    out: dict = {}
    for name in (
        "q59_clean_corpus",
        "q65_dup_clusters",
        "q57_ivf_topk",
        "q101_ivf_pq",
        "q132_association_rules",
        # round-5 additions (r4 VERDICT item 5): the similarity-join,
        # graph, and sketch-grid families' scale-up evidence
        "q112_prefix_jaccard",
        "q135_triangles",
        "q125_hll_trailing",
        # round-5 additions: the asymmetric containment join (its risk is
        # container-side full-posting growth, same axis as q112) and the
        # winnowing overlap join (fingerprint-posting growth)
        "q161_containment",
        "q163_winnow_overlap",
        # round-6 additions (r5 VERDICT item 4): BPE's one corpus-sized
        # word-count agg (iterations are vocab-bounded -> expect ~flat),
        # quantile-normalize (sketch + broadcast range join -> ~linear),
        # and the bucketed rolling window (3 exchanges vs 1 -> constant
        # factor should hold at 10x)
        "q164_bpe_train",
        "q165_quantile_normalize",
        "q157_rolling_window_scalable",
        "q182_sq8_topk",
        # round-6 continuation additions (measured idle: 4.45/9.2/4.55 s)
        "q186_ks_drift",
        "q191_assortativity",
        "q192_pca2",
        # round-7 additions: the FastSS signature join (candidate pairs
        # grow with the duplicate-neighborhood mass — measured 4.1x for
        # 10x names), the k-means validity pass, the bounded-grid
        # isotonic fit, the word-graph TextRank, the double-sketch
        # robust means / Spearman, and the contingency-grid tau
        "q211_fastss_neighbors",
        "q215_cluster_quality",
        "q216_isotonic_calibration",
        "q217_textrank",
        "q219_winsorized_stats",
        "q220_kendall_tau",
        "q221_spearman",
        # round-7 continuation-3: the iterative spine fits (gESD,
        # Huber — expect ~flat), the LPA community rounds (edge
        # growth), the skip-gram pair join (corpus growth) and the
        # dcor / 3-sequence frontiers
        "q249_gesd_outliers",
        "q250_label_propagation",
        "q252_skipgram_pairs",
        "q253_distance_correlation",
        "q255_huber_trend",
        "q257_triple_sequences",
        # round-8 additions: LM retrieval (postings growth), the
        # embedding-isotropy scan, and the matching pipeline's
        # GD-iteration + bounded-level match
        "q277_dirichlet_ql_search",
        "q278_embedding_isotropy",
        "q279_propensity_matching",
        # round-9 additions: iterative graph (HITS edge saturation),
        # the conformal level-selection, and the coincidence-join alpha
        "q287_hits",
        "q289_conformal",
        "q292_krippendorff_alpha",
        # round-12 additions: the level-frame drift family — pooled
        # cent levels saturate at 10x, so the claim under test is
        # FLATNESS (the grouped report additionally exercises the
        # group-keyed hierarchy/window router at scale)
        "q306_wilcoxon_signed_rank",
        "q309_cramer_von_mises",
        "q310_wasserstein",
        "q311_drift_by_group",
        "q314_anderson_darling",
        # round-10 additions: the two new rows with a real scale axis —
        # Mann-Whitney's cent-level frame (levels saturate; the window
        # is level-bounded) and Durbin-Watson's per-key lag windows
        # (events growth)
        "q297_mann_whitney",
        "q302_durbin_watson",
    ):
        fn = getattr(entrymod, name)
        try:
            from pytrousse_spark.operators import _probe as _pc

            _pc.clear()  # self-contained rows (r12 VERDICT item 1)
            spark.catalog.clearCache()  # drop staged persists
            t = _timed_noop(fn, spark, big_dir)
            band = _IDLE_BANDS_10X.get(name)
            if band is not None and t > 2 * band:
                print(
                    f"bench headroom: {name} {t}s > 2x idle band {band}s; "
                    "cooling down and re-running once",
                    file=sys.stderr,
                )
                time.sleep(20)
                _pc.clear()
                out[name] = {"first": t, "rerun": _timed_noop(fn, spark, big_dir)}
            else:
                out[name] = t
        except Exception as exc:
            out[name] = -1.0
            _record_err(f"headroom:{name}", exc)
    return out


# Expected idle-host skew RATIO per row (upper edge; q85's plain window
# is the known funnel and gets the wide band). Same 2x re-run rule as
# the headroom battery.
_IDLE_SKEW_RATIOS = {
    "q11_sessionize": 1.5,
    "q157_rolling_window_scalable": 1.5,
    "q133_event_transitions": 1.5,
    # round-8: the pairwise attribution forms and q85's plain window are
    # RETIRED from per-round re-measurement — their quadratic/funnel
    # behavior is established evidence (r5-r7: q85 4.4-9.15x, linear
    # 18.8-26.8x, position 16.5-20.4x; PLANS.md). The q167/q190 names
    # now default to strategy="auto" (cohort._route_attribution), which
    # probes max per-user pair mass and routes the skewed table to the
    # scalable twins.
    #
    # round-9 (r8 VERDICT item 2): the auto rows' skewed/benign "ratio"
    # is a MIXED-PATH artifact (benign rides the cheap pairwise plan,
    # skewed rides the count decomposition), so a 6.0-band there would
    # mask a real regression of up to 6x. The binding measurement for
    # the auto rows is now `ratio_vs_scalable` — auto-on-skewed vs the
    # scalable twin's OWN skewed wall on the SAME table (_AUTO_TWINS
    # below, band <= 2.0, i.e. routing + probe never costs more than 2x
    # the routed plan) — plus the probe overhead reported separately.
    # The mixed ratio is still recorded but carries no band.
    "q177_linear_attribution_scalable": 2.0,
    "q157_rolling_window_1day": 2.5,
    "q194_position_attribution_scalable": 2.0,
    # round-7 continuation-3 (bands ~2x first idle measures)
    "q257_triple_sequences": 2.5,
    "q263_markov_entropy": 2.0,
}

# r8 VERDICT item 2: auto-routed rows compare against their scalable
# twin's skewed wall (same table, same routed physical plan) — the
# honest degradation measure; the difference is the router's probe
# cost. Band: auto must stay within 2x of the twin it routes to.
_AUTO_TWINS = {
    "q167_linear_attribution": "q177_linear_attribution_scalable",
    "q190_position_attribution": "q194_position_attribution_scalable",
    "q157_rolling_window_auto": "q157_rolling_window_scalable",
}
_AUTO_VS_SCALABLE_BAND = 2.0


def _rolling_window_1day(spark, d):
    """q157's operator at a 1-DAY window over the same skewed table —
    more cross-bucket mass per event (r5 VERDICT item 7's second axis);
    the bucket decomposition's max task is still one (user, day) bucket."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import rolling_time_window

    ev = read_parquet_df(spark, f"{d}/events.parquet")
    return rolling_time_window(
        ev, "user_id", "ts", "value", "1 day", strategy="bucketed"
    ).select("event_id", "user_id", "ts", "roll_n", "roll_avg")


def _rolling_window_auto(spark, d):
    """The DEFAULT-named rolling window (strategy="auto", r7 VERDICT
    item 2): the density probe routes the benign table to the plain
    RANGE window and the 20%-skew table to the bucketed decomposition,
    so a user reaching for the obvious name never hits the per-key sort
    funnel. The ratio intentionally mixes physical plans."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import rolling_time_window

    ev = read_parquet_df(spark, f"{d}/events.parquet")
    return rolling_time_window(ev, "user_id", "ts", "value", "1 hour").select(
        "event_id", "user_id", "ts", "roll_n", "roll_avg"
    )


def _skew_stress(spark, tmp: str) -> dict:
    """Window/session-family skew battery (round-4 VERDICT item 6): time
    the user-partitioned gates on the benign 10x events table and on the
    zipfian variant (one user owns ~20% of events), and record the ratio.
    A user-partitioned window funnels that user's slice through one task,
    so the expected worst case is wall ~ max(skew_share * n, n / cores);
    ratios well under cores/1 show the remaining work still spreads.
    Round 6 adds the user-keyed range join (q167 linear attribution) and
    the 1-day-window variant of the bucketed rolling window; rows whose
    ratio exceeds 2x the idle band re-run once after a cooldown."""
    cases: dict = {
        name: getattr(entrymod, name)
        for name in (
            "q11_sessionize",
            "q157_rolling_window_scalable",  # bucketed fix for q85's funnel
            "q133_event_transitions",
            # round-8: these two names now default to strategy="auto" —
            # the battery certifies the DEFAULT routes around the skew
            # funnel (pairwise re-measurement retired; see PLANS.md)
            "q167_linear_attribution",
            "q177_linear_attribution_scalable",
            "q190_position_attribution",
            "q194_position_attribution_scalable",
            # round-7 continuation-3: the greedy 3-sequence frontier
            # (entity-keyed joins — the hot user's frontier grows
            # linearly, events x vocab, never pairwise) and the
            # entropy-rate lag shuffle (q133's axis)
            "q257_triple_sequences",
            "q263_markov_entropy",
        )
    }
    cases["q157_rolling_window_1day"] = _rolling_window_1day
    cases["q157_rolling_window_auto"] = _rolling_window_auto

    # r10 VERDICT item 7: the auto/twin rows feed the probe-overhead
    # signal, and at their 3-5 s scale single readings are noise-bound
    # (q157_auto's overhead read -15.7% and +31.9% in consecutive r10
    # runs). Those rows measure as MEDIAN-OF-3; the rest of the battery
    # stays single-shot (its signal is the coarse skew RATIO).
    median3 = set(_AUTO_TWINS) | set(_AUTO_TWINS.values())

    def _run(fn, reps: int = 1) -> dict:
        from pytrousse_spark.operators import _probe as _pc

        row: dict[str, float] = {}
        for label, d in (("benign", tmp), ("skewed", f"{tmp}/skewdir")):
            walls = []
            for _ in range(reps):
                if reps > 1:
                    # each rep must stay COLD: without this, reps 2-3
                    # hit the memoized probe and the median mixes
                    # cold/warm, understating the cold overhead
                    _pc.clear()
                walls.append(_timed_noop(fn, spark, d))
            walls.sort()
            row[label] = walls[len(walls) // 2]
            if reps > 1:
                # half-spread = this row's own measurement noise floor;
                # _score_auto_rows flags overheads smaller than the
                # combined floors as statistically zero (r10 VERDICT
                # item 7: the warm overhead's TRUE value is ~0, so its
                # sign can never stabilize — the honest stable signal
                # is "within noise", not the sign)
                row[f"{label}_spread"] = round(
                    (walls[-1] - walls[0]) / 2.0, 3
                )
        row["ratio"] = round(row["skewed"] / row["benign"], 2)
        return row

    out: dict[str, dict] = {}
    for name, fn in cases.items():
        try:
            # cold labels must be honest: q167's probe would otherwise
            # warm q190's "cold" run through the semantic probe cache
            from pytrousse_spark.operators import _probe as _pc

            _pc.clear()
            reps = 3 if name in median3 else 1
            row = _run(fn, reps=reps)
            band = _IDLE_SKEW_RATIOS.get(name)
            if band is not None and row["ratio"] > 2 * band:
                print(
                    f"bench skew: {name} ratio {row['ratio']} > 2x idle "
                    f"band {band}; cooling down and re-running once",
                    file=sys.stderr,
                )
                time.sleep(20)
                rerun = _run(fn, reps=reps)
                row = {"first": row, **{f"{k}": v for k, v in rerun.items()}}
        except Exception as exc:
            row = {"error": str(exc)[:120]}
            print(f"bench skew: {name} failed: {exc}", file=sys.stderr)
        out[name] = row

    def _rerun_auto(name: str) -> dict:
        return _run(cases[name], reps=3 if name in median3 else 1)

    def _warm_auto(name: str) -> tuple:
        # ADVICE r10 item 2: the cold loop clears the probe cache before
        # EVERY case, so by this point only the LAST case's probe
        # survives — without priming, earlier auto rows pay a cold
        # density probe inside their "warm" measurement (and the next
        # row free-rides on it). One untimed run first, so "warm"
        # genuinely measures the memoized path for every row; then
        # median-of-3 timed reps (r10 VERDICT item 7 — the warm signal
        # was noise-bound at the 3-5 s scale).
        cases[name](spark, f"{tmp}/skewdir").write.format("noop").mode(
            "overwrite"
        ).save()
        walls = sorted(
            _timed_noop(cases[name], spark, f"{tmp}/skewdir")
            for _ in range(3)
        )
        return walls[1], round((walls[-1] - walls[0]) / 2.0, 3)

    return _score_auto_rows(out, _rerun_auto, _warm_auto)


def _score_auto_rows(out, rerun_fn, warm_fn, cooldown: float = 20.0) -> dict:
    """Auto-router scoring over a measured skew battery (r8 VERDICT
    item 2): score each auto-routed row against the routed plan (its
    scalable twin's skewed wall on the SAME table), not the mixed-path
    skewed/benign artifact; the gap over the twin is the router's probe
    cost, reported as seconds and as a fraction of the skewed wall (r8
    item 3's <10% target for the fused probe). ``rerun_fn``/``warm_fn``
    are injectable and EVERY call is guarded — a transient Spark failure
    degrades that row to its first measurement / missing warm fields
    instead of aborting the bench payload the gate reads (r10 VERDICT
    item 4; pinned by tests/test_bench_resilience.py)."""
    for auto, twin in _AUTO_TWINS.items():
        a, t = out.get(auto), out.get(twin)
        if not (
            isinstance(a, dict) and isinstance(t, dict)
            and isinstance(a.get("skewed"), (int, float))
            and isinstance(t.get("skewed"), (int, float))
            and t["skewed"] > 0
        ):
            continue
        ratio = round(a["skewed"] / t["skewed"], 2)
        if ratio > _AUTO_VS_SCALABLE_BAND:
            print(
                f"bench skew: {auto} vs-scalable ratio {ratio} > "
                f"{_AUTO_VS_SCALABLE_BAND}; cooling down and re-running "
                "the auto row once",
                file=sys.stderr,
            )
            time.sleep(cooldown)
            try:
                rerun = rerun_fn(auto)
            except Exception as exc:  # keep the first measurement (r9 ADVICE)
                print(
                    f"bench skew: {auto} rerun failed, keeping first "
                    f"measurement: {exc}",
                    file=sys.stderr,
                )
            else:
                a = {"first": a, **rerun}
                out[auto] = a
                ratio = round(a["skewed"] / t["skewed"], 2)
        a["ratio_vs_scalable"] = ratio
        # cold = first call (pays the density-probe job); steady =
        # second call on the same frame, where the router's probe is
        # memoized per semantic input (operators/_probe.py, r9 VERDICT
        # item 5) — the cost a pipeline actually pays per repeated call.
        a["probe_overhead_sec_cold"] = round(a["skewed"] - t["skewed"], 3)
        a["probe_overhead_pct_cold"] = round(
            100.0 * (a["skewed"] - t["skewed"]) / a["skewed"], 1
        )
        # noise floor = both sides' median-of-3 half-spreads; overheads
        # under it are statistically zero (r10 VERDICT item 7 — the
        # stable cross-run signal, since the warm overhead's true value
        # is ~0 and its SIGN is pure noise)
        base_noise = a.get("skewed_spread", 0.0) + t.get("skewed_spread", 0.0)
        if "skewed_spread" in a or "skewed_spread" in t:
            a["cold_overhead_within_noise"] = (
                abs(a["probe_overhead_sec_cold"]) <= base_noise
            )
        try:
            warm = warm_fn(auto)
        except Exception as exc:
            print(
                f"bench skew: {auto} warm re-measure failed: {exc}",
                file=sys.stderr,
            )
            warm = None
        if warm is not None:
            warm_spread = None
            if isinstance(warm, tuple):
                warm, warm_spread = warm
            a["skewed_warm"] = warm
            a["ratio_vs_scalable_warm"] = round(warm / t["skewed"], 2)
            a["probe_overhead_sec"] = round(warm - t["skewed"], 3)
            a["probe_overhead_pct"] = round(
                100.0 * (warm - t["skewed"]) / warm, 1
            )
            if warm_spread is not None:
                a["skewed_warm_spread"] = warm_spread
                a["warm_overhead_within_noise"] = abs(
                    a["probe_overhead_sec"]
                ) <= warm_spread + t.get("skewed_spread", 0.0)
        else:
            a["probe_overhead_sec"] = a["probe_overhead_sec_cold"]
            a["probe_overhead_pct"] = a["probe_overhead_pct_cold"]
    return out


def _streaming_throughput(spark, big_dir: str, tmp: str) -> dict:
    """Stateful-streaming evidence (round-3 VERDICT item 7 + r5 item 6):
    drive the three stateful sinks as REAL streams over the 10x corpus
    (8 files -> 8 micro-batches at maxFilesPerTrigger=1, availableNow)
    and record rows/s plus the state size — the numbers that ground the
    "state bounded by bands / the bucket grid, not corpus size" claims:

    - ``near_dup_band_alerts``: state-store rows (applyInPandasWithState);
    - ``rollup_events_stream`` / ``cusum_events_stream``: the mergeable
      partials stores' row counts (foreachBatch append sinks — their
      "state" IS the store, bounded by groups/buckets per batch).
    """
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.streaming.events import (
        cusum_events_stream,
        rollup_events_stream,
    )
    from pytrousse_spark.streaming.neardup import near_dup_band_alerts

    out: dict[str, dict] = {}
    try:
        docs = read_parquet_df(spark, f"{big_dir}/documents.parquet")
        n = docs.count()
        docs.repartition(8).write.mode("overwrite").parquet(f"{tmp}/stream_in")
        schema = spark.read.parquet(f"{tmp}/stream_in").schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/stream_in")
        )
        alerts = near_dup_band_alerts(src)
        t0 = time.perf_counter()
        q = (
            alerts.writeStream.format("noop")
            .option("checkpointLocation", f"{tmp}/stream_ck")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        state_rows = 0
        batches = 0
        for prog in q.recentProgress:
            batches += 1
            for op in prog.get("stateOperators") or []:
                state_rows = max(state_rows, op.get("numRowsTotal") or 0)
        out["near_dup_band_alerts"] = {
            "input_rows": n,
            "micro_batches": batches,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n / wall, 1),
            "state_rows": state_rows,
        }
    except Exception as exc:
        print(f"bench streaming: near_dup failed: {exc}", file=sys.stderr)
        out["near_dup_band_alerts"] = {"error": str(exc)[:200]}

    try:
        from pyspark.sql import functions as F

        ev = read_parquet_df(spark, f"{big_dir}/events.parquet")
        n_ev = ev.count()
        ev.repartition(8).write.mode("overwrite").parquet(f"{tmp}/ev_stream_in")
        ev_schema = spark.read.parquet(f"{tmp}/ev_stream_in").schema

        def _ev_src():
            return (
                spark.readStream.schema(ev_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/ev_stream_in")
            )

        t0 = time.perf_counter()
        rollup_events_stream(
            _ev_src(), ["event_type"], "value", f"{tmp}/rollup_store"
        )
        wall = time.perf_counter() - t0
        store = spark.read.parquet(f"{tmp}/rollup_store")
        out["rollup_events_stream"] = {
            "input_rows": n_ev,
            "micro_batches": store.select("__batch").distinct().count(),
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_ev / wall, 1),
            "state_rows": store.count(),
        }

        t0 = time.perf_counter()
        cusum_events_stream(_ev_src(), f"{tmp}/cusum_store", ["event_type"])
        wall = time.perf_counter() - t0
        store = spark.read.parquet(f"{tmp}/cusum_store")
        out["cusum_events_stream"] = {
            "input_rows": n_ev,
            "micro_batches": store.select("__batch").distinct().count(),
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_ev / wall, 1),
            "state_rows": store.count(),
        }

        from pytrousse_spark.streaming.events import ohlc_events_stream

        t0 = time.perf_counter()
        ohlc_events_stream(
            _ev_src(), "event_type", "value", f"{tmp}/ohlc_store"
        )
        wall = time.perf_counter() - t0
        store = spark.read.parquet(f"{tmp}/ohlc_store")
        out["ohlc_events_stream"] = {
            "input_rows": n_ev,
            "micro_batches": store.select("__batch").distinct().count(),
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_ev / wall, 1),
            "state_rows": store.count(),
        }
        from pytrousse_spark.streaming.events import unicode_census_stream

        # documents stream was already staged for the near-dup row
        doc_schema = spark.read.parquet(f"{tmp}/stream_in").schema
        n_docs = spark.read.parquet(f"{tmp}/stream_in").count()
        t0 = time.perf_counter()
        unicode_census_stream(
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/stream_in"),
            "source",
            "text",
            f"{tmp}/uc_store",
        )
        wall = time.perf_counter() - t0
        store = spark.read.parquet(f"{tmp}/uc_store")
        out["unicode_census_stream"] = {
            "input_rows": n_docs,
            "micro_batches": store.select("__batch").distinct().count(),
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_docs / wall, 1),
            "state_rows": store.count(),
        }
    except Exception as exc:
        print(f"bench streaming: maintenance sinks failed: {exc}", file=sys.stderr)
        out.setdefault("rollup_events_stream", {"error": str(exc)[:200]})
        out.setdefault("cusum_events_stream", {"error": str(exc)[:200]})
        out.setdefault("ohlc_events_stream", {"error": str(exc)[:200]})
        out.setdefault("unicode_census_stream", {"error": str(exc)[:200]})
    return out


def _micro_probe() -> float:
    """The fixed single-core CPU probe (20M integer adds) — one number
    that moves when the HOST slows (e.g. %steal), not when the code
    does."""
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def _run_anchor_pass(spark, sf_dir: str, qs: dict, names: list) -> tuple:
    """One probe-adjacent anchor pass (r9 VERDICT item 3): the
    micro-probe immediately followed by the 46 r1-anchor queries, so
    every anchor measurement carries a LOCAL host-speed reading. A
    start-only (or start+end) probe cannot certify a ~10-minute run on
    a host that drifts ~2x on 10-minute scales (r9's recorded 2.918 vs
    1.20-1.39 idle truth); three passes spread across the run, scored
    by MINIMUM, make one slow-host window unable to poison the gate."""
    from pytrousse_spark.operators import _probe as _pc

    probe = _micro_probe()
    walls: dict[str, float] = {}
    for name in names:
        _pc.clear()  # each timed query self-contained (r12 VERDICT item 1)
        spark.catalog.clearCache()  # drop staged persists, outside timer
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            walls[name] = -1.0
            _record_err(f"anchor_rerun:{name}", exc)
    return probe, walls


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # host-load guard (r5 VERDICT item 2): BENCH_r05's recorded numbers
    # were taken right after the 12-minute test suite and read as fake
    # regressions; the archived JSON now carries the 1/5/15-minute load
    # averages at start and end so a polluted run is self-identifying.
    #
    # r7 hardening: labeling was not enough — BENCH_r06 was still
    # RECORDED at loadavg_start 4.66 (anchor read 1.102 vs the same
    # round's idle band 0.834-0.977). Before timing anything, wait for
    # the 1-minute load to drain below a threshold (default 2.0, i.e.
    # ~6% of 32 cores), checking every 10 s, bounded at 5 minutes so a
    # genuinely busy host still produces a (self-labeled) number.
    cool_thresh = float(os.environ.get("SPARK_GRAFT_LOAD_THRESH", "2.0"))
    cool_max = float(os.environ.get("SPARK_GRAFT_COOLDOWN_MAX_SEC", "300"))
    waited = 0.0
    while os.getloadavg()[0] > cool_thresh and waited < cool_max:
        time.sleep(10)
        waited += 10
    load_start = [round(x, 2) for x in os.getloadavg()]

    # page-cache indicator (r9 finding): a run after the cache is
    # dropped reads every parquet cold from disk and the anchors read
    # ~2x WITHOUT the pure-CPU probe moving (observed: buff/cache 1 GB
    # -> anchor 2.48 at probe 0.71 vs warm-cache 1.20 at 0.725). The
    # cached-bytes figure makes cold-I/O runs self-identifying the way
    # loadavg identifies busy-CPU runs.
    cached_gb_start = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("Cached:"):
                    cached_gb_start = round(int(line.split()[1]) / 1048576, 2)
                    break
    except OSError:
        pass

    # fixed single-core CPU probe (20M integer adds): host-speed drift
    # between rounds is otherwise invisible in the archived JSON — the
    # r7 finding was a stable 1.15x anchor ratio on an IDLE host with
    # code and data untouched since the 0.83-0.93 r5-era idle band,
    # i.e. the box itself got slower; this number lets a future reader
    # normalize anchors across rounds instead of chasing phantom
    # regressions.
    cpu_probe = _micro_probe()

    spark = get_spark(app_name="pytrousse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(entrymod.queries())
    # production-path variants (xxhash tier, raw BLAS) — timed, no oracle
    qs.update(entrymod.bench_extras())
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers once with the cheapest query.
    entrymod.q04_filter_agg(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # r8 finding (PLANS.md "anchor creep diagnosed"): queries ran in
    # ONE sorted pass, so the r1-anchor set — 46 names that sort LATE
    # ("q46" > "q2xx" lexicographically) — inherited the JVM heap/GC
    # pressure of the ~250 queries before them, and the anchor ratio
    # crept up exactly as the suite grew (r5 0.97 -> r7 1.19 -> 1.90
    # in-run this round vs 1.38 on a fresh JVM). BENCH_r01 measured
    # those queries in a 46-query session; comparability requires the
    # same conditions, so the anchor block now runs FIRST (right after
    # warmup), then everything else in sorted order. Each query still
    # runs exactly once; only the order changed.
    anchor_first: list[str] = []
    try:
        with open(
            os.path.join(os.path.dirname(__file__), "BENCH_r01.json")
        ) as f:
            anchor_first = [
                k for k in sorted(json.load(f)["parsed"]["queries"])
                if k in qs
            ]
    except (OSError, KeyError, ValueError):
        pass
    rest = [k for k in sorted(qs) if k not in set(anchor_first)]

    # probe adjacent to anchor pass 1 (r9 VERDICT item 3): the anchor
    # block runs first inside the main loop; this probe is its local
    # host-speed reading.
    probe_pass1 = _micro_probe()
    t_all = time.perf_counter()
    from pytrousse_spark.operators import _probe as _probe_cache

    for name in anchor_first + rest:
        # Each timed query must be self-contained (r12 VERDICT item 1):
        # drop memoized router probes and trained artifacts (kmeans
        # centroids) left by earlier queries, so e.g. q79/q82/q215 pay
        # their own training instead of riding q78's. Runs OUTSIDE the
        # per-query timer; the intra-query memo (one training shared by
        # several consumers inside one query) is untouched.
        _probe_cache.clear()
        # ... and drop cached staging relations (io.stage_unbounded
        # persists) deterministically instead of waiting for the 2-min
        # cleaner GC — storage blocks from earlier queries must not
        # squeeze this query's execution memory (r12's in-bench vs
        # isolated inflation class). Also outside the timer.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            _record_err(name, exc)
    total = round(time.perf_counter() - t_all, 3)

    # anchor pass 2 of 3 — middle of the run, outside t_all so the
    # headline total stays comparable to prior rounds (each query still
    # counts exactly once in `value`).
    anchor_passes: list[tuple] = [
        (probe_pass1, {k: timings.get(k, -1.0) for k in anchor_first})
    ]
    if anchor_first and os.environ.get("SPARK_GRAFT_SKIP_ANCHOR_RERUNS") != "1":
        anchor_passes.append(
            _run_anchor_pass(spark, sf_dir, qs, anchor_first)
        )

    # 10x scale-up timings for the shuffle-heaviest queries + stateful
    # streaming throughput over the same corpus; kept OUTSIDE the headline
    # total so round-over-round comparisons stay apples-to-apples with
    # BENCH_r01/r02. Skippable for quick local iteration.
    headroom: dict[str, float] = {}
    skew: dict = {}
    streaming: dict = {}
    if os.environ.get("SPARK_GRAFT_SKIP_HEADROOM") != "1":
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="pytrousse_headroom_")
        try:
            _build_10x_corpus(spark, sf_dir, tmp)
            _build_skewed_events(spark, tmp)
            headroom = _headroom_10x(spark, tmp)
            skew = _skew_stress(spark, tmp)
            streaming = _streaming_throughput(spark, tmp, tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # anchor pass 3 of 3 — end of the run, after the headroom/skew/
    # streaming minutes, so the three passes bracket the whole window.
    if anchor_first and os.environ.get("SPARK_GRAFT_SKIP_ANCHOR_RERUNS") != "1":
        anchor_passes.append(
            _run_anchor_pass(spark, sf_dir, qs, anchor_first)
        )

    # r1-anchor comparison computed HERE so the driver's (truncated-tail)
    # recording keeps the headline numbers: BENCH_r01's 46 queries at
    # 37.551s total are the binding baseline (the reference publishes no
    # numbers, BASELINE.md §1); ratio < 2.0 is the driver's gate.
    anchor_sum = None
    anchor_ratio = None
    anchor_ratio_norm = None
    anchor_pass_detail: list[dict] = []
    # probe-normalization constant (r7 VERDICT item 3): the r7 driver
    # run is the pinned (probe, anchor) pair — cpu_probe_sec 0.756
    # alongside anchor_r1_ratio 1.189 (BENCH_r07.json). normalized =
    # ratio * (PROBE_R7 / probe): a slower host (bigger probe) scales
    # the ratio down proportionally. No probe exists from the r1 era,
    # so this normalizes to the r7 host, not to r1 absolute speed:
    # read it against r7's own 1.189, not against 1.0.
    _PROBE_R7 = 0.756
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_r01.json")) as f:
            r1 = json.load(f)["parsed"]["queries"]
        r1_sum = sum(r1.values())
        # r9 VERDICT item 3 — drift-proof scoring: each pass pairs the
        # anchor block with an ADJACENT micro-probe; the recorded ratio
        # is the MINIMUM over the (up to) three passes spread across
        # the run, so a transient slow-host window (%steal, cold page
        # cache) during ONE pass cannot poison the gate. r9's recorded
        # 2.918 came from exactly such a window (idle truth 1.20-1.39).
        for probe_i, walls_i in anchor_passes:
            if not all(walls_i.get(k, -1) >= 0 for k in r1):
                continue
            sum_i = round(sum(walls_i[k] for k in r1), 3)
            ratio_i = round(sum_i / r1_sum, 3)
            norm_i = (
                round(ratio_i * (_PROBE_R7 / probe_i), 3)
                if probe_i > 0
                else None
            )
            anchor_pass_detail.append(
                {
                    "sum_sec": sum_i,
                    "ratio": ratio_i,
                    "probe_adjacent_sec": probe_i,
                    "ratio_normalized": norm_i,
                    # per-query walls so drift audits can read the BEST
                    # pass, not the (possibly slow-window) first one;
                    # sits before the payload's tail scalars so the
                    # driver's truncated recording keeps the headline
                    "queries": {k: walls_i[k] for k in sorted(r1)},
                }
            )
        if anchor_pass_detail:
            best = min(anchor_pass_detail, key=lambda p: p["ratio"])
            anchor_sum = best["sum_sec"]
            anchor_ratio = best["ratio"]
            norms = [
                p["ratio_normalized"]
                for p in anchor_pass_detail
                if p["ratio_normalized"] is not None
            ]
            anchor_ratio_norm = min(norms) if norms else None
    except (OSError, KeyError, ValueError):
        pass

    # r8 VERDICT item 4: the normalization constant rested on ONE idle
    # (probe, anchor) pair. Every run appends its pair to an UNTRACKED
    # local history (bench_runs/probe_history.json — survives because
    # runs never clobber the committed reference, item 6 below); the
    # payload carries the history plus the median probe over IDLE runs
    # (load1 at start <= the cooldown threshold), the firmer constant a
    # future round can re-pin against (rule recorded in PLANS.md).
    runs_dir = os.path.join(os.path.dirname(__file__), "bench_runs")
    probe_history: list[dict] = []
    try:
        os.makedirs(runs_dir, exist_ok=True)
        hist_path = os.path.join(runs_dir, "probe_history.json")
        try:
            with open(hist_path) as f:
                probe_history = json.load(f)
        except (OSError, ValueError):
            probe_history = []
        probe_history.append(
            {
                "probe": cpu_probe,
                "anchor": anchor_ratio,
                "load1_start": load_start[0],
                "unix_ts": int(time.time()),
                # r10: anchors are only comparable at the r1 scale
                # factor; sf-tagged so an sf0.01 smoke run can't be
                # read as an sf0.1 anchor drift
                "sf": sf,
            }
        )
        with open(hist_path, "w") as f:
            json.dump(probe_history, f, indent=1)
    except OSError:
        pass
    idle_probes = sorted(
        h["probe"]
        for h in probe_history
        if h.get("probe") and (h.get("load1_start") or 0.0) <= cool_thresh
    )
    probe_idle_median = (
        round(
            (
                idle_probes[len(idle_probes) // 2]
                if len(idle_probes) % 2
                else (
                    idle_probes[len(idle_probes) // 2 - 1]
                    + idle_probes[len(idle_probes) // 2]
                )
                / 2.0
            ),
            3,
        )
        if idle_probes
        else None
    )

    # r8 VERDICT item 5: the 10-40% idle-to-idle swings concentrate in
    # the declared exact-baseline rows (oracle anchors, not production
    # paths) — split the headline total so the production paths can be
    # tracked apart from them. The combined `value` stays the driver's
    # gate for round-over-round continuity.
    _DECLARED_BASELINES = {
        "q46_embedding_neardup",
        "q46b_neardup_blas",
        "q47_cosine_topk",
        "x46_neardup_blas_raw",
        "x100_quantiles_exact_baseline",
    }
    value_baselines = round(
        sum(v for k, v in timings.items() if k in _DECLARED_BASELINES and v > 0),
        3,
    )
    value_production = round(
        sum(v for k, v in timings.items() if k not in _DECLARED_BASELINES and v > 0),
        3,
    )

    # Key order is deliberate: the driver records only the TAIL of this
    # line, so the big per-query map goes FIRST and every summary scalar
    # (total, anchor ratio, sf) goes LAST — a truncated tail still shows
    # the headline numbers.
    # end-of-run CPU probe (r9 finding): host speed drifts up to ~2x on
    # ~10-minute scales (same 20M-add loop read 0.71s at one run's
    # start and 1.38s forty minutes later, %steal visible), so a
    # single start-probe can certify a run whose tail ran on a slow
    # host. The pair brackets the run; normalized_mean uses their mean.
    # (r10: the BINDING anchor is now min-of-3 probe-adjacent passes —
    # anchor_r1_passes above — so these bracketing probes are purely
    # drift indicators.)
    cpu_probe_end = _micro_probe()
    anchor_ratio_norm_mean = None
    if anchor_ratio is not None and cpu_probe > 0 and cpu_probe_end > 0:
        anchor_ratio_norm_mean = round(
            anchor_ratio * (0.756 / ((cpu_probe + cpu_probe_end) / 2.0)), 3
        )

    payload = {
        "queries": timings,
        "headroom_10x": headroom,
        "skew_stress": skew,
        "streaming": streaming,
        "metric": "headline_queries_wall_clock",
        "unit": "sec",
        "n_queries": len(timings),
        "n_failed": sum(1 for v in timings.values() if v < 0),
        "probe_history": probe_history,
        "anchor_r1_passes": anchor_pass_detail,
        "anchor_r1_sum_sec": anchor_sum,
        "anchor_r1_ratio": anchor_ratio,
        "anchor_r1_ratio_normalized": anchor_ratio_norm,
        "probe_idle_median": probe_idle_median,
        # load fields sit in the TAIL so the driver's truncated
        # recording always keeps them
        "loadavg_start": load_start,
        "cached_gb_start": cached_gb_start,
        "cpu_probe_sec": cpu_probe,
        "cpu_probe_end_sec": cpu_probe_end,
        "anchor_r1_ratio_normalized_mean": anchor_ratio_norm_mean,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cooldown_wait_sec": round(waited, 1),
        # failure reasons sit in the TAIL (usually {}) so the driver's
        # truncated recording keeps them when a query DOES fail —
        # r11's undiagnosable q28 -1.0 class
        "query_errors": _QUERY_ERRORS,
        "value_production": value_production,
        "value_baselines": value_baselines,
        "value": total,
        "sf": sf,
    }
    print(json.dumps(payload))
    # the driver archives only a 2000-char TAIL of the line above, so
    # per-query history is lost round-over-round (the r8 anchor-creep
    # diagnosis had no r7 per-query walls to diff against). Persist the
    # FULL payload locally — r8 VERDICT item 6: runs write an UNTRACKED
    # timestamped file under bench_runs/ so a driver/iteration run never
    # dirties the tree or silently swaps the committed reference's
    # identity; `--commit-reference` (or SPARK_GRAFT_COMMIT_REFERENCE=1)
    # explicitly refreshes the tracked BENCH_LOCAL_full.json snapshot.
    try:
        with open(
            os.path.join(
                runs_dir, f"BENCH_LOCAL_{int(time.time())}.json"
            ),
            "w",
        ) as f:
            json.dump(payload, f, indent=1)
    except OSError:
        pass
    if (
        "--commit-reference" in sys.argv
        or os.environ.get("SPARK_GRAFT_COMMIT_REFERENCE") == "1"
    ):
        try:
            with open(
                os.path.join(
                    os.path.dirname(__file__), "BENCH_LOCAL_full.json"
                ),
                "w",
            ) as f:
                json.dump(payload, f, indent=1)
        except OSError:
            pass


if __name__ == "__main__":
    main()
