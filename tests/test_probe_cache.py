"""Router-probe memoization (r9 VERDICT item 5): the strategy="auto"
density probes re-scanned their inputs on every call — 28.7% of
q157_auto's wall. operators/_probe.cached_probe memoizes per semantic
input plan; these tests pin (1) the cache contract itself, (2) that
the rolling-window and attribution routers actually ride it with
UNCHANGED routing decisions, (3) that a semantically different frame
never hits another frame's probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from pytrousse_spark.operators import _probe
from tests.conftest import SF_DIR


def test_cached_probe_contract(spark):
    _probe.clear()
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return 42

    a = spark.range(10).select(F.col("id").alias("k"))
    b = spark.range(10).select(F.col("id").alias("k"))  # same plan
    c = spark.range(11).select(F.col("id").alias("k"))  # different plan

    assert _probe.cached_probe("t", (a,), ("k",), compute) == 42
    assert calls["n"] == 1
    # semantically identical frame -> hit, compute NOT re-run
    assert _probe.cached_probe("t", (b,), ("k",), compute) == 42
    assert calls["n"] == 1
    # different params or kind or plan -> miss
    assert _probe.cached_probe("t", (a,), ("x",), compute) == 42
    assert calls["n"] == 2
    assert _probe.cached_probe("u", (a,), ("k",), compute) == 42
    assert calls["n"] == 3
    assert _probe.cached_probe("t", (c,), ("k",), compute) == 42
    assert calls["n"] == 4
    _probe.clear()


def test_cached_probe_lru_bound(spark):
    _probe.clear()
    df = spark.range(3)
    for i in range(_probe._MAX_ENTRIES + 10):
        _probe.cached_probe("bound", (df,), (i,), lambda: i)
    app = spark.sparkContext.applicationId
    assert len(_probe._CACHES[app]) <= _probe._MAX_ENTRIES
    _probe.clear()


def test_probe_cache_scoped_per_application(spark):
    """r10 ADVICE item 3: entries from another (stopped) application
    must be dropped the first time the live application touches the
    cache — stale DataFrames may not linger until LRU eviction."""
    from collections import OrderedDict

    _probe.clear()
    df = spark.range(5)
    _probe.cached_probe("scope", (df,), (1,), lambda: 7)
    app = spark.sparkContext.applicationId
    assert set(_probe._CACHES) == {app}
    # plant a dead application's cache; the next call must evict it
    with _probe._LOCK:
        _probe._CACHES["application_dead_123"] = OrderedDict(
            {("k", (0,), ()): ((df,), 9)}
        )
    assert _probe.cached_probe("scope", (df,), (1,), lambda: 99) == 7
    assert set(_probe._CACHES) == {app}
    _probe.clear()


def test_probe_cache_thread_safety(spark):
    """Concurrent cached_probe calls from many threads (multi-threaded
    driver) must neither corrupt the LRU nor raise."""
    import threading

    _probe.clear()
    df = spark.range(7)
    errs: list[Exception] = []

    def worker(t: int) -> None:
        try:
            for i in range(50):
                v = _probe.cached_probe(
                    "mt", (df,), (i % 8,), lambda i=i: i % 8
                )
                assert v == i % 8
        except Exception as exc:  # pragma: no cover - failure path
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    app = spark.sparkContext.applicationId
    assert len(_probe._CACHES[app]) <= _probe._MAX_ENTRIES
    _probe.clear()


def test_rolling_router_probe_cached_and_routing_unchanged(spark):
    """Two auto calls on the same frame run ONE probe job; the cached
    density still routes per-call thresholds independently (window at
    the default bound, bucketed when the bound is forced below the
    densest key) — i.e. memoization changes cost, never decisions."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import rolling_time_window

    _probe.clear()
    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    kw = dict(key_col="user_id", ts_col="ts", value_col="value",
              window="1 hour")

    real = _probe.cached_probe
    seen = {"computes": 0}

    def spy(kind, dfs, params, compute):
        def counting():
            seen["computes"] += 1
            return compute()
        return real(kind, dfs, params, counting)

    import unittest.mock as mock

    with mock.patch.object(_probe, "cached_probe", side_effect=spy):
        # rebind the name the router imports (function-local import)
        import pytrousse_spark.operators.timeseries as ts_mod  # noqa: F401

        auto_lo = rolling_time_window(ev, strategy="auto", **kw)
        auto_hi = rolling_time_window(
            ev, strategy="auto", auto_max_key_rows=1, **kw
        )
    # NOTE: the router does `from ._probe import cached_probe` inside
    # the call, so the mock.patch above intercepts both calls.
    assert seen["computes"] == 1, "second auto call must hit the cache"
    lo_plan = auto_lo._jdf.queryExecution().optimizedPlan().toString()
    hi_plan = auto_hi._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in lo_plan  # benign density -> plain window
    assert "Join" in hi_plan      # forced bound -> bucketed
    _probe.clear()


def test_attribution_probe_shared_across_flavors(spark):
    """linear + position attribution over the SAME inputs pay ONE
    density probe (the pipeline case q167/q190 model), and both route
    exactly as they would uncached."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.cohort import _route_attribution

    _probe.clear()
    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase")
    touches = ev.where(F.col("event_type") != "purchase")

    real = _probe.cached_probe
    seen = {"computes": 0}

    def spy(kind, dfs, params, compute):
        def counting():
            seen["computes"] += 1
            return compute()
        return real(kind, dfs, params, counting)

    import unittest.mock as mock

    with mock.patch.object(_probe, "cached_probe", side_effect=spy):
        r1 = _route_attribution(
            purchases, touches, "user_id", "auto", 4_000_000
        )
        r2 = _route_attribution(
            purchases, touches, "user_id", "auto", 4_000_000
        )
        # same probe, tighter budget -> may route differently, but must
        # NOT recompute
        r3 = _route_attribution(purchases, touches, "user_id", "auto", 0)
    assert seen["computes"] == 1
    assert r1 == r2
    assert r3 == "scalable"  # any positive mass exceeds a 0 budget
    _probe.clear()


def test_bench_main_loop_is_memo_free(spark):
    """r12 VERDICT item 1: the bench's timed loops must clear the probe
    cache before every query, so no query's wall rides another query's
    trained artifact (q79/q82/q215 riding q78's kmeans training).

    Two pins: (1) functional — a poisoned kmeans_cents entry IS live
    until cleared, and clear() forces a retrain to the true value, i.e.
    the bench's per-query clear is sufficient to restore honesty;
    (2) source tripwire — bench.py's main timed loop and anchor passes
    actually call clear() before starting each query's timer."""
    import os
    import re

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.clustering import kmeans_fit

    emb = read_parquet_df(spark, f"{SF_DIR}/embeddings.parquet")
    _probe.clear()
    true_cents = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=1)

    # plant a poisoned entry under the exact key kmeans_fit uses
    poisoned = [[9.9] * len(true_cents[0]) for _ in true_cents]
    app = spark.sparkContext.applicationId
    key = ("kmeans_cents", (emb.semanticHash(),), ("vec_id", "embedding", 4, 1))
    with _probe._LOCK:
        _probe._CACHES.setdefault(app, __import__("collections").OrderedDict())[
            key
        ] = ((emb,), poisoned)
    assert kmeans_fit(emb, "vec_id", "embedding", k=4, iters=1) == poisoned
    # the bench's discipline: clear between queries -> retrains honestly
    _probe.clear()
    assert kmeans_fit(emb, "vec_id", "embedding", k=4, iters=1) == true_cents
    _probe.clear()

    # source tripwire: every timed loop in bench.py clears first
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench.py")) as f:
        src = f.read()
    # main loop: clear() must precede the query timer (hygiene lines
    # like clearCache() may sit between them)
    assert re.search(
        r"_probe_cache\.clear\(\)(.|\n){0,400}?t0 = time\.perf_counter\(\)",
        src,
    ), "bench main loop no longer clears the probe cache per query"
    # anchor passes
    assert re.search(
        r"_pc\.clear\(\)(.|\n){0,400}?t0 = time\.perf_counter\(\)", src
    ), "bench anchor pass no longer clears the probe cache per query"
