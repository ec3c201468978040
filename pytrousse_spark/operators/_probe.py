"""Router-probe memoization shared by the strategy="auto" routers
(r9 VERDICT item 5: q157_auto paid a 28.7% probe overhead — 0.72 s of
density probe on a 1.2 s query — because every call re-scanned its
inputs; pipelines that call two attribution flavors, or the same
rolling window repeatedly, on the SAME frame re-paid it each time).

The cache keys on each input DataFrame's Catalyst *semantic hash*
(``DataFrame.semanticHash`` — equal for plans that are semantically
identical after normalization, e.g. two ``spark.read.parquet(p)`` of
the same path) plus the probe's parameters, and verifies hits with
``sameSemantics`` so a hash collision can never return the wrong
probe. Entries are (weakly-sized) plan objects, not data; the LRU is
bounded at 64 per application.

Lifetime & concurrency (r10 ADVICE item 3): the cache is SCOPED PER
SPARK APPLICATION — entries key under ``sparkContext.applicationId``,
and touching the cache from a newer application drops every older
application's entries, so DataFrames (and their SparkSession) from a
stopped session are released instead of lingering until LRU eviction
with ``sameSemantics`` raising on every hit. All mutations hold a
``threading.Lock`` so multi-threaded drivers can't corrupt the
OrderedDict mid-resize.

SAFETY: cached values are either ROUTING density statistics (a stale
hit can only pick the *other equally-correct* bit-identical physical
form — the percent_rank/attribution/rolling-window router
convention) or DETERMINISTIC-TRAINING artifacts (``kmeans_fit``
centroids — a pure function of the input frame's content, the
``__spark_entry__._pq_books`` trained-artifact discipline with
stricter keying). Either way a hit requires the same application AND
a ``sameSemantics`` plan, i.e. the same data under the per-session
table-cache invariant; ``clear()`` exists for tests and long-lived
drivers.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Callable, Sequence

_MAX_ENTRIES = 64
_CACHES: "dict[str, OrderedDict[tuple, tuple]]" = {}
_LOCK = threading.Lock()


def clear() -> None:
    with _LOCK:
        _CACHES.clear()


def _cache_for(app: str) -> "OrderedDict[tuple, tuple]":
    """The current application's LRU; caches left by any OTHER
    application are dropped (their JVM-side plans are dead — holding
    them only pins stopped sessions)."""
    for stale in [a for a in _CACHES if a != app]:
        del _CACHES[stale]
    return _CACHES.setdefault(app, OrderedDict())


def cached_probe(
    kind: str,
    dfs: Sequence,
    params: tuple,
    compute: Callable[[], int],
) -> int:
    """Return ``compute()`` memoized on (application, kind, semantic
    plan of every input frame, params). Falls back to an uncached call
    if the semantic-hash API is unavailable (never raises on cache
    machinery).
    """
    try:
        app = dfs[0].sparkSession.sparkContext.applicationId
        key = (kind, tuple(df.semanticHash() for df in dfs), params)
    except Exception:
        return compute()
    with _LOCK:
        cache = _cache_for(app)
        hit = cache.get(key)
    if hit is not None:
        old_dfs, value = hit
        try:
            if all(o.sameSemantics(d) for o, d in zip(old_dfs, dfs)):
                with _LOCK:
                    if key in cache:
                        cache.move_to_end(key)
                return value
        except Exception:
            pass
    value = compute()
    with _LOCK:
        cache = _cache_for(app)
        cache[key] = (tuple(dfs), value)
        while len(cache) > _MAX_ENTRIES:
            cache.popitem(last=False)
    return value
