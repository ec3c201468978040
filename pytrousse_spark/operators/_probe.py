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
bounded at 64.

SAFETY: every cached value is a ROUTING density statistic, never a
query result — the routed physical forms are bit-identical by
contract (the percent_rank/attribution/rolling-window router
convention), so a stale hit (file overwritten under an identical
plan) can only pick the *other equally-correct* plan, never a wrong
answer. That is exactly the trade a hint parameter makes explicit;
``clear()`` exists for tests and long-lived drivers.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Sequence

_MAX_ENTRIES = 64
_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()


def clear() -> None:
    _CACHE.clear()


def cached_probe(
    kind: str,
    dfs: Sequence,
    params: tuple,
    compute: Callable[[], int],
) -> int:
    """Return ``compute()`` memoized on (kind, semantic plan of every
    input frame, params). Falls back to an uncached call if the
    semantic-hash API is unavailable (never raises on cache machinery).
    """
    try:
        key = (kind, tuple(df.semanticHash() for df in dfs), params)
    except Exception:
        return compute()
    hit = _CACHE.get(key)
    if hit is not None:
        old_dfs, value = hit
        try:
            if all(o.sameSemantics(d) for o, d in zip(old_dfs, dfs)):
                _CACHE.move_to_end(key)
                return value
        except Exception:
            pass
    value = compute()
    _CACHE[key] = (tuple(dfs), value)
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return value
