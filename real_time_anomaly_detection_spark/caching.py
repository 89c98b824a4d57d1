"""Tracked persistence for multi-referenced intermediate relations.

Query builders and batch operators persist relations that both sides of a
self-join reference (the q29/q34/q40/q42/q43 pattern) — but a builder
returns its result DataFrame lazily, so it cannot unpersist before the
caller's action runs. In a one-shot CLI process that is fine (the JVM
exits); in a long-lived session that invokes many builders — the bench
envelope loops, the oracle-parity suite, a notebook user — those cached
relations accumulate until LRU eviction starts churning caches other
components still need (ADVICE r5).

``persist_tracked`` is the drop-in replacement for ``df.persist()`` at
those sites: it persists AND registers the relation. ``release_cached()``
unpersists everything registered and drains the registry — precise, unlike
``spark.catalog.clearCache()``, which also drops caches the validation
engine still owns (its per-run persisted meta/verdict relations are
released by ``engine.release`` on the run's own lifecycle).

Call ``release_cached()`` after the action that consumes a builder's
result (bench loops and the parity suite do; the CLI calls it before
exit as a belt for future multi-command modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` (default storage level) and register it for
    ``release_cached``. Returns ``df`` for call-site chaining."""
    df.persist()
    _CACHED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked relation; returns how many were released.

    Safe to call at any time: unpersisting a relation mid-plan only
    forces recompute, never wrong results, and a stopped SparkContext
    underneath a stale reference is swallowed."""
    n = 0
    while _CACHED:
        df = _CACHED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    return n


def tracked_count() -> int:
    """How many relations are currently registered (test/introspection)."""
    return len(_CACHED)
