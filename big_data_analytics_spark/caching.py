"""Registry of the session-lifetime fixture caches (VERDICT r12 task
7): several query modules memoize localCheckpoint'd relations or
measured bounds per (session, sf_dir) — the steady-state warm path a
long-lived session rides (graph edge/label relations, the LSH index,
IVF centroids, e-commerce shaped tables, eval bounds). They are
correctness-neutral (keyed by immutable fixture + applicationId) but
make SHARED-SESSION timing readings order-dependent: the query that
happens to run first pays the build, every later family member rides
it, and a reordered bench reads as a regression (the gr5/seg1/ecom_clv
drift-triage class — three rounds of isolated re-probes to explain).

``evict_all()`` drops every registered cache so a caller (bench.py
--isolate-families) can fence timing sections; each cache module
registers its dict at import time via ``register_cache``.
"""

from __future__ import annotations

_REGISTRY: list[dict] = []


def register_cache(cache: dict) -> dict:
    """Register a module-level cache dict for bulk eviction; returns
    the dict so modules can register at definition site."""
    _REGISTRY.append(cache)
    return cache


def _unpersist(obj) -> None:
    """Best-effort unpersist of a cache value: ``.persist()``'d
    DataFrames (e.g. the src-partitioned edge copy) hold executor
    storage through the CacheManager until explicitly released —
    clearing the dict alone leaves the blocks live until the Python/
    JVM references happen to be GC'd, so repeated --isolate-families
    cycles would accumulate edge copies (r15 ADVICE).
    localCheckpoint'd relations report is_cached=False here and stay
    on the existing ContextCleaner GC path."""
    from pyspark.sql import DataFrame

    if isinstance(obj, DataFrame):
        try:
            if obj.is_cached:
                obj.unpersist()
        except Exception:
            pass  # a dead session's DataFrame: nothing to release
    elif isinstance(obj, (tuple, list)):
        for member in obj:
            _unpersist(member)


def evict_all() -> int:
    """Clear every registered cache — ``.persist()``'d values are
    unpersisted first; checkpointed relations are then unreferenced
    and GC'd by the ContextCleaner. Returns the number of evicted
    entries."""
    n = 0
    for cache in _REGISTRY:
        n += len(cache)
        for value in cache.values():
            _unpersist(value)
        cache.clear()
    return n
