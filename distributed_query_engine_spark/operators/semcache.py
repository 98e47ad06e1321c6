"""Session-scoped persist registries keyed by SEMANTIC plan equality.

``_grams`` (operators/dedup.py) and ``partitioned_running``
(operators/prefix.py) persist their fan-out/pid-stamped relations and
must reuse the SAME materialization across consumers in one session.
They key on the analyzed plan's 32-bit ``semanticHash`` — but Spark's
own CacheManager treats that hash only as a fast path and confirms with
``sameResult`` before serving a cache entry; a raw-hash registry could
collide across two distinct (corpus, k) plans and silently return the
wrong persisted relation (r12 ADVICE). This module is the shared
confirm-on-hit implementation: registries map ``hash -> [DataFrame]``
and a hit is served only after ``sameResult`` on the analyzed plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Registry = "dict[int, list[DataFrame]]"


def persist_semantic(
    registry: "dict[int, list[DataFrame]]",
    df: DataFrame,
    storage_level=None,
) -> DataFrame:
    """Return the registered relation semantically equal to ``df``,
    persisting (MEMORY_AND_DISK by default) and registering ``df``
    itself if none exists. Hash hit ≠ reuse: equality is confirmed with
    ``sameResult`` on the analyzed plans, exactly like Spark's
    CacheManager."""
    from pyspark import StorageLevel

    plan = df._jdf.queryExecution().analyzed()
    key = plan.semanticHash()
    for cached in registry.get(key, []):
        if cached._jdf.queryExecution().analyzed().sameResult(plan):
            return cached
    df = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    registry.setdefault(key, []).append(df)
    return df


def release_semantic(registry: "dict[int, list[DataFrame]]") -> int:
    """Unpersist every registered relation (blocking=False — Spark
    frees the blocks asynchronously); returns the count released."""
    n = 0
    while registry:
        _, dfs = registry.popitem()
        for df in dfs:
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass  # session already stopped — nothing left to free
    return n
