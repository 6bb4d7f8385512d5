"""Registry for DataFrames persisted INSIDE operators.

Several operators persist an intermediate frame because it feeds two or
more consumers of the plan they return (jaccard_pairs' token table,
cluster_pruned_pairs' cell assignment, the percentile family's
distinct-value counts). The caller holds no handle to those frames, so in
a long multi-query session the caches would accumulate until LRU eviction,
competing with executor memory.

Every such internal ``persist()`` goes through :func:`registered_persist`;
a pipeline (or test fixture) calls :func:`release_caches` after the action
that consumed the result. Releasing is safe at any point — Spark recomputes
an unpersisted frame if a plan still references it — so the hook trades at
worst a recompute for bounded cache residency.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_REGISTRY: list[DataFrame] = []


def registered_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER,
) -> DataFrame:
    """persist() + enroll in the module registry for later release."""
    out = df.persist(level)
    _REGISTRY.append(out)
    return out


def release_caches() -> int:
    """Unpersist every operator-internal cache; returns how many."""
    n = len(_REGISTRY)
    while _REGISTRY:
        _REGISTRY.pop().unpersist()
    return n
