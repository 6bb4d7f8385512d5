"""Generic cached external lookup (SURVEY.md §2.1 S8).

The reference's REST enrichment (PubChem PUG CAS->CID, rate-limited +
disk-memoized, 07_integrate_ctdbase.R:13-28) generalized: a parquet-backed
key-value cache; only anti-join misses hit the (rate-limited) fetcher; the
result is a mapping table you broadcast-join onto the dataflow — external
I/O never touches the distributed hot path.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chemharmony_spark.sources.readers import read_parquet_cache_if_exists


def cached_lookup(
    spark: SparkSession,
    keys: DataFrame,
    cache_path: str,
    fetch: Callable[[str], str | None],
    key_col: str = "key",
    value_col: str = "value",
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """Resolve ``keys`` (single string column) to values via cache-first
    lookup. Returns the full (key, value) mapping table for the given keys;
    misses are fetched serially on the driver with ``rate_limit_s`` between
    calls (matching the reference's 0.3 s PUG throttle, 07:24) and appended
    to the cache."""
    wanted = keys.select(key_col).where(keys[key_col].isNotNull()).distinct()
    # missing path = first run; real IO errors raise (never silently
    # re-fetch the whole cache — see read_parquet_cache_if_exists)
    cache = read_parquet_cache_if_exists(spark, cache_path)
    misses = (
        wanted.join(cache.select(key_col), on=key_col, how="left_anti")
        if cache is not None
        else wanted
    )

    miss_keys = sorted(r[key_col] for r in misses.collect())
    rows = []
    for k in miss_keys:
        if rate_limit_s:
            time.sleep(rate_limit_s)
        rows.append((k, fetch(k)))
    if rows:
        spark.createDataFrame(
            rows, f"{key_col} string, {value_col} string"
        ).write.mode("append").parquet(cache_path)

    if cache is None and not rows:
        return spark.createDataFrame([], f"{key_col} string, {value_col} string")
    full = spark.read.parquet(cache_path)
    return full.join(wanted, on=key_col, how="left_semi")
