"""Sinks (SURVEY.md §2.1 S9-S11).

Upgrade over the reference's unpartitioned brick writes (80_harmonize.py:86):
partition by ``source`` — the per-source access pattern dominates QA and
re-integration reads (tests.py:18-30, 80:99), and partition pruning then
skips everything else. At 100 TB also bucket fact tables by sid/pid so the
re-key joins co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  bucket_by: tuple[int, list[str]] | None = None,
                  table_name: str | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        # bucketed writes require saveAsTable (metastore-backed)
        assert table_name, "bucketed writes need a table name"
        w.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(table_name)
        return
    w.parquet(path)
