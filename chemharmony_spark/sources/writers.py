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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """ORC sink (engine addition) — same layout contract as write_parquet."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (engine addition) — the export format downstream
    tokenizer/training jobs consume."""
    df.write.mode(mode).json(path)


def compact_parquet(spark, path: str, target_file_bytes: int = 128 * 1024 * 1024,
                    out_path: str | None = None) -> int:
    """Small-files compaction — the operational fix for the classic
    100 TB failure mode where streaming/incremental writers leave millions
    of KB-sized files and every scan drowns in open() overhead.

    Sizes the output file count from the ACTUAL input bytes (filesystem
    listing, no data pass), round-robins into ceil(bytes/target) files,
    and rewrites. Returns the output file count. In-place compaction
    (out_path=None) writes to a sibling temp dir then swaps, so a crashed
    compaction never destroys the input.

    All listing/rename runs through the Hadoop FileSystem API — the old
    os.walk/os.rename version only saw the driver's local disk, so on
    s3a://hdfs:// it sized the input at 0 bytes (one giant output file)
    and crashed on the rename. Small-files streams live on object stores;
    this helper has to too."""
    import math

    from chemharmony_spark.sources.readers import hadoop_fs

    fs, p = hadoop_fs(spark, path)
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    in_place = out_path is None
    dest = path.rstrip("/") + ".compact_new" if in_place else out_path
    df.repartition(n_out).write.mode("overwrite").parquet(dest)
    if in_place:
        jvm_path = fs.makeQualified(p)
        swap = hadoop_fs(spark, path.rstrip("/") + ".compact_old")[1]
        dest_p = hadoop_fs(spark, dest)[1]
        if not fs.rename(jvm_path, swap):
            raise IOError(f"compact_parquet: rename {path} -> {swap} failed")
        if not fs.rename(dest_p, jvm_path):
            # restore the input before surfacing the failure
            fs.rename(swap, jvm_path)
            raise IOError(f"compact_parquet: swap-in of {dest} failed")
        fs.delete(swap, True)
    return n_out
