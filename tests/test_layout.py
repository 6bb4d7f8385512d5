"""Z-order clustering: per-file min/max footprints must be compact in BOTH
clustered dimensions (that is what makes parquet min/max skipping work for
multi-predicate queries), unlike a linear sort which is compact in one."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from chemharmony_spark.operators.layout import (
    cluster_by_zorder,
    scale_to_bits,
    zorder_key,
)


def _file_spans(path: str, col_x: str, col_y: str) -> list[tuple[int, int]]:
    """(x-span, y-span) of each parquet file's min/max stats."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo_x = lo_y = float("inf")
        hi_x = hi_y = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                name = c.path_in_schema
                if name == col_x:
                    lo_x = min(lo_x, c.statistics.min)
                    hi_x = max(hi_x, c.statistics.max)
                elif name == col_y:
                    lo_y = min(lo_y, c.statistics.min)
                    hi_y = max(hi_y, c.statistics.max)
        spans.append((hi_x - lo_x, hi_y - lo_y))
    return spans


def test_zorder_files_compact_in_both_dims(spark, tmp_path):
    # 64x64 grid of points; 16 files either linearly sorted by x or z-ordered
    n, files = 64, 16
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("int").alias("x"),
            (F.col("id") / n).cast("int").alias("y"),
        )
    )
    lin_dir = str(tmp_path / "linear")
    z_dir = str(tmp_path / "zorder")
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lin_dir)
    )
    zdf = cluster_by_zorder(df, [
        scale_to_bits("x", 0, n - 1, 6), scale_to_bits("y", 0, n - 1, 6)
    ], num_files=files, bits=6)
    zdf.write.mode("overwrite").parquet(z_dir)

    lin = _file_spans(lin_dir, "x", "y")
    zor = _file_spans(z_dir, "x", "y")
    # linear: x tightly bounded but y spans the whole domain in every file
    assert all(sy >= n - 1 for _, sy in lin)
    # z-order: BOTH dims bounded well below the domain in every file
    assert all(sx <= n // 2 and sy <= n // 2 for sx, sy in zor), zor
    # the payoff metric: a predicate on the NON-sort dimension
    # (y BETWEEN 0 AND 15) can skip z-ordered files but not linear ones.
    # Re-read footers for min values to simulate min/max pruning.
    def files_touched(path, lo, hi):
        touched = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn, mx = float("inf"), float("-inf")
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    c = row.column(ci)
                    if c.path_in_schema == "y":
                        mn = min(mn, c.statistics.min)
                        mx = max(mx, c.statistics.max)
            if not (mx < lo or mn > hi):
                touched += 1
        return touched

    lin_touched = files_touched(lin_dir, 0, 15)
    z_touched = files_touched(z_dir, 0, 15)
    assert lin_touched == files  # linear sort: every file matches
    assert z_touched * 2 <= files, (z_touched, files)


def test_zorder_key_matches_python_morton(spark):
    def morton(x: int, y: int, bits: int) -> int:
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x int, y int"
    )
    got = df.select("x", "y", zorder_key(["x", "y"], bits=3).alias("z")).collect()
    for r in got:
        assert r["z"] == morton(r["x"], r["y"], 3), (r["x"], r["y"], r["z"])
