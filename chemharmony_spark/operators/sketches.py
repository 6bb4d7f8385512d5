"""Approximate (sketch-based) aggregations — the 100 TB answer to exact
operators whose state would not fit: HyperLogLog++ distinct counts and
KLL/GK-style approximate percentiles.

These are *deliberately not* oracle-checked against DuckDB: sketch
implementations differ across engines by design, so cross-engine value
equality is the wrong contract. The contract is bounded error vs the exact
answer, asserted in tests/test_sketches.py at several cardinalities.

Exact counterparts in this engine: q17 (count_distinct), q58
(grouped_percentiles_disc). Use the sketch forms when the group count x
per-group cardinality makes exact state the bottleneck — HLL state is
~1.5 KB per group at rsd=0.05 regardless of cardinality, and both sketches
merge associatively, so they aggregate map-side and tolerate any
re-partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, keys: Sequence[str], value_col: str,
                    rsd: float = 0.05) -> DataFrame:
    """Per-group HyperLogLog++ distinct count (relative std dev ``rsd``).
    State per group is O(1/rsd^2) bytes, independent of cardinality."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def countmin_counts(df: DataFrame, item_col: str, width: int = 1024,
                    depth: int = 4) -> DataFrame:
    """Count-min sketch estimates for every distinct item: ``depth``
    independent hash rows of ``width`` counters; the estimate is the MIN of
    an item's counters across rows (always an over-estimate; error <=
    2N/width with prob 1 - 2^-depth).

    Dataflow: one groupBy per hash row over bucket ids (state = depth x
    width counters TOTAL, vs one counter per distinct item for the exact
    count) — the sketch rows union into one skinny table that broadcasts
    back onto the distinct items. The point at 100 TB: heavy-hitter
    estimation whose state is independent of vocabulary size. Exact
    counterpart: q63 heavy hitters.
    """
    item = F.col(item_col)
    buckets = df.select(
        item.alias("item"),
        *[
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"r{r}:"), item)), 1, 8),
                    16, 10,
                ).cast("long"),
                F.lit(width),
            ).alias(f"b{r}")
            for r in range(depth)
        ],
    )
    rows = None
    for r in range(depth):
        row = buckets.groupBy(F.col(f"b{r}").alias("bucket")).agg(
            F.count(F.lit(1)).alias("c")
        ).select(F.lit(r).alias("row"), "bucket", "c")
        rows = row if rows is None else rows.unionByName(row)
    items = buckets.select(
        "item", *[F.col(f"b{r}") for r in range(depth)]
    ).distinct()
    est = items
    for r in range(depth):
        sk = rows.where(F.col("row") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("c").alias(f"c{r}")
        )
        est = est.join(F.broadcast(sk), on=f"b{r}")
    return est.select(
        "item",
        F.least(*[F.col(f"c{r}") for r in range(depth)]).alias("est_count"),
    )


def approx_quantiles(df: DataFrame, keys: Sequence[str], value_col: str,
                     quantiles: Sequence[float],
                     accuracy: int = 10_000) -> DataFrame:
    """Per-group approximate percentiles (Greenwald-Khanna style;
    ``accuracy`` trades state for error: rank error <= 1/accuracy)."""
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    out = df.groupBy(*keys).agg(
        F.percentile_approx(value_col, qs, accuracy).alias("__qs")
    )
    cols = [
        F.col("__qs")[i].alias(f"p{int(round(q * 100)):02d}")
        for i, q in enumerate(quantiles)
    ]
    return out.select(*keys, *cols)
