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
