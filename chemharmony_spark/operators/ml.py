"""ML calibration / per-group model-fitting operators.

The `applyInPandas` exemplars of the UDF surface (SURVEY.md §2.11): ops
whose per-group algorithm is inherently sequential (pool-adjacent-violators
here) and therefore can't be a composition of built-in Column expressions.
Everything batch-shaped stays in Arrow; the group key partitions the work,
so parallelism = number of groups — use these for MANY medium groups, not
one giant one (a single 100 TB group would serialize; pre-aggregate first,
as `grouped_isotonic` does internally on the distinct-x table).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _pava(xs: list[float], ys: list[float], ws: list[float]) -> list[float]:
    """Pool-adjacent-violators: weighted least-squares monotone fit.
    Sequential by nature — the reason this operator is a pandas UDF."""
    # blocks of (weighted mean, weight, count)
    means: list[float] = []
    weights: list[float] = []
    counts: list[int] = []
    for y, w in zip(ys, ws):
        means.append(y)
        weights.append(w)
        counts.append(1)
        while len(means) > 1 and means[-2] > means[-1]:
            m2, w2, c2 = means.pop(), weights.pop(), counts.pop()
            m1, w1, c1 = means.pop(), weights.pop(), counts.pop()
            w = w1 + w2
            means.append((m1 * w1 + m2 * w2) / w)
            weights.append(w)
            counts.append(c1 + c2)
    out: list[float] = []
    for m, c in zip(means, counts):
        out.extend([m] * c)
    return out


def grouped_isotonic(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group isotonic regression (monotone calibration curve): for each
    group, fit the weighted monotone-non-decreasing step function of mean-y
    over distinct x (PAVA). Returns (group, x, n, y_mean, y_iso).

    Scale shape: the raw table first collapses to per-(group, x) sufficient
    statistics (ONE map-side-combined exchange — the only pass over the
    facts), so the pandas stage sees |distinct x| rows per group, not raw
    rows; `applyInPandas` then runs the sequential PAVA per group in Arrow
    batches. Calibration-curve x-domains are small by construction (scores,
    bins), so per-group state is KBs even when the fact table is 100 TB."""
    stats = df.groupBy(group_col, x_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(y_col).cast("double")).alias("ysum"),
    )
    schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField(x_col, DoubleType()),
            StructField("n", LongType()),
            StructField("y_mean", DoubleType()),
            StructField("y_iso", DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        y_mean = pdf["ysum"] / pdf["n"]
        y_iso = _pava(
            pdf[x_col].tolist(), y_mean.tolist(), pdf["n"].astype(float).tolist()
        )
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                x_col: pdf[x_col].astype(float),
                "n": pdf["n"].astype("int64"),
                "y_mean": y_mean,
                "y_iso": y_iso,
            }
        )

    return stats.groupBy(group_col).applyInPandas(fit, schema)
