"""Temporal join operators: as-of join and bin-based range join.

The reference has no temporal joins (SURVEY.md §2.3 notes "No
theta/range/as-of/interval joins exist in the reference"), but a
training-data pipeline over event streams needs both: attach the most
recent profile/label to each observation (as-of), and map points into
intervals (range). Spark has no built-in for either, so they are
implemented here as compositions of existing DataFrame ops — the
(a)-tier strategy for custom operators: no Python workers, everything
stays in whole-stage codegen.

Scale design:
- ``asof_join`` is the union+window plan: ONE shuffle on the equality
  keys, no replication of either side, no theta join. The naive
  alternative (inequality join then per-left-row argmax) replicates the
  fact table by every candidate match and re-shuffles for the argmax —
  quadratic in hot keys. Here each (key) partition is sorted once and a
  running ``last(ignorenulls)`` carries the most recent right payload
  forward; AQE skew-splitting handles hot keys.
- ``range_join`` buckets both sides by a caller-chosen bin width so the
  equi-join on (key, bin) prunes the cross product to adjacent bins,
  then applies the exact interval predicate. Without binning Spark
  plans interval containment as BroadcastNestedLoopJoin (quadratic);
  with it, the plan is a plain shuffled equi-join whose fan-out is
  bounded by interval_width/bin_width + 1 copies of each interval.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    how: str = "inner",
    tolerance: int | float | None = None,
    right_prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row matched
    on equality keys ``on`` — ``direction='backward'`` (default) takes the
    latest right row with ``right_ts <= left_ts``; ``direction='forward'``
    the earliest with ``right_ts >= left_ts``.

    Semantics match DuckDB ``ASOF JOIN`` / pandas ``merge_asof``
    (inclusive at equality, both directions). ``how`` is ``inner`` (drop
    unmatched left rows) or ``left`` (keep them with null right payload).
    ``tolerance`` (same units as the ts columns) rejects matches further
    than ``tolerance`` from ``left_ts`` in the join direction. Ties
    between right rows sharing (keys, right_ts) are broken arbitrarily —
    pre-dedupe the right side if that matters (as the oracle query does).

    ``direction='nearest'`` picks whichever of the two candidates is
    closer in time (ties -> the backward match, pandas-compatible); both
    frames run over the SAME sorted partition, so nearest still costs the
    single shuffle.

    Plan: tag each side, union with null-padded payloads, sort each key
    partition by ts with the right side ordered toward the frame — and
    carry the right payload across with ``last``/``first`` (ignorenulls)
    over an unbounded row frame pointing backward/forward. One shuffle
    total, all built-ins, any direction.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*keys, right_ts}]
    left_payload = [c for c in left.columns if c not in keys]
    out_right = [right_prefix + c for c in [right_ts, *right_cols]]

    tagged_left = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_payload],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(right_prefix + c)
            for c in [right_ts, *right_cols]
        ],
    )
    tagged_right = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(right_prefix + c) for c in [right_ts, *right_cols]],
    )

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "asof_join: direction must be 'backward', 'forward', or "
            f"'nearest', got {direction!r}"
        )
    # backward frame: right rows (side 0) sort BEFORE left rows at equal
    # ts -> an equal-ts right row is inside the preceding frame (inclusive)
    w_b = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward frame: flipped tie order so an equal-ts right row lands in
    # the FOLLOWING frame. Same partition keys -> one exchange serves both.
    w_f = (
        Window.partitionBy(*keys)
        .orderBy("__ts", F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = tagged_left.unionByName(tagged_right)
    fills = []
    if direction in ("backward", "nearest"):
        fills += [
            F.last(c, ignorenulls=True).over(w_b).alias("__b_" + c)
            for c in out_right
        ]
    if direction in ("forward", "nearest"):
        fills += [
            F.first(c, ignorenulls=True).over(w_f).alias("__fw_" + c)
            for c in out_right
        ]
    filled = unioned.select("*", *fills)
    result = filled.where(F.col("__side") == 1)

    def _tol_gate(prefix: str, cond) -> list[Column]:
        return [
            F.when(cond, F.col(prefix + c)).alias(prefix + c) for c in out_right
        ]

    ts_l = F.col("__ts")
    if tolerance is not None:
        # A match further than the tolerance is no match at all.
        gated: list[Column] = []
        if direction in ("backward", "nearest"):
            gated += _tol_gate(
                "__b_", F.col("__b_" + right_prefix + right_ts) >= ts_l - F.lit(tolerance)
            )
        if direction in ("forward", "nearest"):
            gated += _tol_gate(
                "__fw_", F.col("__fw_" + right_prefix + right_ts) <= ts_l + F.lit(tolerance)
            )
        result = result.select(*keys, "__ts", *left_payload, *gated)

    if direction == "backward":
        picked = [F.col("__b_" + c).alias("__f_" + c) for c in out_right]
    elif direction == "forward":
        picked = [F.col("__fw_" + c).alias("__f_" + c) for c in out_right]
    else:
        # nearest: the closer candidate wins; ties -> backward (pandas rule)
        b_ts = F.col("__b_" + right_prefix + right_ts)
        f_ts = F.col("__fw_" + right_prefix + right_ts)
        use_b = b_ts.isNotNull() & (
            f_ts.isNull() | ((ts_l - b_ts) <= (f_ts - ts_l))
        )
        picked = [
            F.when(use_b, F.col("__b_" + c)).otherwise(F.col("__fw_" + c))
            .alias("__f_" + c)
            for c in out_right
        ]
    result = result.select(*keys, "__ts", *left_payload, *picked)
    matched_ts = F.col("__f_" + right_prefix + right_ts)
    if how == "inner":
        result = result.where(matched_ts.isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    return result.select(
        *keys,
        *left_payload,
        *[F.col("__f_" + c).alias(c) for c in out_right],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str] | None,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: pair every point row with every interval
    row (optionally sharing equality keys ``on``) where
    ``start_col <= point < end_col``  (half-open, the SQL-standard
    convention for tiling windows).

    Plan: both sides get integer bin ids (``value div bin_width``);
    intervals are exploded to one row per overlapped bin via
    ``sequence()``; the join is then a plain equi-join on
    (keys..., bin) followed by the exact predicate. Choose ``bin_width``
    near the typical interval length: fan-out per interval is
    ``len/bin_width + 1`` rows, and each point probes exactly one bin.
    ``how='left'`` keeps unmatched points with null interval payload
    (implemented as the equi-join in left mode plus a post-predicate
    null-out, so it is still never a nested-loop plan).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be 'inner' or 'left', got {how!r}")

    # floor (not a truncating cast) so FRACTIONAL and NEGATIVE domains bin
    # correctly: cast("long") truncates toward zero (wrong bin for
    # negative values), and the old integer-only "(end - 1)" last-bin
    # trick dropped true matches for fractional bounds (interval
    # [10.0, 30.5) never produced bin 3, losing point 30.2)
    w = F.lit(bin_width)
    p_bin = F.floor(F.col(point_col) / w)
    binned_points = points.withColumn("__bin", p_bin)
    # end is exclusive: the last overlapped bin holds the largest x < end —
    # floor(end/w) - 1 exactly on a bin boundary, floor(end/w) otherwise
    last_bin = F.floor(F.col(end_col) / w) - F.when(
        F.col(end_col) % w == 0, F.lit(1)
    ).otherwise(F.lit(0))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            # empty intervals (start >= end) overlap nothing; without the
            # guard sequence() would count DOWN and fabricate bins
            F.when(
                F.col(start_col) < F.col(end_col),
                F.sequence(F.floor(F.col(start_col) / w), last_bin),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )
    contained = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    if how == "inner":
        return binned_points.join(iv, [*keys, "__bin"]).where(contained).drop("__bin")
    # left mode: inner matches plus exactly ONE null row per unmatched point.
    # A bin-only left join is wrong here — a bin holding k non-containing
    # intervals would emit k null rows per point — so tag each point row,
    # inner-join, and anti-join the tags back for the unmatched remainder.
    iv_payload = [c for c in intervals.columns if c not in keys]
    tagged = binned_points.withColumn("__pid", F.monotonically_increasing_id())
    inner = tagged.join(iv, [*keys, "__bin"]).where(contained)
    unmatched = tagged.join(inner.select("__pid"), "__pid", "left_anti").select(
        *points.columns,
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_payload],
    )
    return inner.select(*points.columns, *iv_payload).unionByName(unmatched)
