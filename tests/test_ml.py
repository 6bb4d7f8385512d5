"""grouped_isotonic: PAVA correctness vs a brute-force reference, monotone
output, weighted-mean preservation, and partitioning invariance."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from chemharmony_spark.operators.ml import _pava, grouped_isotonic


def brute_isotonic(xs, ys, ws):
    """O(n^2) reference: the isotonic fit equals, at each i, the
    max-over-lower-starts of min-over-upper-ends of weighted block means
    (the minimax characterization)."""
    n = len(xs)
    out = []
    for i in range(n):
        best = None
        for s in range(i + 1):
            cand = None
            for e in range(i, n):
                w = sum(ws[s : e + 1])
                m = sum(y * wt for y, wt in zip(ys[s : e + 1], ws[s : e + 1])) / w
                cand = m if cand is None else min(cand, m)
            best = cand if best is None else max(best, cand)
        out.append(best)
    return out


def test_pava_matches_minimax_reference():
    xs = list(range(8))
    ys = [1.0, 3.0, 2.0, 2.0, 5.0, 4.0, 4.5, 7.0]
    ws = [1.0, 2.0, 1.0, 3.0, 1.0, 2.0, 1.0, 1.0]
    got = _pava(xs, ys, ws)
    want = brute_isotonic(xs, ys, ws)
    assert got == pytest.approx(want)
    assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))


def test_grouped_isotonic_on_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") / 25).cast("double").alias("x"),
        F.when(F.col("event_type") == "purchase", 0.0)
        .otherwise(F.col("value"))
        .alias("y"),
    )
    fit = grouped_isotonic(ev, "event_type", "x", "y").collect()
    by_group = {}
    for r in fit:
        by_group.setdefault(r.event_type, []).append(r)
    assert len(by_group) == 5
    for rows in by_group.values():
        rows.sort(key=lambda r: r.x)
        # monotone non-decreasing fit
        for a, b in zip(rows, rows[1:]):
            assert a.y_iso <= b.y_iso + 1e-9
        # weighted mean preserved (projection property of isotonic LS)
        tot_w = sum(r.n for r in rows)
        assert sum(r.y_iso * r.n for r in rows) / tot_w == pytest.approx(
            sum(r.y_mean * r.n for r in rows) / tot_w
        )


def test_grouped_isotonic_partitioning_invariant(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.col("value").alias("x"),
        (F.col("value") + F.col("user_id") % 7).alias("y"),
    )
    a = grouped_isotonic(ev, "event_type", "x", "y")
    b = grouped_isotonic(ev.repartition(3), "event_type", "x", "y")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
