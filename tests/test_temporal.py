"""Unit tests for operators/temporal.py (as-of join, binned range join).

The reference has no temporal joins (SURVEY.md §2.3); semantics here are
pinned to DuckDB ASOF JOIN / pandas merge_asof conventions, which the
q50/q51 oracles check at scale — these tests cover the edge cases the
oracle data doesn't reach (ties, tolerance, empty right side, left-mode
null rows, bins larger/smaller than intervals).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chemharmony_spark.operators.temporal import asof_join, range_join


def _left(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 10, "e")],
        "k int, ts int, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (2, 11, 3.0)],
        "k int, ts int, v double",
    )


def test_asof_inner_inclusive_at_equality(spark):
    out = asof_join(_left(spark), _right(spark), on="k", how="inner")
    rows = {(r.k, r.ts): (r.r_ts, r.r_v) for r in out.collect()}
    # left (1,10) matches right ts=10 (inclusive), (1,20) matches ts=15,
    # (1,5) has no prior right row, (2,10) predates right ts=11, k=3 empty.
    assert rows == {(1, 10): (10, 1.0), (1, 20): (15, 2.0)}


def test_asof_left_keeps_unmatched_with_nulls(spark):
    out = asof_join(_left(spark), _right(spark), on="k", how="left")
    rows = {(r.k, r.ts): (r.r_ts, r.r_v) for r in out.collect()}
    assert len(rows) == 5
    assert rows[(1, 5)] == (None, None)
    assert rows[(2, 10)] == (None, None)
    assert rows[(3, 10)] == (None, None)
    assert rows[(1, 20)] == (15, 2.0)


def test_asof_tolerance_rejects_stale_matches(spark):
    out = asof_join(_left(spark), _right(spark), on="k", how="left", tolerance=3)
    rows = {(r.k, r.ts): (r.r_ts, r.r_v) for r in out.collect()}
    # (1,20) would match ts=15 but 20-15=5 > 3 -> nulled out
    assert rows[(1, 20)] == (None, None)
    assert rows[(1, 10)] == (10, 1.0)  # 10-10=0 <= 3 kept


def test_asof_empty_right_side(spark):
    empty = _right(spark).where(F.lit(False))
    assert asof_join(_left(spark), empty, on="k", how="inner").count() == 0
    left = asof_join(_left(spark), empty, on="k", how="left")
    assert left.count() == 5
    assert all(r.r_v is None for r in left.collect())


def test_asof_multi_key_and_prefix(spark):
    l = spark.createDataFrame([(1, "x", 10)], "k int, g string, ts int")
    r = spark.createDataFrame(
        [(1, "x", 9, 7.0), (1, "y", 9, 8.0)], "k int, g string, ts int, v double"
    )
    out = asof_join(l, r, on=["k", "g"], right_prefix="m_").collect()
    assert len(out) == 1 and out[0].m_v == 7.0


def test_asof_rejects_bad_how(spark):
    with pytest.raises(ValueError):
        asof_join(_left(spark), _right(spark), on="k", how="outer").collect()


def _points(spark):
    return spark.createDataFrame(
        [(1, 5), (1, 10), (1, 19), (1, 20), (2, 7)], "k int, p int"
    )


def _intervals(spark):
    # overlapping intervals for k=1; k=2 interval missing point 7
    return spark.createDataFrame(
        [(1, 0, 10, "A"), (1, 5, 20, "B"), (2, 8, 9, "C")],
        "k int, s int, e int, name string",
    )


def test_range_join_inner_half_open(spark):
    out = range_join(
        _points(spark), _intervals(spark), on="k",
        point_col="p", start_col="s", end_col="e", bin_width=4,
    )
    got = sorted((r.k, r.p, r.name) for r in out.collect())
    # p=5 in A[0,10) and B[5,20); p=10 only B (A end-exclusive);
    # p=19 in B; p=20 excluded (B end-exclusive); (2,7) not in C[8,9)
    assert got == [(1, 5, "A"), (1, 5, "B"), (1, 10, "B"), (1, 19, "B")]


@pytest.mark.parametrize("bw", [1, 3, 100])
def test_range_join_bin_width_invariance(spark, bw):
    out = range_join(
        _points(spark), _intervals(spark), on="k",
        point_col="p", start_col="s", end_col="e", bin_width=bw,
    )
    assert sorted((r.k, r.p, r.name) for r in out.collect()) == [
        (1, 5, "A"), (1, 5, "B"), (1, 10, "B"), (1, 19, "B"),
    ]


def test_range_join_left_exactly_one_null_row_per_unmatched(spark):
    # (2,7) shares bin(bw=8)=0 with C's bin 1? ensure unmatched points never
    # duplicate even when several non-containing intervals share their bin
    iv = spark.createDataFrame(
        [(1, 0, 2, "A"), (1, 3, 4, "B")], "k int, s int, e int, name string"
    )
    pts = spark.createDataFrame([(1, 2), (1, 2)], "k int, p int")  # dup points
    out = range_join(
        pts, iv, on="k", point_col="p", start_col="s", end_col="e",
        bin_width=100, how="left",
    ).collect()
    # both intervals share bin 0 with p=2 but neither contains it (A half-open)
    assert sorted((r.k, r.p, r.name) for r in out) == [(1, 2, None), (1, 2, None)]


def test_range_join_left_mixed(spark):
    out = range_join(
        _points(spark), _intervals(spark), on="k",
        point_col="p", start_col="s", end_col="e", bin_width=4, how="left",
    )
    got = sorted(((r.k, r.p, r.name) for r in out.collect()), key=str)
    assert (2, 7, None) in got and (1, 20, None) in got
    assert got.count((1, 5, "A")) == 1 and got.count((1, 5, "B")) == 1
    assert len(got) == 6  # 4 matches + 2 null rows


def test_range_join_no_keys(spark):
    pts = spark.createDataFrame([(5,), (50,)], "p int")
    iv = spark.createDataFrame([(0, 10, "A")], "s int, e int, name string")
    out = range_join(
        pts, iv, on=None, point_col="p", start_col="s", end_col="e", bin_width=10
    ).collect()
    assert [(r.p, r.name) for r in out] == [(5, "A")]


def test_asof_forward_matches_pandas_merge_asof(spark):
    """direction='forward' == pandas merge_asof(direction='forward'),
    including tolerance and unmatched-left behavior."""
    import pandas as pd

    from chemharmony_spark.operators.temporal import asof_join

    left = [(1, 10), (1, 25), (1, 99), (2, 5)]
    right = [(1, 12, 1.0), (1, 25, 2.0), (1, 60, 3.0), (2, 4, 9.0)]
    ldf = spark.createDataFrame(left, "k long, ts long")
    rdf = spark.createDataFrame(right, "k long, ts long, v double")

    for tol in (None, 10):
        got = asof_join(
            ldf, rdf, on="k", right_cols=["v"], how="left",
            direction="forward", tolerance=tol,
        ).orderBy("k", "ts").collect()
        want = pd.merge_asof(
            pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts"),
            pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts"),
            on="ts", by="k", direction="forward",
            tolerance=tol, suffixes=("", "_r"),
        ).sort_values(["k", "ts"])
        for g, (_, w) in zip(got, want.iterrows()):
            assert (g["k"], g["ts"]) == (w["k"], w["ts"])
            if pd.isna(w["v"]):
                assert g["r_v"] is None, (tol, g)
            else:
                assert g["r_v"] == w["v"], (tol, g)


def test_asof_nearest_matches_pandas(spark):
    """direction='nearest' == pandas merge_asof(direction='nearest'),
    with the backward-on-tie rule; still a single-exchange plan."""
    import pandas as pd

    from chemharmony_spark.operators.temporal import asof_join

    left = [(1, 10), (1, 20), (1, 99), (2, 5), (3, 1)]
    right = [(1, 8, 1.0), (1, 26, 2.0), (1, 60, 3.0), (2, 4, 9.0)]
    ldf = spark.createDataFrame(left, "k long, ts long")
    rdf = spark.createDataFrame(right, "k long, ts long, v double")
    j = asof_join(ldf, rdf, on="k", right_cols=["v"], how="left",
                  direction="nearest")
    got = {(r["k"], r["ts"]): r["r_v"] for r in j.collect()}
    want = pd.merge_asof(
        pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts"),
        pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts"),
        on="ts", by="k", direction="nearest", suffixes=("", "_r"),
    )
    for _, w in want.iterrows():
        g = got[(w["k"], w["ts"])]
        if pd.isna(w["v"]):
            assert g is None, (w["k"], w["ts"], g)
        else:
            assert g == w["v"], (w["k"], w["ts"], g, w["v"])
    # both frames share the key partitioning: one shuffle boundary in the
    # static plan (AQE's final string can render the union's exchange
    # per-branch, so allow that artifact; the structure check is that the
    # SECOND window sits on a local re-Sort, not another Exchange)
    plan = j._jdf.queryExecution().executedPlan().toString()
    n_shuffle = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffle <= 2, plan[:500]
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    # window -> sort -> window chain with no exchange between them
    assert re.search(r"Window .*\n\s*\+- Sort .*\n\s*\+- Window", plan), plan[:800]


def test_ohlc_bars_endpoints_bracket_extremes(spark, sf_dir):
    """low <= min(open, close) and high >= max(open, close) per bar, and
    bar counts conserve the event count."""
    from chemharmony_spark import queries as Q

    rows = Q.q138_ohlc_bars(spark, sf_dir).collect()
    n_events = Q._events(spark, sf_dir).count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert r.low <= min(r.open, r.close)
        assert r.high >= max(r.open, r.close)
        assert r.hr_start_us % 3_600_000_000 == 0


def test_cusum_matches_python_reference(spark, sf_dir):
    """The distributed fold replays the sequential CUSUM chart exactly:
    compare against a plain-Python reference per user."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    got = {r.user_id: (r.n_alarms, r.final_s_micro)
           for r in Q.q139_cusum_alarms(spark, sf_dir).collect()}
    ev = defaultdict(list)
    for r in Q._events(spark, sf_dir).select(
            "user_id", "event_id", "value",
            Q.F.expr("ts div 1000").alias("us")).collect():
        ev[r.user_id].append((r.us, r.event_id, r.value))
    import math
    for uid, seq in ev.items():
        s, n = 0.0, 0
        for _, _, v in sorted(seq):
            s = max(0.0, s + (v - 60.0))
            if s > 500.0:
                n, s = n + 1, 0.0
        assert got[uid] == (n, math.floor(s * 1_000_000))
    assert set(got) == set(ev)


def test_jsd_is_bounded_and_symmetric_in_construction(spark, sf_dir):
    """JSD in [0, ln 2]; one row per unordered source pair."""
    from chemharmony_spark import queries as Q

    rows = Q.q140_jsd_source_similarity(spark, sf_dir).collect()
    srcs = {r.source for r in
            Q._t(spark, sf_dir, "documents").select("source")
            .distinct().collect()}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        # bound: JSD <= ln(2) ~ 0.693147 nats
        assert -1 <= r.jsd_micro <= 693_148


def test_scd2_intervals_partition_time(spark, sf_dir):
    """Per user: intervals are disjoint, adjacent (each valid_to equals
    the next valid_from), cover every event, and runs alternate types."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    by_user = defaultdict(list)
    for r in Q.q141_scd2_intervals(spark, sf_dir).collect():
        by_user[r.user_id].append(r)
    n_events = Q._events(spark, sf_dir).count()
    assert sum(r.n_events for rs in by_user.values() for r in rs) == n_events
    for rs in by_user.values():
        rs.sort(key=lambda r: r.valid_from_us)
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.event_type != b.event_type  # maximal runs
        assert rs[-1].valid_to_us == -1


def test_rrf_fusion_integer_identity(spark, sf_dir):
    """rrf_micro is exactly the sum of the two integer reciprocal terms,
    and every returned doc appears in at least one top-100 list."""
    from chemharmony_spark import queries as Q

    rows = Q.q142_rrf_fusion(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        expect = 0
        if r.rank_bm25 != -1:
            expect += 1_000_000 // (60 + r.rank_bm25)
        if r.rank_tf != -1:
            expect += 1_000_000 // (60 + r.rank_tf)
        assert r.rrf_micro == expect
        assert r.rank_bm25 != -1 or r.rank_tf != -1


def test_interpolation_brackets_and_hits(spark, sf_dir):
    """Each interpolated slot lies between its neighbors' values (within
    the micro floor), and a slot matches forward-fill only where the
    value is constant — spot-check the bracketing invariant per user."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q
    from chemharmony_spark.queries import F

    out = Q.q143_interpolation_resample(spark, sf_dir).collect()
    assert out, "no interior grid points at sf0.001?"
    ev = defaultdict(list)
    for r in Q._events(spark, sf_dir).select(
            "user_id", F.expr("ts div 1000").alias("us"), "value",
            "event_id").collect():
        ev[r.user_id].append((r.us, r.event_id, r.value))
    import bisect
    for r in out:
        seq = sorted(ev[r.user_id])
        uss = [t[0] for t in seq]
        i = bisect.bisect_right(uss, r.slot_us)
        prev_v = seq[i - 1][2]
        # exact-hit slots take the event's own value
        if seq[i - 1][0] == r.slot_us:
            assert r.interp_micro == __import__("math").floor(prev_v * 1e6)
            continue
        next_v = seq[i][2]
        lo, hi = min(prev_v, next_v), max(prev_v, next_v)
        assert lo * 1e6 - 1 <= r.interp_micro <= hi * 1e6 + 1


def test_interval_merge_reference(spark, sf_dir):
    """Merged coverage equals a plain-Python sweep over each user's
    [s, s+30min) intervals."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q
    from chemharmony_spark.queries import F as SF

    IV = 30 * 60 * 1_000_000
    got = {r.user_id: (r.n_intervals, r.covered_us)
           for r in Q.q150_interval_merge(spark, sf_dir).collect()}
    ev = defaultdict(list)
    for r in Q._events(spark, sf_dir).select(
            "user_id", SF.expr("ts div 1000").alias("us")).collect():
        ev[r.user_id].append(r.us)
    for uid, starts in ev.items():
        starts.sort()
        n, covered, cur_s, cur_e = 0, 0, None, None
        for s in starts:
            e = s + IV
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                n, cur_s, cur_e = n + 1, s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        assert got[uid] == (n, covered), uid
    assert set(got) == set(ev)


def test_topk_with_others_conserves_revenue(spark, sf_dir):
    """5 named nations + OTHER; bucket revenues sum to the global total
    (decimal-exact, so equality is exact in cents)."""
    from chemharmony_spark import queries as Q

    rows = Q.q151_topk_with_others(spark, sf_dir).collect()
    assert len(rows) == 6
    named = [r for r in rows if r.nation != "OTHER"]
    other = [r for r in rows if r.nation == "OTHER"]
    assert len(named) == 5 and len(other) == 1
    total = (
        Q._t(spark, sf_dir, "orders")
        .join(Q._t(spark, sf_dir, "customer"),
              Q.F.col("o_custkey") == Q.F.col("c_custkey"))
        .agg(Q.F.sum(Q.F.col("o_totalprice").cast(Q.DEC)).cast("double"))
        .collect()[0][0]
    )
    assert abs(sum(r.revenue for r in rows) - total) < 0.01
    assert other[0].n_nations == 20


def test_trend_forecast_reference(spark, sf_dir):
    """Slope/intercept/forecast equal python OLS over the zero-filled
    hourly series."""
    import math
    from collections import Counter

    from chemharmony_spark import queries as Q
    from chemharmony_spark.queries import F as SF

    got = {r.event_type: r for r in
           Q.q156_trend_forecast(spark, sf_dir).collect()}
    rows = Q._events(spark, sf_dir).select(
        "event_type", SF.expr("(ts div 1000) div 3600000000").alias("h")
    ).collect()
    series = {}
    for r in rows:
        series.setdefault(r.event_type, Counter())[r.h] += 1
    for t, cnt in series.items():
        h0, h1 = min(cnt), max(cnt)
        pts = [(h - h0, cnt.get(h, 0)) for h in range(h0, h1 + 1)]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        icept = (sy - slope * sx) / n
        g = got[t]
        assert g.n == n
        assert g.slope_micro == math.floor(slope * 1e6)
        assert g.intercept_micro == math.floor(icept * 1e6)
        assert g.next_hour_micro == math.floor((icept + slope * n) * 1e6)


def test_funnel_latency_positive_and_ordered(spark, sf_dir):
    from chemharmony_spark import queries as Q

    r = Q.q157_funnel_latency(spark, sf_dir).collect()[0]
    assert 0 < r.p25_us <= r.p50_us <= r.p90_us


def test_duplicate_payments_reference(spark, sf_dir):
    """Pairs equal the python adjacent-duplicate scan per (user, cents)."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    got = {(r.user_id, r.cents, r.first_event_id, r.dup_event_id, r.gap_us)
           for r in Q.q170_duplicate_payments(spark, sf_dir).collect()}
    ev = defaultdict(list)
    for r in Q._events(spark, sf_dir).select(
            "user_id", "event_id", "value",
            Q.F.expr("ts div 1000").alias("us")).collect():
        cents = round(r.value * 100)
        ev[(r.user_id, cents)].append((r.us, r.event_id))
    want = set()
    W = 7 * 86400 * 1_000_000
    for (uid, cents), rows in ev.items():
        rows.sort()
        for (u0, e0), (u1, e1) in zip(rows, rows[1:]):
            if u1 - u0 <= W:
                want.add((uid, cents, e0, e1, u1 - u0))
    assert got == want


def test_window_funnel_tighter_than_unbounded(spark, sf_dir):
    """The 7-day windowFunnel reaches each stage with at most as many
    users as the unbounded q104 funnel, and stage counts are monotone."""
    from chemharmony_spark import queries as Q

    wf = Q.q173_window_funnel(spark, sf_dir).collect()[0]
    q104 = Q.q104_funnel(spark, sf_dir).collect()[0]
    assert wf.s1_view >= wf.s2_click >= wf.s3_purchase_7d >= 0
    assert wf.s1_view <= q104.step1_view
    assert wf.s2_click <= q104.step2_click
    assert wf.s3_purchase_7d <= q104.step3_purchase


def test_rolling_active_users_reference(spark, sf_dir):
    """WAU equals the python 7-day sliding distinct union per day."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    got = {r.day: (r.dau, r.wau, r.stickiness_ppm)
           for r in Q.q176_rolling_active_users(spark, sf_dir).collect()}
    by_day = defaultdict(set)
    for r in Q._events(spark, sf_dir).select(
            "user_id",
            Q.F.expr("(ts div 1000) div 86400000000").alias("day")
    ).collect():
        by_day[r.day].add(r.user_id)
    for day, users in by_day.items():
        wau = set()
        for d in range(day - 6, day + 1):
            wau |= by_day.get(d, set())
        assert got[day] == (
            len(users), len(wau), len(users) * 1_000_000 // len(wau))
    assert set(got) == set(by_day)


def test_association_rules_metrics(spark, sf_dir):
    from chemharmony_spark import queries as Q

    rows = Q.q177_association_rules(spark, sf_dir).collect()
    nb = Q._t(spark, sf_dir, "lineitem").select(
        "l_orderkey").distinct().count()
    for r in rows:
        assert r.nij >= 3 and r.p1 < r.p2
        assert r.support_ppm == r.nij * 1_000_000 // nb
        assert 0 < r.conf_ppm <= 1_000_000
        assert r.lift_ppm > 0


def test_ewma_matches_python_fold(spark, sf_dir):
    """The distributed fold replays the sequential EWMA exactly."""
    import math
    from collections import Counter

    from chemharmony_spark import queries as Q

    got = {r.event_type: (r.n_hours, r.level_micro)
           for r in Q.q178_ewma_smoothing(spark, sf_dir).collect()}
    rows = Q._events(spark, sf_dir).select(
        "event_type", Q.F.expr("(ts div 1000) div 3600000000").alias("h")
    ).collect()
    series = {}
    for r in rows:
        series.setdefault(r.event_type, Counter())[r.h] += 1
    for t, cnt in series.items():
        h0, h1 = min(cnt), max(cnt)
        seq = [float(cnt.get(h, 0)) for h in range(h0, h1 + 1)]
        s = seq[0]
        for x in seq[1:]:
            s = s + 0.3 * (x - s)
        assert got[t] == (len(seq), math.floor(s * 1_000_000))


def test_cohort_ltv_monotone_cumulative(spark, sf_dir):
    """cum_cents is non-decreasing within a cohort and the final total
    equals the cohort's full revenue."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    by_cohort = defaultdict(list)
    for r in Q.q180_cohort_ltv(spark, sf_dir).collect():
        by_cohort[r.cohort].append((r.age_weeks, r.cum_cents))
    totals = defaultdict(int)
    first = {}
    ev = Q._events(spark, sf_dir).select(
        "user_id", "value",
        Q.F.expr("(ts div 1000) div 604800000000").alias("wk")).collect()
    for r in ev:
        first[r.user_id] = min(first.get(r.user_id, r.wk), r.wk)
    for r in ev:
        totals[first[r.user_id]] += round(r.value * 100)
    for cohort, cells in by_cohort.items():
        cells.sort()
        cums = [c for _, c in cells]
        assert all(a <= b for a, b in zip(cums, cums[1:]))
        assert cums[-1] == totals[cohort]


def test_range_join_fractional_and_negative_domains(spark):
    """Pre-r5 the bins came from truncating casts + an integer-only
    (end-1) trick: fractional bounds lost true matches (point 30.2 in
    [10.0, 30.5) vanished) and negative values binned toward zero.
    Brute-force cross-check over a grid of fractional/negative/empty
    intervals and several bin widths."""
    pts = [(float(p) / 4,) for p in range(-60, 61, 3)]
    ivs = [
        (10.0, 30.5), (-12.25, -1.5), (-5.0, 5.0), (7.5, 7.5),  # empty
        (29.9, 30.0), (-0.25, 0.25),
    ]
    points = spark.createDataFrame(pts, "p double")
    intervals = spark.createDataFrame(ivs, "s double, e double")
    want = sorted(
        (p[0], s, e) for p in pts for (s, e) in ivs if s <= p[0] < e
    )
    for width in (1, 4, 10):
        got = sorted(
            (r.p, r.s, r.e)
            for r in range_join(points, intervals, on=None, point_col="p",
                                start_col="s", end_col="e",
                                bin_width=width).collect()
        )
        assert got == want, f"bin_width={width}"
    # left mode: every point appears exactly once when unmatched
    left = range_join(points, intervals, on=None, point_col="p",
                      start_col="s", end_col="e", bin_width=4, how="left")
    assert left.where(F.col("s").isNull()).count() == len(pts) - len(
        {p for p, _, _ in want}
    )
