"""Unit tests for the generic operator kit (SURVEY.md §2) on tiny frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from chemharmony_spark.operators.core import (
    balanced_class_floor,
    discordance_filter,
    grid_negatives,
    grouped_median_binarize,
    having_filter,
    keep_unique_keys,
    melt,
    recode,
    stratified_sample_exact,
    strip_qualifiers_to_double,
)


def test_recode_with_default_and_lowercase(spark):
    df = spark.createDataFrame(
        [("Active",), ("inactive",), ("weird",)], ["outcome"]
    ).withColumn(
        "value",
        recode("outcome", {"active": "positive", "inactive": "negative"},
               lowercase=True),
    )
    vals = {r.outcome: r.value for r in df.collect()}
    assert vals == {"Active": "positive", "inactive": "negative", "weird": None}


def test_strip_qualifiers(spark):
    df = spark.createDataFrame([(">100",), ("<5.5",), ("42",)], ["v"]).withColumn(
        "n", strip_qualifiers_to_double("v")
    )
    assert [r.n for r in df.collect()] == [100.0, 5.5, 42.0]


def test_keep_unique_and_discordance(spark):
    df = spark.createDataFrame(
        [("k1", "a"), ("k1", "b"), ("k2", "a"), ("k3", "x"), ("k3", "x")],
        ["k", "v"],
    )
    assert {r.k for r in keep_unique_keys(df, "k").collect()} == {"k2"}
    # k3 is unanimous (both x), k1 discordant
    kept = discordance_filter(df, ["k"], "v")
    assert {r.k for r in kept.collect()} == {"k2", "k3"}


def test_having_and_class_floor(spark):
    rows = [("p1", "positive")] * 3 + [("p1", "negative")] * 2 + [("p2", "positive")]
    df = spark.createDataFrame(rows, ["pid", "value"])
    assert having_filter(df, ["pid"], F.count(F.lit(1)) > 2).count() == 5
    assert balanced_class_floor(df, ["pid"], "value", floor=1).count() == 5
    assert balanced_class_floor(df, ["pid"], "value", floor=2).count() == 0


def test_grouped_median_binarize(spark):
    # property p: per-substance medians 1, 3, 5 -> threshold median 3
    rows = [
        ("s1", "p", 1.0), ("s2", "p", 3.0), ("s3", "p", 5.0),
        ("s1", "p", 1.0),  # replicate collapses first
    ]
    df = spark.createDataFrame(rows, ["sid", "pid", "v"])
    out = grouped_median_binarize(df, ["sid"], ["pid"], "v")
    vals = {r.sid: r.value for r in out.collect()}
    assert vals == {"s1": "positive", "s2": "positive", "s3": "negative"}


def test_melt_drops_nulls(spark):
    df = spark.createDataFrame([(1, 10.0, None)], "id long, a double, b double")
    out = melt(df, ["id"], ["a", "b"])
    assert [(r.metric, r.value) for r in out.collect()] == [("a", 10.0)]


def test_grid_negatives_fills_unobserved(spark):
    df = spark.createDataFrame(
        [("s1", "p1", "positive"), ("s2", "p2", "positive")],
        ["sid", "pid", "value"],
    )
    out = grid_negatives(df, "sid", ["pid"])
    vals = {(r.sid, r.pid): r.value for r in out.collect()}
    assert len(vals) == 4
    assert vals[("s1", "p2")] == "negative" and vals[("s2", "p1")] == "negative"
    assert vals[("s1", "p1")] == "positive"


def test_stratified_sample_exact_and_deterministic(spark):
    rows = [(f"id{i}", "a" if i % 2 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    order = F.md5(F.col("id"))
    s1 = stratified_sample_exact(df, ["stratum"], 5, order_by=order)
    s2 = stratified_sample_exact(df, ["stratum"], 5, order_by=order)
    r1 = sorted((r.stratum, r.id) for r in s1.collect())
    assert r1 == sorted((r.stratum, r.id) for r in s2.collect())
    per = {}
    for st, _ in r1:
        per[st] = per.get(st, 0) + 1
    assert per == {"a": 5, "b": 5}


def test_salted_join_matches_plain_join(spark):
    from chemharmony_spark.operators.core import salted_join

    # heavily skewed left side: 90% of rows share one key
    left = spark.createDataFrame(
        [("hot" if i % 10 else f"k{i}", i) for i in range(1000)], "k string, v long"
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B")], "k string, tag string"
    )
    plain = sorted(map(tuple, left.join(right, on="k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, on=["k"]).collect()))
    assert salted == plain and len(plain) == 902


def test_edit_distance_pairs_matches_bruteforce(spark):
    from chemharmony_spark.operators.dedup import edit_distance_pairs

    words = ["alpha", "alphq", "alpja", "beta", "betas", "bet",
             "gamma", "gamma ray", "delta"]
    df = spark.createDataFrame(list(enumerate(words)), "id long, w string")
    got = {(r.a, r.b): r.dist
           for r in edit_distance_pairs(df, "id", "w", max_dist=2).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {(i, j): lev(a, b)
            for i, a in enumerate(words) for j, b in enumerate(words)
            if i < j and lev(a, b) <= 2}
    assert got == want


def test_percentile_cont_matches_numpy(spark, sf_dir):
    """grouped_percentile_cont == numpy's linear (type-7) quantile per
    group, bit-for-bit at the interpolation level."""
    import numpy as np

    from chemharmony_spark import queries as Q
    from chemharmony_spark.operators.core import grouped_percentile_cont

    ev = Q._events(spark, sf_dir).select("event_type", "value")
    got = {
        r.event_type: (r.p25, r.p50, r.p90)
        for r in grouped_percentile_cont(
            ev, ["event_type"], "value",
            [("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10)],
        ).collect()
    }
    rows = ev.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        a = np.sort(np.array(vals))
        n = len(a)
        for got_v, (num, den) in zip(got[t], [(1, 4), (1, 2), (9, 10)]):
            lo = (n - 1) * num // den
            fr = ((n - 1) * num % den) / den
            hi = min(lo + 1, n - 1)
            want = a[lo] + (a[hi] - a[lo]) * fr
            assert got_v == want, (t, num, den, got_v, want)


def test_cumulative_distinct_monotone_and_final(spark, sf_dir):
    """n_types_so_far is non-decreasing per user and ends at the user's
    true distinct-type count."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q
    from chemharmony_spark.queries import F as SF

    rows = Q.q144_cumulative_distinct(spark, sf_dir).collect()
    seq = defaultdict(list)
    for r in rows:
        seq[r.user_id].append(((r.us, r.event_id), r.n_types_so_far))
    truth = {
        r.user_id: r.n
        for r in Q._events(spark, sf_dir)
        .groupBy("user_id")
        .agg(SF.countDistinct("event_type").alias("n"))
        .collect()
    }
    for uid, pairs in seq.items():
        pairs.sort()
        counts = [c for _, c in pairs]
        assert all(a <= b for a, b in zip(counts, counts[1:]))
        assert counts[-1] == truth[uid]


def test_seasonal_baseline_residuals_sum_to_zeroish(spark, sf_dir):
    """Per type: obs sums to total and dev_ppm of a flat profile sums to
    ~0 (integer floor keeps it within 168 ppm-units of zero)."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    per_type = defaultdict(list)
    for r in Q.q147_seasonal_baseline(spark, sf_dir).collect():
        per_type[r.event_type].append(r)
        assert 0 <= r.how < 168
    for rs in per_type.values():
        total = sum(r.obs for r in rs)
        for r in rs:
            n = (r.obs * 168 - total) * 1_000_000
            trunc = abs(n) // total * (1 if n >= 0 else -1)  # div truncates
            assert r.dev_ppm == trunc


def test_hhi_bounds(spark, sf_dir):
    """HHI in (0, 1e6]; a nation with n customers has HHI >= ~1e6/n."""
    from chemharmony_spark import queries as Q

    rows = Q.q148_hhi_concentration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.hhi_ppm <= 1_000_000
        # lower bound for equal shares, slack for ppm floor quantization
        assert r.hhi_ppm >= 1_000_000 // r.n_customers - r.n_customers


def test_ab_test_reference(spark, sf_dir):
    """z statistic equals the python reference on exact counts."""
    import math

    from chemharmony_spark import queries as Q

    r = Q.q152_ab_test(spark, sf_dir).collect()[0]
    p1, p2 = r.ca / r.na, r.cb / r.nb
    pp = (r.ca + r.cb) / (r.na + r.nb)
    se = math.sqrt(pp * (1.0 - pp) * (1.0 / r.na + 1.0 / r.nb))
    assert r.z_micro == math.floor((p1 - p2) / se * 1_000_000)
    assert r.rate_a_ppm == r.ca * 1_000_000 // r.na


def test_benford_shares_sum_to_one(spark, sf_dir):
    """Nine digits; observed ppm sums to ~1e6 (floor slack < 9)."""
    from chemharmony_spark import queries as Q

    rows = Q.q153_benford_digits(spark, sf_dir).collect()
    assert {r.d for r in rows} == set(range(1, 10))
    s = sum(r.obs_ppm for r in rows)
    assert 1_000_000 - 9 <= s <= 1_000_000
    for r in rows:
        assert r.dev == (r.obs_ppm - r.exp_ppm) ** 2 // r.exp_ppm


def test_ks_test_matches_scipy_free_reference(spark, sf_dir):
    """D equals the plain-python two-sample KS on the same data."""
    import math
    from collections import Counter

    from chemharmony_spark import queries as Q

    r = Q.q161_ks_test(spark, sf_dir).collect()[0]
    rows = Q._events(spark, sf_dir).select("event_type", "value").collect()
    a = sorted(x.value for x in rows if x.event_type == "view")
    b = sorted(x.value for x in rows if x.event_type == "purchase")
    ca, cb = Counter(a), Counter(b)
    values = sorted(set(a) | set(b))
    cum1 = cum2 = 0
    best = 0
    for v in values:
        cum1 += ca.get(v, 0)
        cum2 += cb.get(v, 0)
        best = max(best, abs(cum1 * len(b) - cum2 * len(a)))
    assert (r.n1, r.n2) == (len(a), len(b))
    assert r.d_ppm == math.floor(best / (len(a) * len(b)) * 1_000_000)


def test_rare_category_collapse_conserves_counts(spark, sf_dir):
    from chemharmony_spark import queries as Q

    rows = Q.q162_rare_category_collapse(spark, sf_dir).collect()
    total = Q._t(spark, sf_dir, "part").count()
    assert sum(r.n_parts for r in rows) == total
    named = [r for r in rows if r.category != "OTHER"]
    for r in named:
        assert r.n_merged_types == 1 and r.n_parts >= 10


def test_k_anonymity_reference(spark, sf_dir):
    from collections import Counter

    from chemharmony_spark import queries as Q

    r = Q.q163_k_anonymity(spark, sf_dir).collect()[0]
    rows = Q._t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment").collect()
    g = Counter((x.c_nationkey, x.c_mktsegment) for x in rows)
    unsafe = {k: n for k, n in g.items() if n < 5}
    assert r.n_groups == len(g)
    assert r.n_rows == len(rows)
    assert r.n_unsafe_groups == len(unsafe)
    assert r.n_suppressed_rows == sum(unsafe.values())
    assert r.suppressed_ppm == sum(unsafe.values()) * 1_000_000 // len(rows)


def test_pareto_8020_reference(spark, sf_dir):
    """Crossing point equals the python sort-and-accumulate reference."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    r = Q.q174_pareto_8020(spark, sf_dir).collect()[0]
    rev = defaultdict(int)
    for o in Q._t(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice").collect():
        rev[o.o_custkey] += round(o.o_totalprice * 100)
    t = sum(rev.values())
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    for i, (_, c) in enumerate(order, start=1):
        cum += c
        if cum * 5 >= t * 4:
            break
    assert r.n_customers == len(rev)
    assert r.n_top == i
    assert r.top_share_ppm == i * 1_000_000 // len(rev)
    assert r.revenue_share_ppm == cum * 1_000_000 // t


def test_zscore_moments(spark, sf_dir):
    """Per type: z mean ~ 0 and z^2 mean ~ 1 (floor-quantized)."""
    from collections import defaultdict

    from chemharmony_spark import queries as Q

    groups = defaultdict(list)
    for r in Q.q175_zscore_normalize(spark, sf_dir).collect():
        assert r.z_micro is not None
        groups[r.event_type].append(r.z_micro / 1e6)
    for zs in groups.values():
        n = len(zs)
        assert abs(sum(zs) / n) < 1e-3
        assert abs(sum(z * z for z in zs) / n - 1.0) < 1e-2


def test_global_row_number_matches_plain_window(spark, sf_dir):
    """Bucketed global_row_number == row_number over the plain global
    window, for an order-monotone bucket — on real data (documents by
    a text prefix key) and with skewed/empty buckets."""
    from pyspark.sql.window import Window

    from chemharmony_spark.operators.core import global_row_number

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.substring("text", 1, 12).alias("k")
    )
    got = global_row_number(
        docs, ["k", "doc_id"], bucket=F.substring("k", 1, 2)
    )
    want = docs.select(
        "doc_id",
        F.row_number().over(Window.orderBy("k", "doc_id")).alias("rn"),
    )
    diff = (
        got.select("doc_id", "rn")
        .exceptAll(want)
        .unionAll(want.exceptAll(got.select("doc_id", "rn")))
    )
    assert diff.count() == 0
    # numeric bucket, heavy skew (all ids < 256 share bucket 0)
    ids = spark.range(0, 1000).select(F.col("id").alias("v"))
    got2 = global_row_number(ids, ["v"], bucket=F.expr("v DIV 256"))
    bad = got2.where(F.col("rn") != F.col("v") + 1).count()
    assert bad == 0


def test_global_row_number_validate_rejects_non_monotone_bucket(spark):
    """validate=True (ADVICE r4): a bucket that interleaves order-key
    ranges (v % 3 is NOT a function of a prefix of the order) must fail
    loudly instead of silently producing wrong global ranks; a monotone
    bucket passes validation and still matches the plain ranking."""
    import pytest

    from chemharmony_spark.operators.core import global_row_number

    ids = spark.range(0, 300).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="not order-monotone"):
        global_row_number(
            ids, ["v"], bucket=F.expr("v % 3"), validate=True
        ).count()
    ok = global_row_number(
        ids, ["v"], bucket=F.expr("v DIV 64"), validate=True
    )
    assert ok.where(F.col("rn") != F.col("v") + 1).count() == 0


def test_global_row_number_keeps_null_order_keys(spark):
    """NULL leading keys bucket to NULL and must rank FIRST (matching the
    plain window's NULLS FIRST), not silently vanish in the offsets
    join-back — the pre-r5 equi-join dropped them and shifted every
    later rank. validate=True must accept the legitimate NULL bucket."""
    from pyspark.sql.window import Window

    from chemharmony_spark.operators.core import global_row_number

    ids = spark.range(0, 100).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id")).alias("v"),
        F.col("id").alias("tie"),
    )
    got = global_row_number(
        ids, ["v", "tie"], bucket=F.expr("v DIV 16"), validate=True
    )
    want = ids.select(
        "tie",
        F.row_number().over(Window.orderBy("v", "tie")).alias("rn"),
    )
    diff = (
        got.select("tie", "rn").exceptAll(want)
        .unionAll(want.exceptAll(got.select("tie", "rn")))
    )
    assert got.count() == 100  # nothing dropped
    assert diff.count() == 0  # bit-identical ranks incl. the NULL bucket


def test_assign_cells_join_fallback_handles_duplicate_ids(spark):
    """The large-codebook broadcast fallback must assign per ROW (not
    per id): duplicate ids with different vectors land in different
    cells, matching the inline literal-codebook path."""
    from chemharmony_spark.operators.similarity import _assign_cells_join

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.1, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        "cell_id bigint, centroid array<double>",
    )
    rows = sorted(
        (r.vec_id, r.embedding[0], r.cell_id)
        for r in _assign_cells_join(corpus, cents, "vec_id", "embedding")
        .collect()
    )
    assert rows == [(1, 0.0, 0), (1, 10.0, 1), (2, 0.1, 0)]
