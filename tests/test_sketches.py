"""Bounded-error contracts for the sketch aggregations (HLL distinct,
approximate percentiles) vs their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from chemharmony_spark.operators.sketches import approx_distinct, approx_quantiles


def test_hll_distinct_within_rsd(spark):
    # three groups with known cardinalities 100 / 2,000 / 20,000
    df = (
        spark.range(22_100)
        .select(
            F.when(F.col("id") < 100, "small")
            .when(F.col("id") < 2_100, "mid")
            .otherwise("large")
            .alias("g"),
            F.col("id").cast("string").alias("v"),
        )
    )
    got = {r["g"]: r["approx_distinct"]
           for r in approx_distinct(df, ["g"], "v", rsd=0.05).collect()}
    for g, truth in (("small", 100), ("mid", 2_000), ("large", 20_000)):
        # 4 sigma of the configured 5% relative standard deviation
        assert abs(got[g] - truth) <= max(2, 0.2 * truth), (g, got[g], truth)


def test_approx_quantiles_rank_error_bounded(spark):
    n = 10_000
    df = spark.range(n).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    got = approx_quantiles(df, ["g"], "v", [0.5, 0.9], accuracy=10_000).collect()
    for r in got:
        # values are 0..n-1 stepped by 2 per group -> value rank is direct
        for q, name in ((0.5, "p50"), (0.9, "p90")):
            rank = r[name] / 2 / (n / 2)
            assert abs(rank - q) < 0.01, (r["g"], name, r[name])


def test_sketches_merge_under_repartition(spark):
    """Sketch results are partitioning-invariant (associative merge)."""
    df = spark.range(5_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    a = approx_distinct(df.repartition(1), ["g"], "v").collect()[0][1]
    b = approx_distinct(df.repartition(17), ["g"], "v").collect()[0][1]
    assert a == b


def test_countmin_overestimates_within_bound(spark):
    """CM estimates are >= true counts and within the 2N/width bound for
    a Zipf-ish distribution; heavy hitters rank correctly."""
    from chemharmony_spark.operators.sketches import countmin_counts

    # item i appears ~1000/i times, i in 1..50 -> N ~ 4500
    rows = []
    for i in range(1, 51):
        rows.extend([(f"item{i:02d}",)] * (1000 // i))
    df = spark.createDataFrame(rows, "w string").repartition(8)
    truth = {f"item{i:02d}": 1000 // i for i in range(1, 51)}
    n_total = sum(truth.values())
    est = {r["item"]: r["est_count"]
           for r in countmin_counts(df, "w", width=256, depth=4).collect()}
    assert set(est) == set(truth)
    bound = 2 * n_total / 256
    for item, t in truth.items():
        assert est[item] >= t, (item, est[item], t)
        assert est[item] - t <= bound, (item, est[item], t, bound)
    # the top heavy hitter is unambiguous
    assert max(est, key=est.get) == "item01"


def test_countmin_broadcasts_read_cached_rows_not_reexploded(spark):
    """r7 ADVICE: the depth `rows.where(row == r)` broadcast sides used to
    re-run the full depth x N posexplode+agg each (the filter on the
    generated `row` column can't push below Generate, and the differing
    predicates defeat ReuseExchange). With `rows` persisted, every
    BroadcastExchange must read straight off the cache: no Generate and
    no shuffle between the exchange and its InMemoryTableScan."""
    from chemharmony_spark.operators.sketches import countmin_counts

    df = spark.range(2_000).select((F.col("id") % 17).cast("string").alias("w"))
    est = countmin_counts(df, "w", width=64, depth=4)
    est.collect()
    # scan the whole tree (AQE prints final + initial plans, and the
    # persisted rows frame nests its own adaptive plan inside its
    # InMemoryRelation): EVERY BroadcastExchange, wherever printed, must
    # read a cache scan before any Generate/shuffle appears below it
    lines = est._jdf.queryExecution().executedPlan().toString().splitlines()
    n_bcast = 0
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        n_bcast += 1
        for sub in lines[i + 1:]:
            if "InMemoryTableScan" in sub:
                break
            assert "Generate" not in sub and "Exchange hashpartitioning" not in sub, (
                "a count-min broadcast re-runs the explode/agg instead of "
                "reading the persisted rows cache:\n" + "\n".join(lines)
            )
    # 4 in the final plan + up to 4 in the printed initial plan
    assert n_bcast >= 4, f"expected one broadcast per depth row, saw {n_bcast}"
