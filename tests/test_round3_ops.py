"""Round-3 operator contracts: cache registry, factored cosine, the
assign_cells join fallback, mergeable HLL, and star-CC broadcast parity."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cache_registry_releases_everything(spark):
    from chemharmony_spark import cache

    df = spark.range(10)
    out = cache.registered_persist(df)
    assert out.count() == 10
    assert out.storageLevel.useMemory
    n = cache.release_caches()
    assert n >= 1
    assert not out.storageLevel.useMemory  # unpersisted
    assert cache.release_caches() == 0  # registry drained


def test_prep_cosine_matches_plain_cosine_bitwise(spark, sf_dir):
    from chemharmony_spark.operators.similarity import (
        cosine, cosine_pre, prep_cosine,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    prep = prep_cosine(emb, "embedding", keep=["vec_id"])
    a = prep.select(F.col("vec_id").alias("a"), F.col("__dv").alias("va"),
                    F.col("__n").alias("na"))
    b = prep.select(F.col("vec_id").alias("b"), F.col("__dv").alias("vb"),
                    F.col("__n").alias("nb"))
    factored = (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", cosine_pre(F.col("va"), F.col("vb"),
                                     F.col("na"), F.col("nb")).alias("sim"))
    )
    raw = emb.select(F.col("vec_id").alias("a"),
                     F.col("embedding").alias("ea"))
    rb = emb.select(F.col("vec_id").alias("b"),
                    F.col("embedding").alias("eb"))
    plain = (
        raw.join(rb, F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("ea"), F.col("eb")).alias("sim"))
    )
    # bit-exact: same IEEE sequence, only factored per vector
    diff = factored.join(plain, ["a", "b"]) \
        .where(factored.sim != plain.sim).count()
    assert diff == 0


def test_assign_cells_join_fallback_matches_inline(spark, sf_dir, monkeypatch):
    from chemharmony_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    cents = SIM.lloyd_kmeans(emb, n_cells=4, iters=1)
    inline = SIM.assign_cells(emb, cents).select("vec_id", "cell_id")
    monkeypatch.setattr(SIM, "_INLINE_CELL_BUDGET", 1)  # force the fallback
    joined = SIM.assign_cells(emb, cents).select("vec_id", "cell_id")
    assert inline.exceptAll(joined).count() == 0
    assert joined.exceptAll(inline).count() == 0


def test_hll64_is_max_mergeable(spark, sf_dir):
    from chemharmony_spark.operators.sketches import (
        hll64_bucket_rho, hll64_estimate,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bucket, rho = hll64_bucket_rho("user_id")
    tagged = ev.select("event_type", bucket.alias("bucket"),
                       rho.alias("rho"),
                       (F.col("event_id") % 2).alias("half"))
    whole = tagged.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("m"))
    halves = tagged.groupBy("half", "event_type", "bucket").agg(
        F.max("rho").alias("m"))
    merged = halves.groupBy("event_type", "bucket").agg(
        F.max("m").alias("m"))
    e1 = {r.event_type: r.hll_est_micro
          for r in hll64_estimate(whole, ["event_type"]).collect()}
    e2 = {r.event_type: r.hll_est_micro
          for r in hll64_estimate(merged, ["event_type"]).collect()}
    assert e1 == e2 and len(e1) > 0


def test_star_cc_broadcast_maps_parity(spark):
    from chemharmony_spark.operators.graph import connected_components_star

    # chain + clique + isolated pair
    edges = [(i, i + 1) for i in range(0, 20)]
    edges += [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(500, 501)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = connected_components_star(df)
    bcast = connected_components_star(df, broadcast_maps=True)
    assert plain.exceptAll(bcast).count() == 0
    assert bcast.exceptAll(plain).count() == 0
    comps = {r.component for r in bcast.collect()}
    assert comps == {0, 100, 500}


def test_star_cc_driver_finish_parity(spark):
    from chemharmony_spark.operators.graph import connected_components_star

    # chain (worst case for contraction: long diameter) + clique + pair
    edges = [(i, i + 1) for i in range(0, 20)]
    edges += [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(500, 501)]
    df = spark.createDataFrame(edges, "src long, dst long")
    dist = connected_components_star(df, pre_contract=True,
                                     broadcast_maps=True)
    drv = connected_components_star(df, pre_contract=True,
                                    broadcast_maps=True,
                                    driver_finish_cap=1_000_000)
    # driver finish without contraction too (gate applies to raw edges)
    drv_plain = connected_components_star(df, driver_finish_cap=1_000_000)
    want = {r.node: r.component for r in dist.collect()}
    assert {r.node: r.component for r in drv.collect()} == want
    assert {r.node: r.component for r in drv_plain.collect()} == want
    assert set(want.values()) == {0, 100, 500}
    # cap below the edge count -> the distributed loop must still run
    small_cap = connected_components_star(df, driver_finish_cap=3)
    assert {r.node: r.component for r in small_cap.collect()} == want
