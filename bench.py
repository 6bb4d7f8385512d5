"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (since round 4): each query's time is the BEST OF 2
back-to-back runs (caches released between runs, so both execute the
full plan). Single-shot numbers on a shared box mix scheduler noise and
first-touch page-cache effects into the measurement — the same query
was observed at 13.8 s then 5.8 s within one session. Best-of-2 reports
steady-state engine throughput, the quantity that actually compares
across rounds. (Rounds 1-3 were single-shot; their totals carry that
noise.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_region_revenue",
    "q09_melt",
    "q12_window_median",
    "q17_count_distinct",
    "q26_stratified_sample",
    "q28_tumbling_window",
    "q29_sessionize",
    "q30_dedup_exact",
    "q34_minhash_signatures",
    "q36_jaccard_near_dups",
    "q38_cosine_topk",
    "q45_simhash_hamming",
    "q50_asof_join",
    "q51_range_join",
    "q52_repetition_filters",
    "q56_sequence_packing",
    "q57_centroid_outliers",
    "q58_grouped_percentiles",
    "q63_heavy_hitters",
    "q76_resample_forward_fill",
    "q115_semantic_cluster_dedup",
    "q123_dedup_pipeline",
    "q134_bm25_topk",
    "q139_cusum_alarms",
]


def _prepare_staging(spark, sf_dir: str, root: str) -> list[str]:
    """Synthesize a two-source staging area from the TPC-H tables (customer
    payloads as substances, part payloads as properties, lineitem x orders as
    activities) so the flagship harmonize job can be benchmarked end-to-end
    at the same scale factor. Built once per sf; reused across runs."""
    from pyspark.sql import functions as F

    sources = ["src0", "src1"]
    if os.path.isdir(f"{root}/{sources[-1]}"):
        return sources
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("string").alias("sid"),
        F.to_json(F.struct("c_mktsegment", "c_name", "c_nationkey")).alias("data"),
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").cast("string").alias("pid"),
        F.to_json(F.struct("p_brand", "p_size", "p_type")).alias("data"),
    )
    acts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat_ws("-", "l_orderkey", "l_linenumber").alias("aid"),
            F.col("o_custkey").cast("string").alias("sid"),
            F.col("l_partkey").cast("string").alias("pid"),
            F.concat(F.lit("InChI=1S/C"), F.col("l_partkey")).alias("inchi"),
            F.when(F.col("l_returnflag") == "R", "positive")
            .otherwise("negative")
            .alias("value"),
            (F.col("l_orderkey") % 2).alias("shard"),
        )
    )
    for i, src in enumerate(sources):
        d = f"{root}/{src}"
        cust.write.mode("overwrite").parquet(f"{d}/substances.parquet")
        part.write.mode("overwrite").parquet(f"{d}/properties.parquet")
        acts.where(F.col("shard") == i).drop("shard").write.mode(
            "overwrite"
        ).parquet(f"{d}/activities.parquet")
    return sources


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entrymod
    from chemharmony_spark.plans.harmonize import harmonize
    from chemharmony_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footer caches with one cheap action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from chemharmony_spark.cache import release_caches

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        best = None
        try:
            for _ in range(2):  # best-of-2: see module docstring
                t0 = time.time()
                # count() forces full execution of every operator without
                # the driver-collect overhead of toPandas on wide results
                qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                # record inside the loop: if run 2 dies, run 1's valid
                # timing survives (reported alongside the error)
                timings[name] = round(best, 3)
                release_caches()  # bound cache residency across runs
        except Exception as e:  # one bad query must never zero the whole run
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        finally:
            release_caches()
            # localCheckpoint blocks (the CC loop's lineage cuts) are only
            # freed when the driver-side references are garbage-collected
            # and the ContextCleaner runs; force the Python side so one
            # query's checkpoint residue can't inflate the next timing
            import gc

            gc.collect()

    # flagship: the harmonize job end-to-end (scan -> canonicalize ->
    # content ids -> re-key joins -> global aid -> invariant checks)
    try:
        staging_root = f"/tmp/chemharmony_bench_staging_sf{sf}"
        sources = _prepare_staging(spark, sf_dir, staging_root)
        best = None
        for _ in range(2):  # best-of-2, same as the headline queries
            t0 = time.time()
            res = harmonize(spark, staging_root, sources)
            n_acts = res.activities.count()
            dt = time.time() - t0
            assert n_acts > 0
            best = dt if best is None else min(best, dt)
            timings["harmonize_e2e"] = round(best, 3)  # survives a run-2 failure
            res.unpersist()
            release_caches()
    except Exception as e:
        errors["harmonize_e2e"] = f"{type(e).__name__}: {e}"[:300]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
