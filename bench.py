"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entrymod
    from chemharmony_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footer caches with one cheap action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        # count() forces full execution of every operator without the
        # driver-collect overhead of toPandas on wide results
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
