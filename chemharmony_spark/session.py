"""SparkSession factory.

Parameterizes the reference's hand-tuned session configs
(reference: 80_harmonize.py:14-18, 09_integrate_pubchem.py:6-18) and upgrades
them to modern Spark practice: AQE (dynamic coalescing + skew-join splitting)
instead of a static ``spark.sql.shuffle.partitions=200``, Arrow for every
Python<->JVM hop, and vectorized parquet IO.

Scale notes (100 TB / 1000-executor design intent)
--------------------------------------------------
- AQE is the single most important switch: it re-plans shuffles at runtime,
  coalesces small partitions, and splits skewed ones — strictly better than
  the reference's static 200 partitions at any scale.
- ``maxPartitionBytes`` 128m keeps scan tasks memory-bounded regardless of
  input size; at 100 TB that is ~800k scan tasks, which Spark schedules fine.
- Broadcast threshold stays modest (32m) — dimension tables (region, nation,
  GHS codes, smiles maps) broadcast; fact tables never do.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Python workers unpickle our pandas_udfs by module reference, so the package
# root must be importable in the worker too. Local mode: workers inherit the
# driver environment -> prepend to PYTHONPATH before the JVM launches.
# Cluster mode: ship the package with --py-files / spark.submit.pyFiles.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_worker_pythonpath() -> None:
    pp = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_PKG_ROOT}{os.pathsep}{pp}" if pp else _PKG_ROOT
        )


def get_spark(
    app_name: str = "chemharmony_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for columnar batch analytics.

    In tests/bench this runs ``local[$SPARK_GRAFT_CPUS]``; on a cluster the
    same configs hold — only master/memory sizing comes from spark-submit.
    """
    _ensure_worker_pythonpath()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- adaptive execution: runtime re-planning beats static tuning ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- correctness: overflow must error, never silently NULL ---
        # The engine's BIGINT contract-edge casts (see queries.py D38 notes)
        # assume ANSI arithmetic. Spark 4 defaults to ANSI on, but a Spark 3.x
        # or conf-overridden deployment would silently NULL on overflow — the
        # worst failure mode for a correctness-first engine — so pin it here
        # rather than rely on the deployment default.
        .config("spark.sql.ansi.enabled", "true")
        # --- IO ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # --- Python boundary: always Arrow, never row-at-a-time pickle ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- quieter, deterministic local runs ---
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
