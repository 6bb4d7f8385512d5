"""Bucketed-write scale path (SCALE.md: the mitigation for re-key maps that
outgrow broadcast): co-bucketed tables join without a shuffle. Verified by
inspecting the physical plan for Exchange operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chemharmony_spark.sources.writers import write_parquet


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def test_cobucketed_join_has_no_shuffle(spark, warehouse):
    acts = spark.range(0, 10000).select(
        F.col("id").alias("sid"),
        (F.col("id") % 7).alias("x"),
    )
    subs = spark.range(0, 1000).select(
        F.col("id").alias("sid"),
        F.md5(F.col("id").cast("string")).alias("data"),
    )
    spark.sql("DROP TABLE IF EXISTS acts_b")
    spark.sql("DROP TABLE IF EXISTS subs_b")
    write_parquet(acts, f"{warehouse}/acts_b", bucket_by=(8, ["sid"]),
                  table_name="acts_b")
    write_parquet(subs, f"{warehouse}/subs_b", bucket_by=(8, ["sid"]),
                  table_name="subs_b")

    a = spark.table("acts_b")
    s = spark.table("subs_b")
    # disable broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(s, on="sid")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # every activity row with sid < 1000 finds its substance
        assert joined.count() == acts.where("sid < 1000").count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS acts_b")
        spark.sql("DROP TABLE IF EXISTS subs_b")


def test_harmonize_rekey_shape_cobucketed_composite_key(spark, warehouse):
    """The at-rest completion of harmonize's rekey_strategy='bucket'
    (plans/harmonize.py docstring): staging activities and the sid map
    bucketed on the SAME composite (source, sid) key join with ZERO
    exchanges — the exact re-key join shape, so at 100x the fact table
    never shuffles for the re-key even without broadcast."""
    acts = spark.range(0, 20000).select(
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
        F.concat(F.lit("s"), (F.col("id") % 500).cast("string")).alias("sid"),
        (F.col("id") % 2).alias("binary_value"),
    )
    sid_map = spark.range(0, 1500).select(
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
        F.concat(F.lit("s"), (F.col("id") % 500).cast("string")).alias("sid"),
        F.md5(F.col("id").cast("string")).alias("newsid"),
    ).distinct()
    spark.sql("DROP TABLE IF EXISTS acts_ck")
    spark.sql("DROP TABLE IF EXISTS sidmap_ck")
    write_parquet(acts, f"{warehouse}/acts_ck",
                  bucket_by=(8, ["source", "sid"]), table_name="acts_ck")
    write_parquet(sid_map, f"{warehouse}/sidmap_ck",
                  bucket_by=(8, ["source", "sid"]), table_name="sidmap_ck")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("acts_ck").join(
            spark.table("sidmap_ck"), on=["source", "sid"], how="inner"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"composite-key bucketed rekey shuffles:\n{plan}"
        assert joined.count() == 20000  # every (source, sid) resolves
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS acts_ck")
        spark.sql("DROP TABLE IF EXISTS sidmap_ck")
