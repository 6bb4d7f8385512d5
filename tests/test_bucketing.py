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
