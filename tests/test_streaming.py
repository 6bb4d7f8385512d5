"""Batch/stream parity: the streaming tumbling rollup must equal the batch
plan (queries.q28_tumbling_window) on a bounded replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from chemharmony_spark.queries import q28_tumbling_window
from chemharmony_spark.streaming.windows import (
    run_stream_to_memory,
    stream_tumbling_counts,
)


def test_stream_matches_batch(spark, sf_dir):
    agg = stream_tumbling_counts(spark, sf_dir)
    streamed = run_stream_to_memory(agg, "stream_hourly")
    streamed = streamed.select(
        (F.unix_micros(F.col("window.start")) * 1000 / F.lit(3_600_000_000_000))
        .cast("long")
        .alias("hour_bucket"),
        "event_type",
        "n",
        "total_value",
    )
    batch = q28_tumbling_window(spark, sf_dir)
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b
