"""Batch/stream parity: the streaming tumbling rollup must equal the batch
plan (queries.q28_tumbling_window) on a bounded replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from chemharmony_spark.queries import q28_tumbling_window, q29_sessionize
from chemharmony_spark.streaming.windows import (
    run_stream_to_memory,
    stream_session_counts,
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


def test_streaming_sessionization_matches_batch(spark, sf_dir):
    """The stateful session_window streaming op agrees with the oracle-checked
    lag+cumsum batch sessionizer on per-user session counts."""
    agg = stream_session_counts(spark, sf_dir)
    sessions = run_stream_to_memory(agg, "stream_sessions")
    rollup = sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events")
    )
    ours = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in q29_sessionize(spark, sf_dir).collect()
    }
    theirs = {r.user_id: (r.n_sessions, r.n_events) for r in rollup.collect()}
    assert ours == theirs


def test_custom_stateful_operator_matches_batch(spark, sf_dir):
    """applyInPandasWithState per-user profiles == declarative batch agg."""
    from chemharmony_spark.streaming.stateful import (
        batch_user_profiles,
        stream_user_profiles,
    )

    agg = stream_user_profiles(spark, sf_dir)
    streamed = run_stream_to_memory(agg, "stream_profiles", mode="update")
    ours = {
        r.user_id: (r.n_events, round(r.total_value, 2), r.n_event_types, r.event_types)
        for r in streamed.collect()
    }
    batch = {
        r.user_id: (r.n_events, round(r.total_value, 2), r.n_event_types, r.event_types)
        for r in batch_user_profiles(spark, sf_dir).collect()
    }
    assert ours == batch
