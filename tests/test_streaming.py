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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a 30-min watermark over a 3-batch file
    replay: batch2 advances the watermark past batch1's window (finalizing
    it); batch3's late rows for that window arrive behind the watermark and
    must NOT change the emitted result."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late_events"
    d.mkdir()
    H = 3_600_000_000_000  # ns per hour
    T0 = 1_700_000_000_000_000_000  # aligned-ish epoch ns base

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                # rows carry epoch ns; the table stores plain timestamp[us]
                # like the driver testdata
                "ts": pa.array([r[1] // 1000 for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        p = d / name
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    base = _time.time() - 1000
    t_h0 = (T0 // H) * H  # hour-aligned
    # batch 1: three events in hour H0
    write("b1.parquet", [(0, t_h0 + 60 * 10**9), (1, t_h0 + 120 * 10**9),
                         (2, t_h0 + 180 * 10**9)], base)
    # batch 2: an event two hours later -> advances the watermark past H0's
    # window end (effective from the NEXT batch)
    write("b2.parquet", [(3, t_h0 + 2 * H)], base + 10)
    # batch 3: another current event; during this batch the advanced
    # watermark evicts + emits the H0 window. (Empirically, a late row
    # arriving in the SAME batch as the eviction still gets counted — the
    # drop only applies once the window's state is gone.)
    write("b3.parquet", [(4, t_h0 + 2 * H + 60 * 10**9)], base + 20)
    # batch 4: LATE rows for H0 — state evicted, behind watermark -> dropped
    write("b4.parquet", [(5, t_h0 + 200 * 10**9), (6, t_h0 + 240 * 10**9)],
          base + 30)

    src = (
        spark.readStream.schema(
            __import__(
                "chemharmony_spark.streaming.windows", fromlist=["EVENTS_SCHEMA"]
            ).EVENTS_SCHEMA
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    src = src.withColumn("ts_ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts_ts", "30 minutes")
        .groupBy(F.window("ts_ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT unix_micros(window.start) AS ws, n FROM late_test").collect()
    by_window = {r.ws: r.n for r in out}
    h0_us = t_h0 // 1000
    # H0's window was finalized with batch-1's three rows only; the two late
    # batch-3 rows were discarded by the watermark
    assert by_window.get(h0_us) == 3, f"windows emitted: {by_window}"
    # the H2 window is still open at end-of-stream (append mode) -> absent
    assert len(by_window) == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a 3-batch replay: duplicate
    event_ids arriving within the watermark interval are dropped; the
    surviving distinct set equals the batch dropDuplicates twin."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chemharmony_spark.streaming.windows import stream_dedup

    d = tmp_path / "dup_events"
    d.mkdir()
    T0 = 1_700_000_000_000_000_000
    M = 60 * 10**9  # ns per minute

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] // 1000 for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        p = d / name
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    base = _time.time() - 1000
    # batch 1: ids 0,1; batch 2 re-delivers id 0 (dup, 5 min later — inside
    # the 1 h watermark) plus new id 2; batch 3 re-delivers 1 and 2
    write("events.parquet", [(0, T0), (1, T0 + M)], base)
    write("b2.parquet", [(0, T0 + 5 * M), (2, T0 + 6 * M)], base + 10)
    write("b3.parquet", [(1, T0 + 7 * M), (2, T0 + 8 * M)], base + 20)

    # pathGlobFilter in stream_dedup targets events.parquet only — point the
    # reader at the whole dir instead
    from chemharmony_spark.streaming.windows import EVENTS_SCHEMA

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts_ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        src.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r.event_id for r in spark.sql("SELECT event_id FROM dedup_stream").collect()
    )
    assert got == [0, 1, 2], got
    # and the packaged helper compiles to a streaming plan with dedup state
    plan_df = stream_dedup(spark, str(d))
    assert plan_df.isStreaming


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join == the batch interval join
    on a bounded replay."""
    from chemharmony_spark.streaming.windows import stream_stream_join

    joined = stream_stream_join(spark, sf_dir, window="30 minutes")
    streamed = run_stream_to_memory(joined, "ss_join", mode="append")
    got = sorted(
        (r["c_id"], r["p_id"])
        for r in streamed.select("c_id", "p_id").collect()
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("c_id"),
        F.col("us").alias("c_us"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("p_id"),
        F.col("us").alias("p_us"),
    )
    HALF_HOUR_US = 30 * 60 * 1_000_000
    want = sorted(
        (r["c_id"], r["p_id"])
        for r in clicks.join(
            buys,
            (F.col("cu") == F.col("pu"))
            & (F.col("p_us") >= F.col("c_us"))
            & (F.col("p_us") <= F.col("c_us") + HALF_HOUR_US),
        ).select("c_id", "p_id").collect()
    )
    assert len(want) > 0  # the replay actually exercises the join
    assert got == want


def test_transform_with_state_matches_batch(spark, sf_dir):
    """Spark-4 transformWithStateInPandas profile == the declarative batch
    agg (and therefore == the applyInPandasWithState twin)."""
    import pytest

    from chemharmony_spark.streaming.stateful import (
        HAVE_TWS,
        batch_user_profiles,
        stream_user_profiles_tws,
    )

    if not HAVE_TWS:
        pytest.skip("python protobuf package unavailable — the "
                    "transformWithState state server requires it")

    # transformWithState requires the RocksDB state store provider
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        agg = stream_user_profiles_tws(spark, sf_dir)
        streamed = run_stream_to_memory(agg, "stream_profiles_tws",
                                        mode="update")
        streamed = streamed.localCheckpoint()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    ours = {
        r.user_id: (r.n_events, round(r.total_value, 2), r.n_event_types,
                    r.event_types)
        for r in streamed.collect()
    }
    batch = {
        r.user_id: (r.n_events, round(r.total_value, 2), r.n_event_types,
                    r.event_types)
        for r in batch_user_profiles(spark, sf_dir).collect()
    }
    assert ours == batch


def test_streaming_checkpoint_recovery(spark, tmp_path):
    """Exactly-once restart semantics — the property a 100 TB deployment
    lives on: a stateful query restarted against the SAME checkpoint
    (1) does not re-read batches the source offset log marks committed,
    and (2) restores its per-key state, so cumulative aggregates continue
    from where they stopped instead of restarting at zero."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chemharmony_spark.streaming.stateful import stream_user_profiles

    d = tmp_path / "cdc_events"
    d.mkdir()
    cp = str(tmp_path / "checkpoint")
    T0 = 1_700_000_000_000_000

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([T0 + r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([r[3] for r in rows]),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        p = d / name
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    base = _time.time() - 1000
    # run 1: user 1 gets two clicks, user 2 one view
    write("events.parquet",
          [(0, 1, "click", 1.0), (1, 1, "click", 2.5), (2, 2, "view", 4.0)],
          base)

    def run(name):
        # same stateful plan as stream_user_profiles, but reading the whole
        # replay dir (its pathGlobFilter would hide the second batch file);
        # foreachBatch is the recoverable sink form (memory sink refuses to
        # restart from a checkpoint)
        from pyspark.sql.streaming.state import GroupStateTimeout

        from chemharmony_spark.streaming.stateful import (
            PROFILE_SCHEMA,
            STATE_SCHEMA,
            _update_profile,
        )
        from chemharmony_spark.streaming.windows import EVENTS_SCHEMA

        prof = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(str(d))
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_profile,
                outputStructType=PROFILE_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        collected = []

        def sink(batch_df, _epoch):
            collected.extend(batch_df.collect())

        q = (
            prof.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.user_id: (r.n_events, r.total_value) for r in collected}

    first = run("cp_run1")
    assert first == {1: (2, 3.5), 2: (1, 4.0)}

    # run 2 against the same checkpoint: ONLY the new file is processed;
    # user 1's state continues (2 -> 3 events), user 3 appears fresh, and
    # user 2 — untouched in this batch — is NOT re-emitted (update mode)
    write("b2.parquet", [(3, 1, "purchase", 10.0), (4, 3, "view", 1.0)],
          base + 10)
    second = run("cp_run2")
    assert second == {1: (3, 13.5), 3: (1, 1.0)}, second


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    """Stream-static broadcast join parity: enriching the event stream with
    a static dim gives the same rows as the batch join."""
    from chemharmony_spark.streaming.windows import (
        run_stream_to_memory,
        stream_enrich,
    )

    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 10),
         ("signup", 5), ("error", 0)],
        "event_type string, weight int",
    )
    enriched = stream_enrich(spark, sf_dir, dim).select(
        "event_id", "event_type", "weight"
    )
    got = run_stream_to_memory(enriched, "enrich_par", mode="append")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = ev.join(F.broadcast(dim), on="event_type", how="left").select(
        "event_id", "event_type", "weight"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_foreach_batch_sink_is_epoch_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch sink: batches land exactly once under availableNow (one
    epoch-keyed parquet dir per delivered batch), and the union of all
    epochs equals the source."""
    from chemharmony_spark.streaming.windows import (
        run_stream_foreach_batch,
        stream_events,
    )

    out = tmp_path / "sink"
    out.mkdir()

    def write_epoch(batch_df, epoch_id):
        # epoch-keyed path = idempotent under replay
        batch_df.write.mode("overwrite").parquet(str(out / f"epoch={epoch_id}"))

    src = stream_events(spark, sf_dir).select("event_id", "event_type")
    run_stream_foreach_batch(
        src, write_epoch, str(tmp_path / "ckpt"), mode="append"
    )

    epochs = list(out.glob("epoch=*"))
    assert len(epochs) >= 1
    got = spark.read.parquet(str(out / "epoch=*"))
    want = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() == want.count()
    assert got.select("event_id").exceptAll(want.select("event_id")).count() == 0


def test_incremental_near_dup_admission(spark, sf_dir, tmp_path):
    """stream_novel_docs: batch-sequential admission parity. Docs arrive in
    two micro-batches; batch 2 docs sharing a MinHash band bucket with
    batch 1's ADMITTED docs are dropped, matching the reference
    computation run sequentially in batch."""
    import os

    from chemharmony_spark.operators.dedup import minhash_signatures
    from chemharmony_spark.streaming.windows import stream_novel_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)
    src = tmp_path / "incoming"
    # one file per half => maxFilesPerTrigger=1 yields two deterministic
    # micro-batches in arrival order
    half1.coalesce(1).write.parquet(str(src / "batch1"))
    half2.coalesce(1).write.parquet(str(src / "batch2"))
    # flatten: the reader globs files, order = listing order of the two
    # part files; rename so batch1 sorts first
    files = sorted(str(p) for p in src.rglob("part-*.parquet"))
    stage = tmp_path / "stage"
    stage.mkdir()
    os.rename(files[0], stage / "a_documents.parquet")
    os.rename(files[1], stage / "b_documents.parquet")

    idx, adm, ckpt = (tmp_path / d for d in ("index", "admitted", "ckpt"))
    stream_novel_docs(spark, str(stage), str(idx), str(adm), str(ckpt))

    got = spark.read.parquet(str(adm / "*")).select("doc_id")

    # reference: sequential batch admission
    sig1 = minhash_signatures(half1, "doc_id", "text")
    hit2 = (
        minhash_signatures(half2, "doc_id", "text")
        .join(sig1.select("band", "minhash").distinct(),
              on=["band", "minhash"], how="left_semi")
        .select(F.col("id").alias("doc_id")).distinct()
    )
    want = half1.select("doc_id").union(
        half2.join(hit2, on="doc_id", how="left_anti").select("doc_id")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_streaming_cusum_matches_batch_across_batches(spark, sf_dir, tmp_path):
    """The CUSUM chart state folds FORWARD across micro-batches: replaying
    the events in two time-ordered batches yields exactly the batch fold
    (q139) — alarm counts, event counts, and the final S value."""
    import os

    from chemharmony_spark.queries import q139_cusum_alarms
    from chemharmony_spark.streaming.stateful import stream_cusum

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mid = ev.selectExpr(
        "percentile_approx(unix_micros(CAST(ts AS TIMESTAMP)), 0.5) AS m"
    ).collect()[0].m
    stage = tmp_path / "stage"
    stage.mkdir()
    for name, half in (
        ("a_events.parquet",
         ev.where(F.unix_micros(F.col("ts").cast("timestamp")) < mid)),
        ("b_events.parquet",
         ev.where(F.unix_micros(F.col("ts").cast("timestamp")) >= mid)),
    ):
        tmp = tmp_path / ("w_" + name)
        half.coalesce(1).write.parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        os.rename(part, stage / name)
    # oldest-first file ordering => batch a, then batch b
    os.utime(stage / "a_events.parquet", (1, 1))
    os.utime(stage / "b_events.parquet", (2, 2))

    streamed = run_stream_to_memory(
        stream_cusum(spark, str(stage), glob="*_events.parquet",
                     max_files_per_trigger=1),
        "stream_cusum", mode="update",
    )
    # a user's latest update is the one with the largest cumulative count
    final = streamed.groupBy("user_id").agg(
        F.max(F.struct("n_events", "n_alarms", "final_s_micro")).alias("f")
    )
    ours = {r.user_id: (r.f.n_events, r.f.n_alarms, r.f.final_s_micro)
            for r in final.collect()}
    batch = {r.user_id: (r.n_events, r.n_alarms, r.final_s_micro)
             for r in q139_cusum_alarms(spark, sf_dir).collect()}
    assert ours == batch
    # the split genuinely produced two batches (some user alarms straddle)
    assert streamed.count() > len(batch)


def test_streaming_hopping_window_matches_batch(spark, sf_dir):
    """Sliding-window streaming agg == the batch hopping-window rollup
    (q137) on a bounded replay."""
    from chemharmony_spark.queries import q137_hopping_window
    from chemharmony_spark.streaming.windows import stream_hopping_counts

    agg = stream_hopping_counts(spark, sf_dir)
    streamed = run_stream_to_memory(agg, "stream_hopping").select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n",
    )
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, q137_hopping_window(spark, sf_dir).collect()))
    assert s == b


def test_streaming_throttle_matches_batch_across_batches(spark, sf_dir,
                                                         tmp_path):
    """stream_throttle: the (last_kept, kept) state folds FORWARD across
    micro-batches — replaying the events in two time-ordered batches
    reproduces the q190 batch fold's per-type raw/kept totals exactly
    (the cross-batch case is the one a fixed-bucket dedup gets wrong:
    a kept event near the batch boundary must still suppress
    sub-300s followers arriving in the NEXT batch)."""
    import os

    from chemharmony_spark.queries import q190_throttle_dedup
    from chemharmony_spark.streaming.stateful import stream_throttle

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mid = ev.selectExpr(
        "percentile_approx(unix_micros(CAST(ts AS TIMESTAMP)), 0.5) AS m"
    ).collect()[0].m
    stage = tmp_path / "stage"
    stage.mkdir()
    for name, half in (
        ("a_events.parquet",
         ev.where(F.unix_micros(F.col("ts").cast("timestamp")) < mid)),
        ("b_events.parquet",
         ev.where(F.unix_micros(F.col("ts").cast("timestamp")) >= mid)),
    ):
        tmp = tmp_path / ("w_" + name)
        half.coalesce(1).write.parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        os.rename(part, stage / name)
    os.utime(stage / "a_events.parquet", (1, 1))
    os.utime(stage / "b_events.parquet", (2, 2))

    streamed = run_stream_to_memory(
        stream_throttle(spark, str(stage), glob="*_events.parquet",
                        max_files_per_trigger=1),
        "stream_throttle", mode="update",
    )
    final = streamed.groupBy("user_id", "event_type").agg(
        F.max(F.struct("n_raw", "n_kept")).alias("f")
    )
    ours = {
        r.event_type: (r.raw, r.kept)
        for r in final.groupBy("event_type").agg(
            F.sum("f.n_raw").alias("raw"), F.sum("f.n_kept").alias("kept")
        ).collect()
    }
    batch = {r.event_type: (r.n_raw, r.n_kept)
             for r in q190_throttle_dedup(spark, sf_dir).collect()}
    assert ours == batch
    # the split genuinely exercised cross-batch state
    assert streamed.count() > final.count()


def test_streaming_hll_sketch_matches_batch(spark, sf_dir, tmp_path):
    """The incrementally maintained HLL index (per-epoch max-rho partials,
    merged by max) yields EXACTLY the batch q248 estimate: HLL state is a
    max-merge semilattice, so partial order/batching cannot change it."""
    import os

    from chemharmony_spark.queries import q248_hll_distinct
    from chemharmony_spark.streaming.windows import (
        hll_estimate_from_index, stream_hll_index,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage = tmp_path / "stage"
    stage.mkdir()
    # three deterministic slices -> three micro-batches
    for i in range(3):
        half = ev.where(F.col("event_id") % 3 == i)
        tmp = tmp_path / f"w_{i}"
        half.coalesce(1).write.parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        os.rename(part, stage / f"{i}_events.parquet")
        os.utime(stage / f"{i}_events.parquet", (i + 1, i + 1))

    stream_hll_index(
        spark, str(stage), str(tmp_path / "index"), str(tmp_path / "ckpt"),
        glob="*_events.parquet",
    )
    assert len(os.listdir(tmp_path / "index")) >= 2  # genuinely incremental
    streamed = {
        r.event_type: r.hll_est_micro
        for r in hll_estimate_from_index(spark, str(tmp_path / "index")).collect()
    }
    batch = {
        r.event_type: r.hll_est_micro
        for r in q248_hll_distinct(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_countmin_sketch_matches_batch(spark, sf_dir, tmp_path):
    """The incrementally maintained count-min index (per-epoch counter
    partials, merged by SUM) yields EXACTLY the batch sketch estimates:
    count-min state is additive over disjoint batches, so batching
    cannot change it."""
    import os

    from chemharmony_spark.operators.sketches import countmin_counts
    from chemharmony_spark.streaming.windows import (
        countmin_estimate_from_index, stream_countmin_index,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage = tmp_path / "stage"
    stage.mkdir()
    for i in range(3):
        part_df = ev.where(F.col("event_id") % 3 == i)
        tmp = tmp_path / f"w_{i}"
        part_df.coalesce(1).write.parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        os.rename(part, stage / f"{i}_events.parquet")
        os.utime(stage / f"{i}_events.parquet", (i + 1, i + 1))

    stream_countmin_index(
        spark, str(stage), str(tmp_path / "index"), str(tmp_path / "ckpt"),
        item_col="event_type", width=64, depth=4,
        glob="*_events.parquet",
    )
    assert len(os.listdir(tmp_path / "index")) >= 2  # genuinely incremental
    items = ev.select("event_type").distinct()
    streamed = {
        r.item: r.cm_estimate
        for r in countmin_estimate_from_index(
            spark, str(tmp_path / "index"), items,
            item_col="event_type", width=64, depth=4,
        ).collect()
    }
    batch = {
        r.item: r.est_count
        for r in countmin_counts(ev, "event_type", width=64, depth=4)
        .collect()
    }
    assert streamed == batch
    # width=64 forces collisions, so the sketch genuinely over-estimates
    exact = {r.event_type: r["count"]
             for r in ev.groupBy("event_type").count().collect()}
    assert all(streamed[k] >= exact[k] for k in exact)


def test_streaming_page_hinkley_matches_batch(spark, sf_dir, tmp_path):
    """The incrementally maintained daily index (per-epoch (day, n,
    micro-sum) partials, merged by SUM) feeds a Page-Hinkley walk that
    EXACTLY matches the batch monitor over the full table: daily
    sufficient stats are additive over disjoint batches, and the walk
    itself is a pure function of the merged series."""
    import os

    from chemharmony_spark.streaming.windows import (
        batch_page_hinkley_daily,
        page_hinkley_from_index,
        stream_daily_index,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage = tmp_path / "stage"
    stage.mkdir()
    for i in range(3):
        part_df = ev.where(F.col("event_id") % 3 == i)
        tmp = tmp_path / f"w_{i}"
        part_df.coalesce(1).write.parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        os.rename(part, stage / f"{i}_events.parquet")
        os.utime(stage / f"{i}_events.parquet", (i + 1, i + 1))

    stream_daily_index(
        spark, str(stage), str(tmp_path / "index"), str(tmp_path / "ckpt"),
        glob="*_events.parquet",
    )
    assert len(os.listdir(tmp_path / "index")) >= 2  # genuinely incremental
    lam = 1_000_000  # low lambda so alarms actually fire on test data
    streamed = page_hinkley_from_index(
        spark, str(tmp_path / "index"), lam_micro=lam
    ).collect()[0]
    batch = batch_page_hinkley_daily(
        spark, sf_dir, lam_micro=lam
    ).collect()[0]
    assert streamed.asDict() == batch.asDict()
    assert streamed.n_days > 1


def test_index_epochs_uses_hadoop_fs(spark, tmp_path):
    """ADVICE r3 (medium): epoch discovery must go through the Hadoop
    FileSystem API so non-local index paths work; a missing dir is the
    legitimate first-batch case ([]), anything else enumerates only
    epoch=* subdirs, and the batch readers raise an explicit
    'no epochs yet' instead of a confusing zero-path read."""
    import pytest

    from chemharmony_spark.streaming.windows import (
        _index_epochs,
        _read_index_epochs,
    )

    assert _index_epochs(spark, str(tmp_path / "missing")) == []
    d = tmp_path / "idx"
    (d / "epoch=0").mkdir(parents=True)
    (d / "epoch=1").mkdir()
    (d / "_spark_metadata").mkdir()
    eps = _index_epochs(spark, str(d))
    assert [e.rsplit("/", 1)[-1] for e in eps] == ["epoch=0", "epoch=1"]
    # explicit file:/ URI resolves through the same FS API
    eps_uri = _index_epochs(spark, "file://" + str(d))
    assert [e.rsplit("/", 1)[-1] for e in eps_uri] == ["epoch=0", "epoch=1"]
    with pytest.raises(ValueError, match="no epochs yet"):
        _read_index_epochs(spark, str(tmp_path / "missing"), "HLL")
    # replay idempotency (r5): a REPLAYED foreachBatch must not list its
    # own crashed-run epoch — before_epoch bounds the listing strictly
    (d / "epoch=2").mkdir()
    replay = _index_epochs(spark, str(d), before_epoch=2)
    assert [e.rsplit("/", 1)[-1] for e in replay] == ["epoch=0", "epoch=1"]
    assert _index_epochs(spark, str(d), before_epoch=0) == []


def test_profile_parity_null_values_and_half_cents(spark, tmp_path):
    """Stream/batch profile parity on the edges the r5 review exposed:
    NULL event_type (crashed sorted()), NULL values (pandas sum() said
    0.0 where the batch twin says NULL), and exact half-cent values
    (pandas .round() is half-to-even, F.round is HALF-UP)."""
    import pandas as pd

    from chemharmony_spark.streaming.stateful import (
        batch_user_profiles,
        stream_user_profiles,
    )

    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 2, 2, 3],
        "event_type": ["click", None, "buy", "buy", None],
        # 0.125 -> 12.5 cents: HALF-UP says 13, banker's said 12
        "value": [0.125, None, None, None, 2.375],
        "ts": pd.to_datetime(["2024-01-01"] * 5).astype("datetime64[us]"),
    }).to_parquet(d / "events.parquet")
    q = (
        stream_user_profiles(spark, str(d))
        .writeStream.format("memory").queryName("prof_edge")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.total_value, r.n_event_types, r.event_types)
        for r in spark.sql(
            "select * from prof_edge"
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value, r.n_event_types, r.event_types)
        for r in batch_user_profiles(spark, str(d)).collect()
    }
    assert got == want
    assert want[1] == (2, 0.13, 1, "click")   # HALF-UP, null type dropped
    assert want[2][1] is None                  # all-null values -> NULL sum
    assert want[3][3] == ""                    # no types at all
