"""Structured Streaming surface over the events table.

The reference has no streaming (SURVEY.md §2.12 — confirmed none), but the
engine exposes the batch window semantics through ``readStream`` so the same
rollup runs incrementally: parquet source -> event-time tumbling window ->
sink. Batch/stream parity is asserted in tests/test_streaming.py (the batch
twin is queries.q28_tumbling_window).

Scale notes: a real deployment points the same code at a Kafka/file source;
the watermark bounds state, and the windowed agg shuffles on
(window, event_type) exactly like the batch plan. Sessionization
(queries.q29) maps to ``session_window`` / ``applyInPandasWithState`` in
this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampNTZType(), True),  # parquet timestamp[us]
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def _index_epochs(spark: SparkSession, index_dir: str,
                  before_epoch: int | None = None) -> list:
    """Enumerate ``epoch=*`` subdirectories of ``index_dir`` through the
    Hadoop FileSystem API, so the incremental indexes work on ANY
    Spark-supported filesystem (s3a://, hdfs://, file:/) — ``os.listdir``
    only sees the driver's local disk, which on an object-store
    deployment silently reports "no index yet" every batch and disables
    dedup entirely. Returns ``[]`` when the directory does not exist yet
    (the legitimate first-batch case); every other IO error propagates
    and fails the batch instead of admitting data unchecked.

    ``before_epoch``: REQUIRED for replay-idempotent consumers — only
    epochs strictly below it are listed. A replayed foreachBatch
    otherwise sees its own crashed-run output (the current epoch's
    partially written index), collides every document with itself, and
    rewrites the epoch EMPTY — permanent data loss on recovery."""
    from chemharmony_spark.sources.readers import hadoop_fs

    fs, path = hadoop_fs(spark, index_dir)
    if not fs.exists(path):
        return []

    def _keep(name: str) -> bool:
        if not name.startswith("epoch="):
            return False
        if before_epoch is None:
            return True
        try:
            return int(name.split("=", 1)[1]) < before_epoch
        except ValueError:
            return True
    return sorted(
        st.getPath().toString()
        for st in fs.listStatus(path)
        if st.isDirectory() and _keep(st.getPath().getName())
    )


def _read_index_epochs(
    spark: SparkSession, index_dir: str, what: str
) -> DataFrame:
    """Read the union of all epoch partials, with an explicit error for
    the not-yet-populated case (os.listdir would raise FileNotFoundError
    on a missing local dir and spark.read.parquet() with zero paths gives
    a confusing 'path not specified' — neither names the real problem)."""
    epochs = _index_epochs(spark, index_dir)
    if not epochs:
        raise ValueError(
            f"{what} index at {index_dir!r} has no epochs yet — run the "
            "indexing stream (or its batch twin) before estimating"
        )
    return spark.read.parquet(*epochs)


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream over events.parquet with the two time views every streaming
    plan consumes: ``ts`` re-derived as BIGINT ns since epoch and ``ts_ts``
    as TimestampType (session tz is UTC, so the NTZ cast is a pure re-tag).
    Mirrors queries._events so batch/stream twins share semantics."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_dir)
    )
    ts_ts = F.col("ts").cast("timestamp")
    return src.withColumn("ts_ts", ts_ts).withColumn(
        "ts", F.unix_micros(ts_ts) * F.lit(1000).cast("long")
    )


def stream_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    with_watermark: bool = False,
) -> DataFrame:
    """Streaming hourly rollup per event_type (tumbling event-time window).

    ``with_watermark=False`` + complete output mode gives exact batch parity
    for a bounded replay; set True for unbounded sources (bounds state, may
    hold back the trailing window until the watermark passes it).
    """
    src = stream_events(spark, events_dir)
    if with_watermark:
        src = src.withWatermark("ts_ts", watermark)
    return src.groupBy(F.window("ts_ts", window), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


def stream_hopping_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Streaming hopping-window counts — the stream twin of the batch
    q137_hopping_window: each event expands JVM-side into its
    window/slide = 4 overlapping windows before the stateful agg. Same
    complete-mode bounded-replay parity contract as the tumbling rollup."""
    src = stream_events(spark, events_dir)
    return src.groupBy(
        F.window("ts_ts", window, slide), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))


def stream_session_counts(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    with_watermark: bool = False,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: Spark's built-in ``session_window`` stateful
    operator (dynamic-gap session windows merged incrementally). The batch
    twin is queries.q29_sessionize (lag + cumulative sum); parity is
    asserted in tests/test_streaming.py."""
    src = stream_events(spark, events_dir)
    if with_watermark:
        src = src.withWatermark("ts_ts", watermark)
    # one stateful operator per stream: emit session-level rows; roll up
    # per-user downstream (a second stateful agg in the same stream trips
    # Spark's global-watermark correctness check)
    return src.groupBy(F.session_window("ts_ts", gap), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )


def stream_dedup(
    spark: SparkSession,
    events_dir: str,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication on ``keys``.

    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark`` — the
    bounded-state form: a duplicate arriving within the watermark interval
    of its first sighting is dropped, and state for keys older than the
    watermark is evicted. That is the ONLY sane form at 100 TB/day: plain
    ``dropDuplicates`` on a stream keeps every key ever seen in the state
    store. The batch twin (exact parity on a bounded replay where all dups
    arrive inside one interval) is a plain ``dropDuplicates``.
    """
    keys = keys or ["event_id"]
    src = stream_events(spark, events_dir)
    src = src.withWatermark("ts_ts", watermark)
    if within_watermark:
        return src.dropDuplicatesWithinWatermark(keys)
    return src.dropDuplicates(keys)


def stream_stream_join(
    spark: SparkSession,
    events_dir: str,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each click joined to purchases by the
    same user within ``window`` AFTER the click. Both sides carry
    watermarks and the join condition bounds event time on both ends —
    the two requirements that let Spark evict join state instead of
    buffering both streams forever (the only viable shape at 100 TB/day).
    Batch parity on a bounded replay is asserted in tests/test_streaming.py
    against the q51-style interval-join semantics.
    """
    def side(event_type: str, alias: str) -> DataFrame:
        src = stream_events(spark, events_dir)
        return (
            src.where(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user"),
                F.col("event_id").alias(f"{alias}_id"),
                F.col("ts_ts").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", watermark)
        )

    clicks = side("click", "c")
    buys = side("purchase", "p")
    return clicks.join(
        buys,
        F.expr(
            f"""
            c_user = p_user AND
            p_ts >= c_ts AND
            p_ts <= c_ts + INTERVAL {window}
            """
        ),
    )


def run_stream_to_memory(agg: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drain a bounded stream into an in-memory table (availableNow trigger)
    and return the result as a batch DataFrame."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.sql(f"SELECT * FROM {name}")


def stream_enrich(
    spark: SparkSession,
    events_dir: str,
    dim: DataFrame,
    on: str = "event_type",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch hash-joins against
    the static (bounded) ``dim`` frame — the standard pattern for decorating
    an event stream with reference data. The dim side is re-resolved per
    micro-batch, so a dim that reads from a refreshable view/table picks up
    updates without restarting the query; broadcast keeps the join
    shuffle-free on the stream side (state-free, unlike stream-stream
    joins — no watermark needed)."""
    return stream_events(spark, events_dir).join(F.broadcast(dim), on=on, how=how)


def run_stream_foreach_batch(
    df: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    mode: str = "update",
) -> None:
    """Drain a bounded stream through a ``foreachBatch`` sink — the escape
    hatch for sinks Structured Streaming lacks natively (JDBC upserts,
    MERGE targets, multi-table fan-out). ``batch_fn(batch_df, epoch_id)``
    runs on the driver per micro-batch with a BATCH DataFrame (full batch
    API available). Exactly-once contract: replays after failure re-deliver
    a batch with the SAME epoch_id, so the sink must be idempotent per
    epoch (write to epoch-keyed paths, or MERGE on a key) — the checkpoint
    only guarantees at-least-once delivery into ``batch_fn``."""
    q = (
        df.writeStream.foreachBatch(batch_fn)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_novel_docs(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    admitted_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incremental near-dup admission control — the production pattern for
    growing a deduplicated corpus: stream incoming documents and, per
    micro-batch (foreachBatch = full BATCH semantics, so the per-doc
    anti-join needs no streaming state), compute MinHash band signatures,
    drop any doc sharing a (band, minhash) bucket with the historical
    index, append the survivors to ``admitted_dir`` and THEIR signatures
    to ``index_dir`` — so batch N+1 is checked against everything admitted
    through batch N.

    Exactly-once: both writes are idempotent per epoch (epoch-keyed
    subdirs), the run_stream_foreach_batch contract. The index side is
    re-read per batch — it grows between batches by construction. False
    negatives (a near-dup admitted because no band collided) are bounded
    by the LSH band/row trade-off, exactly as in the batch q35/q36
    pipeline."""
    import os

    from chemharmony_spark.operators.dedup import minhash_signatures

    src = spark.readStream.schema(DOCS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(docs_dir)

    def admit(batch_df, epoch_id):
        sigs = minhash_signatures(batch_df, "doc_id", "text").persist()
        sess = batch_df.sparkSession
        # Detect the no-index-yet case EXPLICITLY (first batch) instead of
        # a bare except around the read: a transient IO error or corrupt
        # index file must propagate and fail the batch, not silently admit
        # everything unchecked and pollute the deduplicated corpus. The
        # Hadoop FS listing (not os.listdir) keeps this working when
        # index_dir is an object-store/HDFS path. before_epoch=epoch_id:
        # a REPLAYED batch must not see its own crashed-run index output,
        # or every doc collides with itself and the epoch rewrites empty.
        epochs = _index_epochs(sess, index_dir, before_epoch=epoch_id)
        if epochs:
            index = sess.read.parquet(*epochs)
            hit_ids = (
                sigs.join(
                    index.select("band", "minhash").distinct(),
                    on=["band", "minhash"],
                    how="left_semi",
                )
                .select(F.col("id").alias("doc_id"))
                .distinct()
            )
            novel = batch_df.join(hit_ids, on="doc_id", how="left_anti")
        else:  # first batch: no index yet
            novel = batch_df
        # persisted: the admitted write AND the index semi-join both
        # consume novel — without the cache the index read + anti-join
        # re-run for the second write every micro-batch
        novel = novel.persist()
        try:
            novel.write.mode("overwrite").parquet(
                os.path.join(admitted_dir, f"epoch={epoch_id}")
            )
            sigs.join(
                novel.select(F.col("doc_id").alias("id")),
                on="id", how="left_semi",
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, f"epoch={epoch_id}")
            )
        finally:
            novel.unpersist()
            sigs.unpersist()

    run_stream_foreach_batch(src, admit, checkpoint_dir, mode="append")


def stream_hll_index(
    spark: SparkSession,
    events_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
    max_files_per_trigger: int = 1,
) -> None:
    """Incrementally maintained HyperLogLog sketch: each micro-batch folds
    its events into 64-bucket max-rho partials (sketches.hll64_bucket_rho)
    and appends them to ``index_dir`` under an epoch-keyed subdir — the
    foreachBatch exactly-once contract (idempotent per epoch, same as
    stream_novel_docs). Because HLL state MERGES BY MAX, the union of all
    epochs' partials re-aggregated with max(m) is EXACTLY the batch
    sketch over all data ever seen: no read-modify-write of prior state,
    so batches never contend and replay is safe.

    Read the estimate at any time with :func:`hll_estimate_from_index` —
    parity with the batch q248 estimate is asserted in
    tests/test_streaming.py."""
    from chemharmony_spark.operators.sketches import hll64_bucket_rho

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
    )

    def fold(batch_df, epoch_id):
        import os

        bucket, rho = hll64_bucket_rho("user_id")
        partial = (
            batch_df.select(
                "event_type", bucket.alias("bucket"), rho.alias("rho")
            )
            .groupBy("event_type", "bucket")
            .agg(F.max("rho").alias("m"))
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"epoch={epoch_id}")
        )

    run_stream_foreach_batch(src, fold, checkpoint_dir, mode="update")


def hll_estimate_from_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Merge every epoch's HLL partials (max per (group, bucket)) and
    produce the estimate — identical to running the batch sketch over the
    union of all batches."""
    from chemharmony_spark.operators.sketches import hll64_estimate

    partials = _read_index_epochs(spark, index_dir, "HLL")
    merged = partials.groupBy("event_type", "bucket").agg(
        F.max("m").alias("m")
    )
    return hll64_estimate(merged, ["event_type"])


def stream_countmin_index(
    spark: SparkSession,
    events_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    item_col: str = "event_type",
    width: int = 1024,
    depth: int = 4,
    glob: str = "*.parquet",
    max_files_per_trigger: int = 1,
) -> None:
    """Incrementally maintained count-min sketch: each micro-batch folds
    its items into (row, bucket) counter partials and appends them under
    an epoch-keyed subdir — the foreachBatch exactly-once contract
    (idempotent per epoch, same as stream_hll_index). Count-min state
    MERGES BY SUM over disjoint batches, so the union of all epochs'
    partials re-aggregated with sum(c) is EXACTLY the batch sketch over
    all data ever seen — no read-modify-write of prior state, batches
    never contend, replay is safe. State is depth x width counters per
    epoch, independent of item cardinality (the point at 100 TB).

    Read estimates at any time with :func:`countmin_estimate_from_index`
    — parity with the batch sketch is asserted in
    tests/test_streaming.py."""
    from chemharmony_spark.operators.sketches import cm_bucket

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
    )

    def fold(batch_df, epoch_id):
        import os

        item = F.col(item_col)
        # ONE scan computes every hash row's bucket, then unpivots —
        # the per-row groupBy loop re-read the micro-batch depth times
        # (the pattern operators/sketches.countmin_counts fixed with a
        # persist; here the unpivot avoids even the cache)
        wide = batch_df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(r).alias("row"),
                        cm_bucket(item, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ])
            ).alias("e")
        )
        parts = (
            wide.select(F.col("e.row").alias("row"),
                        F.col("e.bucket").alias("bucket"))
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        parts.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"epoch={epoch_id}")
        )

    run_stream_foreach_batch(src, fold, checkpoint_dir, mode="update")


def countmin_estimate_from_index(
    spark: SparkSession,
    index_dir: str,
    items: DataFrame,
    item_col: str = "item",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Merge every epoch's count-min partials (SUM per (row, bucket)) and
    estimate each query item's count as the min over hash rows —
    identical to running the batch sketch over the union of all batches."""
    from chemharmony_spark.operators.sketches import cm_bucket

    merged = (
        _read_index_epochs(spark, index_dir, "count-min")
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    item = F.col(item_col)
    est = items.select(
        item.alias("item"),
        *[cm_bucket(item, r, width).alias(f"b{r}") for r in range(depth)],
    )
    for r in range(depth):
        sk = merged.where(F.col("row") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("c").alias(f"c{r}")
        )
        est = est.join(F.broadcast(sk), on=f"b{r}", how="left")
    counts = [
        F.coalesce(F.col(f"c{r}"), F.lit(0)) for r in range(depth)
    ]
    return est.select(
        "item", F.least(*counts).alias("cm_estimate")
    )


def stream_daily_index(
    spark: SparkSession,
    events_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
    max_files_per_trigger: int = 1,
) -> None:
    """Incrementally maintained DAILY sufficient statistics: each
    micro-batch folds its events into per-day (n, micro-floored value
    sum) partials and appends them under an epoch-keyed subdir — the
    same exactly-once contract as :func:`stream_hll_index`. Daily
    counts and integer sums MERGE BY SUM over disjoint batches, so the
    union of all epochs re-aggregated with sum() is EXACTLY the batch
    daily table over all data ever seen — which makes the index the
    state under ANY expanding-window monitor read off it
    (:func:`page_hinkley_from_index` here; q375 is the batch twin of
    the walk). State is one row per (epoch, day) — independent of
    event volume."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
    )

    def fold(batch_df, epoch_id):
        import os

        partial = (
            batch_df.select(
                F.to_date(F.col("ts").cast("timestamp")).alias("day"),
                F.floor(F.col("value") * 1_000_000)
                .cast("long")
                .alias("vmu"),
            )
            .groupBy("day")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("vmu").alias("s"),
            )
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"epoch={epoch_id}")
        )

    run_stream_foreach_batch(src, fold, checkpoint_dir, mode="update")


def _ph_walk(daily: DataFrame, lam_micro: int) -> DataFrame:
    """Page-Hinkley walk over a (day, x double) frame — q375's exact
    machinery (expanding prefix mean, micro-floored per-day terms,
    integer prefix sums) factored so the batch and index-readoff paths
    share one implementation."""
    from pyspark.sql.window import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        "x",
        F.sum("x").over(w).alias("cx"),
        F.count(F.lit(1)).over(w).alias("t"),
    )
    term = F.floor(
        (F.col("x") - F.col("cx") / F.col("t").cast("double"))
        * 1_000_000
    ).cast("long")
    mt = pre.select("day", term.alias("term")).withColumn(
        "m", F.sum("term").over(w)
    )
    gapped = mt.withColumn("gap", F.col("m") - F.min("m").over(w))
    return gapped.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.when(F.col("gap") > lam_micro, 1).otherwise(0)
        ).alias("n_alarms"),
        F.min(
            F.when(F.col("gap") > lam_micro, F.col("day"))
        ).alias("first_alarm_day"),
        F.max("gap").alias("max_gap_micro"),
    )


def page_hinkley_from_index(
    spark: SparkSession, index_dir: str, lam_micro: int = 500_000_000
) -> DataFrame:
    """Merge every epoch's daily partials (sum per day) and run the
    Page-Hinkley mean-shift walk over the merged series (x = daily
    total value) — identical to computing the monitor in batch over
    the union of all batches (parity asserted in
    tests/test_streaming.py). The walk itself is model-space: one row
    per distinct day, regardless of stream volume."""
    partials = _read_index_epochs(spark, index_dir, "daily Page-Hinkley")
    daily = (
        partials.groupBy("day")
        .agg(F.sum("s").alias("s"))
        .select(
            "day", (F.col("s").cast("double") / 1e6).alias("x")
        )
    )
    return _ph_walk(daily, lam_micro)


def batch_page_hinkley_daily(
    spark: SparkSession, events_dir: str, lam_micro: int = 500_000_000
) -> DataFrame:
    """Batch twin of the streamed monitor: the same daily series and
    walk computed directly over the full events table."""
    ev = spark.read.schema(EVENTS_SCHEMA).parquet(
        f"{events_dir}/events.parquet"
    )
    daily = (
        ev.select(
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            F.floor(F.col("value") * 1_000_000).cast("long").alias("vmu"),
        )
        .groupBy("day")
        .agg(F.sum("vmu").alias("s"))
        .select("day", (F.col("s").cast("double") / 1e6).alias("x"))
    )
    return _ph_walk(daily, lam_micro)
