"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the engine's escape hatch for stateful semantics the built-in
window/session operators can't express: an incrementally-maintained
per-user running profile (event count, value sum, distinct event types)
that survives across micro-batches via GroupState.

The batch twin is a plain groupBy aggregation; parity on a bounded replay
is asserted in tests/test_streaming.py. At scale state is partitioned by
the grouping key across executors and checkpointed by the state store —
exactly how a 1000-executor deployment holds billions of keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from chemharmony_spark.streaming.windows import EVENTS_SCHEMA

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("n_event_types", LongType(), True),
        StructField("event_types", StringType(), True),  # sorted csv
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("n_vals", LongType(), True),  # non-null values seen
        StructField("total_cents", LongType(), True),  # exact integer cents
        StructField("types_csv", StringType(), True),
    ]
)


def _fold_profile_pdf(pdf: pd.DataFrame, n: int, n_vals: int,
                      total_cents: int, types: set) -> tuple[int, int, int]:
    """One micro-batch pdf into the profile accumulators, with EXACTLY the
    batch twin's null/rounding semantics: n counts every row (count(*));
    values round HALF-UP away from zero like Spark F.round — pandas
    .round() is half-to-even and diverged on half-cent inputs; NULL
    values contribute nothing (F.sum skips them; n_vals tracks whether
    ANY value was seen so an all-null user reports total_value NULL like
    the batch sum); NULL event types are dropped (collect_set skips
    them — and None in the set crashed sorted())."""
    import numpy as np

    n += len(pdf)
    v = pdf["value"].dropna()
    n_vals += len(v)
    if len(v):
        s100 = v.to_numpy(dtype="float64") * 100.0
        total_cents += int(
            (np.sign(s100) * np.floor(np.abs(s100) + 0.5)).sum()
        )
    types.update(pdf["event_type"].dropna().unique().tolist())
    return n, n_vals, total_cents


def _update_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, n_vals, total_cents, types_csv = state.get
        types = set(types_csv.split(",")) if types_csv else set()
    else:
        n, n_vals, total_cents, types = 0, 0, 0, set()
    for pdf in pdfs:
        n, n_vals, total_cents = _fold_profile_pdf(
            pdf, n, n_vals, total_cents, types
        )
    types_csv = ",".join(sorted(types))
    state.update((n, n_vals, total_cents, types_csv))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total_cents / 100.0 if n_vals else None],
            "n_event_types": [len(types)],
            "event_types": [types_csv],
        }
    )


def stream_user_profiles(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming per-user profile maintenance (custom stateful operator)."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_dir)
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_profiles(spark: SparkSession, events_dir: str) -> DataFrame:
    """Batch twin: same profile via one declarative aggregation."""
    ev = spark.read.parquet(f"{events_dir}/events.parquet")
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("total_value"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
    )


# -------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API to
# applyInPandasWithState — typed state handles (ValueState/ListState/
# MapState), timers, and TTL support. Same per-user profile maintained
# through a StatefulProcessor so both stateful surfaces stay covered;
# parity vs the batch twin asserted in tests/test_streaming.py.
#
# Runtime requirements beyond applyInPandasWithState: the RocksDB state
# store provider (spark.sql.streaming.stateStore.providerClass) AND the
# python `protobuf` package (the TWS state server speaks protobuf to the
# JVM). HAVE_TWS gates on the latter so environments without it (like
# this container) keep a working applyInPandasWithState surface and skip
# the TWS test cleanly.
# -------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

try:  # pragma: no cover - protobuf not in the test container
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAVE_TWS = True
except ImportError:
    HAVE_TWS = False


class ProfileProcessor(StatefulProcessor):
    """Per-user running profile as a Spark-4 StatefulProcessor.

    State is one ValueState row (n, exact integer cents, sorted types csv)
    — the same layout the applyInPandasWithState twin keeps, so the two
    APIs are directly comparable. At scale the state store shards by
    user_id across executors exactly as before; what the new API adds is
    typed composite state, per-key timers, and TTL eviction."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        if self._state.exists():
            n, n_vals, total_cents, types_csv = self._state.get()
            types = set(types_csv.split(",")) if types_csv else set()
        else:
            n, n_vals, total_cents, types = 0, 0, 0, set()
        for pdf in rows:
            n, n_vals, total_cents = _fold_profile_pdf(
                pdf, n, n_vals, total_cents, types
            )
        types_csv = ",".join(sorted(types))
        self._state.update((n, n_vals, total_cents, types_csv))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total_cents / 100.0 if n_vals else None],
                "n_event_types": [len(types)],
                "event_types": [types_csv],
            }
        )

    def close(self) -> None:
        pass


def stream_user_profiles_tws(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming per-user profiles via transformWithStateInPandas."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_dir)
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# -------------------------------------------------------------------------
# Streaming CUSUM change-point detection — the stateful-streaming twin of
# queries.q139_cusum_alarms. The chart state (S, alarm count) lives in the
# state store keyed by user_id and folds FORWARD across micro-batches:
# batch N+1 resumes exactly where batch N's fold left off, so a bounded
# replay equals the batch fold bit-for-bit (Python floats are IEEE
# doubles — the same add/max sequence the Column fold runs JVM-side).
# Within a batch rows sort by (us, event_id); across batches correctness
# requires event-time-ordered arrival (the standard file/Kafka-partition
# contract; late data would need a watermark + buffer variant).
# -------------------------------------------------------------------------

CUSUM_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("n_alarms", LongType(), True),
        StructField("final_s_micro", LongType(), True),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s", DoubleType(), True),
        StructField("n_alarms", LongType(), True),
        StructField("cnt", LongType(), True),
    ]
)


def _update_cusum(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import math

    (user_id,) = key
    if state.exists:
        s, n_alarms, cnt = state.get
    else:
        s, n_alarms, cnt = 0.0, 0, 0
    frames = list(pdfs)
    pdf = pd.concat(frames).sort_values(["us", "event_id"])
    for v in pdf["value"].tolist():
        s = max(0.0, s + (v - 60.0))
        if s > 500.0:
            n_alarms += 1
            s = 0.0
    cnt += len(pdf)
    state.update((s, n_alarms, cnt))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [cnt],
            "n_alarms": [n_alarms],
            "final_s_micro": [math.floor(s * 1_000_000)],
        }
    )


def stream_cusum(
    spark: SparkSession,
    events_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming per-user CUSUM chart (see queries.q139_cusum_alarms for
    the batch twin and the chart constants)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    src = reader.parquet(events_dir).select(
        "user_id",
        # schema reads ts as TIMESTAMP_NTZ; session tz is UTC so the cast
        # is a pure re-tag (same convention as queries._events)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id", "value",
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _update_cusum,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


THROTTLE_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("n_raw", LongType(), True),
        StructField("n_kept", LongType(), True),
    ]
)

THROTTLE_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType(), True),
        StructField("kept", LongType(), True),
        StructField("raw", LongType(), True),
    ]
)


def _update_throttle(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    if state.exists:
        last, kept, raw = state.get
    else:
        last, kept, raw = -(10 ** 18), 0, 0
    pdf = pd.concat(list(pdfs)).sort_values("us")
    for us in pdf["us"].tolist():
        if us - last >= 300_000_000:
            kept += 1
            last = us
    raw += len(pdf)
    state.update((last, kept, raw))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_type": [event_type],
            "n_raw": [raw],
            "n_kept": [kept],
        }
    )


def stream_throttle(
    spark: SparkSession,
    events_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming throttle dedup: keep an event only if >= 300 s have
    passed since the LAST KEPT event of the same (user, type) — the
    stateful twin of queries.q190_throttle_dedup's batch fold, carrying
    (last_kept_us, kept, raw) across micro-batches. The semantics need
    the previous KEPT time (not just the previous event), which rules
    out dropDuplicatesWithinWatermark's fixed-bucket behavior — the
    applyInPandasWithState escape hatch exists for exactly this."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    src = reader.parquet(events_dir).select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return src.groupBy("user_id", "event_type").applyInPandasWithState(
        _update_throttle,
        outputStructType=THROTTLE_OUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
