"""Size-gated broadcast hints (100 TB posture; VERDICT r4 task 1).

``F.broadcast`` FORCES a broadcast regardless of runtime size — on a frame
whose cardinality grows with the data (harmonize's re-key maps are >1e6 rows
at reference production scale, 80_harmonize.py:96, multi-GB at 100×) that is
an executor OOM / broadcast-timeout, not a hint. :func:`size_gated_broadcast`
attaches the hint only when Catalyst's own cost estimate for the frame's
optimized logical plan is under the session's
``spark.sql.autoBroadcastJoinThreshold``; otherwise the frame is returned
unhinted and AQE picks the join strategy at runtime from *actual* shuffle
statistics (which still broadcasts genuinely-small maps — nothing is lost on
the small side, only the forced-OOM path on the large side is closed).

The estimate is driver-side plan analysis only — no Spark job runs.
Unknown statistics surface as Catalyst's defaultSizeInBytes (huge), which
correctly fails the gate and defers to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_UNITS = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
          "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40}


def parse_byte_conf(raw: str) -> int:
    """Parse a Spark byte-size conf value ('10485760', '10MB', '-1')."""
    s = str(raw).strip().lower()
    for suffix in sorted(_UNITS, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _UNITS[suffix])
    return int(s)


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (-1 = disabled)."""
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    return parse_byte_conf(raw)


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for ``df``'s optimized plan.

    Driver-side only (plan analysis, no job). Relations without statistics
    report ``spark.sql.defaultSizeInBytes`` (Long.MaxValue by default), so
    an unknown size reads as 'too big to force'."""
    size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    # py4j maps scala.math.BigInt to int when it fits; larger values come
    # back as a JavaObject needing an explicit string round-trip
    return size if isinstance(size, int) else int(size.toString())


def size_gated_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Return ``F.broadcast(df)`` only if the plan-estimated size clears the
    gate; else ``df`` unhinted (AQE decides from runtime statistics).

    ``max_bytes``: override the gate; default = the session's
    autoBroadcastJoinThreshold. A non-positive gate never hints."""
    if max_bytes is None:
        max_bytes = broadcast_threshold_bytes(df.sparkSession)
    if max_bytes > 0 and plan_size_bytes(df) <= max_bytes:
        return F.broadcast(df)
    return df
