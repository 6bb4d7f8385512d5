"""Session-factory contract tests.

The engine's integer-overflow discipline (BIGINT contract-edge casts,
queries.py D38 notes) requires ANSI arithmetic: overflow must raise, never
silently NULL. Spark 4 defaults ANSI on, but the factory must pin it so a
Spark 3.x / conf-overridden deployment keeps the same loud-failure contract
(analogue: reference 80_harmonize.py:96-105 row-count asserts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_session_pins_ansi_mode(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_session_pins_adaptive_execution(spark):
    # AQE is the engine's scale story (runtime coalesce + skew split);
    # regressing it silently would invalidate every SCALE.md claim.
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_bigint_overflow_errors_loudly(spark):
    df = spark.range(1).select(
        (F.lit(9223372036854775807).cast("bigint") + F.lit(1)).alias("x")
    )
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        df.collect()
