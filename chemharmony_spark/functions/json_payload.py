"""JSON payload construction, canonicalization, and access.

The ``data`` column is a schemaless JSON string inside a fixed envelope
(SURVEY.md §1.3). Canonicalization — sorted keys, 4-decimal float rounding,
dropping null/''/[] values — makes the string a stable identity for
content-addressed ids (reference: helper/udf.py:18-37, used at
80_harmonize.py:39-40,54-55).

The canonicalizer is the one genuinely non-built-in scalar function in the
whole engine (``to_json`` alone doesn't round or drop empties), so it is a
vectorized pandas_udf (Arrow batches) rather than the reference's
row-at-a-time ``F.udf`` (helper/udf.py:37) — ~10-100x less Python overhead.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _canonicalize(value):
    """Recursively sort keys, round floats to 4dp, drop null/''/[]/{} values.

    Mirrors the *semantics* of reference helper/udf.py:18-37 (clean-then-sort
    recursive walk) without copying its implementation.
    """
    if isinstance(value, dict):
        out = {}
        for k in sorted(value):
            v = _canonicalize(value[k])
            if v is None or v == "" or v == [] or v == {}:
                continue
            out[k] = v
        return out
    if isinstance(value, list):
        return [_canonicalize(v) for v in value if v is not None]
    if isinstance(value, float):
        return round(value, 4)
    return value


def canonicalize_json_str(s: str | None) -> str | None:
    if s is None:
        return None
    try:
        parsed = json.loads(s)
    except (ValueError, TypeError):
        return s
    return json.dumps(_canonicalize(parsed), sort_keys=True, separators=(",", ":"))


@pandas_udf(StringType())
def canonicalize_json_udf(s: pd.Series) -> pd.Series:
    return s.map(canonicalize_json_str, na_action="ignore")


def to_data_payload(*cols: Column | str) -> Column:
    """Build the JSON ``data`` payload from columns: ``to_json(struct(...))``.

    reference: 09_integrate_pubchem.py:34,44; 13_integrate_BBBP.py:38-40.
    Field order = argument order; pass columns sorted by name if the result
    feeds :func:`~chemharmony_spark.functions.ids.content_id`.
    """
    return F.to_json(F.struct(*[F.col(c) if isinstance(c, str) else c for c in cols]))


def json_get(data: Column | str, key: str) -> Column:
    """Extract a top-level key from the JSON payload as a string.

    In-engine replacement for the reference's driver-side ``json.loads``
    loops (91_property_categories.py:30, 92_llm_property_titles.py:45).
    """
    col = F.col(data) if isinstance(data, str) else data
    return F.get_json_object(col, f"$.{key}")
