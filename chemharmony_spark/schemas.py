"""The harmonized three-table envelope + enrichment tables.

Fixed-envelope / dynamic-payload schema system (SURVEY.md §1.3): the envelope
is a hard StructType contract (reference: 80_harmonize.py:96-105 asserts it);
the ``data`` column stays a JSON *string* so arbitrary per-source metadata
survives harmonization and the string itself is the content-addressed
identity (reference: 80_harmonize.py:39-40,54-55).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# reference: README.md:7-10, 80_harmonize.py:92-93
SUBSTANCES_SCHEMA = StructType(
    [
        StructField("sid", StringType(), False),
        StructField("source", StringType(), True),
        StructField("data", StringType(), True),
    ]
)

# reference: README.md:12-15, 80_harmonize.py:89-90
PROPERTIES_SCHEMA = StructType(
    [
        StructField("pid", StringType(), False),
        StructField("source", StringType(), True),
        StructField("data", StringType(), True),
    ]
)

# reference: README.md:17-25, 80_harmonize.py:68-69,81-84
ACTIVITIES_SCHEMA = StructType(
    [
        StructField("aid", StringType(), False),
        StructField("sid", StringType(), False),
        StructField("pid", StringType(), False),
        StructField("source", StringType(), True),
        StructField("inchi", StringType(), True),
        StructField("smiles", StringType(), True),
        StructField("value", StringType(), True),
        StructField("binary_value", IntegerType(), True),
        StructField("numvalue", DoubleType(), True),  # README.md:24
    ]
)

# reference: 91_property_categories.py:35,54-58
PROPERTY_CATEGORIES_SCHEMA = StructType(
    [
        StructField("pid", StringType(), False),
        StructField("category", StringType(), True),
        StructField("reason", StringType(), True),
        StructField("strength", DoubleType(), True),
    ]
)

# reference: 92_llm_property_titles.py:49,71
PROPERTY_TITLES_SCHEMA = StructType(
    [
        StructField("pid", StringType(), False),
        StructField("title", StringType(), True),
        StructField("prop_json_data", StringType(), True),
    ]
)

# staging contract (SURVEY.md §1.2; reference: dvc.yaml:4-104)
STAGING_SUBSTANCES_SCHEMA = StructType(
    [StructField("sid", StringType(), False), StructField("data", StringType(), True)]
)
STAGING_PROPERTIES_SCHEMA = StructType(
    [StructField("pid", StringType(), False), StructField("data", StringType(), True)]
)
STAGING_ACTIVITIES_SCHEMA = StructType(
    [
        StructField("aid", StringType(), True),
        StructField("sid", StringType(), False),
        StructField("pid", StringType(), False),
        StructField("inchi", StringType(), True),
        StructField("value", StringType(), True),
        StructField("smiles", StringType(), True),
        StructField("metric", StringType(), True),
        StructField("numvalue", DoubleType(), True),
    ]
)

VALID_ACTIVITY_VALUES = ("positive", "negative")
