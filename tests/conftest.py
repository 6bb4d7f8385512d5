from __future__ import annotations

import json

import pytest

from chemharmony_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="chemharmony-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def staging_fixture(spark, tmp_path_factory):
    """FIXTURES.md F1: three synthetic sources with dup / cross-source-collapse
    / canonicalization cases baked in."""
    root = tmp_path_factory.mktemp("staging")
    shared = {"name": "aspirin", "casrn": "50-78-2"}  # identical across srcA/srcB

    def j(d):
        return json.dumps(d)

    per_source = {
        "srcA": {
            "substances": [
                ("a-s1", j(shared)),
                ("a-s1", j(shared)),  # exact dup row -> distinct
                ("a-s2", j({"name": "caffeine", "weight": 194.19012345})),  # rounding
            ],
            "properties": [
                ("a-p1", j({"assay": "LD50", "units": "mg/kg", "note": ""})),  # drop ""
                ("a-p2", j({"endpoint": "BBB", "assay": "perm"})),  # unsorted keys
            ],
            "activities": [
                ("a-a1", "a-s1", "a-p1", "InChI=1S/C9H8O4", "positive"),
                ("a-a2", "a-s2", "a-p1", "InChI=1S/C8H10N4O2", "negative"),
                ("a-a3", "a-s1", "a-p2", "InChI=1S/C9H8O4", "active"),  # -> binary 0
            ],
        },
        "srcB": {
            "substances": [("b-s9", j(shared))],  # same canonical data as a-s1
            "properties": [("b-p1", j({"assay": "perm", "endpoint": "BBB"}))],
            "activities": [
                ("b-a1", "b-s9", "b-p1", "InChI=1S/C9H8O4", "positive"),
                ("b-a1", "b-s9", "b-p1", "badinchi", "positive"),  # invalid inchi
            ],
        },
        "srcC": {
            "substances": [("c-s1", j({"name": "unique", "x": None}))],  # drop null
            "properties": [("c-p1", j({"assay": "tox21", "w": 1.000049999}))],
            "activities": [("c-a1", "c-s1", "c-p1", "InChI=1S/Xq", "negative")],
        },
    }
    import pyarrow as pa
    import pyarrow.parquet as pq

    for src, tables in per_source.items():
        d = root / src
        d.mkdir()
        subs = tables["substances"]
        pq.write_table(
            pa.table({"sid": [r[0] for r in subs], "data": [r[1] for r in subs]}),
            d / "substances.parquet",
        )
        props = tables["properties"]
        pq.write_table(
            pa.table({"pid": [r[0] for r in props], "data": [r[1] for r in props]}),
            d / "properties.parquet",
        )
        acts = tables["activities"]
        pq.write_table(
            pa.table(
                {
                    "aid": [r[0] for r in acts],
                    "sid": [r[1] for r in acts],
                    "pid": [r[2] for r in acts],
                    "inchi": [r[3] for r in acts],
                    "value": [r[4] for r in acts],
                }
            ),
            d / "activities.parquet",
        )
    return str(root)
