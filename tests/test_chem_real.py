"""RDKit-real-path dry run: the chemistry UDFs' real branches
(functions/chem.py) only execute where RDKit is importable — these tests
exercise them there so installing the dependency can't silently break
harmonize, and skip cleanly in RDKit-less containers (like this one).

Reference parity target: helper/udf.py:7-16 (inchi2smi) and :39-47
(smiles_to_inchi) — null on parse failure, canonical round-trip otherwise.
"""

from __future__ import annotations

import pytest

from chemharmony_spark.functions.chem import (
    HAVE_RDKIT,
    inchi_to_smiles,
    smiles_to_inchi,
    with_derived_column_deduped,
)

pytestmark = pytest.mark.skipif(
    not HAVE_RDKIT, reason="rdkit not installed in this container"
)

# pragma: no cover - everything below needs RDKit
ETHANOL_INCHI = "InChI=1S/C2H6O/c1-2-3/h3H,1-2H3"


def test_inchi_smiles_round_trip(spark):
    df = spark.createDataFrame(
        [(ETHANOL_INCHI,), ("not-an-inchi",), (None,)], "inchi string"
    )
    out = {
        r["inchi"]: r["smiles"]
        for r in df.withColumn("smiles", inchi_to_smiles("inchi")).collect()
    }
    assert out[ETHANOL_INCHI] == "CCO"  # RDKit canonical form
    assert out["not-an-inchi"] is None  # null-on-failure contract
    assert out[None] is None

    back = (
        spark.createDataFrame([("CCO",)], "smiles string")
        .withColumn("inchi", smiles_to_inchi("smiles"))
        .collect()[0]["inchi"]
    )
    assert back == ETHANOL_INCHI


def test_dedup_before_udf_with_real_rdkit(spark):
    facts = spark.createDataFrame(
        [(i, ETHANOL_INCHI) for i in range(10)], "aid long, inchi string"
    )
    out = with_derived_column_deduped(
        facts, "inchi", "smiles", inchi_to_smiles("inchi")
    )
    rows = out.collect()
    assert len(rows) == 10 and all(r["smiles"] == "CCO" for r in rows)
