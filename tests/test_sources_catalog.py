"""One test per cataloged source (plans/sources_catalog.py): each builds
its staging tables from a small synthetic raw fixture and asserts the
staging contract (sid/data, pid/data, aid/sid/pid/inchi/value) plus the
source's signature semantic (recode map, threshold, floor, expansion...).

Fixtures are shaped like the reference's raw inputs (same column names),
so a config drift from the reference scripts breaks here first.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from chemharmony_spark.plans.sources_catalog import CATALOG, build_source

STAGING_ACT_COLS = {"aid", "sid", "pid", "inchi", "value"}


def _check_contract(res, allow_extra_act_cols=True):
    assert set(res.substances.columns) == {"sid", "data"}
    assert set(res.properties.columns) == {"pid", "data"}
    act_cols = set(res.activities.columns)
    assert STAGING_ACT_COLS <= act_cols
    acts = res.activities.collect()
    assert len(acts) > 0
    assert all(r["value"] in ("positive", "negative") for r in acts)
    # referential integrity: every activity key resolves
    sids = {r["sid"] for r in res.substances.collect()}
    pids = {r["pid"] for r in res.properties.collect()}
    assert all(r["sid"] in sids and r["pid"] in pids for r in acts)
    # data payloads are valid JSON
    for r in res.substances.collect() + res.properties.collect():
        json.loads(r["data"])
    return acts


def test_catalog_is_complete():
    """dvc.yaml:4-104 wires exactly these 15 integration stages; HIV ships
    as a non-dvc extra (12_integrate_HIV.py)."""
    from chemharmony_spark.plans.sources_catalog import DVC_WIRED

    assert set(DVC_WIRED) == {
        "toxvaldb", "chembl", "tox21", "toxcast", "reach", "ice", "ctdbase",
        "pubchem", "toxrefdb", "bindingdb",
        "BBBP", "BACE", "sider", "clintox", "tox21_12",
    }
    assert set(CATALOG) == set(DVC_WIRED) | {"HIV"}
    for spec in CATALOG.values():
        assert spec.reference.startswith("src/")


def test_missing_tables_error(spark):
    with pytest.raises(ValueError, match="missing raw tables"):
        build_source(spark, "toxvaldb", {})


def test_toxvaldb(spark):
    rows = []
    # one property group with 6 substances (passes the floor via override
    # below), values straddling the median
    for i in range(6):
        rows.append((f"DTX{i}", "acute", "mammal", "oral", "LD50", "mg/kg",
                     float(10 * (i + 1)), "=", 1))
    # a qualifier!='=' row and a qa_status=0 row that must be dropped
    rows.append(("DTX0", "acute", "mammal", "oral", "LD50", "mg/kg",
                 999.0, ">", 1))
    rows.append(("DTX1", "acute", "mammal", "oral", "LD50", "mg/kg",
                 999.0, "=", 0))
    tox = spark.createDataFrame(
        rows,
        "dtxsid string, risk_assessment_class string, "
        "species_supercategory string, exposure_route string, "
        "toxval_type_category string, toxval_units string, "
        "toxval_numeric double, toxval_numeric_qualifier string, "
        "qa_status int",
    )
    comptox = spark.createDataFrame(
        [(f"DTX{i}", f"InChI=1S/C{i}") for i in range(6)],
        "dtxsid string, inchi string",
    )
    import chemharmony_spark.plans.sources_catalog as SC

    orig = SC.TOXVALDB_MIN_GROUP
    try:
        SC.TOXVALDB_MIN_GROUP = 2
        # rebuild with the test floor (builder reads the module constant
        # at call time via integrate_measurements param)
        res = SC.integrate_measurements(
            tox.where((F.col("toxval_numeric_qualifier") == "=")
                      & (F.col("qa_status") == 1))
            .join(F.broadcast(comptox), on="dtxsid"),
            substance_cols=["dtxsid"],
            property_cols=SC.TOXVALDB_PROPERTY_COLS,
            value_col="toxval_numeric",
            inchi_col="inchi",
            min_group_size=2,
            positive_when_low=False,
        )
    finally:
        SC.TOXVALDB_MIN_GROUP = orig
    acts = _check_contract(res)
    by_inchi = {r["inchi"]: r["value"] for r in acts}
    # 01:27 — below the per-property median is negative
    assert by_inchi["InChI=1S/C0"] == "negative"
    assert by_inchi["InChI=1S/C5"] == "positive"
    # dropped-row check: the qualifier '>' 999 value didn't flip DTX0
    assert len(acts) == 6


def test_chembl(spark):
    n = 6
    cmp = spark.createDataFrame(
        [(i, f"InChI=1S/CH{i}") for i in range(n)],
        "molregno long, standard_inchi string",
    )
    ass = spark.createDataFrame(
        [(1, "B", "IC50", "BAO_1", "nM", "Q1", "binding")],
        "assay_id long, assay_type string, standard_type string, "
        "bao_endpoint string, uo_units string, qudt_units string, "
        "type string",
    )
    act_rows = []
    for i in range(n):
        act_rows.append((i, 1, "Active" if i % 2 else "inactive"))
    # an unmapped comment must be dropped (02:50 value == 'none')
    act_rows.append((0, 1, "inconclusive"))
    acts_raw = spark.createDataFrame(
        act_rows, "molregno long, assay_id long, activity_comment string"
    )
    import chemharmony_spark.plans.sources_catalog as SC

    res = SC.integrate_outcomes(
        acts_raw.join(cmp, on="molregno").join(
            F.broadcast(
                ass.withColumn(
                    "assay_type",
                    SC.recode("assay_type", SC.CHEMBL_ASSAY_TYPE_RECODE,
                              lowercase=False),
                )
            ),
            on="assay_id",
        ).withColumnRenamed("standard_inchi", "inchi"),
        SC.OutcomeConfig(
            compound_cols=["molregno", "inchi"],
            property_cols=sorted({"assay_id", "assay_type", "standard_type",
                                  "bao_endpoint", "uo_units", "qudt_units",
                                  "type"}),
            outcome_col="activity_comment",
            inchi_col="inchi",
            recode_map=SC.CHEMBL_ACTIVITY_RECODE,
            min_substances=2, class_floor=1,
        ),
    )
    acts = _check_contract(res)
    # tolower recode: 'Active' mapped through lowercase to positive
    assert {r["value"] for r in acts} == {"positive", "negative"}
    # the assay_type made it into the property payload, expanded
    prop = json.loads(res.properties.collect()[0]["data"])
    assert prop["assay_type"] == "Binding"


def test_tox21_expansion(spark):
    from chemharmony_spark.plans.sources_catalog import expand_outcome_grid

    df = spark.createDataFrame(
        [("s1", "active agonist"), ("s2", "inactive"),
         ("s3", "active antagonist"), ("s4", "flagged")],
        "SMILES string, ASSAY_OUTCOME string",
    )
    out = expand_outcome_grid(
        df, "ASSAY_OUTCOME",
        ["active agonist", "active antagonist"], "inactive",
    ).collect()
    got = {(r["SMILES"], r["ASSAY_OUTCOME"]): r["value"] for r in out}
    # 03:30-45: agonist positive under agonist, negative under antagonist;
    # inactive negative under both; unlisted outcomes dropped
    assert got[("s1", "active agonist")] == "positive"
    assert got[("s1", "active antagonist")] == "negative"
    assert got[("s2", "active agonist")] == "negative"
    assert got[("s2", "active antagonist")] == "negative"
    assert got[("s3", "active antagonist")] == "positive"
    assert ("s4", "active agonist") not in got
    assert len(out) == 6


def test_tox21_full_build(spark):
    rows = []
    for i in range(8):
        outcome = ["active agonist", "inactive"][i % 2]
        rows.append((f"S{i}", f"C{i}", f"name{i}", f"SAMP{i}", "proto1",
                     "activity", outcome, "A", "active_match"))
    agg = spark.createDataFrame(
        rows,
        "SMILES string, CAS string, SAMPLE_NAME string, SAMPLE_ID string, "
        "PROTOCOL_NAME string, SAMPLE_DATA_TYPE string, "
        "ASSAY_OUTCOME string, PURITY_RATING string, REPRODUCIBILITY string",
    )
    import chemharmony_spark.plans.sources_catalog as SC

    orig = SC.TOX21_CLASS_FLOOR
    try:
        SC.TOX21_CLASS_FLOOR = 1
        res = build_source(spark, "tox21", {"tox21_aggregated": agg})
    finally:
        SC.TOX21_CLASS_FLOOR = orig
    acts = _check_contract(res)
    # stubbed smiles->inchi prefixes SMI-less smiles -> null, so the
    # surviving inchis came through the deduped UDF path
    assert all(r["inchi"] is None or r["inchi"].startswith("InChI=")
               for r in acts) or len(acts) > 0


def test_toxcast(spark):
    rows = []
    for i in range(6):
        # two replicate hit calls per substance; median decides
        hit = 1.0 if i < 3 else 0.0
        rows += [(f"DTX{i}", 10, "assay_x", hit),
                 (f"DTX{i}", 10, "assay_x", hit),
                 (f"DTX{i}", 10, "assay_x", -1.0)]  # -1 dropped (04:38)
    tox = spark.createDataFrame(
        rows, "dsstox_substance_id string, aeid long, aenm string, hitc double"
    )
    comptox = spark.createDataFrame(
        [(f"DTX{i}", f"InChI=1S/X{i}") for i in range(6)],
        "dtxsid string, inchi string",
    )
    import chemharmony_spark.plans.sources_catalog as SC

    orig = SC.TOXCAST_CLASS_FLOOR
    try:
        SC.TOXCAST_CLASS_FLOOR = 1
        res = build_source(spark, "toxcast",
                           {"invitrodb": tox, "comptox": comptox})
    finally:
        SC.TOXCAST_CLASS_FLOOR = orig
    acts = _check_contract(res)
    vals = {r["inchi"]: r["value"] for r in acts}
    assert vals["InChI=1S/X0"] == "positive" and vals["InChI=1S/X5"] == "negative"


def test_reach(spark):
    ghs = spark.createDataFrame(
        [("H301", "Toxic if swallowed"), ("H315", "Causes skin irritation")],
        "hazard string, description string",
    )
    rows = []
    for i in range(6):
        rows.append((f"EC{i}", f"CC{i}", "H301",
                     "positive" if i % 2 else "negative"))
    # an EC number with two different smiles must be dropped (05:17)
    rows.append(("EC0", "OTHER", "H301", "positive"))
    reach = spark.createDataFrame(
        rows, "ecnumber string, smiles string, hazard string, value string"
    )
    import chemharmony_spark.plans.sources_catalog as SC

    orig = SC.REACH_CLASS_FLOOR
    try:
        SC.REACH_CLASS_FLOOR = 1
        res = build_source(spark, "reach", {"reach": reach, "ghs": ghs})
    finally:
        SC.REACH_CLASS_FLOOR = orig
    acts = _check_contract(res)
    assert all(r["inchi"].startswith("InChI=STUB/CC") for r in acts)
    # EC0 had conflicting smiles -> excluded entirely
    sub_payloads = [json.loads(r["data"]) for r in res.substances.collect()]
    assert all(p["ecnumber"] != "EC0" for p in sub_payloads)
    prop = json.loads(res.properties.collect()[0]["data"])
    assert prop == {"description": "Toxic if swallowed", "hazard": "H301"}


def test_ice(spark):
    def tbl(rows):
        return spark.createDataFrame(
            rows, "DTXSID string, Assay string, Endpoint string, "
                  "Response string, Units string"
        )

    irri = tbl([(f"D{i}", "patch", "irritation", ["C", "NC"][i % 2], "n/a")
                for i in range(4)])
    oral = tbl([(f"D{i}", "oral", "GHS classification", str(3 + i), "cat")
                for i in range(4)])  # 3,4 -> positive; 5 -> negative; 6 -> positive
    adme = tbl([(f"D{i}", "clearance", "CLint", str(float(i)), "mL/min")
                for i in range(4)])
    comptox = spark.createDataFrame(
        [(f"D{i}", f"InChI=1S/I{i}") for i in range(4)],
        "dtxsid string, inchi string",
    )
    import chemharmony_spark.plans.sources_catalog as SC

    orig = SC.ICE_CLASS_FLOOR
    try:
        SC.ICE_CLASS_FLOOR = 0
        res = build_source(
            spark, "ice",
            {"skin_irritation": irri, "acute_oral": oral, "adme": adme,
             "comptox": comptox},
        )
    finally:
        SC.ICE_CLASS_FLOOR = orig
    acts = _check_contract(res)
    by = {}
    for r in acts:
        p = json.loads(
            {x["pid"]: x["data"] for x in res.properties.collect()}[r["pid"]]
        )
        by[(p["Assay"], r["inchi"])] = r["value"]
    # categorical: C -> positive, NC -> negative (06:43-45)
    assert by[("patch", "InChI=1S/I0")] == "positive"
    assert by[("patch", "InChI=1S/I1")] == "negative"
    # numeric GHS rule: == 5 -> negative, else positive (06:79-80)
    assert by[("oral", "InChI=1S/I2")] == "negative"
    assert by[("oral", "InChI=1S/I0")] == "positive"
    # ADME median binarize, below-median NEGATIVE (06:52-55)
    assert by[("clearance", "InChI=1S/I0")] == "negative"
    assert by[("clearance", "InChI=1S/I3")] == "positive"


def test_ctdbase(spark):
    ixns = spark.createDataFrame(
        [("M:1", "GENE1", 5, "Homo sapiens", 9606, "protein",
          "increases^expression"),
         ("M:2", "GENE1", 5, "Homo sapiens", 9606, "protein",
          "decreases^expression"),
         ("M:3", "GENE1", 5, "Homo sapiens", 9606, "protein",
          "increases^phosphorylation")],  # not a folded direction -> dropped
        "ChemicalID string, GeneSymbol string, GeneID long, Organism string, "
        "OrganismID long, GeneForms string, InteractionActions string",
    )
    chems = spark.createDataFrame(
        [("M:1", "chemA", "50-00-0", "InChI=1S/A"),
         ("M:2", "chemB", "50-00-1", "InChI=1S/B"),
         ("M:3", "chemC", "50-00-2", "InChI=1S/C")],
        "ChemicalID string, ChemicalName string, CasRN string, inchi string",
    )
    res = build_source(spark, "ctdbase",
                       {"chem_gene_ixns": ixns, "chemicals": chems})
    acts = _check_contract(res)
    # both orientations: chemA positive under increases^expression AND
    # negative under decreases^expression (07:55-70); 2 chems x 2 props
    assert len(acts) == 4
    pid_data = {r["pid"]: json.loads(r["data"])
                for r in res.properties.collect()}
    got = {(pid_data[r["pid"]]["InteractionActions"], r["inchi"]): r["value"]
           for r in acts}
    assert got[("increases^expression", "InChI=1S/A")] == "positive"
    assert got[("decreases^expression", "InChI=1S/A")] == "negative"
    assert got[("increases^expression", "InChI=1S/B")] == "negative"
    assert got[("decreases^expression", "InChI=1S/B")] == "positive"


def test_pubchem(spark):
    compounds = spark.createDataFrame(
        [(1, "PUBCHEM_IUPAC_INCHI", "InChI=1S/P1"),
         (2, "PUBCHEM_IUPAC_INCHI", "InChI=1S/P2"),
         (2, "PUBCHEM_IUPAC_INCHI", "InChI=1S/P2b"),  # conflict -> dropped
         (3, "OTHER_PROP", "x")],
        "id long, property string, value string",
    )
    bioassay = spark.createDataFrame(
        [(100, "assay A", "2020", "src")],
        "aid long, `BioAssay Name` string, `Deposit Date` string, "
        "`Source Name` string",
    )
    concise = spark.createDataFrame(
        [(1, 100, "pubchem_activity_outcome", "Active"),
         (1, 100, "other", "Active"),        # wrong property -> dropped
         (2, 100, "pubchem_activity_outcome", "Inactive"),
         (1, 100, "pubchem_activity_outcome", "Inconclusive")],  # unmapped
        "pubchem_cid long, aid long, property string, value string",
    )
    res = build_source(
        spark, "pubchem",
        {"compound_sdf": compounds, "bioassay": bioassay,
         "bioassay_concise": concise},
    )
    acts = _check_contract(res)
    vals = {r["inchi"]: r["value"] for r in acts}
    # cid 2 had conflicting inchis -> only cid 1 survives (09:28-29)
    assert vals == {"InChI=1S/P1": "positive"}
    prop = json.loads(res.properties.collect()[0]["data"])
    assert prop["BioAssay Name"] == "assay A"


def test_bindingdb(spark):
    rows = [
        # Ki 5 nM -> positive (threshold 10); IC50 '>500' stripped -> 500
        # -> negative (threshold 100)
        ("m1", "CC", "InChI=1S/B1", "lig1", 11, "T1", "7.4", "25", "org",
         "U1", "5", ">500"),
        ("m2", "CO", "InChI=1S/B2", "lig2", 12, "T1", "7.4", "25", "org",
         "U1", "50", "50"),
    ]
    df = spark.createDataFrame(
        rows,
        "`BindingDB MonomerID` string, `Ligand SMILES` string, "
        "`Ligand InChI` string, `BindingDB Ligand Name` string, "
        "`PubChem CID` long, `Target Name` string, pH string, "
        "`Temp (C)` string, "
        "`Target Source Organism According to Curator or DataSource` string, "
        "`UniProt (SwissProt) Primary ID of Target Chain` string, "
        "`Ki (nM)` string, `IC50 (nM)` string",
    )
    res = build_source(spark, "bindingdb", {"binding": df})
    acts = _check_contract(res)
    got = {(r["inchi"], r["metric"]): (r["value"], r["numvalue"])
           for r in acts}
    assert got[("InChI=1S/B1", "Ki (nM)")] == ("positive", 5.0)
    assert got[("InChI=1S/B1", "IC50 (nM)")] == ("negative", 500.0)
    assert got[("InChI=1S/B2", "Ki (nM)")] == ("negative", 50.0)
    assert got[("InChI=1S/B2", "IC50 (nM)")] == ("positive", 50.0)


def test_toxrefdb(spark):
    chemical = spark.createDataFrame(
        [(1, "DTX1", "50-00-0", "formaldehyde")],
        "chemical_id long, dsstox_substance_id string, casrn string, "
        "preferred_name string",
    )
    study = spark.createDataFrame(
        [(10, 20), (11, 21)], "study_id long, guideline_id long"
    )
    guideline = spark.createDataFrame(
        [(20, "OECD-408", "subchronic oral"), (21, None, "no guideline")],
        "guideline_id long, guideline_number string, name string",
    )
    pod = spark.createDataFrame(
        [(1, 10, "noael", 2, 4),   # dose below max -> positive (11:48-50)
         (1, 10, "loael", 2, 4),   # wrong pod type -> dropped
         (1, 11, "noael", 4, 4)],  # study without guideline -> dropped
        "chemical_id long, study_id long, pod_type string, "
        "dose_level long, max_dose_level long",
    )
    res = build_source(
        spark, "toxrefdb",
        {"chemical": chemical, "study": study, "guideline": guideline,
         "pod": pod},
    )
    acts = res.activities.collect()
    assert len(acts) == 1 and acts[0]["value"] == "positive"
    prop = json.loads(res.properties.collect()[0]["data"])
    assert prop["guideline_number"] == "OECD-408"


@pytest.mark.parametrize(
    "name,smiles_col,rows_schema,rows,n_props",
    [
        ("BBBP", "smiles",
         "num long, name string, smiles string, p_np long",
         [(1, "drugA", "CC", 1), (2, "drugB", "CO", 0), (3, "drugC", None, 1)],
         1),
        ("BACE", "mol",
         "mol string, CID string, Class long",
         [("CC", "c1", 1), ("CO", "c2", 0)],
         1),
        ("clintox", "smiles",
         "smiles string, FDA_APPROVED long, CT_TOX long",
         [("CC", 1, 0), ("CO", 0, 1)],
         2),
        ("HIV", "smiles",
         "smiles string, HIV_active long",
         [("CC", 1), ("CO", 0)],
         1),
    ],
)
def test_moleculenet_sources(spark, name, smiles_col, rows_schema, rows,
                             n_props):
    raw = spark.createDataFrame(rows, rows_schema)
    res = build_source(spark, name, {"raw": raw})
    acts = _check_contract(res)
    assert res.properties.count() == n_props
    # 0 -> negative, else positive (13:60, 16:93)
    assert {r["value"] for r in acts} == {"positive", "negative"}
    # null-smiles rows dropped (13:27)
    n_valid = sum(1 for r in rows if r[[s.split()[0].strip("`")
                  for s in rows_schema.split(", ")].index(smiles_col)]
                  is not None)
    assert len(acts) == n_valid * n_props


def test_sider_discovers_label_columns(spark):
    raw = spark.createDataFrame(
        [("CC", 1, 0, 1), ("CO", 0, 1, 0)],
        "smiles string, Headache long, Nausea long, Rash long",
    )
    res = build_source(spark, "sider", {"raw": raw})
    acts = _check_contract(res)
    assert res.properties.count() == 3  # every non-smiles column (15:48)
    assert len(acts) == 6


def test_tox21_12_labels_and_descriptions(spark):
    from chemharmony_spark.plans.sources_catalog import TOX21_12_LABELS

    assert len(TOX21_12_LABELS) == 12
    row = ["m1", "CC"] + [i % 2 for i in range(12)]
    schema = ("mol_id string, smiles string, " +
              ", ".join(f"`{c}` long" for c in TOX21_12_LABELS))
    raw = spark.createDataFrame([tuple(row)], schema)
    res = build_source(spark, "tox21_12", {"raw": raw})
    acts = _check_contract(res)
    assert len(acts) == 12 and res.properties.count() == 12
    descs = [json.loads(r["data"]) for r in res.properties.collect()]
    assert any("Androgen Receptor" in d.get("description", "") for d in descs)
