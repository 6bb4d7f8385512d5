"""Concrete configurations for all 15 reference source integrations.

The reference ships one bespoke script per source (dvc.yaml:4-104); here
each source is DATA — a :class:`SourceSpec` naming its pipeline shape
(plans/integrations.py) plus the concrete column sets, recode maps,
thresholds, and floors that script hard-codes. A user porting the
reference points ``build_source`` at the same raw tables and gets the
same staging contract: substances(sid, data), properties(pid, data),
activities(aid, sid, pid, inchi, value[, metric, numvalue]).

Per-source reference citations sit on each spec. Raw-table inputs are
passed as a ``{table_name: DataFrame}`` dict so the catalog stays
storage-agnostic (the reference pulls from biobricks assets; any parquet/
TSV/SQLite reader from sources.readers produces the same frames).

Everything here is config + thin glue over the shape templates; the heavy
lifting (dedup-before-UDF, discordance removal, floors, median
binarization, melt) lives in operators/ and plans/integrations.py and is
plan-audited there.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chemharmony_spark.hints import size_gated_broadcast

from chemharmony_spark.functions.chem import (
    smiles_to_inchi,
    with_derived_column_deduped,
)
from chemharmony_spark.functions.ids import group_id
from chemharmony_spark.operators.core import (
    balanced_class_floor,
    discordance_filter,
    grouped_median_binarize,
    having_filter,
    keep_unique_keys,
    recode,
)
from chemharmony_spark.plans.integrations import (
    MetricThreshold,
    OutcomeConfig,
    StagingTables,
    fold_directional_outcomes,
    integrate_long_keyvalue,
    integrate_measurements,
    integrate_outcomes,
    integrate_relational,
    integrate_wide_labels,
    integrate_wide_measurements,
)


@dataclass(frozen=True)
class SourceSpec:
    name: str
    shape: str          # which plans/integrations.py template drives it
    reference: str      # reference script this config reproduces
    tables: tuple[str, ...]  # raw table names build_source expects
    builder: Callable[[SparkSession, dict[str, DataFrame]], StagingTables]
    notes: str = ""


# =========================================================================
# 01 toxvaldb — numeric measurements, median collapse + median binarize
# =========================================================================

TOXVALDB_PROPERTY_COLS = [
    "risk_assessment_class",
    "species_supercategory",
    "exposure_route",
    "toxval_type_category",
    "toxval_units",
]
TOXVALDB_MIN_GROUP = 500  # 01_integrate_toxvaldb.R:24 (n() > 500)


def _comptox_inchi(t):
    """The shared comptox dtxsid -> inchi mapping, ONE inchi per dtxsid:
    conflicting mappings (salts/stereo variants under one dtxsid) are
    DROPPED entirely — the pubchem keep-unique idiom (09:28-29). Without
    this, a double-mapped dtxsid duplicates every joined activity AND
    gives one local sid two payloads, which harmonize's re-key then fans
    out into both global substances."""
    from chemharmony_spark.operators.core import keep_unique_keys

    return keep_unique_keys(
        t["comptox"].select("dtxsid", "inchi").distinct(), "dtxsid"
    )


def _build_toxvaldb(spark, t):
    """01_integrate_toxvaldb.R: keep qualifier '=' + qa_status 1 rows
    (:20), join comptox for inchi (:12), drop null inchi."""
    raw = t["toxvaldb"].where(
        (F.col("toxval_numeric_qualifier") == "=") & (F.col("qa_status") == 1)
    )
    raw = raw.join(
        size_gated_broadcast(_comptox_inchi(t)),
        on="dtxsid",
    ).where(F.col("inchi").isNotNull())
    return integrate_measurements(
        raw,
        substance_cols=["dtxsid"],
        property_cols=TOXVALDB_PROPERTY_COLS,
        value_col="toxval_numeric",
        inchi_col="inchi",
        min_group_size=TOXVALDB_MIN_GROUP,
        # :27 ifelse(value < medvalue, "negative", "positive")
        positive_when_low=False,
    )


# =========================================================================
# 02 chembl — categorical activity comments over assay metadata
# =========================================================================

# 02_integrate_chembl.R:44-51
CHEMBL_ACTIVITY_RECODE = {
    "inactive": "negative",
    "active": "positive",
    "not active": "negative",
    "non-toxic": "negative",
    "toxic": "positive",
    "antagonist": "positive",
}
# 02:31-38
CHEMBL_ASSAY_TYPE_RECODE = {
    "B": "Binding",
    "F": "Functional (i.e %cell death or rat weight)",
    "A": "Absorption Distribution Metabolism Excretion",
    "T": "Toxicity (T) - Data measuring toxicity of a compound, e.g., "
         "cytotoxicity.",
    "P": "Physicochemical (P) - Assays measuring physicochemical properties "
         "of the compounds in the absence of biological material e.g., "
         "chemical stability, solubility.",
    "U": "Unclassified",
}
# 02:55-56 — the property key is EVERY assay column plus these
CHEMBL_EXTRA_PROP_COLS = [
    "assay_id", "standard_type", "bao_endpoint", "uo_units", "qudt_units",
    "type",
]
CHEMBL_MIN_SUBSTANCES = 100  # 02:61 n_distinct(sid) > 100
CHEMBL_CLASS_FLOOR = 50      # 02:62 > 50 positives and negatives


def _build_chembl(spark, t):
    """02_integrate_chembl.R: compounds ⋈ assays ⋈ activities, comment
    recode, discordance removal, substance + class floors."""
    cmp = t["compound_structures"].select(
        "molregno", F.col("standard_inchi").alias("inchi")
    )
    ass = t["assays"].withColumn(
        "assay_type", recode("assay_type", CHEMBL_ASSAY_TYPE_RECODE,
                             lowercase=False)
    )
    prop_cols = sorted(set(ass.columns) | set(CHEMBL_EXTRA_PROP_COLS))
    acts = (
        t["activities"]
        .join(cmp, on="molregno")
        .join(size_gated_broadcast(ass), on="assay_id")
    )
    return integrate_outcomes(
        acts,
        OutcomeConfig(
            compound_cols=["molregno", "inchi"],
            property_cols=prop_cols,
            outcome_col="activity_comment",
            inchi_col="inchi",
            recode_map=CHEMBL_ACTIVITY_RECODE,
            lowercase_outcome=True,  # 02:43 tolower(activity_comment)
            drop_discordant=True,    # 02:60
            min_substances=CHEMBL_MIN_SUBSTANCES,
            class_floor=CHEMBL_CLASS_FLOOR,
        ),
    )


# =========================================================================
# 03 tox21 — agonist/antagonist outcome expansion over screening data
# =========================================================================

TOX21_LEGAL_OUTCOMES = ["active agonist", "active antagonist", "inactive"]
TOX21_ACTIVE_OUTCOMES = ["active agonist", "active antagonist"]
TOX21_REPRO = ["active_match", "inactive_match"]          # 03:17
TOX21_SAMPLE_TYPES = ["activity", "viability", "control", "signal"]  # 03:18
TOX21_PROPERTY_COLS = ["PROTOCOL_NAME", "SAMPLE_DATA_TYPE", "ASSAY_OUTCOME"]
TOX21_CLASS_FLOOR = 100  # 03:50 n() > 100 per (pid, value)


def expand_outcome_grid(df: DataFrame, outcome_col: str,
                        active_outcomes: list[str],
                        inactive_outcome: str) -> DataFrame:
    """tox21 posneg block (03_integrate_tox21.R:30-45): each ACTIVE outcome
    becomes its own property; a row is positive under its own outcome and
    negative under every other active outcome; inactive rows are negative
    under all of them. One explode of a k-element literal array — no
    shuffle, replacing the reference's 4-way bind_rows."""
    targets = F.array(*[F.lit(o) for o in active_outcomes])
    keep = df.where(F.col(outcome_col).isin(*active_outcomes, inactive_outcome))
    return (
        keep.withColumn("__target", F.explode(targets))
        .withColumn(
            "value",
            F.when(F.col(outcome_col) == F.col("__target"), "positive")
            .otherwise("negative"),
        )
        .withColumn(outcome_col, F.col("__target"))
        .drop("__target")
    )


def _build_tox21(spark, t):
    """03_integrate_tox21.R: QC filters (:13-18), one-sample substances
    (:26), outcome expansion, discordance removal, per-class floor, inchi
    via the deduped smiles->inchi UDF (:77-87)."""
    agg = (
        t["tox21_aggregated"]
        .where(F.col("ASSAY_OUTCOME").isin(TOX21_LEGAL_OUTCOMES))
        .where(F.col("SMILES").isNotNull())
        .where(F.col("PURITY_RATING") == "A")
        .where(F.col("REPRODUCIBILITY").isin(TOX21_REPRO))
        .where(F.col("SAMPLE_DATA_TYPE").isin(TOX21_SAMPLE_TYPES))
    )
    # :26 — drop SMILES groups spanning multiple SAMPLE_IDs
    one_sample = having_filter(
        agg, ["SMILES"], F.countDistinct("SAMPLE_ID") == 1
    )
    expanded = expand_outcome_grid(
        one_sample, "ASSAY_OUTCOME", TOX21_ACTIVE_OUTCOMES, "inactive"
    )
    expanded = with_derived_column_deduped(
        expanded, "SMILES", "inchi", smiles_to_inchi("SMILES")
    ).where(F.col("inchi").isNotNull())

    keyed = (
        expanded.withColumn(
            "pid", group_id(*TOX21_PROPERTY_COLS, sep="|")
        )
        .withColumn("sid", F.md5(F.col("SMILES")))
    )
    keyed = discordance_filter(keyed, ["sid", "pid"], "value")  # :47
    keyed = balanced_class_floor(
        keyed, ["pid"], "value", floor=TOX21_CLASS_FLOOR
    )  # :50-51
    # sid <-> data bijection (harmonize invariant): sid keys on SMILES
    # alone, so per-sid meta (CAS/SAMPLE_NAME vary across replicate rows
    # of one compound) is collapsed deterministically (min) before the
    # payload — two payloads under one sid would fan the re-key join out
    subs = (
        keyed.groupBy("sid").agg(
            F.min("CAS").alias("CAS"),
            F.min("SAMPLE_NAME").alias("SAMPLE_NAME"),
            F.min("SMILES").alias("SMILES"),
            F.min("inchi").alias("inchi"),
        )
        .withColumn(
            "data", F.to_json(F.struct("CAS", "SAMPLE_NAME", "SMILES", "inchi"))
        )
    )
    props = (
        keyed.select("pid", *TOX21_PROPERTY_COLS)
        .distinct()
        .withColumn("data", F.to_json(F.struct(*sorted(TOX21_PROPERTY_COLS))))
    )
    acts = (
        keyed.select("sid", "pid", "inchi", "value")
        .withColumn("aid", group_id("sid", "pid", "inchi", "value"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts.select("aid", "sid", "pid", "inchi", "value"),
    )


# =========================================================================
# 04 toxcast — hit-call screening, per-(sid,pid) median hit rounding
# =========================================================================

TOXCAST_CLASS_FLOOR = 100  # 04:46 n() > 100 per (pid, value)


def _build_toxcast(spark, t):
    """04_integrate_toxcast.R: hitc != -1 (:38), per-(substance, assay)
    rounded-median hit call (:39), class floor + both-classes filter
    (:46-47); inchi from comptox (:14-16)."""
    tox = t["invitrodb"].withColumnRenamed("dsstox_substance_id", "dtxsid")
    tox = tox.join(
        size_gated_broadcast(_comptox_inchi(t)),
        on="dtxsid",
    )
    tox = tox.where(F.col("hitc") != -1)
    med = (
        tox.groupBy("dtxsid", "inchi", "aeid", "aenm")
        .agg(F.percentile_approx("hitc", 0.5, 1).alias("medhit"))
        .withColumn(
            "value",
            F.when(F.round("medhit") == 1, "positive").otherwise("negative"),
        )
    )
    keyed = (
        med.withColumn("sid", F.md5(F.col("dtxsid")))
        .withColumn("pid", group_id("aeid", "aenm", sep="|"))
    )
    keyed = balanced_class_floor(keyed, ["pid"], "value",
                                 floor=TOXCAST_CLASS_FLOOR)
    keyed = having_filter(keyed, ["pid"], F.countDistinct("value") > 1)
    subs = (
        keyed.select("sid", "dtxsid", "inchi").distinct()
        .withColumn("data", F.to_json(F.struct("dtxsid", "inchi")))
    )
    props = (
        keyed.select("pid", "aeid", "aenm").distinct()
        .withColumn("data", F.to_json(F.struct("aeid", "aenm")))
    )
    acts = (
        keyed.select("sid", "pid", "inchi", "value")
        .withColumn("aid", group_id("sid", "pid", "inchi", "value"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts.select("aid", "sid", "pid", "inchi", "value"),
    )


# =========================================================================
# 05 reach — GHS hazard recode over EC-number substances
# =========================================================================

REACH_CLASS_FLOOR = 100  # 05:51-52 (> 100 positives AND negatives per pid)


def _build_reach(spark, t):
    """05_integrate_reach.R: join the GHS hazard->description TSV (:10-12;
    the reference reads src/helper/ghs.txt — pass the same table via
    sources.readers.read_tsv), drop EC numbers with conflicting smiles
    (:16-17), smiles->inchi (:24-33), balanced 100-floor (:50-52)."""
    reach = t["reach"].join(F.broadcast(t["ghs"]), on="hazard")
    one_smiles = having_filter(
        reach, ["ecnumber"], F.countDistinct("smiles") == 1
    )
    one_smiles = with_derived_column_deduped(
        one_smiles, "smiles", "inchi", smiles_to_inchi("smiles")
    ).where(F.col("inchi").isNotNull())
    keyed = (
        one_smiles.withColumn("sid", F.md5(F.col("ecnumber")))
        .withColumn("pid", group_id("hazard", "description", sep="|"))
    )
    keyed = balanced_class_floor(keyed, ["pid"], "value",
                                 floor=REACH_CLASS_FLOOR)
    subs = (
        keyed.select("sid", "ecnumber", "smiles", "inchi").distinct()
        .withColumn("data", F.to_json(F.struct("ecnumber", "inchi", "smiles")))
    )
    props = (
        keyed.select("pid", "hazard", "description").distinct()
        .withColumn("data", F.to_json(F.struct("description", "hazard")))
    )
    acts = (
        keyed.select("sid", "pid", "inchi", "value")
        .withColumn("aid", group_id("sid", "pid", "inchi", "value"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts.select("aid", "sid", "pid", "inchi", "value"),
    )


# =========================================================================
# 06 ice — eight sub-table recodes unioned, per-class floor 50
# =========================================================================

# 06_integrate_ice.R per-subtable recodes. Each entry: categorical map OR
# numeric rule; all emit (DTXSID, Assay, Endpoint, Response, Units,
# data_type).
ICE_CATEGORICAL = {
    # :42-46 Skin Irritation and Corrosion
    "skin_irritation": {
        "data_type": "Skin Irritation and Corrosion",
        "positive": ["C", "Active", "1", "2", "3"],
        "negative": ["NC", "Inactive", "0"],
    },
    # :60-65 Skin Sensitization
    "skin_sensitization": {
        "data_type": "Skin Sensitization",
        "positive": ["Active", "Sensitizer"],
        "negative": ["Inactive", "Non-sensitizer"],
    },
    # :68-72 Cancer
    "cancer": {
        "data_type": "Cancer",
        "positive": ["Positive"],
        "negative": ["Negative"],
    },
    # :85-90 High Throughput Screening
    "chts": {
        "data_type": "High Throughput Screening",
        "positive": ["Active"],
        "negative": ["Inactive"],
    },
}
# :75-82 acute oral / :108-117 inhalation numeric rules: (endpoint match,
# negative-when predicate over the numeric response)
ICE_NUMERIC_RULES = {
    "acute_oral": {
        "data_type": "Acute Oral Toxicity",
        "rules": [
            ("EPA classification", "== 4"),
            ("GHS classification", "== 5"),
            ("LD50", ">= 2000"),
        ],
    },
    "acute_inhalation": {
        "data_type": "Acute Inhalation Toxicity",
        "rules": [
            ("EPA Classification, Acute Inhalation", "== 4"),
            ("GHS Classification, Acute Inhalation", ">= 4"),
            ("LC50", "> 10"),
        ],
    },
}
ICE_CLASS_FLOOR = 50  # :137 n() > 50 per (pid, Response)


def ice_recode_categorical(df: DataFrame, spec: dict) -> DataFrame:
    resp = F.col("Response").cast("string")
    return (
        df.where(resp.isin(spec["positive"] + spec["negative"]))
        .withColumn(
            "Response",
            F.when(resp.isin(spec["positive"]), "positive")
            .otherwise("negative"),
        )
        .withColumn("data_type", F.lit(spec["data_type"]))
    )


def ice_recode_numeric(df: DataFrame, spec: dict) -> DataFrame:
    num = F.col("Response").cast("double")
    branches = None
    for endpoint, neg_pred in spec["rules"]:
        cond = (F.col("Endpoint") == endpoint) & num.isNotNull()
        neg = F.expr(f"cast(Response as double) {neg_pred}")
        val = F.when(neg, "negative").otherwise("positive")
        branches = (
            F.when(cond, val) if branches is None else branches.when(cond, val)
        )
    return (
        df.withColumn("__v", branches)
        .where(F.col("__v").isNotNull())
        .withColumn("Response", F.col("__v"))
        .drop("__v")
        .withColumn("data_type", F.lit(spec["data_type"]))
    )


def ice_median_binarize_adme(df: DataFrame) -> DataFrame:
    """:52-58 — numeric ADME parameters binarized at the per-(Assay,
    Endpoint, Units) median; below-median is NEGATIVE (inverted vs
    toxvaldb)."""
    out = grouped_median_binarize(
        df.withColumn("Response", F.col("Response").cast("double")),
        substance_keys=["DTXSID"],
        property_keys=["Assay", "Endpoint", "Units"],
        value_col="Response",
        positive_when_low=False,
    )
    return out.withColumn(
        "Response", F.col("value")
    ).drop("value", "medvalue").withColumn(
        "data_type",
        F.lit("Absorption Distribution Metabolism Excretion Parameters"),
    )


def _build_ice(spark, t):
    """06_integrate_ice.R: recode each sub-table, union, join comptox for
    inchi (:129-131), per-(pid, Response) floor 50 + both-classes filter
    (:135-139). The functional-use grid-negative synthesis (:93-105) is the
    grid_negatives operator — exercised separately in test_integrations."""
    parts = []
    for key, spec in ICE_CATEGORICAL.items():
        if key in t:
            parts.append(ice_recode_categorical(t[key], spec))
    for key, spec in ICE_NUMERIC_RULES.items():
        if key in t:
            parts.append(ice_recode_numeric(t[key], spec))
    if "adme" in t:
        parts.append(ice_median_binarize_adme(t["adme"]))
    assert parts, "no recognized ICE sub-tables supplied"
    iceb = parts[0]
    for p in parts[1:]:
        iceb = iceb.unionByName(p, allowMissingColumns=True)
    iceb = iceb.withColumnRenamed("DTXSID", "dtxsid").join(
        size_gated_broadcast(_comptox_inchi(t)),
        on="dtxsid",
    ).where(F.col("inchi").isNotNull())
    keyed = (
        iceb.withColumn("sid", F.md5(F.col("dtxsid")))
        .withColumn("pid", group_id("Assay", "Endpoint", "Units", sep="|"))
        .withColumnRenamed("Response", "value")
    )
    keyed = balanced_class_floor(keyed, ["pid"], "value", floor=ICE_CLASS_FLOOR)
    keyed = having_filter(keyed, ["pid"], F.countDistinct("value") > 1)
    subs = (
        keyed.select("sid", "dtxsid", "inchi").distinct()
        .withColumn("data", F.to_json(F.struct("dtxsid", "inchi")))
    )
    props = (
        keyed.select("pid", "Assay", "Endpoint", "Units").distinct()
        .withColumn("data", F.to_json(F.struct("Assay", "Endpoint", "Units")))
    )
    acts = (
        keyed.select("sid", "pid", "inchi", "value")
        .withColumn("aid", group_id("sid", "pid", "inchi", "value"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts.select("aid", "sid", "pid", "inchi", "value"),
    )


# =========================================================================
# 07 ctdbase — directional chem-gene interactions folded to +/- pairs
# =========================================================================

# 07_integrate_ctdbase.R:55-70 — each direction pair folds into one
# property with the opposite direction as the negative class
CTD_DIRECTION_PAIRS = [
    ("increases^expression", "decreases^expression"),
    ("increases^methylation", "decreases^methylation"),
    ("increases^activity", "decreases^activity"),
]
CTD_PROPERTY_COLS = [
    "Organism", "OrganismID", "GeneSymbol", "GeneForms", "InteractionActions",
]


def _build_ctdbase(spark, t):
    """07_integrate_ctdbase.R: keep the six directional interaction types,
    fold each increases/decreases pair (both orientations — the reference
    emits the flipped copy too, :62-70), substances keyed by inchi."""
    parts = []
    for pos, neg in CTD_DIRECTION_PAIRS:
        for a, b in ((pos, neg), (neg, pos)):
            folded = fold_directional_outcomes(
                t["chem_gene_ixns"].where(
                    F.col("InteractionActions").isin(a, b)
                ),
                direction_col="InteractionActions",
                positive_direction=a,
                negative_direction=b,
            ).withColumn("InteractionActions", F.lit(a))
            parts.append(folded)
    ixns = parts[0]
    for p in parts[1:]:
        ixns = ixns.unionByName(p)
    chem = t["chemicals"].where(F.col("inchi").isNotNull())
    joined = ixns.join(size_gated_broadcast(chem), on="ChemicalID")
    keyed = (
        joined.withColumn("sid", F.md5(F.col("inchi")))
        .withColumn("pid", group_id(*CTD_PROPERTY_COLS, sep="|"))
    )
    # sid keys on inchi alone; chemical meta (two ChemicalIDs can share
    # an InChI) collapses deterministically so sid <-> data stays 1:1
    subs = (
        keyed.groupBy("sid").agg(
            F.min("CasRN").alias("CasRN"),
            F.min("ChemicalID").alias("ChemicalID"),
            F.min("ChemicalName").alias("ChemicalName"),
            F.min("inchi").alias("inchi"),
        )
        .withColumn(
            "data",
            F.to_json(F.struct("CasRN", "ChemicalID", "ChemicalName", "inchi")),
        )
    )
    props = (
        keyed.select("pid", *CTD_PROPERTY_COLS).distinct()
        .withColumn("data", F.to_json(F.struct(*sorted(CTD_PROPERTY_COLS))))
    )
    acts = (
        keyed.select("sid", "pid", "inchi", "value")
        .withColumn("aid", group_id("sid", "pid", "inchi", "value"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts.select("aid", "sid", "pid", "inchi", "value"),
    )


# =========================================================================
# 09 pubchem — long key-value bioassay outcomes
# =========================================================================

PUBCHEM_INCHI_PROPERTY = "PUBCHEM_IUPAC_INCHI"        # 09:25
PUBCHEM_OUTCOME_PROPERTY = "pubchem_activity_outcome"  # 09:54
PUBCHEM_VALUE_MAP = {"Active": "positive", "Inactive": "negative"}  # 09:55-56
PUBCHEM_BIOASSAY_META = [
    "BioAssay Name", "Deposit Date", "Modify Date", "Source Name",
    "Source ID", "Substance Type", "Outcome Type", "Project Category",
    "BioAssay Group", "BioAssay Types", "Protein Accessions", "UniProts IDs",
    "Gene IDs", "Target TaxIDs", "Taxonomy IDs",
]  # 09:40-42


def _build_pubchem(spark, t):
    """09_integrate_pubchem.py: compounds = long property triples (InChI
    rows; conflicting ids dropped), properties = bioassay metadata,
    activities = concise outcomes recoded Active/Inactive."""
    meta = [c for c in PUBCHEM_BIOASSAY_META if c in t["bioassay"].columns]
    outcomes = t["bioassay_concise"].where(
        F.col("property") == PUBCHEM_OUTCOME_PROPERTY
    )
    return integrate_long_keyvalue(
        compounds=t["compound_sdf"],
        outcomes=outcomes,
        properties=t["bioassay"],
        compound_key="id",
        inchi_property=PUBCHEM_INCHI_PROPERTY,
        outcome_compound_key="pubchem_cid",
        outcome_property_key="aid",
        property_key="aid",
        property_meta_cols=meta,
        value_col="value",
        value_map=PUBCHEM_VALUE_MAP,
    )


# =========================================================================
# 10 bindingdb — wide binding metrics with per-metric nM thresholds
# =========================================================================

# 10_integrate_bindingdb.R:80-88
BINDINGDB_METRICS = {
    "Ki (nM)": MetricThreshold(10.0),
    "IC50 (nM)": MetricThreshold(100.0),
    "Kd (nM)": MetricThreshold(10.0),
    "EC50 (nM)": MetricThreshold(100.0),
}
# 10:7-26 (subset used as the property identity; the reference includes
# every UniProt/PDB target column present in the dump)
BINDINGDB_PROPERTY_COLS = [
    "Target Name", "pH", "Temp (C)",
    "Target Source Organism According to Curator or DataSource",
    "UniProt (SwissProt) Primary ID of Target Chain",
]
# 10:28-43 (likewise the substance identity columns)
BINDINGDB_SUBSTANCE_COLS = [
    "BindingDB MonomerID", "Ligand SMILES", "Ligand InChI",
    "BindingDB Ligand Name", "PubChem CID",
]


def _build_bindingdb(spark, t):
    df = t["binding"].where(F.col("Ligand InChI").isNotNull())
    subs = [c for c in BINDINGDB_SUBSTANCE_COLS if c in df.columns]
    props = [c for c in BINDINGDB_PROPERTY_COLS if c in df.columns]
    return integrate_wide_measurements(
        df,
        substance_cols=subs,
        property_cols=props,
        metric_cols={m: s for m, s in BINDINGDB_METRICS.items()
                     if m in df.columns},
        inchi_col="Ligand InChI",
    )


# =========================================================================
# 11 toxrefdb — relational NOAEL point-of-departure labels
# =========================================================================

TOXREFDB_POD_TYPE = "noael"  # 11:47


def _build_toxrefdb(spark, t):
    return integrate_relational(
        chemical=t["chemical"],
        study=t["study"],
        guideline=t["guideline"],
        pod=t["pod"],
        pod_type=TOXREFDB_POD_TYPE,
    )


# =========================================================================
# 13-17 MoleculeNet wide-label sources
# =========================================================================

BBBP_PROPERTY_META = {
    "p_np": {
        "property": "p_np",
        "description": "Blood-brain barrier permeability: ability of a "
                       "compound to cross the blood-brain barrier",
        "active_label": "Permeable (P)",
        "inactive_label": "Non-permeable (NP)",
    }
}  # 13_integrate_BBBP.py:47-55

BACE_PROPERTY_META = {
    "Class": {
        "property": "Class",
        "description": "BACE-1 (β-secretase 1) inhibition activity",
        "active_label": "Active (Inhibitor)",
        "inactive_label": "Inactive (Non-inhibitor)",
    }
}  # 14_integrate_BACE.py:48-56

CLINTOX_PROPERTY_META = {
    "FDA_APPROVED": {
        "property": "FDA_APPROVED",
        "description": "FDA approval status of the compound",
        "active_label": "Approved",
        "inactive_label": "Not Approved",
    },
    "CT_TOX": {
        "property": "CT_TOX",
        "description": "Clinical trial toxicity: indicates whether the "
                       "compound was found to be toxic in clinical trials",
        "active_label": "Toxic",
        "inactive_label": "Non-toxic",
    },
}  # 16_integrate_clintox.py:52-71

TOX21_12_PROPERTY_META = {
    k: {"property": k, "description": v}
    for k, v in {
        "NR-AR": "Androgen Receptor assay tests for agonists of the "
                 "androgen receptor.",
        "NR-AR-LBD": "Androgen Receptor Ligand Binding Domain assay "
                     "assesses the ability of chemicals to bind to the "
                     "androgen receptor.",
        "NR-AhR": "Aryl Hydrocarbon Receptor assay tests for activation "
                  "of the aryl hydrocarbon receptor.",
        "NR-Aromatase": "Aromatase assay tests for inhibition of "
                        "aromatase, an enzyme responsible for a key step "
                        "in estrogen biosynthesis.",
        "NR-ER": "Estrogen Receptor assay tests for agonists of the "
                 "estrogen receptor.",
        "NR-ER-LBD": "Estrogen Receptor Ligand Binding Domain assay "
                     "assesses the binding ability of chemicals to the "
                     "estrogen receptor.",
        "NR-PPAR-gamma": "Peroxisome Proliferator-Activated Receptor "
                         "Gamma assay targets PPAR-gamma receptor, "
                         "regulating fatty acid storage and glucose "
                         "metabolism.",
        "SR-ARE": "Antioxidant Response Element assay identifies "
                  "chemicals that activate ARE, involved in response to "
                  "oxidative stress.",
        "SR-ATAD5": "ATAD5 assay assesses DNA damage by identifying "
                    "chemicals that increase ATAD5 expression, involved "
                    "in DNA repair.",
        "SR-HSE": "Heat Shock Element assay identifies chemicals that "
                  "activate HSE, involved in protecting cells from "
                  "stress.",
        "SR-MMP": "Matrix Metalloproteinase assay tests for inhibition "
                  "of matrix metalloproteinases, involved in "
                  "extracellular matrix breakdown.",
        "SR-p53": "p53 assay identifies chemicals that activate p53, a "
                  "protein crucial for controlling cell division and "
                  "apoptosis.",
    }.items()
}  # 17_integrate_tox21_12.py:48-60

TOX21_12_LABELS = list(TOX21_12_PROPERTY_META)


def _wide_labels_builder(label_cols, smiles_col="smiles", meta=None,
                         substance_meta=None, rename=None):
    def build(spark, t):
        df = t["raw"]
        for old, new in (rename or {}).items():
            df = df.withColumnRenamed(old, new)
        cols = label_cols if label_cols else [
            c for c in df.columns
            if c not in {smiles_col, *(substance_meta or [])}
        ]
        return integrate_wide_labels(
            df,
            smiles_col=smiles_col,
            label_cols=cols,
            substance_meta=substance_meta or [],
            property_meta=meta or {},
        )
    return build


# =========================================================================
# The catalog
# =========================================================================

CATALOG: dict[str, SourceSpec] = {
    "toxvaldb": SourceSpec(
        name="toxvaldb", shape="measurements",
        reference="src/01_integrate_toxvaldb.R",
        tables=("toxvaldb", "comptox"), builder=_build_toxvaldb,
        notes="qualifier '=' + qa_status 1; props keyed on 5 class columns; "
              "median collapse then per-property median binarize; >500 floor",
    ),
    "chembl": SourceSpec(
        name="chembl", shape="outcomes",
        reference="src/02_integrate_chembl.R",
        tables=("compound_structures", "assays", "activities"),
        builder=_build_chembl,
        notes="activity_comment recode; property key = all assay columns + "
              "6 activity columns; discordance removal; 100/50 floors",
    ),
    "tox21": SourceSpec(
        name="tox21", shape="outcomes+expansion",
        reference="src/03_integrate_tox21.R",
        tables=("tox21_aggregated",), builder=_build_tox21,
        notes="QC filters; agonist/antagonist outcome grid expansion; "
              "per-class floor 100",
    ),
    "toxcast": SourceSpec(
        name="toxcast", shape="measurements",
        reference="src/04_integrate_toxcast.R",
        tables=("invitrodb", "comptox"), builder=_build_toxcast,
        notes="hitc median-round binarize; class floor 100",
    ),
    "reach": SourceSpec(
        name="reach", shape="outcomes",
        reference="src/05_integrate_reach.R",
        tables=("reach", "ghs"), builder=_build_reach,
        notes="GHS hazard->description join (read src/helper/ghs.txt via "
              "read_tsv); unique-smiles EC numbers; balanced 100 floor",
    ),
    "ice": SourceSpec(
        name="ice", shape="multi-subtable union",
        reference="src/06_integrate_ice.R",
        tables=("comptox", "skin_irritation", "skin_sensitization", "cancer",
                "chts", "acute_oral", "acute_inhalation", "adme"),
        builder=_build_ice,
        notes="8 sub-table recodes (categorical maps, numeric "
              "classification rules, ADME median binarize); floor 50",
    ),
    "ctdbase": SourceSpec(
        name="ctdbase", shape="directional fold",
        reference="src/07_integrate_ctdbase.R",
        tables=("chem_gene_ixns", "chemicals"), builder=_build_ctdbase,
        notes="six interaction directions folded to three +/- properties, "
              "both orientations emitted",
    ),
    "pubchem": SourceSpec(
        name="pubchem", shape="long_keyvalue",
        reference="src/09_integrate_pubchem.py",
        tables=("compound_sdf", "bioassay", "bioassay_concise"),
        builder=_build_pubchem,
        notes="InChI property rows; conflicting cids dropped; "
              "Active/Inactive recode",
    ),
    "bindingdb": SourceSpec(
        name="bindingdb", shape="wide_measurements",
        reference="src/10_integrate_bindingdb.R",
        tables=("binding",), builder=_build_bindingdb,
        notes="melt Ki/IC50/Kd/EC50; strip >/< qualifiers; "
              "10/100 nM thresholds; numvalue carried",
    ),
    "toxrefdb": SourceSpec(
        name="toxrefdb", shape="relational",
        reference="src/11_integrate_toxrefdb.R",
        tables=("chemical", "study", "guideline", "pod"),
        builder=_build_toxrefdb,
        notes="NOAEL dose_level < max_dose_level => positive; "
              "guideline-keyed properties",
    ),
    "BBBP": SourceSpec(
        name="BBBP", shape="wide_labels",
        reference="src/13_integrate_BBBP.py",
        tables=("raw",),
        builder=_wide_labels_builder(["p_np"], meta=BBBP_PROPERTY_META,
                                     substance_meta=["name"]),
        notes="single p_np label; substance meta num/name",
    ),
    "BACE": SourceSpec(
        name="BACE", shape="wide_labels",
        reference="src/14_integrate_BACE.py",
        tables=("raw",),
        builder=_wide_labels_builder(["Class"], meta=BACE_PROPERTY_META,
                                     substance_meta=["CID"],
                                     rename={"mol": "smiles"}),
        notes="'mol' column renamed to smiles; single Class label",
    ),
    "sider": SourceSpec(
        name="sider", shape="wide_labels",
        reference="src/15_integrate_sider.py",
        tables=("raw",),
        builder=_wide_labels_builder(None),  # every non-smiles column (15:48)
        notes="27 side-effect label columns, discovered from the frame",
    ),
    "clintox": SourceSpec(
        name="clintox", shape="wide_labels",
        reference="src/16_integrate_clintox.py",
        tables=("raw",),
        builder=_wide_labels_builder(["FDA_APPROVED", "CT_TOX"],
                                     meta=CLINTOX_PROPERTY_META),
        notes="two labels with FDA/toxicity descriptions",
    ),
    "tox21_12": SourceSpec(
        name="tox21_12", shape="wide_labels",
        reference="src/17_integrate_tox21_12.py",
        tables=("raw",),
        builder=_wide_labels_builder(TOX21_12_LABELS,
                                     meta=TOX21_12_PROPERTY_META,
                                     substance_meta=["mol_id"]),
        notes="the 12 Tox21 assay labels with assay descriptions",
    ),
    # Present in the reference src/ but NOT wired into dvc.yaml — shipped
    # as an extra so "every query they run today" includes the shelf too.
    # (src/13_integrate_skinsensdb.py is left out deliberately: the
    # reference script is unfinished — it stops at '# thresholds' before
    # defining any value recode, so there is no behavior to reproduce.)
    "HIV": SourceSpec(
        name="HIV", shape="wide_labels",
        reference="src/12_integrate_HIV.py (not dvc-wired)",
        tables=("raw",),
        builder=_wide_labels_builder(
            ["HIV_active"],
            meta={"HIV_active": {"property": "HIV_active"}},
        ),
        notes="single HIV_active label; structural-only substance payload",
    ),
}

DVC_WIRED = frozenset(CATALOG) - {"HIV"}  # dvc.yaml:4-104 stages


def build_source(spark: SparkSession, name: str,
                 tables: dict[str, DataFrame]) -> StagingTables:
    """Run one cataloged source integration over its raw tables."""
    spec = CATALOG[name]
    missing = [
        tb for tb in spec.tables
        if tb not in tables and name != "ice"  # ice sub-tables are optional
    ]
    if name == "ice":
        missing = [tb for tb in ("comptox",) if tb not in tables]
    if missing:
        raise ValueError(f"{name}: missing raw tables {missing}")
    return spec.builder(spark, tables)
