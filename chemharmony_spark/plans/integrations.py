"""Declarative source-integration pipelines (SURVEY.md §7 step 4).

The reference's 15 integration scripts are ~85% the same shape (compare
13_integrate_BBBP.py / 14_BACE / 15_sider / 16_clintox / 17_tox21_12);
instead of 15 bespoke scripts, each source is a *configuration* over a small
set of pipeline shapes, every one emitting the staging contract
(SURVEY.md §1.2): substances(sid, data), properties(pid, data),
activities(aid, sid, pid, inchi, value[, smiles, metric, numvalue]).

Shapes:
- :func:`integrate_wide_labels`     — MoleculeNet shape (13-17): one row per
  compound, k 0/1 label columns -> k properties, melt to activities.
- :func:`integrate_long_keyvalue`   — pubchem shape (09): long (id, property,
  value) triples + a property-metadata table.
- :func:`integrate_measurements`    — toxvaldb shape (01): numeric
  measurements -> per-(sid,pid) median collapse -> per-pid median
  binarization, with a group-size floor.
- :func:`integrate_wide_measurements` — bindingdb shape (10): wide metric
  columns -> melt -> qualifier strip -> per-metric threshold recode.
- :func:`integrate_outcomes`        — chembl/tox21/ctdbase shape (02/03/07):
  categorical outcomes -> recode map -> discordance removal -> class floors.
- :func:`integrate_relational`      — toxrefdb shape (11): multi-table
  relational source with dose-level-derived labels.

All ids are deterministic (md5 of content / of key tuples — SURVEY.md §1.4);
the reference's per-source UUID/monotonic ids are run-dependent, ours are
not. All functions return lazy DataFrames; writers are the caller's choice.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chemharmony_spark.hints import size_gated_broadcast

from chemharmony_spark.functions.chem import smiles_to_inchi, with_derived_column_deduped
from chemharmony_spark.functions.ids import content_id, group_id
from chemharmony_spark.operators.core import (
    balanced_class_floor,
    discordance_filter,
    grouped_median_binarize,
    having_filter,
    melt,
    recode,
    strip_qualifiers_to_double,
)


@dataclass
class StagingTables:
    substances: DataFrame
    properties: DataFrame
    activities: DataFrame


def _payload(*cols: str) -> F.Column:
    """JSON data payload with sorted keys (stable content identity)."""
    return F.to_json(F.struct(*sorted(cols)))


def integrate_wide_labels(
    df: DataFrame,
    smiles_col: str,
    label_cols: list[str],
    substance_meta: list[str] | None = None,
    property_meta: dict[str, dict[str, str]] | None = None,
) -> StagingTables:
    """MoleculeNet shape (reference 13_integrate_BBBP.py:28-62,
    17_integrate_tox21_12.py:87-89).

    Spark-first upgrade: the per-label union *loop* of the reference
    (15_integrate_sider.py:68-70 stacks 27 frames) is a single ``unpivot`` —
    one narrow operator instead of k plan branches.

    sid is attached to each row BEFORE the unpivot, so activities carry
    their exact substance identity (smiles + inchi + meta): the previous
    join-back on inchi alone fanned out whenever two distinct SMILES
    canonicalized to the same InChI (real RDKit does this for salts /
    tautomers), cross-attributing one compound's labels to another's sid.

    Label cells that don't parse as a number (e.g. 'NA', '?', '' from a
    schemaless CSV read) are DROPPED — only 0 maps to negative and
    numeric non-zero to positive; junk must not silently become a
    positive activity.
    """
    substance_meta = substance_meta or []
    df = df.where(F.col(smiles_col).isNotNull())
    df = with_derived_column_deduped(
        df, smiles_col, "inchi", smiles_to_inchi(smiles_col)
    )
    df = df.where(F.col("inchi").isNotNull())
    # row-level substance identity, BEFORE the unpivot: no join-back
    df = df.withColumn(
        "data", _payload(smiles_col, "inchi", *substance_meta)
    ).withColumn("sid", F.md5(F.col("data")))

    subs = df.select("sid", "data").distinct()

    raw_rows = [{"label": c, **(property_meta or {}).get(c, {})} for c in label_cols]
    keys = sorted({k for r in raw_rows for k in r})
    prop_rows = [{k: r.get(k) for k in keys} for r in raw_rows]
    props = (
        df.sparkSession.createDataFrame(prop_rows)
        .withColumn("data", F.to_json(F.struct(*keys)))
        .withColumn("pid", F.md5(F.col("data")))
        .select(F.col("label"), "pid", "data")
    )

    long = melt(
        df.select("sid", "inchi", *label_cols),
        ids=["sid", "inchi"],
        value_cols=label_cols,
        var_name="label",
        value_name="raw",
    )
    acts = (
        # try_cast: junk label cells ('NA', '?', '') drop out explicitly
        # under ANSI and non-ANSI alike (a plain cast throws under ANSI
        # and silently yielded otherwise()='positive' without it)
        long.where(F.col("raw").try_cast("double").isNotNull())
        .withColumn(
            "value",
            F.when(F.col("raw").try_cast("double") == 0, "negative")
            .otherwise("positive"),
        )
        .join(F.broadcast(props.select("label", "pid")), on="label")
        .select(
            "sid", "pid", "inchi", "value",
            group_id("sid", "pid", "inchi", "value").alias("aid"),
        )
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts,
    )


def integrate_long_keyvalue(
    compounds: DataFrame,
    outcomes: DataFrame,
    properties: DataFrame,
    compound_key: str,
    inchi_property: str,
    outcome_compound_key: str,
    outcome_property_key: str,
    property_key: str,
    property_meta_cols: list[str],
    value_col: str,
    value_map: dict[str, str],
) -> StagingTables:
    """PubChem shape (reference 09_integrate_pubchem.py).

    compounds: long (id, property, value) — rows where property ==
    ``inchi_property`` carry the InChI; ids with conflicting InChI rows are
    dropped (window count == 1, 09:28-29). outcomes: (compound, property,
    outcome-value). properties: per-property metadata.
    """
    from chemharmony_spark.operators.core import keep_unique_keys

    inchis = (
        compounds.where(F.col("property") == inchi_property)
        .select(F.col(compound_key).alias("cid"), F.col("value").alias("inchi"))
        .distinct()
    )
    inchis = keep_unique_keys(inchis, "cid")
    subs = (
        inchis.withColumn("data", _payload("cid", "inchi"))
        .withColumn("sid", F.md5(F.col("data")))
    )

    props = (
        properties.select(F.col(property_key).alias("prop_key"), *property_meta_cols)
        .distinct()
        .withColumn("data", _payload("prop_key", *property_meta_cols))
        .withColumn("pid", F.md5(F.col("data")))
    )

    acts = (
        outcomes.withColumn("value", recode(value_col, value_map))
        .where(F.col("value").isNotNull())
        .select(
            F.col(outcome_compound_key).alias("cid"),
            F.col(outcome_property_key).alias("prop_key"),
            "value",
        )
        .join(subs.select("cid", "sid", "inchi"), on="cid")
        .join(size_gated_broadcast(props.select("prop_key", "pid")), on="prop_key")
        .select(
            "sid", "pid", "inchi", "value",
            group_id("sid", "pid", "inchi", "value").alias("aid"),
        )
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts,
    )


def integrate_measurements(
    df: DataFrame,
    substance_cols: list[str],
    property_cols: list[str],
    value_col: str,
    inchi_col: str,
    min_group_size: int = 500,
    positive_when_low: bool = True,
) -> StagingTables:
    """ToxValDB shape (reference 01_integrate_toxvaldb.R): collapse replicate
    measurements to the per-(substance,property) median, binarize at the
    per-property median, keep properties with > min_group_size substances."""
    keyed = df.withColumn("pid", content_id(*[F.col(c) for c in sorted(property_cols)]))
    keyed = having_filter(keyed, ["pid"], F.count(F.lit(1)) > min_group_size)
    binarized = grouped_median_binarize(
        keyed,
        substance_keys=[*substance_cols, inchi_col],
        property_keys=["pid", *property_cols],
        value_col=value_col,
        positive_when_low=positive_when_low,
    )
    subs = (
        binarized.select(*substance_cols, inchi_col)
        .distinct()
        .withColumn("data", _payload(*substance_cols, inchi_col))
        .withColumn("sid", F.md5(F.col("data")))
    )
    props = (
        binarized.select("pid", *property_cols)
        .distinct()
        .withColumn("data", _payload(*property_cols))
    )
    acts = (
        binarized.join(
            subs.select(*substance_cols, inchi_col, "sid").distinct(),
            on=[*substance_cols, inchi_col],
        )
        .select(
            "sid", "pid", F.col(inchi_col).alias("inchi"), "value",
            F.col("medvalue").alias("numvalue"),
        )
        .withColumn("aid", group_id("sid", "pid", "inchi", "value"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts,
    )


@dataclass
class MetricThreshold:
    """Per-metric positive threshold (reference 10_integrate_bindingdb.R:80-88:
    EC50/IC50 < 100 nM positive; Kd/Ki < 10 nM positive)."""
    threshold: float
    positive_when_low: bool = True


def integrate_wide_measurements(
    df: DataFrame,
    substance_cols: list[str],
    property_cols: list[str],
    metric_cols: dict[str, MetricThreshold],
    inchi_col: str,
) -> StagingTables:
    """BindingDB shape (reference 10_integrate_bindingdb.R): melt wide metric
    columns -> strip >/< qualifiers -> cast -> per-metric threshold recode,
    carrying the raw measurement as ``numvalue`` (README.md:24)."""
    long = melt(
        df,
        ids=[*substance_cols, *property_cols],
        value_cols=list(metric_cols),
        var_name="metric",
        value_name="raw",
    )
    long = long.withColumn("numvalue", strip_qualifiers_to_double("raw")).where(
        F.col("numvalue").isNotNull()
    )
    value = None
    for m, spec in metric_cols.items():
        cmp = (
            F.col("numvalue") < spec.threshold
            if spec.positive_when_low
            else F.col("numvalue") > spec.threshold
        )
        cond_pos = (F.col("metric") == m) & cmp
        cond_neg = F.col("metric") == m
        if value is None:
            value = F.when(cond_pos, "positive").when(cond_neg, "negative")
        else:
            value = value.when(cond_pos, "positive").when(cond_neg, "negative")
    long = long.withColumn("value", value)

    subs = (
        long.select(*substance_cols)
        .distinct()
        .withColumn("data", _payload(*substance_cols))
        .withColumn("sid", F.md5(F.col("data")))
    )
    props = (
        long.select(*property_cols, "metric")
        .distinct()
        .withColumn("data", _payload(*property_cols, "metric"))
        .withColumn("pid", F.md5(F.col("data")))
    )
    acts = (
        long.join(subs.select(*substance_cols, "sid"), on=list(substance_cols))
        .join(props.select(*property_cols, "metric", "pid"),
              on=[*property_cols, "metric"])
        .select(
            "sid", "pid", F.col(inchi_col).alias("inchi"),
            "value", "metric", "numvalue",
        )
        # numvalue participates: replicate measurements (two Ki readings
        # mapping to the same label) must not collide to one aid — the
        # integrate_relational recipe
        .withColumn("aid",
                    group_id("sid", "pid", "inchi", "value", "metric",
                             "numvalue"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts,
    )


def fold_directional_outcomes(
    df: DataFrame,
    direction_col: str,
    positive_direction: str,
    negative_direction: str,
    out_col: str = "value",
) -> DataFrame:
    """CTD flip-to-negative pattern (reference 07_integrate_ctdbase.R:55-70):
    directional interaction pairs like 'increases^expression' /
    'decreases^expression' fold into ONE property with the opposing
    direction mapped to the negative label. The direction column is consumed
    (dropped) so both directions share a property key downstream."""
    return (
        df.withColumn(
            out_col,
            F.when(F.lower(F.col(direction_col)) == positive_direction.lower(),
                   "positive")
            .when(F.lower(F.col(direction_col)) == negative_direction.lower(),
                  "negative"),
        )
        .where(F.col(out_col).isNotNull())
        .drop(direction_col)
    )


@dataclass
class OutcomeConfig:
    """chembl/tox21/ctdbase shape config (reference 02/03/07)."""
    compound_cols: list[str]
    property_cols: list[str]
    outcome_col: str
    inchi_col: str
    recode_map: dict[str, str] = field(default_factory=dict)
    lowercase_outcome: bool = True
    drop_discordant: bool = True
    min_substances: int = 100
    class_floor: int = 50


def integrate_outcomes(df: DataFrame, cfg: OutcomeConfig) -> StagingTables:
    """Categorical-outcome shape: recode -> drop unmapped -> discordance
    removal per (substance, property) -> distinct-substance floor ->
    balanced-class floor (reference 02_integrate_chembl.R:42-62)."""
    df = df.withColumn(
        "value",
        recode(cfg.outcome_col, cfg.recode_map, lowercase=cfg.lowercase_outcome),
    ).where(F.col("value").isNotNull())
    df = df.withColumn("pid", content_id(*[F.col(c) for c in sorted(cfg.property_cols)]))
    df = df.withColumn("sid", content_id(*[F.col(c) for c in sorted(cfg.compound_cols)]))
    if cfg.drop_discordant:
        df = discordance_filter(df, ["sid", "pid"], "value")
    df = having_filter(
        df, ["pid"], F.countDistinct(*[F.col(c) for c in ["sid"]]) > cfg.min_substances
    )
    df = balanced_class_floor(df, ["pid"], "value", floor=cfg.class_floor)

    subs = (
        df.select(*cfg.compound_cols, "sid")
        .distinct()
        .withColumn("data", _payload(*cfg.compound_cols))
    )
    props = (
        df.select(*cfg.property_cols, "pid")
        .distinct()
        .withColumn("data", _payload(*cfg.property_cols))
    )
    acts = (
        df.select(
            "sid", "pid", F.col(cfg.inchi_col).alias("inchi"), "value"
        )
        .withColumn("aid", group_id("sid", "pid", "inchi", "value"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts,
    )


def integrate_relational(
    chemical: DataFrame,
    study: DataFrame,
    guideline: DataFrame,
    pod: DataFrame,
    pod_type: str = "noael",
) -> StagingTables:
    """ToxRefDB shape (reference 11_integrate_toxrefdb.R): a relational
    multi-table source — chemical ⋈ pod ⋈ study ⋈ guideline — where the
    label derives from point-of-departure dose levels: positive iff the
    effect dose is below the max tested dose (11:48-50); studies without a
    guideline number are dropped (11:34).

    Expected columns:
      chemical(chemical_id, dsstox_substance_id, casrn, preferred_name)
      study(study_id, guideline_id)
      guideline(guideline_id, guideline_number, name)
      pod(chemical_id, study_id, pod_type, dose_level, max_dose_level)
    """
    studies = (
        study.join(F.broadcast(guideline), on="guideline_id")
        .where(F.col("guideline_number").isNotNull())
        .select("study_id", "guideline_number", F.col("name").alias("guideline_name"))
    )
    labeled = (
        pod.where(F.lower(F.col("pod_type")) == pod_type)
        .join(size_gated_broadcast(studies), on="study_id")
        .withColumn(
            "value",
            F.when(F.col("dose_level") < F.col("max_dose_level"), "positive")
            .otherwise("negative"),
        )
        .join(size_gated_broadcast(chemical), on="chemical_id")
    )
    subs = (
        labeled.select("dsstox_substance_id", "casrn", "preferred_name")
        .distinct()
        .withColumn("data", _payload("dsstox_substance_id", "casrn", "preferred_name"))
        .withColumn("sid", F.md5(F.col("data")))
    )
    props = (
        labeled.select("guideline_number", "guideline_name")
        .distinct()
        .withColumn("data", _payload("guideline_number", "guideline_name"))
        .withColumn("pid", F.md5(F.col("data")))
    )
    acts = (
        labeled.join(
            subs.select("dsstox_substance_id", "casrn", "preferred_name", "sid"),
            on=["dsstox_substance_id", "casrn", "preferred_name"],
        )
        .join(props.select("guideline_number", "guideline_name", "pid"),
              on=["guideline_number", "guideline_name"])
        .select(
            "sid", "pid", F.lit(None).cast("string").alias("inchi"), "value",
            F.col("dose_level").cast("double").alias("numvalue"),
        )
        .withColumn("aid", group_id("sid", "pid", "value", "numvalue"))
        .distinct()
    )
    return StagingTables(
        substances=subs.select("sid", "data").distinct(),
        properties=props.select("pid", "data").distinct(),
        activities=acts,
    )
