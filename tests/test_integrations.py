"""Integration-pipeline tests over FIXTURES.md F2/F4/F5/F6 shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from chemharmony_spark.plans.integrations import (
    MetricThreshold,
    OutcomeConfig,
    integrate_measurements,
    integrate_outcomes,
    integrate_wide_labels,
    integrate_wide_measurements,
)
from chemharmony_spark.plans.qa import (
    check_binary_consistency,
    check_referential_integrity,
    check_unique,
    check_values_in,
    run_checks,
)


def _check_contract(res):
    assert res.substances.columns == ["sid", "data"]
    assert res.properties.columns == ["pid", "data"]
    for c in ("aid", "sid", "pid", "inchi", "value"):
        assert c in res.activities.columns
    run_checks(
        check_unique(res.substances, "sid"),
        check_unique(res.properties, "pid"),
        check_values_in(res.activities, "value"),
        check_referential_integrity(res.activities, res.substances, "sid"),
        check_referential_integrity(res.activities, res.properties, "pid"),
    )


def test_wide_labels_moleculenet_shape(spark):
    df = spark.createDataFrame(
        [
            ("c1", "CCO", 1, 0),
            ("c2", "CCN", 0, None),
            ("c3", None, 1, 1),  # null smiles dropped
            ("c4", "CCC", None, 1),
        ],
        "cid string, smiles string, tox int, bbb int",
    )
    res = integrate_wide_labels(
        df, smiles_col="smiles", label_cols=["tox", "bbb"],
        property_meta={"tox": {"desc": "toxicity"}, "bbb": {"desc": "barrier"}},
    )
    _check_contract(res)
    assert res.substances.count() == 3
    assert res.properties.count() == 2
    acts = res.activities.collect()
    # c1: tox=1 -> positive, bbb=0 -> negative; null labels dropped by melt
    assert len(acts) == 2 + 1 + 1
    # determinism across runs
    res2 = integrate_wide_labels(
        df, smiles_col="smiles", label_cols=["tox", "bbb"],
        property_meta={"tox": {"desc": "toxicity"}, "bbb": {"desc": "barrier"}},
    )
    assert sorted(map(tuple, acts)) == sorted(map(tuple, res2.activities.collect()))


def test_measurements_median_binarization(spark):
    rows = []
    # one property group with 6 substances straddling the median (>5 floor)
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]):
        rows += [(f"s{i}", f"InChI=1S/X{i}", "LD50", "rat", v)]
    rows += [("s0", "InChI=1S/X0", "LD50", "rat", 1.0)]  # replicate
    df = spark.createDataFrame(
        rows, "dtxsid string, inchi string, assay string, species string, v double"
    )
    res = integrate_measurements(
        df, substance_cols=["dtxsid"], property_cols=["assay", "species"],
        value_col="v", inchi_col="inchi", min_group_size=5,
    )
    _check_contract(res)
    acts = {r.inchi: r.value for r in res.activities.collect()}
    # median of per-substance medians = 3.5; lower half positive
    assert acts["InChI=1S/X0"] == "positive" and acts["InChI=1S/X5"] == "negative"
    run_checks(check_binary_consistency(
        res.activities.withColumn(
            "binary_value", F.when(F.col("value") == "positive", 1).otherwise(0))
    ))


def test_wide_measurements_bindingdb_shape(spark):
    df = spark.createDataFrame(
        [
            ("InChI=1S/A", "T1", "5", None),
            ("InChI=1S/B", "T1", ">500", "50"),
            ("InChI=1S/C", "T2", None, "<2"),
        ],
        "inchi string, target string, ki string, ic50 string",
    )
    res = integrate_wide_measurements(
        df, substance_cols=["inchi"], property_cols=["target"],
        metric_cols={"ki": MetricThreshold(10.0), "ic50": MetricThreshold(100.0)},
        inchi_col="inchi",
    )
    _check_contract(res)
    got = {(r.inchi, r.metric): (r.value, r.numvalue) for r in res.activities.collect()}
    assert got[("InChI=1S/A", "ki")] == ("positive", 5.0)
    assert got[("InChI=1S/B", "ki")] == ("negative", 500.0)  # qualifier stripped
    assert got[("InChI=1S/B", "ic50")] == ("positive", 50.0)
    assert got[("InChI=1S/C", "ic50")] == ("positive", 2.0)


def test_outcomes_discordance_and_floors(spark):
    rows = []
    # assay A: 12 substances, clean outcomes, balanced classes
    for i in range(6):
        rows += [(f"c{i}", "InChI=1S/P%d" % i, "assayA", "Active")]
        rows += [(f"d{i}", "InChI=1S/Q%d" % i, "assayA", "inactive")]
    # discordant substance in assayA
    rows += [("c0", "InChI=1S/P0", "assayA", "inactive")]
    # assay B: below the substance floor
    rows += [("c0", "InChI=1S/P0", "assayB", "Active")]
    df = spark.createDataFrame(rows, "cmp string, inchi string, assay string, outcome string")
    cfg = OutcomeConfig(
        compound_cols=["cmp", "inchi"], property_cols=["assay"],
        outcome_col="outcome", inchi_col="inchi",
        recode_map={"active": "positive", "inactive": "negative"},
        min_substances=5, class_floor=4,
    )
    res = integrate_outcomes(df, cfg)
    _check_contract(res)
    acts = res.activities.collect()
    srcs = {r.inchi for r in acts}
    assert "InChI=1S/P0" not in srcs  # discordant dropped
    assert all("assayB" not in r.pid for r in acts)  # under-floor assay gone
    assert len(acts) == 11  # 12 clean minus the discordant c0


def test_enrichment_cache_and_anti_join(spark, tmp_path):
    from chemharmony_spark.plans.enrichment import (
        assign_categories,
        assign_titles,
        big_properties,
    )

    props = spark.createDataFrame(
        [("p1", '{"assay":"a1","endpoint":"e1"}'), ("p2", '{"assay":"a2","endpoint":"e2"}')],
        "pid string, data string",
    )
    cache = str(tmp_path / "cat_cache")
    r1 = assign_categories(spark, props, cache)
    assert r1.n_model_calls == 2
    out1 = sorted(map(tuple, r1.table.collect()))
    # second run: all hits, no model calls, same output
    r2 = assign_categories(spark, props, cache)
    assert r2.n_model_calls == 0
    assert sorted(map(tuple, r2.table.collect())) == out1

    tcache = str(tmp_path / "title_cache")
    t1 = assign_titles(spark, props, tcache)
    titles = [r.title for r in t1.table.collect()]
    assert len(titles) == len(set(titles)) == 2
    t2 = assign_titles(spark, props, tcache)
    assert t2.n_model_calls == 0

    # big-pid filter: two-level agg semantics
    acts = spark.createDataFrame(
        [("p1", 1)] * 3 + [("p1", 0)] * 3 + [("p2", 1)] * 5,
        "pid string, binary_value int",
    )
    big = big_properties(acts, min_per_class=3)
    assert [r.pid for r in big.collect()] == ["p1"]


def test_pipeline_runner_order_and_filtering():
    from chemharmony_spark.plans.runner import Pipeline

    p = Pipeline()
    calls = []

    @p.stage("a")
    def a():
        calls.append("a")
        return 1

    @p.stage("b", deps=["a"])
    def b(a):
        calls.append("b")
        return a + 1

    @p.stage("c", deps=["a"])
    def c(a):
        calls.append("c")
        return a + 10

    @p.stage("d", deps=["b", "c"])
    def d(b, c):
        calls.append("d")
        return b + c

    res = p.run()
    assert res["d"] == 13 and calls.index("a") == 0 and calls.index("d") == 3
    calls.clear()
    res = p.run(only=["b"])
    assert set(calls) == {"a", "b"} and res["b"] == 2


def test_long_keyvalue_pubchem_shape(spark):
    from chemharmony_spark.plans.integrations import integrate_long_keyvalue

    compounds = spark.createDataFrame(
        [
            (1, "INCHI", "InChI=1S/AA"),
            (2, "INCHI", "InChI=1S/BB"),
            (2, "OTHER", "x"),
            (3, "INCHI", "InChI=1S/CC1"),
            (3, "INCHI", "InChI=1S/CC2"),  # conflicting inchi -> cid dropped
        ],
        "id long, property string, value string",
    )
    outcomes = spark.createDataFrame(
        [
            (1, 100, "Active"),
            (2, 100, "Inactive"),
            (2, 200, "Inconclusive"),  # unmapped -> dropped
            (3, 100, "Active"),  # cid 3 dropped upstream
        ],
        "cid long, assay long, outcome string",
    )
    properties = spark.createDataFrame(
        [(100, "CYP inhibition", "conc"), (200, "hERG", "binary")],
        "assay long, name string, kind string",
    )
    res = integrate_long_keyvalue(
        compounds.withColumnRenamed("id", "cid"),
        outcomes,
        properties,
        compound_key="cid",
        inchi_property="INCHI",
        outcome_compound_key="cid",
        outcome_property_key="assay",
        property_key="assay",
        property_meta_cols=["name", "kind"],
        value_col="outcome",
        value_map={"Active": "positive", "Inactive": "negative"},
    )
    _check_contract(res)
    acts = res.activities.collect()
    got = {(r.inchi, r.value) for r in acts}
    assert got == {("InChI=1S/AA", "positive"), ("InChI=1S/BB", "negative")}
    assert res.properties.count() == 2  # property dim keeps both assays


def test_relational_toxrefdb_shape(spark):
    from chemharmony_spark.plans.integrations import integrate_relational

    chemical = spark.createDataFrame(
        [(1, "DTX1", "50-00-0", "formaldehyde"), (2, "DTX2", "50-78-2", "aspirin")],
        "chemical_id long, dsstox_substance_id string, casrn string, preferred_name string",
    )
    study = spark.createDataFrame(
        [(10, 100), (11, 101), (12, 102)], "study_id long, guideline_id long"
    )
    guideline = spark.createDataFrame(
        [(100, "OECD-408", "subchronic"), (101, None, "orphan"), (102, "OECD-414", "devtox")],
        "guideline_id long, guideline_number string, name string",
    )
    pod = spark.createDataFrame(
        [
            (1, 10, "noael", 2, 4),   # effect below max dose -> positive
            (2, 10, "noael", 4, 4),   # at max dose -> negative
            (1, 11, "noael", 1, 4),   # guideline_number null -> dropped
            (2, 12, "noael", 1, 3),   # positive on devtox
            (1, 12, "loael", 1, 3),   # wrong pod_type -> dropped
        ],
        "chemical_id long, study_id long, pod_type string, dose_level int, max_dose_level int",
    )
    res = integrate_relational(chemical, study, guideline, pod)
    _check_contract(res)
    acts = res.activities.collect()
    assert len(acts) == 3
    by_num = {(r.numvalue, r.value) for r in acts}
    assert (2.0, "positive") in by_num and (4.0, "negative") in by_num
    assert res.properties.count() == 2  # two guidelines with numbers


def test_cached_lookup_rate_limited_fetch(spark, tmp_path):
    from chemharmony_spark.plans.lookup import cached_lookup

    calls = []

    def fetch(k):
        calls.append(k)
        return f"cid-{k}"

    keys = spark.createDataFrame([("50-00-0",), ("50-78-2",), (None,)], "key string")
    cache = str(tmp_path / "pug_cache")
    m1 = cached_lookup(spark, keys, cache, fetch)
    assert sorted(r.key for r in m1.collect()) == ["50-00-0", "50-78-2"]
    assert sorted(calls) == ["50-00-0", "50-78-2"]
    calls.clear()
    m2 = cached_lookup(spark, keys, cache, fetch)
    assert calls == []  # all cache hits
    assert sorted((r.key, r.value) for r in m2.collect()) == [
        ("50-00-0", "cid-50-00-0"), ("50-78-2", "cid-50-78-2")]


def test_directional_fold(spark):
    from chemharmony_spark.plans.integrations import fold_directional_outcomes

    df = spark.createDataFrame(
        [
            ("c1", "expression", "increases"),
            ("c2", "expression", "decreases"),
            ("c3", "expression", "affects"),  # unmapped -> dropped
        ],
        "cmp string, interaction string, direction string",
    )
    out = fold_directional_outcomes(df, "direction", "increases", "decreases")
    got = {(r.cmp, r.interaction): r.value for r in out.collect()}
    assert got == {("c1", "expression"): "positive",
                   ("c2", "expression"): "negative"}
    assert "direction" not in out.columns  # both directions share a property


def test_incremental_runner_skips_unchanged(tmp_path):
    from chemharmony_spark.plans.runner import Pipeline

    src = tmp_path / "in.txt"
    out = tmp_path / "out.txt"
    src.write_text("v1")
    calls = []

    def build_pipeline():
        p = Pipeline(state_path=str(tmp_path / "state.json"))

        @p.stage("build", inputs=[str(src)], outputs=[str(out)])
        def build():
            calls.append("build")
            out.write_text(src.read_text().upper())
            return str(out)

        return p

    build_pipeline().run()
    assert calls == ["build"] and out.read_text() == "V1"
    build_pipeline().run()
    assert calls == ["build"]  # unchanged input + existing output -> skipped
    import os
    os.utime(src, (1, 1))  # touch -> fingerprint changes
    build_pipeline().run()
    assert calls == ["build", "build"]


def test_enrichment_qa_checks(spark):
    from chemharmony_spark.plans.qa import check_category_coverage, check_titles_unique

    cats = spark.createDataFrame(
        [(f"p{i}", f"cat{i % 2}", "r", 5.0) for i in range(20)],
        "pid string, category string, reason string, strength double",
    )
    assert check_category_coverage(cats, min_categories=2,
                                   min_props_per_category=10).ok
    assert not check_category_coverage(cats, min_categories=3,
                                       min_props_per_category=10).ok
    titles = spark.createDataFrame(
        [("p1", "t1", "{}"), ("p2", "t2", "{}")],
        "pid string, title string, prop_json_data string",
    )
    assert check_titles_unique(titles).ok
    bad = titles.union(spark.createDataFrame([("p3", "t1", "{}")], titles.schema))
    assert not check_titles_unique(bad).ok


def test_cache_reads_distinguish_missing_from_broken(spark, tmp_path):
    """VERDICT r4 task 2: a MISSING cache path is the legitimate first
    run (empty-cache behavior); a BROKEN cache (corrupt file where the
    path exists) must RAISE, not silently re-fetch the whole corpus —
    re-billing a ~52k-entry LLM cache on a transient IO error is the
    production failure this guards."""
    import pytest

    from chemharmony_spark.plans.enrichment import assign_categories, assign_titles
    from chemharmony_spark.plans.labeler import magentic_labels
    from chemharmony_spark.plans.lookup import cached_lookup
    from chemharmony_spark.sources.readers import read_parquet_cache_if_exists

    # missing -> None (no exception), all four consumers take the
    # first-run path (exercised by test_enrichment_cache_and_anti_join)
    assert read_parquet_cache_if_exists(spark, str(tmp_path / "nope")) is None

    # a crashed FIRST write leaves the dir with only _temporary/_SUCCESS
    # droppings — still 'no cache yet', NOT a permanent wedge on
    # 'Unable to infer schema'
    wreck = tmp_path / "wrecked_cache"
    (wreck / "_temporary" / "0").mkdir(parents=True)
    (wreck / "_SUCCESS").write_bytes(b"")
    assert read_parquet_cache_if_exists(spark, str(wreck)) is None

    # corrupt-on-disk -> raise from every consumer
    broken = tmp_path / "broken_cache"
    broken.mkdir()
    (broken / "part-00000.parquet").write_bytes(b"this is not parquet")
    props = spark.createDataFrame(
        [("p1", '{"assay":"a1"}')], "pid string, data string"
    )
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        read_parquet_cache_if_exists(spark, str(broken)).collect()
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        assign_categories(spark, props, str(broken))
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        assign_titles(spark, props, str(broken))
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        magentic_labels(spark, props, str(broken))
    keys = spark.createDataFrame([("k1",)], "key string")
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        cached_lookup(spark, keys, str(broken), fetch=lambda k: "v")


def test_wide_labels_no_fanout_on_shared_inchi(spark):
    """r5 review repro: two substance rows with the same SMILES (hence
    same stub InChI) but different meta produce two sids; the old
    join-back on inchi alone cross-attributed the label to BOTH sids per
    row (3 activities from 2 rows). Row-level sid attachment keeps
    exactly one activity per (row, label), each under its own sid."""
    df = spark.createDataFrame(
        [("CCO", "ethanol", 1), ("CCO", "alcohol", 1)],
        "smiles string, name string, tox int",
    )
    res = integrate_wide_labels(
        df, smiles_col="smiles", label_cols=["tox"],
        substance_meta=["name"],
    )
    acts = res.activities.collect()
    assert res.substances.count() == 2
    assert len(acts) == 2
    assert len({r.sid for r in acts}) == 2  # one activity per substance
    # junk label cells are dropped, not silently positive
    junk = spark.createDataFrame(
        [("CCO", "NA"), ("CCN", "1"), ("CCC", "")],
        "smiles string, tox string",
    )
    jres = integrate_wide_labels(junk, smiles_col="smiles", label_cols=["tox"])
    jacts = jres.activities.collect()
    assert len(jacts) == 1 and jacts[0].value == "positive"
