"""D8 magentic labeler: similarity-uniqueness invariant, conflict
differentiation, cache semantics, and the banded driver Levenshtein."""

from __future__ import annotations

import itertools
import json

import pytest

from chemharmony_spark.plans.labeler import (
    MIN_DISTANCE,
    fake_label_client,
    levenshtein_lt,
    magentic_labels,
)


def _props(spark, n=12):
    rows = [
        (f"p{i:03d}", json.dumps({"assay": f"assay-{i}", "species": "rat"}))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "pid string, data string")


def _levenshtein_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_banded_levenshtein_matches_full_dp():
    words = ["label", "lable", "labels", "tag", "tags", "", "a", "ab",
             "assay nr ahr 12ab", "assay nr ahr 12ac", "completely different"]
    for a in words:
        for b in words:
            for cap in (1, 2, 3, 5):
                assert levenshtein_lt(a, b, cap) == (_levenshtein_ref(a, b) < cap), (a, b, cap)


def test_labels_pairwise_distance_invariant(spark, tmp_path):
    cache = str(tmp_path / "labels.parquet")
    res = magentic_labels(spark, _props(spark), cache)
    rows = {r.pid: r.label for r in res.table.collect()}
    assert len(rows) == 12
    for a, b in itertools.combinations(rows.values(), 2):
        assert _levenshtein_ref(a, b) >= MIN_DISTANCE, (a, b)
    # descriptions present and non-empty
    assert all(r.description for r in res.table.collect())


def test_conflicts_are_differentiated(spark, tmp_path):
    # client that proposes the SAME label for every property -> every row
    # after the first must go through the differentiation loop
    res = magentic_labels(
        spark,
        _props(spark, n=5),
        str(tmp_path / "labels.parquet"),
        label_client=lambda data: "identical label",
    )
    labels = [r.label for r in res.table.collect()]
    assert len(set(labels)) == 5
    for a, b in itertools.combinations(labels, 2):
        assert _levenshtein_ref(a, b) >= MIN_DISTANCE, (a, b)
    assert res.n_differentiation_calls >= 4


def test_cache_hits_skip_model_and_respect_existing(spark, tmp_path):
    cache = str(tmp_path / "labels.parquet")
    props = _props(spark, n=6)
    r1 = magentic_labels(spark, props, cache)
    assert r1.n_model_calls == 12  # label + description per property

    # second run over the same properties: all cached, zero calls
    r2 = magentic_labels(spark, props, cache)
    assert r2.n_model_calls == 0
    assert r2.n_cache_hits == 6
    assert sorted(map(tuple, r1.table.collect())) == \
        sorted(map(tuple, r2.table.collect()))

    # a new property whose proposal collides with a CACHED label must be
    # differentiated against the cache, not just the batch
    taken = {r.pid: r.label for r in r1.table.collect()}["p000"]
    r3 = magentic_labels(
        spark,
        spark.createDataFrame(
            [("p_new", json.dumps({"assay": "fresh"}))], "pid string, data string"
        ),
        cache,
        label_client=lambda data: taken,
    )
    new_label = {r.pid: r.label for r in r3.table.collect()}["p_new"]
    assert _levenshtein_ref(new_label, taken) >= MIN_DISTANCE
    all_labels = [r.label for r in r3.table.unionByName(r1.table).collect()]
    assert len(all_labels) == 7


def test_fake_client_is_deterministic():
    d = json.dumps({"assay": "x"})
    assert fake_label_client(d) == fake_label_client(d)
    assert len(fake_label_client(d)) <= 200
