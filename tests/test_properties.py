"""Property-based tests (hypothesis) for the engine's determinism-critical
pieces: JSON canonicalization, content ids, text normalization."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from chemharmony_spark.functions.json_payload import canonicalize_json_str

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.text(max_size=8), json_values, max_size=5))
def test_canonicalize_idempotent(payload):
    s = json.dumps(payload)
    once = canonicalize_json_str(s)
    twice = canonicalize_json_str(once)
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=8), json_scalars,
                       min_size=1, max_size=5))
def test_canonicalize_key_order_invariant(payload):
    items = list(payload.items())
    a = json.dumps(dict(items))
    b = json.dumps(dict(reversed(items)))
    assert canonicalize_json_str(a) == canonicalize_json_str(b)


@settings(max_examples=100, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_canonicalize_rounds_floats(x):
    out = canonicalize_json_str(json.dumps({"v": x}))
    parsed = json.loads(out)
    if "v" in parsed:
        assert parsed["v"] == round(x, 4)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=6),
                       st.one_of(st.none(), st.just(""), st.just([])),
                       min_size=1, max_size=4))
def test_canonicalize_drops_empties(payload):
    out = canonicalize_json_str(json.dumps(payload))
    assert json.loads(out) == {}


def test_canonicalize_passthrough_on_invalid_json():
    assert canonicalize_json_str("not json {") == "not json {"
    assert canonicalize_json_str(None) is None
