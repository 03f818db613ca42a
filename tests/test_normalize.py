"""Normalizer: structural invariants + semantic equivalence.

The central property (the reference's "normalize equivalence"
harness, test_json_schema_test_suite.py:96-214, restated with our
evaluator): for every schema S and boundary candidate v,
validate(v, S) == validate(v, normalize(S))."""

from __future__ import annotations

import pytest

from fences_spark.fixtures import ORACLE_SPECS
from fences_spark.schema.evaluator import Evaluator
from fences_spark.schema.generate import generate_candidates
from fences_spark.schema.normalize import (
    NORM_FALSE,
    NormalizeError,
    check_normalized,
    contains_opaque,
    merge_options,
    normalize,
)


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
def test_equivalence_on_boundary_candidates(name):
    schema = ORACLE_SPECS[name]
    try:
        norm = normalize(schema)
    except NormalizeError:
        pytest.skip(f"{name}: normalizer declines (documented relaxation)")
    ev_orig = Evaluator(schema)
    ev_norm = Evaluator(norm)
    for v in generate_candidates(schema):
        assert ev_orig.validate(v) == ev_norm.validate(v), (
            name, v, norm,
        )


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
def test_structural_invariants(name):
    if contains_opaque(ORACLE_SPECS[name]):
        # unevaluated*/content* schemas pass through normalization as
        # one opaque option (DNF restructuring is not annotation-safe)
        # — structural flatness intentionally does not apply
        pytest.skip("opaque schema: normalizer passes it through intact")
    try:
        norm = normalize(ORACLE_SPECS[name])
    except NormalizeError:
        pytest.skip("normalizer declines")
    assert check_normalized(norm) == []
    # normalizer-created defs (recursion points) are themselves
    # normalized; carried-over original defs are raw by design
    for key, d in norm.get("$defs", {}).items():
        if key.startswith("d") and len(key) == 17:
            assert check_normalized(d) == []


def test_bool_schemas():
    assert normalize(True) == {"anyOf": [{}]}
    assert normalize(False) == NORM_FALSE
    assert normalize({"allOf": [True, False]})["anyOf"] == []


def test_const_becomes_enum():
    n = normalize({"const": 5})
    assert n["anyOf"] == [{"enum": [5]}]


def test_integer_lattice():
    n = normalize({"type": "integer"})
    (opt,) = n["anyOf"]
    assert opt["type"] == ["number"]
    assert opt["multipleOf"] == 1


def test_merge_bounds():
    m = merge_options({"minimum": 3, "maximum": 10}, {"minimum": 5, "maximum": 8})
    assert m["minimum"] == 5 and m["maximum"] == 8


def test_merge_multiple_of_lcm():
    assert merge_options({"multipleOf": 4}, {"multipleOf": 6})["multipleOf"] == 12
    assert merge_options({"multipleOf": 0.2}, {"multipleOf": 0.3})["multipleOf"] == pytest.approx(0.6)


def test_merge_pattern_conjunction():
    m = merge_options({"pattern": "^a"}, {"pattern": "b$"})
    assert m["pattern"] == "(^a)&(b$)"


def test_merge_enum_intersection():
    m = merge_options({"enum": [1, 2, 3]}, {"enum": [2, 3, 4]})
    assert m["enum"] == [2, 3]


def test_merge_type_intersection():
    m = merge_options({"type": ["string", "number"]}, {"type": ["number", "null"]})
    assert m["type"] == ["number"]


def test_merge_required_union():
    m = merge_options({"required": ["a"]}, {"required": ["b"]})
    assert m["required"] == ["a", "b"]


def test_merge_properties_with_additional():
    a = {"properties": {"x": {"type": "number"}}, "additionalProperties": {"type": "string"}}
    b = {"properties": {"y": {"minLength": 2}}}
    m = merge_options(a, b)
    assert set(m["properties"]) == {"x", "y"}
    # y absent from a → folded with a's additionalProperties
    y = m["properties"]["y"]
    assert y == {"allOf": [{"type": "string"}, {"minLength": 2}]}


def test_not_elimination_produces_flat_options():
    n = normalize({"not": {"type": "string", "minLength": 3}})
    assert check_normalized(n) == []
    ev = Evaluator(n)
    assert ev.validate(5)  # not a string → passes
    assert ev.validate("ab")  # too short → ¬(minLength 3) holds
    assert not ev.validate("abcd")


def test_oneof_expansion():
    n = normalize({"type": "number", "oneOf": [{"multipleOf": 3}, {"multipleOf": 5}]})
    ev = Evaluator(n)
    assert ev.validate(9) and ev.validate(10)
    assert not ev.validate(15) and not ev.validate(7)


def test_recursive_ref_survives():
    schema = {"type": ["array", "number"], "items": {"$ref": "#"}}
    n = normalize(schema)
    assert "$defs" in n or check_normalized(n) == []
    ev = Evaluator(n)
    assert ev.validate([1, [2, [3]]])
    assert not ev.validate([1, ["x"]])


def test_root_id_uri_form_refs_survive_normalize():
    """ADVICE r3: a root-level $id with refs spelled in absolute-URI
    form (``http://x/root.json#/...``) must keep the documented
    invariant validate(v, S) == validate(v, normalize(S)) — DNF output
    drops $id, so such refs are canonicalized to fragment form."""
    from fences_spark.schema.evaluator import Evaluator, validate

    cases = [
        # pointer ref outside $defs (forces relocation)
        {
            "$id": "http://x/root.json",
            "type": "object",
            "properties": {
                "a": {"$ref": "http://x/root.json#/properties/b"},
                "b": {"type": "integer"},
            },
        },
        # relative-URI spelling of the same base, $defs pointer
        {
            "$id": "http://x/root.json",
            "properties": {"a": {"$ref": "root.json#/$defs/pos"}},
            "$defs": {"pos": {"type": "number", "exclusiveMinimum": 0}},
        },
        # URI-form root self-ref (recursive)
        {
            "$id": "http://x/root.json",
            "type": ["object", "integer"],
            "properties": {"a": {"$ref": "http://x/root.json#"}},
        },
    ]
    values = [
        {"a": 1, "b": 2}, {"a": "s", "b": 2}, {"a": 1.5}, {"a": -1},
        {"a": 3}, {"a": {"a": 5}}, {"a": {"a": "x"}}, 7, "nope",
    ]
    for s in cases:
        n = normalize(s)
        ev = Evaluator(n)
        for v in values:
            assert ev.validate(v) == validate(v, s), (s, v)
