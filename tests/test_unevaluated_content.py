"""unevaluatedProperties / unevaluatedItems annotation semantics and
the asserted content* keywords.

The reference parses these keywords but never generates for them
(fences/json_schema/parse.py:244-250,304-306) and blacklists them in
its suite runs (test/json_schema/test_json_schema_test_suite.py:249-254).
Our evaluator asserts full draft-2020-12 semantics for unevaluated*
(annotation visibility arbitrated by ``jsonschema``, the reference's
own oracle) and asserts content* as a dialect choice (SURVEY.md §2.A:
unbase64 round-trip predicate).  These tests pin the visibility rules
the fuzz suites then stress at random.
"""

from __future__ import annotations

import base64
import json

import jsonschema
import pytest

from fences_spark.fixtures import DIALECT_ONLY, ORACLE_SPECS
from fences_spark.schema.evaluator import validate
from fences_spark.schema.normalize import contains_opaque, normalize

FORMAT_CHECKER = jsonschema.Draft202012Validator.FORMAT_CHECKER


def _agree(schema, value):
    ours = validate(value, schema)
    theirs = jsonschema.Draft202012Validator(
        schema, format_checker=FORMAT_CHECKER
    ).is_valid(value)
    assert ours == theirs, (schema, value, ours, theirs)
    return ours


# ---- annotation visibility (each case pins one spec rule) ----------


def test_cousin_properties_are_visible():
    s = {"properties": {"a": True}, "unevaluatedProperties": False}
    assert _agree(s, {"a": 1}) is True
    assert _agree(s, {"a": 1, "b": 2}) is False


def test_inplace_allof_annotations_are_visible():
    s = {"allOf": [{"properties": {"a": {"type": "number"}}}],
         "unevaluatedProperties": False}
    assert _agree(s, {"a": 1}) is True
    assert _agree(s, {"b": 1}) is False


def test_sibling_branch_annotations_are_not_visible():
    # unevaluatedProperties inside ONE allOf branch cannot see the
    # other branch's properties
    s = {"allOf": [{"properties": {"a": True}}, {"unevaluatedProperties": False}]}
    assert _agree(s, {"a": 1}) is False
    assert _agree(s, {}) is True


def test_failed_anyof_branch_contributes_nothing():
    s = {
        "anyOf": [
            {"required": ["a"], "properties": {"a": True}},
            {"required": ["b"], "properties": {"b": True}},
        ],
        "unevaluatedProperties": False,
    }
    assert _agree(s, {"a": 1}) is True
    assert _agree(s, {"b": 1}) is True
    assert _agree(s, {"a": 1, "b": 2}) is True   # both branches succeed
    assert _agree(s, {"a": 1, "c": 2}) is False  # c never evaluated


def test_only_taken_ite_arm_contributes():
    s = {
        "properties": {"a": True},
        "if": {"required": ["a"]},
        "then": {"properties": {"b": True}},
        "else": {"properties": {"c": True}},
        "unevaluatedProperties": False,
    }
    assert _agree(s, {"a": 1, "b": 2}) is True   # then-arm evaluated b
    assert _agree(s, {"c": 3}) is True           # else-arm evaluated c
    assert _agree(s, {"b": 2}) is False          # then-arm not taken
    assert _agree(s, {"a": 1, "c": 3}) is False  # else-arm not taken


def test_ref_annotations_are_visible():
    s = {
        "$defs": {"base": {"properties": {"x": {"type": "integer"}}}},
        "$ref": "#/$defs/base",
        "unevaluatedProperties": False,
    }
    assert _agree(s, {"x": 1}) is True
    assert _agree(s, {"x": 1, "y": 2}) is False


def test_dependent_schemas_annotations_are_visible():
    s = {
        "dependentSchemas": {"t": {"properties": {"extra": True}}},
        "properties": {"t": True},
        "unevaluatedProperties": False,
    }
    assert _agree(s, {"t": 1, "extra": 2}) is True
    assert _agree(s, {"extra": 2}) is False  # dependent schema not triggered


def test_property_names_evaluates_nothing():
    s = {"propertyNames": {"maxLength": 10}, "unevaluatedProperties": False}
    assert _agree(s, {}) is True
    assert _agree(s, {"short": 1}) is False


def test_unevaluated_properties_schema_form():
    s = {"properties": {"name": {"type": "string"}},
         "unevaluatedProperties": {"type": "integer"}}
    assert _agree(s, {"name": "n", "count": 3}) is True
    assert _agree(s, {"name": "n", "count": 3.5}) is False


def test_items_prefix_contains_mark_items_evaluated():
    s1 = {"prefixItems": [{"type": "string"}], "unevaluatedItems": False}
    assert _agree(s1, ["a"]) is True
    assert _agree(s1, ["a", 1]) is False
    s2 = {"contains": {"type": "number"}, "unevaluatedItems": False}
    assert _agree(s2, [1, 2]) is True
    assert _agree(s2, [1, "x"]) is False
    s3 = {"prefixItems": [{"type": "number"}], "items": {"type": "string"},
          "unevaluatedItems": False}
    assert _agree(s3, [1, "a", "b"]) is True  # items evaluated the tail


def test_unevaluated_items_schema_form():
    s = {"prefixItems": [{"type": "number"}], "unevaluatedItems": {"type": "string"}}
    assert _agree(s, [1, "a"]) is True
    assert _agree(s, [1, 2]) is False


# ---- content* assertions (dialect-only: no jsonschema arbitration) --


B64_OK = base64.b64encode(json.dumps({"k": 1}).encode()).decode()
B64_BAD_DOC = base64.b64encode(json.dumps({"j": 1}).encode()).decode()
B64_NOT_JSON = base64.b64encode(b"hello").decode()
B64_BINARY = base64.b64encode(b"\xff\xfe\x00").decode()


def test_content_encoding_base64():
    s = ORACLE_SPECS["content_b64"]
    assert validate(B64_OK, s) is True
    assert validate(B64_BINARY, s) is True      # decodes, no media check
    assert validate("!!!not-base64!!!", s) is False
    assert validate("aGVsbG8", s) is False      # bad padding
    assert validate(7, s) is False              # type: string


def test_content_schema_round_trip():
    s = ORACLE_SPECS["content_b64_json"]
    assert validate(B64_OK, s) is True
    assert validate(B64_BAD_DOC, s) is False    # contentSchema fails
    assert validate(B64_NOT_JSON, s) is False   # not JSON
    assert validate(B64_BINARY, s) is False     # not UTF-8 text
    assert validate("!!!", s) is False


def test_content_media_type_without_encoding():
    s = {"type": "string", "contentMediaType": "application/json"}
    assert validate('{"a": 1}', s) is True
    assert validate("not json", s) is False


def test_unknown_encoding_and_media_type_assert_nothing():
    assert validate("anything", {"type": "string", "contentEncoding": "7bit"}) is True
    assert validate("anything", {"type": "string", "contentMediaType": "text/html"}) is True


# ---- compile-time lowering (unevaluated* → additionalProperties/items)


def test_lowering_equivalences_vs_jsonschema():
    """Applicator-free unevaluated* is exactly additionalProperties /
    post-prefix items — the soundness claim behind lower_unevaluated."""
    from fences_spark.compiler import lower_unevaluated

    cases = [
        {"properties": {"a": {"type": "number"}}, "unevaluatedProperties": False},
        {"properties": {"n": {"type": "string"}},
         "patternProperties": {"^s_": {"type": "string"}},
         "unevaluatedProperties": {"type": "integer"}},
        {"prefixItems": [{"type": "string"}], "unevaluatedItems": False},
        {"prefixItems": [{"type": "number"}], "unevaluatedItems": {"type": "string"}},
        {"properties": {"a": True}, "additionalProperties": {"type": "number"},
         "unevaluatedProperties": False},
        {"prefixItems": [{"type": "number"}], "items": {"type": "string"},
         "unevaluatedItems": False},
        {"required": ["a"], "propertyNames": {"maxLength": 3},
         "unevaluatedProperties": {"type": "integer"}},
        {"items": {"type": "object", "properties": {"v": True},
                   "unevaluatedProperties": False}},
    ]
    values = [{}, {"a": 1}, {"a": "s"}, {"a": 1, "b": 2}, {"a": 1, "b": "x"},
              {"s_k": "v"}, {"s_k": 1}, {"n": "x", "z": 3}, {"n": "x", "z": 3.5},
              {"abc": 1}, {"abcd": 1}, [], ["a"], ["a", 1], [1], [1, "a"],
              [1, 2], [1, "a", "b"], [{"v": 1}], [{"v": 1, "w": 2}],
              "str", 5, None, True]
    for s in cases:
        low = lower_unevaluated(s)
        assert "unevaluatedProperties" not in json.dumps(low)
        jv = jsonschema.Draft202012Validator(s)
        for v in values:
            assert validate(v, low) == jv.is_valid(v), (s, low, v)


def test_lowering_bails_on_inplace_applicators():
    from fences_spark.compiler import CompileError, lower_unevaluated

    for s in [
        {"allOf": [{"properties": {"a": True}}], "unevaluatedProperties": False},
        {"$ref": "#/x", "unevaluatedProperties": False},
        {"if": {"required": ["a"]}, "unevaluatedProperties": False},
        {"contains": {"type": "number"}, "unevaluatedItems": False},
        {"dependentSchemas": {"t": True}, "unevaluatedProperties": False},
    ]:
        with pytest.raises(CompileError):
            lower_unevaluated(s)
    # literal-value keywords keep dict literals untouched
    weird = {"const": {"unevaluatedProperties": 1}}
    assert lower_unevaluated(weird) == weird


def test_lowered_fixtures_route_to_builtin_tier(spark):
    """The applicator-free unevaluated* fixtures compile JVM-side; the
    annotation-needing ones stay on the Arrow evaluator."""
    from pyspark.sql import functions as F

    from fences_spark.compiler.jsonvalue import compile_json

    expect = {
        "uneval_props": "variant",
        "uneval_props_schema": "variant",
        "uneval_items": "variant",
        "uneval_items_schema": "variant",
        "uneval_props_allof": "arrow_udf",
        "uneval_props_ite": "arrow_udf",
        "uneval_items_contains": "arrow_udf",
    }
    for name, want in expect.items():
        _, tier = compile_json(ORACLE_SPECS[name], F.col("cell"))
        assert tier == want, (name, tier, want)


# ---- normalizer opacity --------------------------------------------


def test_opaque_schemas_pass_through_normalization():
    for name in ("uneval_props_allof", "content_b64_json"):
        s = ORACLE_SPECS[name]
        assert contains_opaque(s)
        n = normalize(s)
        assert n["anyOf"] == [s]


def test_opaque_detection_is_recursive():
    assert contains_opaque({"items": {"unevaluatedProperties": False}})
    assert not contains_opaque({"items": {"additionalProperties": False}})


def test_new_fixtures_flagged_consistently():
    # every content* fixture must be DIALECT_ONLY (jsonschema treats
    # the keywords as annotations); unevaluated* must NOT be (it is
    # asserted by the oracle and arbitrated in the fuzz suites)
    for name, s in ORACLE_SPECS.items():
        tree = json.dumps(s)
        if "content" in tree and "contentSchema" in tree or "contentEncoding" in tree:
            assert name in DIALECT_ONLY, name
        if "unevaluated" in tree:
            assert name not in DIALECT_ONLY, name
