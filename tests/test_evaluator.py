"""Pinned semantics of the reference evaluator — hand-written
expected verdicts for the FIXTURES.md §B schema families (derived
from the reference's own test cases, /root/reference/test/
json_schema/test_generate.py, re-expressed as value/verdict pairs —
no code taken)."""

from __future__ import annotations

import pytest

from fences_spark.schema.evaluator import validate

CASES = [
    # num_min (test_generate.py:44-46)
    ({"type": "number", "minimum": 100}, 100, True),
    ({"type": "number", "minimum": 100}, 99.999, False),
    ({"type": "number", "exclusiveMinimum": 100}, 100, False),
    ({"type": "number", "exclusiveMinimum": 100}, 100.001, True),
    ({"type": "number", "maximum": 10}, 10, True),
    ({"type": "number", "maximum": 10}, 10.5, False),
    ({"type": "number", "minimum": 100}, "not a number", False),  # type fails first
    ({"minimum": 100}, "free string", True),  # vacuous on non-number
    # num_multiple (test_generate.py:52-56)
    ({"type": "number", "minimum": 100, "multipleOf": 3}, 102, True),
    ({"type": "number", "minimum": 100, "multipleOf": 3}, 101, False),
    # jsonschema-exact float semantics: 0.3/0.1 = 2.99..96 in IEEE, so
    # 0.3 is NOT a multiple of 0.1 (jsonschema._keywords.multipleOf)
    ({"type": "number", "multipleOf": 0.1}, 0.3, False),
    ({"type": "number", "multipleOf": 0.1}, 0.5, True),
    ({"type": "number", "multipleOf": 0.1}, 0.35, False),
    ({"type": "number", "multipleOf": 3}, 1073741824.0, False),
    ({"type": "number", "multipleOf": 3}, 1073741826.0, True),
    ({"type": "integer"}, 5, True),
    ({"type": "integer"}, 5.0, True),
    ({"type": "integer"}, 5.5, False),
    ({"type": "integer"}, True, False),  # bool is not a number
    ({"type": "number"}, False, False),
    # str_len (test_generate.py:70-73)
    ({"type": "string", "minLength": 3, "maxLength": 10}, "abc", True),
    ({"type": "string", "minLength": 3, "maxLength": 10}, "ab", False),
    ({"type": "string", "minLength": 3, "maxLength": 10}, "abcdefghijk", False),
    # str_format
    ({"type": "string", "format": "email"}, "a@b.co", True),
    ({"type": "string", "format": "email"}, "nope", False),
    ({"type": "string", "format": "uuid"}, "123e4567-e89b-12d3-a456-426614174000", True),
    ({"type": "string", "format": "uuid"}, "xyz", False),
    ({"type": "string", "format": "ipv4"}, "192.168.0.1", True),
    ({"type": "string", "format": "ipv4"}, "999.1.1.1", False),
    ({"type": "string", "format": "date"}, "2024-01-31", True),
    ({"type": "string", "format": "unknown-format"}, "anything", True),
    # str_pattern incl. dialect extensions (normalize.py:97,154)
    ({"type": "string", "pattern": "^[-\\w.]+/[-\\w.]+$"}, "org/repo", True),
    ({"type": "string", "pattern": "^[-\\w.]+/[-\\w.]+$"}, "no-slash", False),
    ({"type": "string", "pattern": "(^a)&(b$)"}, "a-then-b", True),
    ({"type": "string", "pattern": "(^a)&(b$)"}, "a-then-c", False),
    ({"type": "string", "pattern": "!(^forbidden)"}, "allowed", True),
    ({"type": "string", "pattern": "!(^forbidden)"}, "forbidden!", False),
    # pattern is a search, not a full match (draft-2020-12)
    ({"type": "string", "pattern": "bc"}, "abcd", True),
    # enum / const (parse.py:219-232, 234-243)
    ({"enum": ["public", "private"]}, "public", True),
    ({"enum": ["public", "private"]}, "protected", False),
    ({"enum": [1, "x", None, [1, 2]]}, None, True),
    ({"enum": [1, "x", None, [1, 2]]}, [1, 2], True),
    ({"enum": [1, "x", None, [1, 2]]}, [1, 3], False),
    ({"enum": [1]}, True, False),  # bool != 1 in JSON deep-eq
    ({"const": "United States of America"}, "United States of America", True),
    ({"const": "United States of America"}, "USA", False),
    ({"NOT_enum": ["a"]}, "a", False),
    ({"NOT_enum": ["a"]}, "b", True),
    ({"NOT_multipleOf": 2}, 4, False),
    ({"NOT_multipleOf": 2}, 3, True),
    # arr_items / bounds / prefix / contains (test_generate.py:84-106)
    ({"type": "array", "items": {"type": "number"}}, [1, 2.5], True),
    ({"type": "array", "items": {"type": "number"}}, [1, "x"], False),
    ({"type": "array", "minItems": 3}, [1, 2], False),
    ({"type": "array", "minItems": 3}, [1, 2, 3], True),
    ({"type": "array", "maxItems": 3}, [1, 2, 3, 4], False),
    ({"type": "array", "prefixItems": [{"type": "string"}]}, ["a", 1], True),
    ({"type": "array", "prefixItems": [{"type": "string"}]}, [1, "a"], False),
    ({"type": "array", "prefixItems": [{"type": "string"}], "items": {"type": "number"}}, ["a", 1, 2], True),
    ({"type": "array", "prefixItems": [{"type": "string"}], "items": {"type": "number"}}, ["a", 1, "b"], False),
    (
        {"type": "array", "contains": {"type": "number", "minimum": 3}, "minContains": 2, "items": {"type": "number"}},
        [3, 4, 1],
        True,
    ),
    (
        {"type": "array", "contains": {"type": "number", "minimum": 3}, "minContains": 2, "items": {"type": "number"}},
        [3, 1, 1],
        False,
    ),
    ({"type": "array", "uniqueItems": True}, [1, 2, 1], False),
    ({"type": "array", "uniqueItems": True}, [1, 2, 3], True),
    ({"type": "array", "uniqueItems": True}, [1, 1.0], False),  # 1 == 1.0
    # obj_required / properties (test_generate.py:109-121)
    ({"type": "object", "required": ["foo"], "properties": {"foo": {}}}, {"foo": 1}, True),
    ({"type": "object", "required": ["foo"], "properties": {"foo": {}}}, {}, False),
    ({"type": "object", "properties": {"a": {"type": "number"}}}, {"a": "x"}, False),
    ({"type": "object", "properties": {"a": {"type": "number"}}}, {"b": "x"}, True),
    ({"type": "object", "additionalProperties": False, "properties": {"a": True}}, {"a": 1}, True),
    ({"type": "object", "additionalProperties": False, "properties": {"a": True}}, {"a": 1, "b": 2}, False),
    ({"type": "object", "minProperties": 2}, {"a": 1}, False),
    ({"type": "object", "patternProperties": {"^n_": {"type": "number"}}}, {"n_x": 1}, True),
    ({"type": "object", "patternProperties": {"^n_": {"type": "number"}}}, {"n_x": "s"}, False),
    ({"propertyNames": {"pattern": "^[a-z]+$"}}, {"ok": 1}, True),
    ({"propertyNames": {"pattern": "^[a-z]+$"}}, {"NotOk": 1}, False),
    # dep_required (test_generate.py:284-295)
    ({"dependentRequired": {"a": ["b", "c"]}}, {"a": 1, "b": 2, "c": 3}, True),
    ({"dependentRequired": {"a": ["b", "c"]}}, {"a": 1, "b": 2}, False),
    ({"dependentRequired": {"a": ["b", "c"]}}, {"d": 1}, True),
    # logic (test_generate.py:298-399)
    ({"not": {"type": "string"}}, 5, True),
    ({"not": {"type": "string"}}, "s", False),
    ({"allOf": [{"minimum": 3}, {"maximum": 5}], "type": "number"}, 4, True),
    ({"allOf": [{"minimum": 3}, {"maximum": 5}], "type": "number"}, 6, False),
    ({"anyOf": [{"type": "string"}, {"type": "number"}]}, 5, True),
    ({"anyOf": [{"type": "string"}, {"type": "number"}]}, [], False),
    ({"oneOf": [{"multipleOf": 3}, {"multipleOf": 5}], "type": "number"}, 9, True),
    ({"oneOf": [{"multipleOf": 3}, {"multipleOf": 5}], "type": "number"}, 15, False),
    ({"oneOf": [{"multipleOf": 3}, {"multipleOf": 5}], "type": "number"}, 7, False),
    (
        {"if": {"properties": {"a": {"const": "x"}}, "required": ["a"]}, "then": {"required": ["b"]}, "else": {"required": ["c"]}},
        {"a": "x", "b": 1},
        True,
    ),
    (
        {"if": {"properties": {"a": {"const": "x"}}, "required": ["a"]}, "then": {"required": ["b"]}, "else": {"required": ["c"]}},
        {"a": "x"},
        False,
    ),
    (
        {"if": {"properties": {"a": {"const": "x"}}, "required": ["a"]}, "then": {"required": ["b"]}, "else": {"required": ["c"]}},
        {"c": 1},
        True,
    ),
    # logic_not nested (test_generate.py:300-312)
    ({"not": {"properties": {"b": {"properties": {"bb": {"not": {"type": "string"}}}}}}}, {"b": {"bb": 5}}, False),
    ({"not": {"properties": {"b": {"properties": {"bb": {"not": {"type": "string"}}}}}}}, {"b": {"bb": "s"}}, True),
    # bool schemas (test_normalize.py:210-218)
    (True, {"anything": 1}, True),
    (False, "x", False),
    ({"allOf": [True, False]}, 1, False),
    ({"oneOf": [False, False]}, 1, False),
    # type lattice (normalize.py:296-319)
    ({"type": ["integer", "object"]}, 3, True),
    ({"type": ["integer", "object"]}, 3.5, False),
    ({"type": ["integer", "object"]}, {}, True),
    ({"type": []}, 3, False),  # empty type list is always-false
    # null handling
    ({"type": "null"}, None, True),
    ({"type": "string"}, None, False),
    ({"type": ["string", "null"]}, None, True),
    # refs (test_generate.py:125-169)
    (
        {"$defs": {"pos": {"type": "number", "minimum": 0}}, "properties": {"x": {"$ref": "#/$defs/pos"}}},
        {"x": 5},
        True,
    ),
    (
        {"$defs": {"pos": {"type": "number", "minimum": 0}}, "properties": {"x": {"$ref": "#/$defs/pos"}}},
        {"x": -5},
        False,
    ),
    # recursive self-ref (test_generate.py:158-169)
    (
        {"type": ["array", "number"], "items": {"$ref": "#"}},
        [1, [2, [3]]],
        True,
    ),
    (
        {"type": ["array", "number"], "items": {"$ref": "#"}},
        [1, ["x"]],
        False,
    ),
]


@pytest.mark.parametrize("schema,value,expected", CASES)
def test_evaluator_cases(schema, value, expected):
    assert validate(value, schema) is expected, (schema, value)


def test_depth_guard_raises_distinct_error():
    """ADVICE r3: hitting the same-location no-progress bound is a
    schema defect, not an instance verdict — it must raise
    SchemaDepthError (never return False, which `not` would flip into
    a spurious valid), and the error must NOT be a ValueError (the
    Arrow UDF's malformed-JSON handler catches ValueError)."""
    from fences_spark.schema.evaluator import Evaluator, SchemaDepthError

    # value-free $ref cycle
    with pytest.raises(SchemaDepthError):
        Evaluator({"allOf": [{"$ref": "#"}]}).validate("x")
    assert not issubclass(SchemaDepthError, (ValueError, TypeError))

    # finite-but-too-deep static allOf tower: raises instead of
    # silently mis-validating (and `not` cannot flip it)
    deep: dict = {"type": "integer"}
    for _ in range(80):
        deep = {"allOf": [deep]}
    with pytest.raises(SchemaDepthError):
        Evaluator(deep).validate(3)
    with pytest.raises(SchemaDepthError):
        Evaluator({"not": deep}).validate(3)

    # a tower inside the bound still validates exactly
    ok: dict = {"type": "integer"}
    for _ in range(40):
        ok = {"allOf": [ok]}
    assert Evaluator(ok).validate(3)
    assert not Evaluator(ok).validate("s")
