"""Build the frozen JSON-Schema-Test-Suite subset under
tests/fixtures/jsts/draft2020-12/.

The official suite submodule is not available in this sandbox (the
reference's checkout at test/fixtures/JSON-Schema-Test-Suite is empty
too), so this vendors a re-transcription of the draft2020-12 cases the
reference's harness runs (test/json_schema/test_json_schema_test_suite.py:
96-409), in the suite's exact file format:

    [{"description": ..., "schema": ..., "tests":
        [{"description": ..., "data": ..., "valid": bool}]}]

Every case label is arbitrated at test time against the external
``jsonschema`` Draft202012Validator (tests/test_jsts_corpus.py) — a
transcription error fails the corpus itself, not the engine — so the
corpus carries no authority of its own; it is a coverage map.

Excluded, with reasons, mirroring the dialect's documented divergences:
- format / content*: the dialect asserts them (fences
  json_schema/parse.py:134-171); the suite treats them as annotations.
- remote refs / $vocabulary: out of scope for the dialect (reference
  Coverage.blacklist, test_json_schema_test_suite.py:245-276).
  $anchor / $dynamicRef / in-document $id moved IN scope in round 3b
  (jsts_corpus_ext.py, anchor.json + dynamicRef.json).

Run: python scripts/build_jsts_corpus.py   (idempotent)
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "jsts", "draft2020-12")


def suite(description, schema, *tests):
    return {
        "description": description,
        "schema": schema,
        "tests": [{"description": d, "data": v, "valid": ok} for d, v, ok in tests],
    }


CORPUS: dict[str, list] = {}

CORPUS["type.json"] = [
    suite("integer type matches integers", {"type": "integer"},
          ("an integer is an integer", 1, True),
          ("a float with zero fractional part is an integer", 1.0, True),
          ("a float is not an integer", 1.1, False),
          ("a string is not an integer", "foo", False),
          ("a string is still not an integer, even if it looks like one", "1", False),
          ("an object is not an integer", {}, False),
          ("an array is not an integer", [], False),
          ("a boolean is not an integer", True, False),
          ("null is not an integer", None, False)),
    suite("number type matches numbers", {"type": "number"},
          ("an integer is a number", 1, True),
          ("a float is a number", 1.1, True),
          ("a string is not a number", "foo", False),
          ("a boolean is not a number", True, False),
          ("null is not a number", None, False)),
    suite("string type matches strings", {"type": "string"},
          ("1 is not a string", 1, False),
          ("a string is a string", "foo", True),
          ("an empty string is still a string", "", True),
          ("a boolean is not a string", True, False)),
    suite("object type matches objects", {"type": "object"},
          ("an object is an object", {}, True),
          ("an array is not an object", [], False),
          ("a string is not an object", "foo", False)),
    suite("array type matches arrays", {"type": "array"},
          ("an array is an array", [], True),
          ("an object is not an array", {}, False),
          ("a string is not an array", "foo", False)),
    suite("boolean type matches booleans", {"type": "boolean"},
          ("true is a boolean", True, True),
          ("false is a boolean", False, True),
          ("zero is not a boolean", 0, False),
          ("an empty string is not a boolean", "", False)),
    suite("null type matches only the null object", {"type": "null"},
          ("null is null", None, True),
          ("zero is not null", 0, False),
          ("false is not null", False, False),
          ("an empty string is not null", "", False)),
    suite("multiple types can be specified in an array", {"type": ["integer", "string"]},
          ("an integer is valid", 1, True),
          ("a string is valid", "foo", True),
          ("a float is invalid", 1.1, False),
          ("an object is invalid", {}, False),
          ("an array is invalid", [], False),
          ("null is invalid", None, False)),
]

CORPUS["enum.json"] = [
    suite("simple enum validation", {"enum": [1, 2, 3]},
          ("one of the enum is valid", 1, True),
          ("something else is invalid", 4, False)),
    suite("heterogeneous enum validation",
          {"enum": [6, "foo", [], True, {"foo": 12}]},
          ("one of the enum is valid", [], True),
          ("something else is invalid", None, False),
          ("objects are deep compared", {"foo": False}, False),
          ("valid object matches", {"foo": 12}, True),
          ("extra properties in object is invalid", {"foo": 12, "boo": 42}, False)),
    suite("enum with false does not match 0", {"enum": [False]},
          ("false is valid", False, True),
          ("integer zero is invalid", 0, False),
          ("float zero is invalid", 0.0, False)),
    suite("enum with true does not match 1", {"enum": [True]},
          ("true is valid", True, True),
          ("integer one is invalid", 1, False)),
    suite("enum with 0 does not match false", {"enum": [0]},
          ("false is invalid", False, False),
          ("integer zero is valid", 0, True),
          ("float zero is valid", 0.0, True)),
    suite("nul characters in strings", {"enum": ["hello\u0000there"]},
          ("match string with nul", "hello\u0000there", True),
          ("do not match string lacking nul", "hellothere", False)),
]

CORPUS["const.json"] = [
    suite("const validation", {"const": 2},
          ("same value is valid", 2, True),
          ("another value is invalid", 5, False),
          ("another type is invalid", "a", False)),
    suite("const with object", {"const": {"foo": "bar", "baz": "bax"}},
          ("same object is valid", {"foo": "bar", "baz": "bax"}, True),
          ("same object with different property order is valid",
           {"baz": "bax", "foo": "bar"}, True),
          ("another object is invalid", {"foo": "bar"}, False),
          ("another type is invalid", [1, 2], False)),
    suite("const with array", {"const": [{"foo": "bar"}]},
          ("same array is valid", [{"foo": "bar"}], True),
          ("another array item is invalid", [2], False),
          ("array with additional items is invalid", [1, 2, 3], False)),
    suite("const with null", {"const": None},
          ("null is valid", None, True),
          ("not null is invalid", 0, False)),
    suite("const with false does not match 0", {"const": False},
          ("false is valid", False, True),
          ("integer zero is invalid", 0, False)),
    suite("const with 1 does not match true", {"const": 1},
          ("true is invalid", True, False),
          ("integer one is valid", 1, True),
          ("float one is valid", 1.0, True)),
]

CORPUS["minimum.json"] = [
    suite("minimum validation", {"minimum": 1.1},
          ("above the minimum is valid", 2.6, True),
          ("boundary point is valid", 1.1, True),
          ("below the minimum is invalid", 0.6, False),
          ("ignores non-numbers", "x", True)),
    suite("minimum validation with signed integer", {"minimum": -2},
          ("negative above the minimum is valid", -1, True),
          ("boundary point is valid", -2, True),
          ("boundary point with float is valid", -2.0, True),
          ("float below the minimum is invalid", -2.0001, False),
          ("int below the minimum is invalid", -3, False),
          ("ignores non-numbers", "x", True)),
]

CORPUS["maximum.json"] = [
    suite("maximum validation", {"maximum": 3.0},
          ("below the maximum is valid", 2.6, True),
          ("boundary point is valid", 3.0, True),
          ("above the maximum is invalid", 3.5, False),
          ("ignores non-numbers", "x", True)),
    suite("maximum validation with unsigned integer", {"maximum": 300},
          ("below the maximum is invalid", 299.97, True),
          ("boundary point integer is valid", 300, True),
          ("boundary point float is valid", 300.00, True),
          ("above the maximum is invalid", 300.5, False)),
]

CORPUS["exclusiveMinimum.json"] = [
    suite("exclusiveMinimum validation", {"exclusiveMinimum": 1.1},
          ("above the exclusiveMinimum is valid", 1.2, True),
          ("boundary point is invalid", 1.1, False),
          ("below the exclusiveMinimum is invalid", 0.6, False),
          ("ignores non-numbers", "x", True)),
]

CORPUS["exclusiveMaximum.json"] = [
    suite("exclusiveMaximum validation", {"exclusiveMaximum": 3.0},
          ("below the exclusiveMaximum is valid", 2.2, True),
          ("boundary point is invalid", 3.0, False),
          ("above the exclusiveMaximum is invalid", 3.5, False),
          ("ignores non-numbers", "x", True)),
]

CORPUS["multipleOf.json"] = [
    suite("by int", {"multipleOf": 2},
          ("int by int", 10, True),
          ("int by int fail", 7, False),
          ("ignores non-numbers", "foo", True)),
    suite("by number", {"multipleOf": 1.5},
          ("zero is multiple of anything", 0, True),
          ("4.5 is multiple of 1.5", 4.5, True),
          ("35 is not multiple of 1.5", 35, False)),
    suite("by small number", {"multipleOf": 0.0001},
          ("0.0075 is multiple of 0.0001", 0.0075, True),
          ("0.00751 is not multiple of 0.0001", 0.00751, False)),
]

CORPUS["minLength.json"] = [
    suite("minLength validation", {"minLength": 2},
          ("longer is valid", "foo", True),
          ("exact length is valid", "fo", True),
          ("too short is invalid", "f", False),
          ("ignores non-strings", 1, True),
          ("one supplementary Unicode code point is not long enough", "\U0001f4a9", False)),
]

CORPUS["maxLength.json"] = [
    suite("maxLength validation", {"maxLength": 2},
          ("shorter is valid", "f", True),
          ("exact length is valid", "fo", True),
          ("too long is invalid", "foo", False),
          ("ignores non-strings", 100, True),
          ("two supplementary Unicode code points is long enough", "\U0001f4a9\U0001f4a9", True)),
]

CORPUS["pattern.json"] = [
    suite("pattern validation", {"pattern": "^a*$"},
          ("a matching pattern is valid", "aaa", True),
          ("a non-matching pattern is invalid", "abc", False),
          ("ignores booleans", True, True),
          ("ignores integers", 123, True),
          ("ignores floats", 1.0, True),
          ("ignores objects", {}, True),
          ("ignores arrays", [], True),
          ("ignores null", None, True)),
    suite("pattern is not anchored", {"pattern": "a+"},
          ("matches a substring", "xxaayy", True)),
]

CORPUS["items.json"] = [
    suite("a schema given for items", {"items": {"type": "integer"}},
          ("valid items", [1, 2, 3], True),
          ("wrong type of items", [1, "x"], False),
          ("ignores non-arrays", {"foo": "bar"}, True),
          ("JavaScript pseudo-array is valid",
           {"0": "invalid", "length": 1}, True)),
    suite("items with boolean schema (true)", {"items": True},
          ("any array is valid", [1, "foo", True], True),
          ("empty array is valid", [], True)),
    suite("items with boolean schema (false)", {"items": False},
          ("any non-empty array is invalid", [1, "foo", True], False),
          ("empty array is valid", [], True)),
    suite("nested items",
          {"type": "array", "items": {"type": "array", "items": {"type": "number"}}},
          ("valid nested array", [[1], [2.5, 3]], True),
          ("nested array with invalid type", [["1"]], False),
          ("not deep enough", [1, 2], False)),
    suite("prefixItems with no additional items allowed",
          {"prefixItems": [{}, {}, {}], "items": False},
          ("empty array", [], True),
          ("fewer number of items present (1)", [1], True),
          ("equal number of items present", [1, 2, 3], True),
          ("additional items are not permitted", [1, 2, 3, 4], False)),
    suite("items does not look in applicators, valid case",
          {"allOf": [{"prefixItems": [{"minimum": 3}]}], "items": {"minimum": 5}},
          ("prefixItems in allOf does not constrain items, invalid case", [3, 5], False),
          ("prefixItems in allOf does not constrain items, valid case", [5, 5], True)),
]

CORPUS["prefixItems.json"] = [
    suite("a schema given for prefixItems",
          {"prefixItems": [{"type": "integer"}, {"type": "string"}]},
          ("correct types", [1, "foo"], True),
          ("wrong types", ["foo", 1], False),
          ("incomplete array of items", [1], True),
          ("array with additional items", [1, "foo", True], True),
          ("empty array", [], True),
          ("ignores non-arrays", {"foo": "bar"}, True)),
    suite("prefixItems with boolean schemas", {"prefixItems": [True, False]},
          ("array with one item is valid", [1], True),
          ("array with two items is invalid", [1, "foo"], False),
          ("empty array is valid", [], True)),
]

CORPUS["contains.json"] = [
    suite("contains keyword validation", {"contains": {"minimum": 5}},
          ("array with item matching schema (5) is valid", [3, 4, 5], True),
          ("array with item matching schema (6) is valid", [3, 4, 6], True),
          ("array with two items matching schema (5, 6) is valid", [3, 4, 5, 6], True),
          ("array without items matching schema is invalid", [2, 3, 4], False),
          ("empty array is invalid", [], False),
          ("not array is valid", {}, True)),
    suite("contains keyword with const keyword", {"contains": {"const": 5}},
          ("array with item 5 is valid", [3, 4, 5], True),
          ("array with two items 5 is valid", [3, 4, 5, 5], True),
          ("array without item 5 is invalid", [1, 2, 3, 4], False)),
    suite("contains keyword with boolean schema false", {"contains": False},
          ("any non-empty array is invalid", ["foo"], False),
          ("empty array is invalid", [], False),
          ("non-arrays are valid", "contains does not apply to strings", True)),
    suite("minContains=2 with contains",
          {"contains": {"const": 1}, "minContains": 2},
          ("empty data", [], False),
          ("all elements match, valid minContains", [1, 1], True),
          ("some elements match, invalid minContains", [1, 2], False),
          ("all elements match, valid minContains (exactly as needed)", [1, 1], True),
          ("all elements match, valid minContains (more than needed)", [1, 1, 1], True)),
    suite("maxContains=2 with contains",
          {"contains": {"const": 1}, "maxContains": 2},
          ("empty data", [], False),
          ("all elements match, valid maxContains", [1], True),
          ("all elements match, valid maxContains (upper bound)", [1, 1], True),
          ("all elements match, invalid maxContains", [1, 1, 1], False)),
    suite("minContains = 0 with no maxContains",
          {"contains": {"const": 1}, "minContains": 0},
          ("empty data", [], True),
          ("minContains = 0 makes contains always pass", [2], True)),
]

CORPUS["minItems.json"] = [
    suite("minItems validation", {"minItems": 1},
          ("longer is valid", [1, 2], True),
          ("exact length is valid", [1], True),
          ("too short is invalid", [], False),
          ("ignores non-arrays", "", True)),
]

CORPUS["maxItems.json"] = [
    suite("maxItems validation", {"maxItems": 2},
          ("shorter is valid", [1], True),
          ("exact length is valid", [1, 2], True),
          ("too long is invalid", [1, 2, 3], False),
          ("ignores non-arrays", "foobar", True)),
]

CORPUS["uniqueItems.json"] = [
    suite("uniqueItems validation", {"uniqueItems": True},
          ("unique array of integers is valid", [1, 2], True),
          ("non-unique array of integers is invalid", [1, 1], False),
          ("numbers are unique if mathematically unequal", [1.0, 1.00, 1], False),
          ("false is not equal to zero", [0, False], True),
          ("true is not equal to one", [1, True], True),
          ("unique array of objects is valid",
           [{"foo": "bar"}, {"foo": "baz"}], True),
          ("non-unique array of objects is invalid",
           [{"foo": "bar"}, {"foo": "bar"}], False),
          ("property order of array of objects is ignored",
           [{"foo": "bar", "a": 1}, {"a": 1, "foo": "bar"}], False),
          ("unique array of nested objects is valid",
           [{"foo": {"bar": {"baz": True}}}, {"foo": {"bar": {"baz": False}}}], True),
          ("unique array of arrays is valid", [["foo"], ["bar"]], True),
          ("non-unique array of arrays is invalid", [["foo"], ["foo"]], False),
          ("1 and true are unique", [1, True], True),
          ("0 and false are unique", [0, False], True),
          ("unique heterogeneous types are valid", [{}, [1], True, None, 1], True),
          ("non-unique heterogeneous types are invalid",
           [{}, [1], True, None, {}, 1], False)),
    suite("uniqueItems=false validation", {"uniqueItems": False},
          ("unique array of integers is valid", [1, 2], True),
          ("non-unique array of integers is valid", [1, 1], True)),
]

CORPUS["properties.json"] = [
    suite("object properties validation",
          {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}},
          ("both properties present and valid is valid", {"foo": 1, "bar": "baz"}, True),
          ("one property invalid is invalid", {"foo": 1, "bar": {}}, False),
          ("both properties invalid is invalid", {"foo": [], "bar": {}}, False),
          ("doesn't invalidate other properties", {"quux": []}, True),
          ("ignores arrays", [], True),
          ("ignores other non-objects", 12, True)),
    suite("properties, patternProperties, additionalProperties interaction",
          {"properties": {"foo": {"type": "array", "maxItems": 3},
                          "bar": {"type": "array"}},
           "patternProperties": {"f.o": {"minItems": 2}},
           "additionalProperties": {"type": "integer"}},
          ("property validates property", {"foo": [1, 2]}, True),
          ("property invalidates property", {"foo": [1, 2, 3, 4]}, False),
          ("patternProperty invalidates property", {"foo": []}, False),
          ("patternProperty validates nonproperty", {"fxo": [1, 2]}, True),
          ("patternProperty invalidates nonproperty", {"fxo": []}, False),
          ("additionalProperty ignores property", {"bar": []}, True),
          ("additionalProperty validates others", {"quux": 3}, True),
          ("additionalProperty invalidates others", {"quux": "foo"}, False)),
    suite("properties with boolean schema",
          {"properties": {"foo": True, "bar": False}},
          ("no property present is valid", {}, True),
          ("only 'true' property present is valid", {"foo": 1}, True),
          ("only 'false' property present is invalid", {"bar": 2}, False),
          ("both properties present is invalid", {"foo": 1, "bar": 2}, False)),
]

CORPUS["required.json"] = [
    suite("required validation",
          {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]},
          ("present required property is valid", {"foo": 1}, True),
          ("non-present required property is invalid", {"bar": 1}, False),
          ("ignores arrays", [], True),
          ("ignores strings", "", True),
          ("ignores other non-objects", 12, True)),
    suite("required with empty array", {"properties": {"foo": {}}, "required": []},
          ("property not required", {}, True)),
]

CORPUS["additionalProperties.json"] = [
    suite("additionalProperties being false does not allow other properties",
          {"properties": {"foo": {}, "bar": {}},
           "patternProperties": {"^v": {}},
           "additionalProperties": False},
          ("no additional properties is valid", {"foo": 1}, True),
          ("an additional property is invalid", {"foo": 1, "bar": 2, "quux": "boom"}, False),
          ("ignores arrays", [1, 2, 3], True),
          ("ignores strings", "foobarbaz", True),
          ("ignores other non-objects", 12, True),
          ("patternProperties are not additional properties", {"foo": 1, "vroom": 2}, True)),
    suite("additionalProperties with schema",
          {"properties": {"foo": {}, "bar": {}},
           "additionalProperties": {"type": "boolean"}},
          ("no additional properties is valid", {"foo": 1}, True),
          ("an additional valid property is valid", {"foo": 1, "bar": 2, "quux": True}, True),
          ("an additional invalid property is invalid", {"foo": 1, "bar": 2, "quux": 12}, False)),
    suite("additionalProperties can exist by itself",
          {"additionalProperties": {"type": "boolean"}},
          ("an additional valid property is valid", {"foo": True}, True),
          ("an additional invalid property is invalid", {"foo": 1}, False)),
    suite("additionalProperties are allowed by default",
          {"properties": {"foo": {}, "bar": {}}},
          ("additional properties are allowed", {"foo": 1, "bar": 2, "quux": True}, True)),
    suite("additionalProperties does not look in applicators",
          {"allOf": [{"properties": {"foo": {}}}],
           "additionalProperties": {"type": "boolean"}},
          ("properties defined in allOf are not examined",
           {"foo": 1, "bar": True}, False)),
]

CORPUS["patternProperties.json"] = [
    suite("patternProperties validates properties matching a regex",
          {"patternProperties": {"f.*o": {"type": "integer"}}},
          ("a single valid match is valid", {"foo": 1}, True),
          ("multiple valid matches is valid", {"foo": 1, "foooooo": 2}, True),
          ("a single invalid match is invalid", {"foo": "bar", "fother": 2}, False),
          ("multiple invalid matches is invalid", {"foo": "bar", "foooooo": "baz"}, False),
          ("ignores arrays", ["foo"], True),
          ("ignores strings", "foo", True),
          ("ignores other non-objects", 12, True)),
    suite("multiple simultaneous patternProperties are validated",
          {"patternProperties": {"a*": {"type": "integer"},
                                 "aaa*": {"maximum": 20}}},
          ("a single valid match is valid", {"a": 21}, True),
          ("a simultaneous match is valid", {"aaaa": 18}, True),
          ("multiple matches is valid", {"a": 21, "aaaa": 18}, True),
          ("an invalid due to one is invalid", {"a": "bar"}, False),
          ("an invalid due to the other is invalid", {"aaaa": 31}, False),
          ("an invalid due to both is invalid", {"aaa": "foo", "aaaa": 31}, False)),
    suite("patternProperties with boolean schemas",
          {"patternProperties": {"f.*": True, "b.*": False}},
          ("object with property matching schema true is valid", {"foo": 1}, True),
          ("object with property matching schema false is invalid", {"bar": 2}, False),
          ("object with both properties is invalid", {"foo": 1, "bar": 2}, False),
          ("object with a property matching both true and false is invalid",
           {"foobar": 1}, False),
          ("empty object is valid", {}, True)),
]

CORPUS["propertyNames.json"] = [
    suite("propertyNames validation", {"propertyNames": {"maxLength": 3}},
          ("all property names valid", {"f": {}, "foo": {}}, True),
          ("some property names invalid", {"foo": {}, "foobar": {}}, False),
          ("object without properties is valid", {}, True),
          ("ignores arrays", [1, 2, 3, 4], True),
          ("ignores strings", "foobar", True),
          ("ignores other non-objects", 12, True)),
    suite("propertyNames with boolean schema false", {"propertyNames": False},
          ("object with any properties is invalid", {"foo": 1}, False),
          ("empty object is valid", {}, True)),
]

CORPUS["minProperties.json"] = [
    suite("minProperties validation", {"minProperties": 1},
          ("longer is valid", {"foo": 1, "bar": 2}, True),
          ("exact length is valid", {"foo": 1}, True),
          ("too short is invalid", {}, False),
          ("ignores arrays", [], True),
          ("ignores strings", "", True),
          ("ignores other non-objects", 12, True)),
]

CORPUS["maxProperties.json"] = [
    suite("maxProperties validation", {"maxProperties": 2},
          ("shorter is valid", {"foo": 1}, True),
          ("exact length is valid", {"foo": 1, "bar": 2}, True),
          ("too long is invalid", {"foo": 1, "bar": 2, "baz": 3}, False),
          ("ignores arrays", [1, 2, 3], True),
          ("ignores strings", "foobar", True),
          ("ignores other non-objects", 12, True)),
    suite("maxProperties = 0 means the object is empty", {"maxProperties": 0},
          ("no properties is valid", {}, True),
          ("one property is invalid", {"foo": 1}, False)),
]

CORPUS["dependentRequired.json"] = [
    suite("single dependency", {"dependentRequired": {"bar": ["foo"]}},
          ("neither", {}, True),
          ("nondependant", {"foo": 1}, True),
          ("with dependency", {"foo": 1, "bar": 2}, True),
          ("missing dependency", {"bar": 2}, False),
          ("ignores arrays", ["bar"], True),
          ("ignores strings", "foobar", True),
          ("ignores other non-objects", 12, True)),
    suite("multiple dependents required", {"dependentRequired": {"quux": ["foo", "bar"]}},
          ("neither", {}, True),
          ("nondependants", {"foo": 1, "bar": 2}, True),
          ("with dependencies", {"foo": 1, "bar": 2, "quux": 3}, True),
          ("missing dependency", {"foo": 1, "quux": 2}, False),
          ("missing other dependency", {"bar": 1, "quux": 2}, False),
          ("missing both dependencies", {"quux": 1}, False)),
]

CORPUS["dependentSchemas.json"] = [
    suite("single dependency",
          {"dependentSchemas": {"bar": {
              "properties": {"foo": {"type": "integer"},
                             "bar": {"type": "integer"}}}}},
          ("valid", {"foo": 1, "bar": 2}, True),
          ("no dependency", {"foo": "quux"}, True),
          ("wrong type", {"foo": "quux", "bar": 2}, False),
          ("wrong type other", {"foo": 2, "bar": "quux"}, False),
          ("wrong type both", {"foo": "quux", "bar": "quux"}, False),
          ("ignores arrays", ["bar"], True),
          ("ignores strings", "foobar", True),
          ("ignores other non-objects", 12, True)),
    suite("boolean subschemas",
          {"dependentSchemas": {"foo": True, "bar": False}},
          ("object with property having schema true is valid", {"foo": 1}, True),
          ("object with property having schema false is invalid", {"bar": 2}, False),
          ("object with both properties is invalid", {"foo": 1, "bar": 2}, False),
          ("empty object is valid", {}, True)),
]

CORPUS["allOf.json"] = [
    suite("allOf",
          {"allOf": [
              {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
              {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
          ("allOf", {"foo": "baz", "bar": 2}, True),
          ("mismatch second", {"foo": "baz"}, False),
          ("mismatch first", {"bar": 2}, False),
          ("wrong type", {"foo": "baz", "bar": "quux"}, False)),
    suite("allOf with base schema",
          {"properties": {"bar": {"type": "integer"}}, "required": ["bar"],
           "allOf": [
               {"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
               {"properties": {"baz": {"type": "null"}}, "required": ["baz"]}]},
          ("valid", {"foo": "quux", "bar": 2, "baz": None}, True),
          ("mismatch base schema", {"foo": "quux", "baz": None}, False),
          ("mismatch first allOf", {"bar": 2, "baz": None}, False),
          ("mismatch second allOf", {"foo": "quux", "bar": 2}, False),
          ("mismatch both", {"bar": 2}, False)),
    suite("allOf simple types",
          {"allOf": [{"maximum": 30}, {"minimum": 20}]},
          ("valid", 25, True),
          ("mismatch one", 35, False)),
    suite("allOf with boolean schemas, all true", {"allOf": [True, True]},
          ("any value is valid", "foo", True)),
    suite("allOf with boolean schemas, some false", {"allOf": [True, False]},
          ("any value is invalid", "foo", False)),
    suite("allOf with boolean schemas, all false", {"allOf": [False, False]},
          ("any value is invalid", "foo", False)),
    suite("allOf with one empty schema", {"allOf": [{}]},
          ("any data is valid", 1, True)),
    suite("nested allOf, to check validation semantics",
          {"allOf": [{"allOf": [{"type": "null"}]}]},
          ("null is valid", None, True),
          ("anything non-null is invalid", 123, False)),
]

CORPUS["anyOf.json"] = [
    suite("anyOf", {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
          ("first anyOf valid", 1, True),
          ("second anyOf valid", 2.5, True),
          ("both anyOf valid", 3, True),
          ("neither anyOf valid", 1.5, False)),
    suite("anyOf with base schema",
          {"type": "string", "anyOf": [{"maxLength": 2}, {"minLength": 4}]},
          ("mismatch base schema", 3, False),
          ("one anyOf valid", "foobar", True),
          ("both anyOf invalid", "foo", False)),
    suite("anyOf with boolean schemas, all true", {"anyOf": [True, True]},
          ("any value is valid", "foo", True)),
    suite("anyOf with boolean schemas, some true", {"anyOf": [True, False]},
          ("any value is valid", "foo", True)),
    suite("anyOf with boolean schemas, all false", {"anyOf": [False, False]},
          ("any value is invalid", "foo", False)),
    suite("anyOf complex types",
          {"anyOf": [
              {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
              {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
          ("first anyOf valid (complex)", {"bar": 2}, True),
          ("second anyOf valid (complex)", {"foo": "baz"}, True),
          ("both anyOf valid (complex)", {"foo": "baz", "bar": 2}, True),
          ("neither anyOf valid (complex)", {"foo": 2, "bar": "quux"}, False)),
    suite("nested anyOf, to check validation semantics",
          {"anyOf": [{"anyOf": [{"type": "null"}]}]},
          ("null is valid", None, True),
          ("anything non-null is invalid", 123, False)),
]

CORPUS["oneOf.json"] = [
    suite("oneOf", {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
          ("first oneOf valid", 1, True),
          ("second oneOf valid", 2.5, True),
          ("both oneOf valid", 3, False),
          ("neither oneOf valid", 1.5, False)),
    suite("oneOf with base schema",
          {"type": "string", "oneOf": [{"minLength": 2}, {"maxLength": 4}]},
          ("mismatch base schema", 3, False),
          ("one oneOf valid", "foobar", True),
          ("both oneOf valid", "foo", False)),
    suite("oneOf with boolean schemas, all true", {"oneOf": [True, True, True]},
          ("any value is invalid", "foo", False)),
    suite("oneOf with boolean schemas, one true", {"oneOf": [True, False, False]},
          ("any value is valid", "foo", True)),
    suite("oneOf with boolean schemas, more than one true",
          {"oneOf": [True, True, False]},
          ("any value is invalid", "foo", False)),
    suite("oneOf with boolean schemas, all false", {"oneOf": [False, False, False]},
          ("any value is invalid", "foo", False)),
    suite("oneOf complex types",
          {"oneOf": [
              {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
              {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
          ("first oneOf valid (complex)", {"bar": 2}, True),
          ("second oneOf valid (complex)", {"foo": "baz"}, True),
          ("both oneOf valid (complex)", {"foo": "baz", "bar": 2}, False),
          ("neither oneOf valid (complex)", {"foo": 2, "bar": "quux"}, False)),
    suite("oneOf with required",
          {"type": "object",
           "oneOf": [{"required": ["foo", "bar"]}, {"required": ["foo", "baz"]}]},
          ("both invalid - invalid", {"bar": 2}, False),
          ("first valid - valid", {"foo": 1, "bar": 2}, True),
          ("second valid - valid", {"foo": 1, "baz": 3}, True),
          ("both valid - invalid", {"foo": 1, "bar": 2, "baz": 3}, False)),
]

CORPUS["not.json"] = [
    suite("not", {"not": {"type": "integer"}},
          ("allowed", "foo", True),
          ("disallowed", 1, False)),
    suite("not multiple types", {"not": {"type": ["integer", "boolean"]}},
          ("valid", "foo", True),
          ("mismatch", 1, False),
          ("other mismatch", True, False)),
    suite("not more complex schema",
          {"not": {"type": "object", "properties": {"foo": {"type": "string"}}}},
          ("match", 1, True),
          ("other match", {"foo": 1}, True),
          ("mismatch", {"foo": "bar"}, False)),
    suite("forbidden property", {"properties": {"foo": {"not": {}}}},
          ("property present invalid", {"foo": 1, "bar": 2}, False),
          ("property absent valid", {"bar": 1, "baz": 2}, True)),
    suite("not with boolean schema true", {"not": True},
          ("any value is invalid", "foo", False)),
    suite("not with boolean schema false", {"not": False},
          ("any value is valid", "foo", True)),
]

CORPUS["if-then-else.json"] = [
    suite("ignore if without then or else", {"if": {"const": 0}},
          ("valid when valid against lone if", 0, True),
          ("valid when invalid against lone if", "hello", True)),
    suite("ignore then without if", {"then": {"const": 0}},
          ("valid when valid against lone then", 0, True),
          ("valid when invalid against lone then", "hello", True)),
    suite("ignore else without if", {"else": {"const": 0}},
          ("valid when valid against lone else", 0, True),
          ("valid when invalid against lone else", "hello", True)),
    suite("if and then without else",
          {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}},
          ("valid through then", -1, True),
          ("invalid through then", -100, False),
          ("valid when if test fails", 3, True)),
    suite("if and else without then",
          {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}},
          ("valid when if test passes", -1, True),
          ("valid through else", 4, True),
          ("invalid through else", 3, False)),
    suite("validate against correct branch, then vs else",
          {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10},
           "else": {"multipleOf": 2}},
          ("valid through then", -1, True),
          ("invalid through then", -100, False),
          ("valid through else", 4, True),
          ("invalid through else", 3, False)),
    suite("if with boolean schema true",
          {"if": True, "then": {"const": "then"}, "else": {"const": "else"}},
          ("boolean schema true in if always chooses the then path (valid)",
           "then", True),
          ("boolean schema true in if always chooses the then path (invalid)",
           "else", False)),
    suite("if with boolean schema false",
          {"if": False, "then": {"const": "then"}, "else": {"const": "else"}},
          ("boolean schema false in if always chooses the else path (invalid)",
           "then", False),
          ("boolean schema false in if always chooses the else path (valid)",
           "else", True)),
]

CORPUS["ref.json"] = [
    suite("nested refs",
          {"$defs": {
              "a": {"type": "integer"},
              "b": {"$ref": "#/$defs/a"},
              "c": {"$ref": "#/$defs/b"}},
           "$ref": "#/$defs/c"},
          ("nested ref valid", 5, True),
          ("nested ref invalid", "a", False)),
    suite("ref applies alongside sibling keywords",
          {"$defs": {"reffed": {"type": "array"}},
           "properties": {"foo": {"$ref": "#/$defs/reffed", "maxItems": 2}}},
          ("ref valid, maxItems valid", {"foo": []}, True),
          ("ref valid, maxItems invalid", {"foo": [1, 2, 3]}, False),
          ("ref invalid", {"foo": "string"}, False)),
    suite("property named $ref that is not a reference",
          {"properties": {"$ref": {"type": "string"}}},
          ("property named $ref valid", {"$ref": "a"}, True),
          ("property named $ref invalid", {"$ref": 2}, False)),
    suite("recursive ref to root",
          {"properties": {"foo": {"$ref": "#"}},
           "additionalProperties": False},
          ("match", {"foo": False}, True),
          ("recursive match", {"foo": {"foo": False}}, True),
          ("mismatch", {"bar": False}, False),
          ("recursive mismatch", {"foo": {"bar": False}}, False)),
]

CORPUS["boolean_schema.json"] = [
    suite("boolean schema 'true'", True,
          ("number is valid", 1, True),
          ("string is valid", "foo", True),
          ("boolean true is valid", True, True),
          ("boolean false is valid", False, True),
          ("null is valid", None, True),
          ("object is valid", {"foo": "bar"}, True),
          ("empty object is valid", {}, True),
          ("array is valid", ["foo"], True),
          ("empty array is valid", [], True)),
    suite("boolean schema 'false'", False,
          ("number is invalid", 1, False),
          ("string is invalid", "foo", False),
          ("boolean true is invalid", True, False),
          ("boolean false is invalid", False, False),
          ("null is invalid", None, False),
          ("object is invalid", {"foo": "bar"}, False),
          ("empty object is invalid", {}, False),
          ("array is invalid", ["foo"], False),
          ("empty array is invalid", [], False)),
]

CORPUS["unevaluatedProperties.json"] = [
    suite("unevaluatedProperties true", {"type": "object", "unevaluatedProperties": True},
          ("with no unevaluated properties", {}, True),
          ("with unevaluated properties", {"foo": "foo"}, True)),
    suite("unevaluatedProperties false", {"type": "object", "unevaluatedProperties": False},
          ("with no unevaluated properties", {}, True),
          ("with unevaluated properties", {"foo": "foo"}, False)),
    suite("unevaluatedProperties schema",
          {"type": "object", "unevaluatedProperties": {"type": "string", "minLength": 3}},
          ("with no unevaluated properties", {}, True),
          ("with valid unevaluated properties", {"foo": "foo"}, True),
          ("with invalid unevaluated properties", {"foo": "fo"}, False)),
    suite("unevaluatedProperties with adjacent properties",
          {"type": "object",
           "properties": {"foo": {"type": "string"}},
           "unevaluatedProperties": False},
          ("with no unevaluated properties", {"foo": "foo"}, True),
          ("with unevaluated properties", {"foo": "foo", "bar": "bar"}, False)),
    suite("unevaluatedProperties with adjacent patternProperties",
          {"type": "object",
           "patternProperties": {"^foo": {"type": "string"}},
           "unevaluatedProperties": False},
          ("with no unevaluated properties", {"foo": "foo"}, True),
          ("with unevaluated properties", {"foo": "foo", "bar": "bar"}, False)),
    suite("unevaluatedProperties with nested properties (allOf)",
          {"type": "object",
           "properties": {"foo": {"type": "string"}},
           "allOf": [{"properties": {"bar": {"type": "string"}}}],
           "unevaluatedProperties": False},
          ("with no additional properties", {"foo": "foo", "bar": "bar"}, True),
          ("with additional properties",
           {"foo": "foo", "bar": "bar", "baz": "baz"}, False)),
    suite("unevaluatedProperties with anyOf",
          {"type": "object",
           "properties": {"foo": {"type": "string"}},
           "anyOf": [
               {"properties": {"bar": {"const": "bar"}}, "required": ["bar"]},
               {"properties": {"baz": {"const": "baz"}}, "required": ["baz"]}],
           "unevaluatedProperties": False},
          ("when one matches and has no unevaluated properties",
           {"foo": "foo", "bar": "bar"}, True),
          ("when one matches and has unevaluated properties",
           {"foo": "foo", "bar": "bar", "baz": "not-baz"}, False),
          ("when two match and has no unevaluated properties",
           {"foo": "foo", "bar": "bar", "baz": "baz"}, True)),
    suite("unevaluatedProperties with if/then/else",
          {"type": "object",
           "if": {"properties": {"foo": {"const": "then"}}, "required": ["foo"]},
           "then": {"properties": {"bar": {"type": "string"}}, "required": ["bar"]},
           "else": {"properties": {"baz": {"type": "string"}}, "required": ["baz"]},
           "unevaluatedProperties": False},
          ("when if is true and has no unevaluated properties",
           {"foo": "then", "bar": "bar"}, True),
          ("when if is true and has unevaluated properties",
           {"foo": "then", "bar": "bar", "baz": "baz"}, False),
          ("when if is false and has no unevaluated properties",
           {"baz": "baz"}, True),
          ("when if is false and has unevaluated properties",
           {"foo": "else", "baz": "baz"}, False)),
]

CORPUS["unevaluatedItems.json"] = [
    suite("unevaluatedItems true", {"type": "array", "unevaluatedItems": True},
          ("with no unevaluated items", [], True),
          ("with unevaluated items", ["foo"], True)),
    suite("unevaluatedItems false", {"type": "array", "unevaluatedItems": False},
          ("with no unevaluated items", [], True),
          ("with unevaluated items", ["foo"], False)),
    suite("unevaluatedItems as schema",
          {"type": "array", "unevaluatedItems": {"type": "string"}},
          ("with no unevaluated items", [], True),
          ("with valid unevaluated items", ["foo"], True),
          ("with invalid unevaluated items", [42], False)),
    suite("unevaluatedItems with uniform items",
          {"type": "array", "items": {"type": "string"},
           "unevaluatedItems": False},
          ("unevaluatedItems doesn't apply when items evaluates everything",
           ["foo", "bar"], True)),
    suite("unevaluatedItems with tuple (prefixItems)",
          {"type": "array", "prefixItems": [{"type": "string"}],
           "unevaluatedItems": False},
          ("with no unevaluated items", ["foo"], True),
          ("with unevaluated items", ["foo", "bar"], False)),
]

# round-3 full-suite completion: merge the corner-case transcriptions
# (new files + deepened existing files) from jsts_corpus_ext
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from jsts_corpus_ext import EXTRA  # noqa: E402

for fname, suites in EXTRA.items():
    out = CORPUS.setdefault(fname, [])
    by_desc = {s["description"]: s for s in out}
    for s in suites:
        prev = by_desc.get(s["description"])
        if prev is None:
            out.append(s)
            by_desc[s["description"]] = s
        elif prev["schema"] == s["schema"]:
            # same suite already vendored: union in any new cases
            have = {t["description"] for t in prev["tests"]}
            prev["tests"].extend(t for t in s["tests"] if t["description"] not in have)
        else:
            # same name, different schema → distinct suite, keep both
            s = {**s, "description": s["description"] + " (ext)"}
            out.append(s)
            by_desc[s["description"]] = s

os.makedirs(OUT, exist_ok=True)
for fname, suites in CORPUS.items():
    with open(os.path.join(OUT, fname), "w") as f:
        json.dump(suites, f, indent=2, ensure_ascii=False)
        f.write("\n")
n = sum(len(t["tests"]) for ss in CORPUS.values() for t in ss)
print(f"wrote {len(CORPUS)} files, {sum(len(s) for s in CORPUS.values())} suites, {n} cases -> {os.path.normpath(OUT)}")
