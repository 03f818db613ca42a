"""FIXTURES.md §B — the oracle constraint specs, as data.

Each spec is drawn from the reference's own test suite (source cited
per entry in FIXTURES.md); together they cover every keyword family
in SURVEY.md §2.A.  Tests generate labeled boundary samples for each
and assert the Spark predicates reproduce the labels exactly.
"""

from __future__ import annotations

from fences_spark.schema.evaluator import SchemaType

ORACLE_SPECS: dict[str, SchemaType] = {
    "num_min": {"type": "number", "minimum": 100},
    "num_min_excl": {"type": "number", "exclusiveMinimum": 100},
    "num_multiple": {"type": "number", "minimum": 100, "multipleOf": 3},
    "num_multiple_float": {"type": "number", "multipleOf": 0.1, "maximum": 2},
    "str_len": {"type": "string", "minLength": 3, "maxLength": 10},
    "str_format_email": {"type": "string", "format": "email"},
    "str_format_datetime": {"type": "string", "format": "datetime"},
    "str_format_uuid": {"type": "string", "format": "uuid"},
    "str_format_ipv4": {"type": "string", "format": "ipv4"},
    "str_pattern": {"type": "string", "pattern": "^[-\\w.]+/[-\\w.]+$"},
    "str_pattern_merged": {"type": "string", "pattern": "(^[a-z])&(!(^forbidden))"},
    "arr_items": {"type": "array", "items": {"type": "number"}},
    "arr_items_str": {"type": "array", "items": {"type": "string", "minLength": 1}},
    "arr_bounds_min": {"type": "array", "minItems": 3},
    "arr_bounds_max": {"type": "array", "maxItems": 3},
    "arr_prefix": {"type": "array", "prefixItems": [{"type": "string"}]},
    "arr_contains": {
        "type": "array",
        "contains": {"type": "number", "minimum": 3},
        "minContains": 2,
        "items": {"type": "number"},
    },
    "arr_unique": {"type": "array", "uniqueItems": True},
    "obj_required": {"type": "object", "required": ["foo"], "properties": {"foo": {}}},
    "obj_const": {
        "type": "object",
        "properties": {"country": {"const": "United States of America"}},
    },
    "obj_addprops": {
        "type": "object",
        "properties": {"a": {"type": "number"}},
        "additionalProperties": {"type": "string"},
    },
    "enum_basic": {"enum": ["public", "private"]},
    "refs_nested": {
        "$defs": {
            "pos": {"type": "number", "minimum": 0},
            "item": {"type": "object", "required": ["v"], "properties": {"v": {"$ref": "#/$defs/pos"}}},
        },
        "type": "array",
        "items": {"$ref": "#/$defs/item"},
    },
    "refs_recursive": {
        "type": ["array", "number"],
        "items": {"$ref": "#"},
    },
    "logic_not": {
        "not": {"properties": {"b": {"properties": {"bb": {"not": {"type": "string"}}}}}}
    },
    "logic_allof": {
        "$defs": {
            "needs_a": {"type": "object", "required": ["a"]},
            "needs_b": {"type": "object", "required": ["b"]},
        },
        "allOf": [{"$ref": "#/$defs/needs_a"}, {"$ref": "#/$defs/needs_b"}],
    },
    "logic_ite": {
        "type": "object",
        "if": {"properties": {"a": {"const": "x"}}, "required": ["a"]},
        "then": {"required": ["b"]},
        "else": {"required": ["c"]},
    },
    "dep_required": {
        "type": "object",
        "dependentRequired": {"a": ["b", "c"]},
        "properties": {"a": True, "b": True, "c": True},
    },
    "obj_pattern_props": {
        "type": "object",
        "patternProperties": {"^x_": {"type": "integer", "minimum": 0}},
        "properties": {"name": {"type": "string"}},
    },
    "obj_prop_names": {
        "type": "object",
        "propertyNames": {"maxLength": 4},
    },
    "obj_dep_schemas": {
        "type": "object",
        "dependentSchemas": {"credit": {"required": ["limit"],
                                        "properties": {"limit": {"type": "number", "minimum": 0}}}},
        "properties": {"credit": True, "limit": True},
    },
    "type_lattice": {"type": ["integer", "object"]},
    "bool_allof_false": {"allOf": [True, False]},
    "bool_oneof_false": {"oneOf": [False, False]},
    "oneof_multiple": {"type": "number", "oneOf": [{"multipleOf": 3}, {"multipleOf": 5}]},
    # unevaluated* — annotation-dependent keywords (the reference
    # parses-but-skips them, fences/json_schema/parse.py:244-250;
    # blacklisted in its suite runs test_json_schema_test_suite.py:249-254).
    # Our Arrow-evaluator tier asserts full draft-2020-12 semantics,
    # arbitrated by the jsonschema oracle.
    "uneval_props": {
        "type": "object",
        "properties": {"a": {"type": "number"}},
        "unevaluatedProperties": False,
    },
    "uneval_props_schema": {
        "type": "object",
        "properties": {"name": {"type": "string"}},
        "patternProperties": {"^s_": {"type": "string"}},
        "unevaluatedProperties": {"type": "integer"},
    },
    "uneval_props_allof": {
        # in-place applicator annotations ARE visible: both branches'
        # properties count as evaluated at the root
        "allOf": [
            {"properties": {"a": {"type": "number"}}},
            {"properties": {"b": {"type": "string"}}},
        ],
        "unevaluatedProperties": False,
    },
    "uneval_props_ite": {
        # only the taken if/then/else arm contributes annotations
        "type": "object",
        "properties": {"a": True},
        "if": {"required": ["a"]},
        "then": {"properties": {"b": True}},
        "unevaluatedProperties": False,
    },
    "uneval_items": {
        "type": "array",
        "prefixItems": [{"type": "string"}],
        "unevaluatedItems": False,
    },
    "uneval_items_schema": {
        "type": "array",
        "prefixItems": [{"type": "number"}],
        "unevaluatedItems": {"type": "string"},
    },
    "uneval_items_contains": {
        # contains marks its matched items evaluated (2020-12)
        "type": "array",
        "contains": {"type": "number"},
        "unevaluatedItems": False,
    },
    # content* — asserted in this dialect (annotation-only in
    # draft 2020-12, so DIALECT_ONLY vs the jsonschema oracle; the
    # reference parses them at parse.py:304-306 and generates base64
    # pairs for `format: byte` at parse.py:315-324)
    "content_b64": {"type": "string", "contentEncoding": "base64"},
    "content_b64_json": {
        "type": "string",
        "contentEncoding": "base64",
        "contentMediaType": "application/json",
        "contentSchema": {
            "type": "object",
            "required": ["k"],
            "properties": {"k": {"type": "number"}},
        },
    },
}

# schemas that are unsatisfiable by construction (no valid sample exists)
UNSATISFIABLE = {"bool_allof_false", "bool_oneof_false"}

# fences-dialect-only constructs jsonschema cannot arbitrate: the
# `(a)&(b)` pattern extension, the nonstandard `datetime` format name,
# and the content* keywords (annotation-only in draft 2020-12 — our
# dialect asserts them; see evaluator._content_ok)
DIALECT_ONLY = {
    "str_pattern_merged",
    "str_format_datetime",
    "content_b64",
    "content_b64_json",
}
