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
}

# schemas that are unsatisfiable by construction (no valid sample exists)
UNSATISFIABLE = {"bool_allof_false", "bool_oneof_false"}
