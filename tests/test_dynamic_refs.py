"""$anchor / $id-resource / $dynamicRef resolution (round 3b).

The suite-level behavior is pinned by tests/test_jsts_corpus.py
(anchor.json, dynamicRef.json, unknownKeyword.json across all tiers);
these tests pin the pieces the corpus can't see directly: the
bookending NEGATIVE CONTROL (a plain $ref accepts what only dynamic
resolution rejects — the reason the keyword exists), the compile-tier
routing boundary, and the index/scope internals.

Reference parity note: the reference BLACKLISTS these keywords
(test/json_schema/test_json_schema_test_suite.py:104-118) — this
capability is beyond it.
"""

from __future__ import annotations

import pytest

from fences_spark.compiler import CompileError
from fences_spark.schema.evaluator import Evaluator, uses_dynamic_scope

STRICT_TREE = {
    "$id": "https://example.test/strict-tree",
    "$dynamicAnchor": "node",
    "$ref": "tree",
    "unevaluatedProperties": False,
    "$defs": {
        "tree": {
            "$id": "tree",
            "$dynamicAnchor": "node",
            "type": "object",
            "properties": {
                "data": {"type": "number"},
                "children": {"type": "array", "items": {"$dynamicRef": "#node"}},
            },
        }
    },
}

# identical shape, but the recursion is a plain $ref to a plain $anchor:
# resolution is static, so nested nodes validate against the INNER tree
# resource only — the outer unevaluatedProperties never applies to them
LOOSE_TREE = {
    "$id": "https://example.test/loose-tree",
    "$ref": "tree",
    "unevaluatedProperties": False,
    "$defs": {
        "tree": {
            "$id": "tree",
            "$anchor": "node",
            "type": "object",
            "properties": {
                "data": {"type": "number"},
                "children": {"type": "array", "items": {"$ref": "#node"}},
            },
        }
    },
}

MISSPELLED = {"children": [{"daat": 1}]}
CORRECT = {"children": [{"data": 1}]}


def test_dynamic_vs_static_recursion_negative_control():
    """The load-bearing difference: only $dynamicRef re-binds the
    recursion target to the outer resource, so only it rejects the
    misspelled key at depth.  (jsonschema agrees on both — checked in
    the corpus harness; here the contrast itself is pinned.)"""
    import jsonschema

    strict, loose = Evaluator(STRICT_TREE), Evaluator(LOOSE_TREE)
    assert strict.validate(CORRECT) and loose.validate(CORRECT)
    assert not strict.validate(MISSPELLED)
    assert loose.validate(MISSPELLED)  # static recursion: accepted
    assert jsonschema.Draft202012Validator(STRICT_TREE).is_valid(MISSPELLED) is False
    assert jsonschema.Draft202012Validator(LOOSE_TREE).is_valid(MISSPELLED) is True


@pytest.mark.parametrize(
    "schema,expected",
    [
        ({"type": "string"}, False),
        ({"$id": "https://x/root", "type": "string"}, False),  # root $id rebases nothing
        ({"$defs": {"a": {"$anchor": "n"}}}, False),  # plain anchor: static
        ({"$defs": {"a": {"$id": "nested", "type": "string"}}}, True),
        ({"$defs": {"a": {"$dynamicAnchor": "n"}}}, True),
        ({"items": {"$dynamicRef": "#n"}}, True),
        # $id inside enum/const/unknown keywords is DATA, not a resource
        ({"enum": [{"$id": "https://x/fake"}]}, False),
        ({"const": {"$dynamicRef": "#n"}}, False),
        ({"x-custom": {"$id": "https://x/fake"}}, False),
    ],
)
def test_uses_dynamic_scope_classification(schema, expected):
    assert uses_dynamic_scope(schema) is expected


def test_compile_tiers_route_dynamic_scope_to_arrow(spark):
    from pyspark.sql import functions as F

    from fences_spark.compiler.jsonvalue import VariantCompiler, compile_json
    from fences_spark.compiler.typed import TypedCompiler

    with pytest.raises(CompileError):
        VariantCompiler(STRICT_TREE)
    with pytest.raises(CompileError):
        TypedCompiler(STRICT_TREE)
    _, tier = compile_json(STRICT_TREE, F.lit('{"data": 1}'))
    assert tier == "arrow_udf"
    # plain single-resource $anchor stays on the fast tier
    _, tier = compile_json(
        {"$defs": {"A": {"$anchor": "foo", "type": "integer"}}, "$ref": "#foo"},
        F.lit("3"),
    )
    assert tier == "variant"


def test_anchor_resolution_with_base_change():
    ev = Evaluator(
        {
            "$id": "https://example.test/root.json",
            "$ref": "nested.json#foo",
            "$defs": {
                "A": {
                    "$id": "nested.json",
                    "$defs": {"B": {"$anchor": "foo", "type": "integer"}},
                }
            },
        }
    )
    assert ev.validate(3)
    assert not ev.validate("s")


def test_single_resource_skips_scope_bookkeeping():
    """Hot-path flag: a single-resource, anchor-free document never
    touches the scope stack."""
    ev = Evaluator({"properties": {"a": {"type": "integer"}}})
    assert ev._scoped is False
    assert ev.validate({"a": 1}) and not ev.validate({"a": "x"})
    assert ev._scope == []
    assert Evaluator(STRICT_TREE)._scoped is True


def test_scope_restored_after_validation():
    ev = Evaluator(STRICT_TREE)
    for v in (CORRECT, MISSPELLED, {"children": "bad"}, None, 3):
        ev.validate(v)
        assert ev._scope == []


def test_unresolvable_refs_still_raise():
    ev = Evaluator({"$ref": "#nope"})
    with pytest.raises(ValueError):
        ev.validate({})
    ev = Evaluator({"$ref": "https://elsewhere.test/remote.json"})
    with pytest.raises(ValueError):
        ev.validate({})


def test_unevaluated_beside_dynamicref_not_lowered(spark):
    """Review regression: lower_unevaluated must treat $dynamicRef as
    an in-place applicator — rewriting its sibling
    unevaluatedProperties to additionalProperties flips verdicts
    (the $dynamicRef target's properties count as evaluated)."""
    import json

    import jsonschema
    from pyspark.sql import functions as F

    from fences_spark.compiler import CompileError, lower_unevaluated
    from fences_spark.compiler.jsonvalue import compile_json

    schema = {
        "$id": "https://x/root",
        "type": "object",
        "$dynamicRef": "#node",
        "unevaluatedProperties": False,
        "$defs": {"n": {"$dynamicAnchor": "node",
                        "properties": {"a": {"type": "integer"}}}},
    }
    inst = {"a": 1}
    assert jsonschema.Draft202012Validator(schema).is_valid(inst)
    with pytest.raises(CompileError):
        lower_unevaluated(schema)
    pred, tier = compile_json(schema, F.lit(json.dumps(inst)))
    assert tier == "arrow_udf"
    assert spark.range(1).select(pred).collect()[0][0] is True


def test_unresolvable_ref_fails_fast_at_compile(spark):
    """A typo'd anchor / unregistered URI must error on the driver at
    compile time, not per-task inside the Arrow UDF."""
    from pyspark.sql import functions as F

    from fences_spark.compiler.jsonvalue import compile_json
    from fences_spark.compiler.typed import TypedCompiler

    for bad in ({"$ref": "#tyop"}, {"$ref": "https://nowhere.test/x.json"}):
        with pytest.raises(ValueError):
            compile_json(bad, F.lit("1"))
        with pytest.raises(ValueError):
            from pyspark.sql import types as T

            TypedCompiler(bad).compile(F.lit("1"), T.StringType())
