"""Parity: the Spark predicate tiers must reproduce the reference
evaluator's verdicts exactly (diagonal confusion matrix — the
reference's correctness criterion, test_generate.py:26-36)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fences_spark.compiler import CompileError
from fences_spark.compiler.jsonvalue import VariantCompiler, compile_json, compile_json_udf
from fences_spark.compiler.typed import TypedCompiler
from fences_spark.schema.evaluator import Evaluator


def check_typed(spark, schema, values, ddl):
    """Compile `schema` against a typed column of type `ddl`, compare
    verdicts to the evaluator's for every value."""
    df = spark.createDataFrame([(v,) for v in values], f"v {ddl}")
    pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
    got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
    ev = Evaluator(schema)
    want = [ev.validate(v) for v in values]
    assert got == want, f"{schema}: got {got}, want {want} for {values}"


def check_json(spark, schema, values):
    """Same parity over JSON-text cells for both the variant tier (if
    expressible) and the Arrow UDF tier."""
    texts = [json.dumps(v) for v in values]
    df = spark.createDataFrame([(t,) for t in texts], "v string")
    ev = Evaluator(schema)
    want = [ev.validate(v) for v in values]

    pred, tier = compile_json(schema, df["v"])
    got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
    assert got == want, f"[{tier}] {schema}: got {got}, want {want}"

    upred = compile_json_udf(schema, df["v"])
    got_u = [r["ok"] for r in df.select(F.coalesce(upred, F.lit(False)).alias("ok")).collect()]
    assert got_u == want, f"[arrow_udf] {schema}: got {got_u}, want {want}"
    return tier


STRINGS = ["", "a", "abc", "org/repo", "no-slash", "a/b/c", "x" * 20, None,
           "2024-01-31", "a@b.co", "FORBIDDEN", "forbidden-start"]
NUMBERS = [0.0, 1.0, -1.5, 99.999, 100.0, 102.0, 3.0, 0.3, 1e6, None]
INT_NUMBERS = [0, 1, -3, 100, 102, 7, None]


class TestTypedString:
    @pytest.mark.parametrize("schema", [
        {"type": "string", "minLength": 3, "maxLength": 10},
        {"type": "string", "pattern": "^[-\\w.]+/[-\\w.]+$"},
        {"type": "string", "pattern": "(^[a-z])&(!(^forbidden))"},
        {"type": "string", "format": "email"},
        {"type": "string", "format": "date"},
        {"enum": ["org/repo", "a/b/c", 5]},
        {"NOT_enum": ["abc"]},
        {"const": "abc"},
        {"type": ["string", "null"]},
        {"not": {"minLength": 3}},
        {"anyOf": [{"maxLength": 1}, {"pattern": "/"}]},
        {"oneOf": [{"maxLength": 3}, {"pattern": "a"}]},
        {"if": {"pattern": "^a"}, "then": {"minLength": 3}, "else": {"maxLength": 5}},
        {"allOf": [{"minLength": 1}, {"maxLength": 8}]},
        {"minimum": 5},  # vacuous on strings
        True,
        False,
    ])
    def test_string_schemas(self, spark, schema):
        check_typed(spark, schema, STRINGS, "string")


class TestTypedNumber:
    @pytest.mark.parametrize("schema", [
        {"type": "number", "minimum": 100},
        {"type": "number", "exclusiveMinimum": 100},
        {"type": "number", "minimum": 100, "multipleOf": 3},
        {"type": "number", "multipleOf": 0.1},
        {"type": "integer"},
        {"type": "integer", "maximum": 50},
        {"enum": [1, 102.0, "x"]},
        {"NOT_multipleOf": 3},
        {"not": {"minimum": 0}},
        {"oneOf": [{"multipleOf": 3}, {"multipleOf": 5}]},
    ])
    def test_double_schemas(self, spark, schema):
        check_typed(spark, schema, NUMBERS, "double")

    @pytest.mark.parametrize("schema", [
        {"type": "integer", "minimum": 0},
        {"type": "number", "multipleOf": 2},
        {"enum": [1, 7]},
    ])
    def test_bigint_schemas(self, spark, schema):
        check_typed(spark, schema, INT_NUMBERS, "bigint")


class TestTypedArray:
    @pytest.mark.parametrize("schema", [
        {"type": "array", "minItems": 2},
        {"type": "array", "maxItems": 2},
        {"type": "array", "items": {"type": "number", "minimum": 0}},
        {"type": "array", "uniqueItems": True},
        {"type": "array", "prefixItems": [{"minimum": 5}], "items": {"maximum": 3}},
        {"type": "array", "contains": {"minimum": 3}, "minContains": 2},
        {"type": "array", "contains": {"minimum": 3}, "maxContains": 1},
    ])
    def test_array_schemas(self, spark, schema):
        values = [[], [1.0], [1.0, 2.0], [5.0, 1.0, 1.0], [3.0, 4.0, 5.0],
                  [1.0, 1.0], [-1.0, 0.0], None, [None, 1.0]]
        check_typed(spark, schema, values, "array<double>")


class TestTypedStruct:
    @pytest.mark.parametrize("schema", [
        {"type": "object", "required": ["a"]},
        {"type": "object", "required": ["missing_key"]},
        {"type": "object", "properties": {"a": {"type": "number", "minimum": 0}}},
        {"type": "object", "properties": {"a": {"minimum": 0}}, "additionalProperties": {"type": "string"}},
        {"type": "object", "minProperties": 2},
        {"type": "object", "dependentRequired": {"a": ["b"]}},
    ])
    def test_struct_schemas(self, spark, schema):
        # struct rows; None field == key absent (typed-data convention)
        rows = [
            {"a": 1.0, "b": "x"},
            {"a": -1.0, "b": None},
            {"a": None, "b": "y"},
            {"a": None, "b": None},
            None,
        ]
        df = spark.createDataFrame([(r,) for r in rows], "v struct<a: double, b: string>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        ev = Evaluator(schema)
        dicts = [
            None if r is None else {k: x for k, x in r.items() if x is not None}
            for r in rows
        ]
        want = [ev.validate(d) for d in dicts]
        assert got == want


class TestTypedMap:
    def test_map_object(self, spark):
        schema = {
            "type": "object",
            "required": ["a"],
            "properties": {"a": {"minimum": 0}},
            "maxProperties": 2,
        }
        rows = [{"a": 1.0}, {"a": -1.0}, {"b": 2.0}, {"a": 0.0, "b": 1.0, "c": 2.0}, {}, None]
        df = spark.createDataFrame([(r,) for r in rows], "v map<string, double>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        want = [Evaluator(schema).validate(r) for r in rows]
        assert got == want


class TestTypedFallbackSignal:
    def test_recursive_ref_bounded_by_dtype(self, spark):
        # $ref recursion *consumes dtype structure*, so it terminates
        # naturally on typed columns and stays on the builtin tier
        schema = {"type": ["array", "number"], "items": {"$ref": "#"}}
        values = [[1.0, 2.0], [], [-1.0], None]
        check_typed(spark, schema, values, "array<double>")

    def test_self_loop_ref_raises(self, spark):
        # a ref that does not consume structure loops → depth guard
        schema = {"allOf": [{"$ref": "#"}]}
        df = spark.createDataFrame([("x",)], "v string")
        with pytest.raises(CompileError):
            TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)

    def test_composite_enum_raises(self, spark):
        df = spark.createDataFrame([([1.0],)], "v array<double>")
        with pytest.raises(CompileError):
            TypedCompiler({"enum": [[1.0]]}).compile(df["v"], df.schema["v"].dataType)


JSON_VALUES = [
    None, True, False, 0, 1, -2, 3.5, 100, 102, "", "a", "abc", "org/repo",
    [1, 2], ["a"], [], {"a": 1}, {"a": -1}, {"b": 2}, {}, {"a": "x"},
    [3, 4, 1], {"a": 1, "b": 2, "c": 3},
]


class TestJsonTiers:
    @pytest.mark.parametrize("schema,expect_tier", [
        ({"type": "number", "minimum": 100}, "variant"),
        ({"type": "integer"}, "variant"),
        ({"type": "string", "minLength": 2}, "variant"),
        ({"type": ["string", "null"]}, "variant"),
        ({"enum": ["a", 1, None, True]}, "variant"),
        ({"const": "abc"}, "variant"),
        ({"type": "object", "required": ["a"], "properties": {"a": {"type": "number", "minimum": 0}}}, "variant"),
        ({"type": "array", "minItems": 2}, "variant"),
        ({"oneOf": [{"type": "string"}, {"type": "number"}]}, "variant"),
        ({"not": {"type": "object"}}, "variant"),
        ({"if": {"type": "number"}, "then": {"minimum": 0}}, "variant"),
        # widened variant tier: array/object applicators via
        # array<variant> / map<string,variant> casts, bounded $ref
        ({"type": "array", "items": {"type": "number"}}, "variant"),
        ({"type": "object", "minProperties": 2}, "variant"),
        ({"patternProperties": {"^a": {"type": "number"}}}, "variant"),
        ({"dependentRequired": {"a": ["b"]}}, "variant"),
        ({"type": "array", "prefixItems": [{"type": "number"}], "items": {"type": "string"}}, "variant"),
        ({"type": "array", "contains": {"minimum": 3}, "minContains": 1, "maxContains": 2}, "variant"),
        ({"propertyNames": {"maxLength": 1}}, "variant"),
        ({"additionalProperties": {"type": "number"}, "properties": {"a": True}}, "variant"),
        # UDF-tier residue: composite enum literals, uniqueItems
        # (variant deep-equality), unbounded recursion
        ({"enum": [[1, 2]]}, "arrow_udf"),
        ({"type": "array", "uniqueItems": True}, "arrow_udf"),
        ({"type": ["array", "number"], "items": {"$ref": "#"}}, "arrow_udf"),
    ])
    def test_json_parity(self, spark, schema, expect_tier):
        tier = check_json(spark, schema, JSON_VALUES)
        assert tier == expect_tier

    def test_malformed_json_is_invalid(self, spark):
        df = spark.createDataFrame([("{not json",), (None,)], "v string")
        pred, tier = compile_json({"type": "object"}, df["v"])
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        assert got == [False, False]  # malformed invalid; NULL cell = JSON null → not object


class TestAdvancedObjectKeywords:
    """patternProperties / propertyNames / dependentSchemas on the
    typed (codegen) tier — previously UDF-fallback territory."""

    def test_struct_pattern_properties(self, spark):
        schema = {
            "type": "object",
            "patternProperties": {"^x_": {"type": "number", "minimum": 0}},
        }
        rows = [
            {"x_a": 1.0, "other": -5.0},   # x_a ok; other unconstrained
            {"x_a": -1.0, "other": 1.0},   # x_a violates minimum
            {"x_a": None, "other": None},  # x_a absent → vacuous
        ]
        df = spark.createDataFrame([(r,) for r in rows], "v struct<x_a: double, other: double>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        ev = Evaluator(schema)
        dicts = [{k: x for k, x in r.items() if x is not None} for r in rows]
        assert got == [ev.validate(d) for d in dicts] == [True, False, True]

    def test_struct_additional_excludes_pattern_matched(self, spark):
        schema = {
            "type": "object",
            "properties": {"a": {"type": "number"}},
            "patternProperties": {"^x_": {"type": "number"}},
            "additionalProperties": {"type": "number", "maximum": 0},
        }
        rows = [
            {"a": 1.0, "x_b": 99.0, "c": -1.0},  # c<=0 ok; x_b exempt
            {"a": 1.0, "x_b": 99.0, "c": 1.0},   # c violates maximum
        ]
        df = spark.createDataFrame(
            [(r,) for r in rows], "v struct<a: double, x_b: double, c: double>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        ev = Evaluator(schema)
        assert got == [ev.validate(d) for d in rows] == [True, False]

    def test_struct_property_names(self, spark):
        schema = {"type": "object", "propertyNames": {"maxLength": 2}}
        rows = [
            {"ab": 1.0, "lng": None},  # only short key present
            {"ab": 1.0, "lng": 2.0},   # 'lng' (len 3) present → invalid
        ]
        df = spark.createDataFrame([(r,) for r in rows], "v struct<ab: double, lng: double>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        ev = Evaluator(schema)
        dicts = [{k: x for k, x in r.items() if x is not None} for r in rows]
        assert got == [ev.validate(d) for d in dicts] == [True, False]

    def test_struct_dependent_schemas(self, spark):
        schema = {
            "type": "object",
            "dependentSchemas": {"a": {"required": ["b"]}},
        }
        rows = [
            {"a": 1.0, "b": 2.0},     # trigger + dependency → ok
            {"a": 1.0, "b": None},    # trigger without b → invalid
            {"a": None, "b": None},   # no trigger → vacuous
        ]
        df = spark.createDataFrame([(r,) for r in rows], "v struct<a: double, b: double>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        ev = Evaluator(schema)
        dicts = [{k: x for k, x in r.items() if x is not None} for r in rows]
        assert got == [ev.validate(d) for d in dicts] == [True, False, True]

    @pytest.mark.parametrize("value,want", [
        ({"x_a": 1.0}, True),
        ({"x_a": -1.0}, False),           # pattern value violates
        ({"ok": 5.0, "toolong": 1.0}, False),  # propertyNames maxLength
        ({"ok": -2.0}, True),
        ({}, True),
    ])
    def test_map_pattern_and_names(self, spark, value, want):
        schema = {
            "type": "object",
            "patternProperties": {"^x_": {"type": "number", "minimum": 0}},
            "propertyNames": {"maxLength": 3},
        }
        df = spark.createDataFrame([(value,)], "v map<string, double>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        ev = Evaluator(schema)
        assert got == [ev.validate(value)] == [want]

    @pytest.mark.parametrize("value,want", [
        ({"a": 1.0, "b": 2.0}, True),
        ({"a": 1.0}, False),
        ({"b": 2.0}, True),
    ])
    def test_map_dependent_schemas(self, spark, value, want):
        schema = {"type": "object", "dependentSchemas": {"a": {"required": ["b"]}}}
        df = spark.createDataFrame([(value,)], "v map<string, double>")
        pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
        got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
        ev = Evaluator(schema)
        assert got == [ev.validate(value)] == [want]

    def test_map_additional_excludes_pattern_matched(self, spark):
        schema = {
            "type": "object",
            "properties": {"a": {"type": "number"}},
            "patternProperties": {"^x_": {"type": "number"}},
            "additionalProperties": {"type": "number", "maximum": 0},
        }
        cases = [
            ({"a": 9.0, "x_b": 9.0, "c": -1.0}, True),
            ({"a": 9.0, "x_b": 9.0, "c": 1.0}, False),
        ]
        for value, want in cases:
            df = spark.createDataFrame([(value,)], "v map<string, double>")
            pred = TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)
            got = [r["ok"] for r in df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()]
            ev = Evaluator(schema)
            assert got == [ev.validate(value)] == [want]


class TestPortableRegexGuard:
    def test_java_only_pattern_rejected_on_map_tier(self, spark):
        from fences_spark.compiler.typed import TypedCompiler
        schema = {"type": "object",
                  "patternProperties": {r"\p{Lower}+": {"type": "number"}}}
        df = spark.createDataFrame([({"a": 1.0},)], "v map<string, double>")
        with pytest.raises(CompileError):
            TypedCompiler(schema).compile(df["v"], df.schema["v"].dataType)


# ---------------------------------------------------------------------------
# recursive-$ref depth properties: instances PAST the unroll bound
# (reference precedent: test/json_schema/test_generate.py:123-227)
# ---------------------------------------------------------------------------

RECURSIVE_SHAPES = {
    "linked_list": {
        "$defs": {"node": {"type": "object",
                           "properties": {"v": {"type": "integer"},
                                          "next": {"$ref": "#/$defs/node"}},
                           "required": ["v"]}},
        "$ref": "#/$defs/node"},
    "tree": {
        "$defs": {"t": {"type": "object",
                        "properties": {"v": {"type": "integer"},
                                       "kids": {"type": "array",
                                                "items": {"$ref": "#/$defs/t"}}},
                        "required": ["v"]}},
        "$ref": "#/$defs/t"},
    "alternating": {
        "$defs": {"a": {"type": "object",
                        "properties": {"b": {"$ref": "#/$defs/b"}},
                        "required": []},
                  "b": {"type": "array",
                        "items": {"$ref": "#/$defs/a"},
                        "maxItems": 2}},
        "$ref": "#/$defs/a"},
}


def _deep_instance(shape: str, depth: int, defect_at: int | None):
    """Build an instance of the given nesting depth; plant a type
    defect at level ``defect_at`` when given."""
    if shape == "linked_list":
        top = node = {"v": 0}
        for d in range(1, depth):
            node["next"] = {"v": d}
            node = node["next"]
        if defect_at is not None:
            cur = top
            for _ in range(defect_at):
                cur = cur["next"]
            cur["v"] = "bad"
        return top
    if shape == "tree":
        top = node = {"v": 0, "kids": []}
        for d in range(1, depth):
            child = {"v": d, "kids": []}
            node["kids"] = [{"v": -d}, child]
            node = child
        if defect_at is not None:
            cur = top
            for _ in range(defect_at):
                cur = cur["kids"][-1]
            cur["v"] = "bad"
        return top
    # alternating object/array recursion
    top = node = {}
    for d in range(1, depth):
        child: dict = {}
        node["b"] = [child]
        node = child
    if defect_at is not None:
        cur = top
        for _ in range(defect_at):
            cur = cur["b"][0]
        cur["b"] = [1]  # array item must be an object
    return top


@settings(max_examples=80, deadline=None)
@given(
    shape=st.sampled_from(sorted(RECURSIVE_SHAPES)),
    depth=st.integers(13, 160),  # strictly past the unroll bound (12)
    defect=st.one_of(st.none(), st.floats(0.0, 1.0)),
)
def test_evaluator_deep_recursion_matches_jsonschema(shape, depth, defect):
    """Arrow-tier evaluator verdicts must equal jsonschema for
    instances whose nesting is far beyond the compile tiers' unroll
    bound — including defects planted at the DEEPEST levels (a
    truncating evaluator would miss them)."""
    import jsonschema

    from fences_spark.schema.evaluator import Evaluator

    schema = RECURSIVE_SHAPES[shape]
    defect_at = None if defect is None else min(int(defect * depth), depth - 1)
    inst = _deep_instance(shape, depth, defect_at)
    want = jsonschema.Draft202012Validator(schema).is_valid(inst)
    got = Evaluator(schema).validate(inst)
    assert got == want, (shape, depth, defect_at, got, want)
    if defect_at is not None:
        assert want is False  # the planted defect must actually bite


@pytest.mark.parametrize("shape", sorted(RECURSIVE_SHAPES))
def test_spark_tier_deep_recursion_matches_jsonschema(shape, spark):
    """Same property through compile_json: a recursive schema exceeds
    the variant tier's bounded unroll, so dispatch must fall back to
    the Arrow UDF and still judge 120-deep instances exactly.  (The
    typed tier is structurally bounded by the column dtype —
    test_recursive_ref_bounded_by_dtype.)"""
    import json as _json

    import jsonschema

    from fences_spark.compiler.jsonvalue import compile_json

    schema = RECURSIVE_SHAPES[shape]
    cases = []
    for depth in (13, 40, 120):
        cases.append(_deep_instance(shape, depth, None))
        cases.append(_deep_instance(shape, depth, depth - 1))
        cases.append(_deep_instance(shape, depth, depth // 2))
    val = jsonschema.Draft202012Validator(schema)
    # jsonschema burns ~4 Python frames per nesting level and the
    # alternating shape nests 2 levels per depth unit — give the
    # oracle stack headroom (the engine under test runs in Arrow
    # workers with their own fresh stack)
    import sys

    saved = sys.getrecursionlimit()
    sys.setrecursionlimit(20000)
    try:
        want = [val.is_valid(c) for c in cases]
    finally:
        sys.setrecursionlimit(saved)
    df = spark.createDataFrame(
        [(i, _json.dumps(c)) for i, c in enumerate(cases)], "i long, js string"
    )
    pred, tier = compile_json(schema, F.col("js"))
    assert tier == "arrow_udf"  # past the unroll bound → fallback tier
    got = {r["i"]: r["ok"] for r in df.select("i", pred.alias("ok")).collect()}
    for i, w in enumerate(want):
        assert got[i] == w, (shape, i, got[i], w)
    assert not all(want) and any(want)  # both verdicts exercised
