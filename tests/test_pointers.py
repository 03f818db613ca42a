"""Instance-side violation pointers (schema/pointers.py +
compiler/pointers.py) — the JSON dual of the XSD violation paths.

Arbitration: ``jsonschema.Draft202012Validator.iter_errors`` is the
error-location oracle — every top-level ValidationError corresponds
to one (pointer, keyword) pair as (absolute_path, validator).  The
whole vendored JSTS corpus (802 cases) runs through the parity sweep;
cases where jsonschema reports ``validator=None`` (bare-False
subschemas — jsonschema's position for those is an implementation
quirk, see schema/pointers.py docstring) are compared on our own
pinned dialect instead.
"""

from __future__ import annotations

import glob
import json
import os

import jsonschema
import pytest
from pyspark.sql import functions as F, types as T

from fences_spark.compiler import CompileError
from fences_spark.compiler.pointers import (
    TypedPointerCompiler,
    compile_json_pointers,
    compile_pointers,
)
from fences_spark.schema.evaluator import Evaluator, SchemaDepthError
from fences_spark.schema.pointers import (
    PointerCollector,
    render_pointer,
    violation_pointers,
)

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "jsts", "draft2020-12")
CORPUS_FILES = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(CORPUS_DIR, "*.json"))
)


def _load(fname):
    with open(os.path.join(CORPUS_DIR, fname)) as f:
        return json.load(f)


def _js_pairs(schema, inst):
    """jsonschema top-level errors as sorted (pointer, validator)
    pairs; None when any error has validator None (False-schema quirk
    — jsonschema's location for those is implementation-defined)."""
    out = set()
    for e in jsonschema.Draft202012Validator(schema).iter_errors(inst):
        if e.validator is None:
            return None
        toks = [str(x).replace("~", "~0").replace("/", "~1") for x in e.absolute_path]
        out.add(("#" if not toks else "#/" + "/".join(toks), str(e.validator)))
    return sorted(out)


# ---------------------------------------------------------------------------
# render + dialect pinning
# ---------------------------------------------------------------------------

def test_render_pointer():
    assert render_pointer(()) == "#"
    assert render_pointer(("a", "0")) == "#/a/0"
    # RFC 6901 escaping, reference JsonPointer style
    assert render_pointer(("a~b", "c/d")) == "#/a~0b/c~1d"


def test_false_schema_dialect():
    """Dialect choice (pinned): a False schema errors at the instance
    location it rejects, keyword 'false'."""
    assert violation_pointers({"a": 1}, {"properties": {"a": False}}) == [("#/a", "false")]
    assert violation_pointers([5], {"prefixItems": [False]}) == [("#/0", "false")]
    assert violation_pointers(3, False) == [("#", "false")]


def test_depth_guard_propagates():
    with pytest.raises(SchemaDepthError):
        violation_pointers("x", {"allOf": [{"$ref": "#"}]})


def test_consistency_invariant_quick():
    """errors(v) == [] iff validate(v) — the collector never invents
    or misses a verdict."""
    schemas = [
        {"type": "object", "required": ["a"], "properties": {"a": {"minimum": 0}}},
        {"anyOf": [{"type": "string"}, {"contains": {"const": 1}}]},
        {"unevaluatedProperties": False, "properties": {"a": True}},
        {"not": {"enum": [3]}},
        {"if": {"type": "number"}, "then": {"multipleOf": 2}, "else": {"minLength": 2}},
    ]
    values = [None, True, 3, 4, "x", "ab", [1], [2], {"a": 1}, {"a": -1, "b": 2}, {}]
    for s in schemas:
        ev = Evaluator(s)
        pc = PointerCollector(s)
        for v in values:
            assert (pc.errors(v) == []) == ev.validate(v), (s, v)


# ---------------------------------------------------------------------------
# jsonschema parity — fixed probes for every vocabulary rule
# ---------------------------------------------------------------------------

FIXED_CASES = [
    ({"type": "object", "properties": {"a": {"type": "integer"},
      "b": {"items": {"minimum": 3}}}, "required": ["c"]}, {"a": "x", "b": [1, 5, 2]}),
    ({"additionalProperties": False, "properties": {"a": True}}, {"a": 1, "b": 2}),
    ({"additionalProperties": {"type": "string"}, "properties": {"a": True}}, {"a": 1, "b": 2}),
    ({"propertyNames": {"maxLength": 1}}, {"ab": 1, "c": 2}),
    ({"anyOf": [{"type": "string"}, {"minimum": 5}]}, 3),
    ({"oneOf": [{"type": "integer"}, {"minimum": 2}]}, 3),
    ({"not": {"type": "integer"}}, 3),
    ({"if": {"type": "integer"}, "then": {"minimum": 5}}, 3),
    ({"if": {"required": ["a"]}, "else": {"required": ["b"]}}, {}),
    ({"contains": {"type": "string"}, "minContains": 1}, [1, 2]),
    ({"contains": {"type": "integer"}, "minContains": 3}, [1, 2, "x"]),
    ({"contains": {"type": "integer"}, "minContains": 2}, ["a", "b"]),
    ({"contains": {"type": "integer"}, "maxContains": 1}, [1, 2]),
    ({"prefixItems": [{"type": "string"}], "items": {"type": "integer"}}, [1, "x"]),
    ({"items": False}, [1]),
    ({"items": False, "prefixItems": [True]}, [1, 2]),
    ({"uniqueItems": True}, [1, 1]),
    ({"dependentRequired": {"a": ["b"]}}, {"a": 1}),
    ({"dependentSchemas": {"a": {"required": ["b"]}}}, {"a": 1}),
    ({"$ref": "#/$defs/p", "$defs": {"p": {"type": "integer"}}}, "x"),
    ({"unevaluatedProperties": False, "properties": {"a": True}}, {"a": 1, "b": 2}),
    ({"unevaluatedProperties": {"type": "string"}, "properties": {"a": True}}, {"a": 1, "b": 2}),
    ({"unevaluatedItems": False, "prefixItems": [True]}, [1, 2]),
    ({"allOf": [{"minimum": 5}, {"type": "string"}]}, 3),
    ({"minProperties": 2}, {"a": 1}),
    ({"properties": {"a": {"properties": {"b": {"prefixItems": [{"const": 5}]}}}}},
     {"a": {"b": [4]}}),
    ({"type": "array", "properties": {"a": {"type": "string"}}}, {"a": 1}),
    ({"minimum": 5, "type": "string"}, 3),
    ({"type": "string", "minLength": 5, "pattern": "x"}, "abc"),
    ({"patternProperties": {"^a": {"type": "integer"}}}, {"ab": "x"}),
    ({"enum": [1, 2]}, 3),
    ({"multipleOf": 3}, 4),
    ({"exclusiveMinimum": 3}, 3),
    ({"properties": {"a~b": {"type": "string"}, "c/d": {"type": "string"}}},
     {"a~b": 1, "c/d": 2}),
    ({"allOf": [{"properties": {"x": {"minimum": 0}}}, {"required": ["y"]}]}, {"x": -1}),
]


@pytest.mark.parametrize("schema,inst", FIXED_CASES)
def test_jsonschema_parity_fixed(schema, inst):
    js = _js_pairs(schema, inst)
    assert js is not None, "fixed corpus must avoid bare-False subschemas"
    assert violation_pointers(inst, schema) == js


# ---------------------------------------------------------------------------
# jsonschema parity — the WHOLE vendored JSTS corpus (802 cases)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fname", CORPUS_FILES)
def test_jsts_corpus_pointer_parity(fname):
    """Every suite case: (1) the consistency invariant against our own
    evaluator; (2) exact (pointer, keyword) parity with jsonschema on
    every case jsonschema can arbitrate (no validator-None errors)."""
    checked = skipped = 0
    for s in _load(fname):
        pc = PointerCollector(s["schema"])
        ev = Evaluator(s["schema"])
        for t in s["tests"]:
            ours = pc.errors(t["data"])
            assert (ours == []) == ev.validate(t["data"]), (
                f"{fname} :: {s['description']} :: {t['description']}"
            )
            js = _js_pairs(s["schema"], t["data"])
            if js is None:
                skipped += 1
                continue
            checked += 1
            assert ours == js, (
                f"{fname} :: {s['description']} :: {t['description']}: "
                f"ours={ours} jsonschema={js}"
            )
    assert checked > 0 or skipped > 0


# ---------------------------------------------------------------------------
# typed + Arrow Column tiers
# ---------------------------------------------------------------------------

TYPED_SCHEMA = {
    "type": "object",
    "required": ["name", "size"],
    "properties": {
        "name": {"type": "string", "minLength": 2, "pattern": "^[a-z]+$"},
        "size": {"type": "integer", "minimum": 0, "maximum": 100},
        "tags": {"type": "array", "items": {"type": "string", "maxLength": 3},
                 "minItems": 1, "uniqueItems": True},
        "meta": {"type": "object",
                 "properties": {"lvl": {"enum": ["a", "b"]}},
                 "required": ["lvl"], "additionalProperties": False},
        "pair": {"prefixItems": [{"const": 1}, {"minimum": 0}], "items": False},
        "alt": {"oneOf": [{"type": "string"}, {"minimum": 10}]},
        "ref": {"$ref": "#/$defs/pos"},
        "choice": {"anyOf": [{"const": "x"}, {"const": "y"}]},
        "neg": {"not": {"const": 13}},
        "scores": {"contains": {"minimum": 50}, "minContains": 2, "maxContains": 3},
    },
    "patternProperties": {"^x_": {"type": "number", "exclusiveMinimum": 0}},
    "dependentRequired": {"size": ["name"]},
    "dependentSchemas": {"alt": {"required": ["tags"]}},
    "$defs": {"pos": {"type": "number", "exclusiveMinimum": 0}},
}

TYPED_ROWS = [
    {"name": "ok", "size": 5, "tags": ["a"]},
    {"name": "X", "size": -1},
    {"name": "okay", "size": 101, "tags": ["abcd", "ok", "ok"]},
    {"size": 5, "meta": {"lvl": "z", "extra": "w"}},
    {"name": "ok", "size": 5, "pair": [2, -3, 9], "tags": ["a"]},
    {"name": "ok", "size": 5, "alt": 3.5},
    {"name": "ok", "size": 5, "ref": -2.0, "choice": "z", "neg": 13, "tags": ["a"]},
    {"name": "ok", "size": 5, "scores": [10, 60], "tags": ["a"]},
    {"name": "ok", "size": 5, "scores": [55, 60, 70, 80], "tags": ["a"]},
    {"name": "ok", "size": 5, "x_v": -1.5, "tags": ["a"]},
    None,
]

TYPED_DT = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("meta", T.StructType([
        T.StructField("lvl", T.StringType()),
        T.StructField("extra", T.StringType()),
    ])),
    T.StructField("pair", T.ArrayType(T.LongType())),
    T.StructField("alt", T.DoubleType()),
    T.StructField("ref", T.DoubleType()),
    T.StructField("choice", T.StringType()),
    T.StructField("neg", T.LongType()),
    T.StructField("scores", T.ArrayType(T.LongType())),
    T.StructField("x_v", T.DoubleType()),
])


class TestColumnTiers:
    def _expected(self, row):
        return violation_pointers(row, TYPED_SCHEMA)

    def test_typed_tier_matches_collector(self, spark):
        jdf = spark.createDataFrame(
            [(json.dumps(r) if r is not None else None,) for r in TYPED_ROWS],
            "v string",
        )
        tdf = jdf.select(F.from_json("v", TYPED_DT).alias("s"))
        col, tier = compile_pointers(TYPED_SCHEMA, tdf["s"], TYPED_DT)
        assert tier == "typed_builtin"
        got = [
            [(e["pointer"], e["keyword"]) for e in r[0]]
            for r in tdf.select(col).collect()
        ]
        for row, g in zip(TYPED_ROWS, got):
            assert g == self._expected(row), row

    def test_arrow_tier_matches_collector(self, spark):
        jdf = spark.createDataFrame(
            [(json.dumps(r) if r is not None else None,) for r in TYPED_ROWS]
            + [("{not json",)],
            "v string",
        )
        col, tier = compile_json_pointers(TYPED_SCHEMA, jdf["v"])
        assert tier == "arrow_udf"
        got = [
            sorted((e["pointer"], e["keyword"]) for e in r[0])
            for r in jdf.select(col).collect()
        ]
        for row, g in zip(TYPED_ROWS, got):
            assert g == self._expected(row), row
        assert got[-1] == [("#", "json")]  # malformed cell

    def test_unsupported_keywords_raise(self):
        for s in (
            {"unevaluatedProperties": False},
            {"contentEncoding": "base64"},
        ):
            with pytest.raises(CompileError):
                TypedPointerCompiler(s)
        with pytest.raises(CompileError):
            # composite-literal enum: raises when the predicate is built
            TypedPointerCompiler({"enum": [[1, 2]]}).compile_pointers(
                F.col("a"), T.ArrayType(T.LongType())
            )
        with pytest.raises(CompileError):
            TypedPointerCompiler({"required": ["a"]}).compile_pointers(
                F.col("m"), T.MapType(T.StringType(), T.LongType())
            )

    def test_map_dtype_falls_back(self, spark):
        df = spark.createDataFrame(
            [({"a": 1},), ({"b": 2},), (None,)],
            T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))]),
        )
        col, tier = compile_pointers(
            {"required": ["a"]}, df["m"], df.schema["m"].dataType
        )
        assert tier == "arrow_udf"
        got = [
            sorted((e["pointer"], e["keyword"]) for e in r[0])
            for r in df.select(col).collect()
        ]
        # NULL cell = JSON null: `required` applies only to objects,
        # so null is VALID (evaluator + jsonschema agree)
        assert got == [[], [("#", "required")], []]

    def test_ruleset_pointers_end_to_end(self, spark):
        from fences_spark.compiler.ruleset import RuleSet

        df = spark.createDataFrame(
            [(1, "ab", '{"x": 1}'), (2, "A", '{"x": -5, "y": 2}'), (3, None, "{bad")],
            "id long, code string, payload string",
        )
        rs = RuleSet()
        rs.add("code_ok", "code",
               {"type": "string", "pattern": "^[a-z]+$", "minLength": 2})
        rs.add("payload_ok", "payload",
               {"type": "object", "properties": {"x": {"minimum": 0}},
                "additionalProperties": False}, mode="json")
        got = sorted(
            map(tuple, rs.pointers(df, "id").collect())
        )
        assert got == [
            (2, "code_ok", "#", "minLength"),
            (2, "code_ok", "#", "pattern"),
            (2, "payload_ok", "#", "additionalProperties"),
            (2, "payload_ok", "#/x", "minimum"),
            (3, "code_ok", "#", "type"),  # NULL cell = JSON null
            (3, "payload_ok", "#", "json"),
        ]

    def test_ref_in_items_falls_back_not_crashes(self, spark):
        """A $ref inside items/propertyNames used to raise KeyError at
        compile time (the null-branch sub-collector was rooted at the
        SUBSCHEMA, losing the root $defs scope) instead of CompileError
        — crashing RuleSet.pointers outright.  Now it surfaces as
        CompileError, the Arrow fallback engages, and pointers come out
        right (found by round-4 self-review)."""
        from fences_spark.compiler.ruleset import RuleSet

        df = spark.createDataFrame(
            [(1, [1.0, -2.0]), (2, None)], "id long, arr array<double>"
        )
        schema = {
            "type": "array",
            "items": {"$ref": "#/$defs/pos"},
            "$defs": {"pos": {"type": "number", "exclusiveMinimum": 0}},
        }
        rs = RuleSet().add("pos_arr", "arr", schema)
        got = sorted(map(tuple, rs.pointers(rs.apply(df).df, "id").collect()))
        assert got == [
            (1, "pos_arr", "#/1", "exclusiveMinimum"),
            (2, "pos_arr", "#", "type"),
        ]

        dfj = spark.createDataFrame([(1, '{"bad key": 1}')], "id long, j string")
        rs2 = RuleSet().add(
            "pn", "j",
            {
                "type": "object",
                "propertyNames": {"$ref": "#/$defs/name"},
                "$defs": {"name": {"pattern": "^[a-z]+$"}},
            },
            mode="json",
        )
        got2 = sorted(map(tuple, rs2.pointers(rs2.apply(dfj).df, "id").collect()))
        assert got2 == [(1, "pn", "#", "pattern")]


# ------------------------------------------------------------------
# seeded random cross-tier fuzz: compile_pointers (typed builtin tier
# with Arrow fallback) must equal the reference PointerCollector on
# random scalar/array schemas over random typed cells — the pointer
# dual of test_fuzz_spark_tier's boolean conformance fuzz.
# ------------------------------------------------------------------
def _rand_string_schema(rng):
    s = {"type": "string"}
    if rng.random() < 0.6:
        s["minLength"] = rng.randint(0, 6)
    if rng.random() < 0.6:
        s["maxLength"] = rng.randint(2, 10)
    if rng.random() < 0.5:
        s["pattern"] = rng.choice(
            ["^[a-z]+$", "^[-\\w.]+$", "ab", "^x", "[0-9]{2}", "^$|^a+b$"]
        )
    if rng.random() < 0.25:
        s["enum"] = rng.sample(["", "a", "ab", "xy", "héllo", "x" * 8], k=rng.randint(1, 4))
    return s


def _rand_number_schema(rng):
    s = {"type": rng.choice(["number", "integer", "number"])}
    if rng.random() < 0.6:
        s["minimum"] = rng.choice([-5, 0, 1, 2.5, 7])
    if rng.random() < 0.6:
        s["maximum"] = rng.choice([-1, 0, 3, 9.5, 100])
    if rng.random() < 0.3:
        s["exclusiveMinimum"] = rng.choice([-2, 0, 4])
    if rng.random() < 0.3:
        s["exclusiveMaximum"] = rng.choice([1, 6, 50])
    if rng.random() < 0.3:
        s["multipleOf"] = rng.choice([1, 2, 3, 0.5])
    return s


def _rand_array_schema(rng):
    s = {"type": "array", "items": _rand_number_schema(rng)}
    if rng.random() < 0.5:
        s["minItems"] = rng.randint(0, 3)
    if rng.random() < 0.5:
        s["maxItems"] = rng.randint(1, 4)
    if rng.random() < 0.4:
        s["uniqueItems"] = True
    return s


class TestPointerFuzz:
    def _check(self, spark, dtype, schemas, cells):
        """Compile every schema against one column of ``dtype``; every
        (cell, schema) pair must reproduce PointerCollector exactly
        (order-insensitive — the typed tier sorts entries)."""
        df = spark.createDataFrame([(c,) for c in cells], T.StructType(
            [T.StructField("v", dtype)]))
        cols, tiers = [], set()
        for i, s in enumerate(schemas):
            col, tier = compile_pointers(s, df["v"], dtype)
            tiers.add(tier)
            cols.append(col.alias(f"s{i}"))
        rows = df.select(*cols).collect()
        bad = []
        for cell, row in zip(cells, rows):
            for i, s in enumerate(schemas):
                got = sorted((e["pointer"], e["keyword"]) for e in row[f"s{i}"])
                want = sorted(violation_pointers(cell, s))
                if got != want:
                    bad.append((s, cell, got, want))
        assert not bad, bad[:5]
        return tiers

    def test_string_schemas(self, spark):
        import random

        rng = random.Random(20260821)
        schemas = [_rand_string_schema(rng) for _ in range(30)]
        cells = [None, "", "a", "ab", "abc", "x" * 7, "x" * 11, "héllo",
                 "A9", "a-b.c", "12", "xyz", "ab\ncd"] + [
            "".join(rng.choice("abxy z.-09é") for _ in range(rng.randint(0, 9)))
            for _ in range(25)
        ]
        tiers = self._check(spark, T.StringType(), schemas, cells)
        assert "typed_builtin" in tiers

    def test_number_schemas(self, spark):
        import random

        rng = random.Random(20260822)
        schemas = [_rand_number_schema(rng) for _ in range(30)]
        cells = [None, -5.0, -1.0, 0.0, 0.5, 1.0, 2.5, 3.0, 4.0, 6.0,
                 7.0, 9.5, 50.0, 100.0, 101.0, 1e9, -0.0, 0.3] + [
            rng.choice([float(rng.randint(-10, 110)), rng.uniform(-10, 110)])
            for _ in range(25)
        ]
        tiers = self._check(spark, T.DoubleType(), schemas, cells)
        assert "typed_builtin" in tiers

    def test_array_schemas(self, spark):
        import random

        rng = random.Random(20260823)
        schemas = [_rand_array_schema(rng) for _ in range(25)]
        cells = [None, [], [1.0], [0.0, 2.0], [2.0, 2.0], [-3.0, 0.5, 9.0],
                 [1.0, 2.0, 3.0, 4.0, 5.0]] + [
            [float(rng.randint(-5, 12)) for _ in range(rng.randint(0, 5))]
            for _ in range(20)
        ]
        self._check(spark, T.ArrayType(T.DoubleType()), schemas, cells)


def test_gated_arrow_pointers_match_ungated(spark):
    """pointer_entries_per_rule gates each Arrow-tier rule's UDF input
    on that rule's own failure (NULL input = short-circuit), so the
    Python cost tracks the defect rate even in projections that cannot
    pre-filter (streaming).  Semantics must be bit-equal to the
    ungated path — including the two NULL-convention traps: a
    malformed JSON cell ((#, json)) and a SQL-NULL cell, which the
    gate re-encodes as the JSON text "null" ((#, type))."""
    from fences_spark.compiler.ruleset import RuleSet

    df = spark.createDataFrame(
        [(1, '{"x": -5}', "ab"), (2, "{bad", "a"),
         (3, None, None), (4, '{"x": 1}', "ok")],
        "id long, j string, s string",
    )
    rs = RuleSet()
    rs.add("jx", "j",
           {"type": "object", "properties": {"x": {"minimum": 0}},
            "required": ["x"]}, mode="json")
    rs.add("s_ok", "s", {"type": "string", "minLength": 2})
    res = rs.apply(df)
    ann = res.df.withColumn(
        "vp", F.when(~F.col("row_valid"), rs.pointer_entries_per_rule(res.df))
    )
    gated = sorted(
        (r["id"], e["rule_id"], p["pointer"], p["keyword"])
        for r in ann.collect() if r["vp"] is not None
        for e in r["vp"] for p in e["pointers"]
    )
    ref = sorted(map(tuple, rs.pointers(
        res.df.filter(~F.col("row_valid")), "id").collect()))
    assert gated == ref
    assert (1, "jx", "#/x", "minimum") in gated
    assert (2, "jx", "#", "json") in gated
    assert (3, "jx", "#", "type") in gated
