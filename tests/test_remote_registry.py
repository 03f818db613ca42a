"""Pre-registered external schema resources (round 3b).

The reference (and the vendored suite corpus) blacklists
refRemote.json because resolution would need network fetches.  The
engine instead takes the registry route — external documents are
supplied up front (`Evaluator(root, resources={uri: doc})`,
`compile_json(..., resources=...)`), the same model as jsonschema's
``referencing.Registry`` — so cross-document $ref/$dynamicRef resolve
with zero I/O anywhere, executors included (the registry ships in the
UDF closure).  Every case here is arbitrated against
jsonschema.Draft202012Validator backed by the equivalent Registry, so
the labels carry no authority of their own.

Case shapes mirror the official refRemote.json suite
(remote ref / fragment within remote / ref within remote / base-URI
change via $id / anchor within remote), re-transcribed for a
registry rather than a localhost server.
"""

from __future__ import annotations

import jsonschema
import pytest
from referencing import Registry, Resource
from referencing.jsonschema import DRAFT202012

from fences_spark.schema.evaluator import Evaluator

BASE = "https://registry.test/draft2020-12/"

REMOTE_DOCS: dict[str, dict] = {
    BASE + "integer.json": {"type": "integer"},
    BASE + "subSchemas.json": {
        "$defs": {
            "integer": {"type": "integer"},
            "refToInteger": {"$ref": "#/$defs/integer"},
        }
    },
    BASE + "name-defs.json": {
        "$defs": {"orNull": {"anyOf": [{"type": "null"}, {"$ref": "#"}]}},
        "type": "string",
    },
    BASE + "baseUriChange/folderInteger.json": {"type": "integer"},
    BASE + "draft2020-12-list.json": {
        "$id": BASE + "draft2020-12-list.json",
        "$dynamicAnchor": "node",
        "type": "array",
        "items": {"$dynamicRef": "#node"},
    },
    BASE + "anchored.json": {
        "$defs": {"A": {"$anchor": "foo", "type": "integer"}}
    },
}


def _registry() -> Registry:
    return Registry().with_resources(
        (uri, Resource.from_contents(doc, default_specification=DRAFT202012))
        for uri, doc in REMOTE_DOCS.items()
    )


CASES = [
    ("remote ref", {"$ref": BASE + "integer.json"},
     [(1, True), ("a", False)]),
    ("fragment within remote ref",
     {"$ref": BASE + "subSchemas.json#/$defs/integer"},
     [(1, True), ("a", False)]),
    ("ref within remote ref",
     {"$ref": BASE + "subSchemas.json#/$defs/refToInteger"},
     [(1, True), ("a", False)]),
    ("remote anchor",
     {"$ref": BASE + "anchored.json#foo"},
     [(2, True), ("x", False)]),
    ("remote ref with recursion through the remote root",
     {"$ref": BASE + "name-defs.json#/$defs/orNull"},
     [(None, True), ("hi", True), (3, False)]),
    ("relative ref resolved against the referencing resource's base",
     {"$id": BASE + "baseUriChange/top.json",
      "properties": {"n": {"$ref": "folderInteger.json"}}},
     [({"n": 1}, True), ({"n": "a"}, False)]),
    ("$dynamicRef across documents: outer $dynamicAnchor re-binds the remote recursion",
     # the remote generic list recurses via $dynamicRef "#node"; the
     # outer document plants a node $dynamicAnchor saying items are
     # strings, so the remote's recursion must re-bind to it
     {"$id": BASE + "string-list.json",
      "$defs": {"str": {"$dynamicAnchor": "node", "type": "string"}},
      "$ref": BASE + "draft2020-12-list.json"},
     [(["a", "b"], True), ([1], False), ([["a"]], False)]),
    ("the same remote list WITHOUT an outer re-binding recurses into itself",
     {"$ref": BASE + "draft2020-12-list.json"},
     [([[], [[]]], True), (["a"], False)]),
]


@pytest.mark.parametrize("desc,schema,cases", CASES, ids=[c[0] for c in CASES])
def test_registry_resolution_matches_jsonschema(desc, schema, cases):
    ev = Evaluator(schema, resources=REMOTE_DOCS)
    val = jsonschema.Draft202012Validator(schema, registry=_registry())
    for value, expected in cases:
        assert val.is_valid(value) is expected, f"arbitration: {desc} / {value!r}"
        assert bool(ev.validate(value)) is expected, f"engine: {desc} / {value!r}"


def test_unregistered_uri_still_raises():
    ev = Evaluator({"$ref": "https://registry.test/not-registered.json"},
                   resources=REMOTE_DOCS)
    with pytest.raises(ValueError):
        ev.validate(1)


def test_spark_tier_ships_registry_to_executors(spark):
    from pyspark.sql import functions as F

    from fences_spark.compiler.jsonvalue import compile_json

    schema = {"$ref": BASE + "subSchemas.json#/$defs/refToInteger"}
    df = spark.createDataFrame(
        [("3",), ('"s"',), (None,), ("not json",)], "js string"
    )
    pred, tier = compile_json(schema, F.col("js"), resources=REMOTE_DOCS)
    assert tier == "arrow_udf"
    got = [r[0] for r in df.select(pred).collect()]
    # NULL cell evaluates as JSON null (invalid for integer); malformed
    # JSON is invalid
    assert got == [True, False, False, False]


def test_ruleset_resources_json_and_typed_modes(spark):
    from fences_spark.compiler.ruleset import RuleSet

    df = spark.createDataFrame(
        [(1, '{"n": 3}', "abc"), (2, '{"n": "x"}', None), (3, "oops", "z")],
        "id long, cell string, s string",
    )
    rs = (
        RuleSet()
        .add("remote_obj", "cell",
             {"type": "object",
              "properties": {"n": {"$ref": BASE + "integer.json"}}},
             mode="json", resources=REMOTE_DOCS)
        .add("remote_str", "s",
             {"anyOf": [{"type": "null"},
                        {"$ref": BASE + "subSchemas.json#/$defs/integer"},
                        {"type": "string", "minLength": 2}]},
             mode="typed", resources=REMOTE_DOCS)
    )
    res = rs.apply(df)
    assert res.tiers == {"remote_obj": "arrow_udf", "remote_str": "arrow_udf"}
    rows = {r["id"]: (r["remote_obj"], r["remote_str"]) for r in res.df.collect()}
    assert rows == {1: (True, True), 2: (False, True), 3: (False, False)}
