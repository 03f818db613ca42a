"""Schema inference round-trip (round 5): data -> profile -> inferred
draft-2020-12 schema -> RuleSet validation, all inside the engine."""

from __future__ import annotations

import pyspark.sql.functions as F

from fences_spark.compiler.ruleset import RuleSet
from fences_spark.operators.jsonprofile import json_path_profile
from fences_spark.schema.infer import infer_schema

DOCS = [
    (1, '{"id": 5, "cust": {"key": 3, "seg": "A"}, '
        '"items": [{"p": 1, "q": 2.5}, {"p": 2}], "flag": true}'),
    (2, '{"id": "x", "cust": {"key": 9}, "items": []}'),
    (3, '{"id": 7, "cust": {"key": 1, "seg": "B"}, "items": [{"p": 3}], '
        '"note": null}'),
]


def _infer(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, j string")
    return infer_schema(json_path_profile(df, "doc_id", "j"))


def test_inferred_schema_shape(spark):
    schema = _infer(spark, DOCS)
    assert schema["anyOf"] if "anyOf" in schema else schema["type"] == "object"
    props = schema["properties"]
    # id was number AND string -> type list
    assert sorted(props["id"]["type"]) == ["number", "string"]
    # cust.key in every cust object -> required; seg in 2 of 3 -> not
    assert props["cust"]["required"] == ["key"]
    assert "seg" in props["cust"]["properties"]
    # items: array of objects, p always present, q sometimes
    assert props["items"]["type"] == "array"
    assert props["items"]["items"]["required"] == ["p"]
    # note observed only as JSON null
    assert props["note"]["type"] == "null"
    # id and cust and items are in every doc; flag/note are not
    assert sorted(schema["required"]) == ["cust", "id", "items"]
    # open-world: no additionalProperties constraint anywhere
    import json
    assert "additionalProperties" not in json.dumps(schema)


def test_round_trip_all_docs_valid(spark):
    schema = _infer(spark, DOCS)
    df = spark.createDataFrame(DOCS, "doc_id int, j string")
    res = RuleSet().add("inferred", "j", schema, mode="json").apply(df)
    assert res.df.filter(~F.col("inferred")).count() == 0


def test_mutations_fail_inferred_schema(spark):
    schema = _infer(spark, DOCS)
    bad = [
        (10, '{"cust": {"key": 3}, "items": []}'),        # required id missing
        (11, '{"id": true, "cust": {"key": 3}, "items": []}'),  # bool id
        (12, '{"id": 5, "cust": {"seg": "A"}, "items": []}'),   # cust.key missing
        (13, '{"id": 5, "cust": {"key": 3}, "items": [{"q": 1}]}'),  # item.p missing
    ]
    good = [(20, '{"id": 5, "cust": {"key": 3}, "items": [], "extra": "ok"}')]
    df = spark.createDataFrame(bad + good, "doc_id int, j string")
    res = RuleSet().add("inferred", "j", schema, mode="json").apply(df)
    got = {r["doc_id"]: r["inferred"] for r in res.df.collect()}
    assert got == {10: False, 11: False, 12: False, 13: False, 20: True}


def test_empty_profile_accepts_everything(spark):
    assert _infer(spark, [(1, "not json")]) is True


def test_scalar_root_and_array_root(spark):
    schema = _infer(spark, [(1, "42"), (2, "[1, 2]")])
    # number root and array-of-number root merge under anyOf
    assert "anyOf" in schema
    kinds = {f.get("type") for f in schema["anyOf"]}
    assert kinds == {"number", "array"}


def test_inferred_schema_feeds_the_generator(spark):
    """Full loop: data -> profile -> inferred schema -> boundary-sample
    GENERATION (the reference's own direction) -> Spark validation of
    the generated samples agrees with the reference evaluator label on
    every sample.  Inference output must be a well-formed dialect
    schema for the whole engine, not just the validators."""
    import json

    from fences_spark.schema.generate import generate_samples

    schema = _infer(spark, DOCS)
    samples = generate_samples(schema)
    assert len(samples) >= 10
    assert any(ok for _, ok in samples) and any(not ok for _, ok in samples)

    rows = [(i, json.dumps(v)) for i, (v, _) in enumerate(samples)]
    df = spark.createDataFrame(rows, "doc_id int, j string")
    res = RuleSet().add("inferred", "j", schema, mode="json").apply(df)
    got = {r["doc_id"]: r["inferred"] for r in res.df.collect()}
    for i, (v, want) in enumerate(samples):
        assert got[i] == want, (v, want)


def test_enum_inference_from_value_profile(spark):
    """values= + enum_max_cardinality: a low-cardinality scalar path
    gains an enum; high-cardinality and structured paths do not; the
    enum round-trips (observed values valid, unseen value invalid)."""
    from fences_spark.operators.jsonprofile import json_value_profile

    docs = [(i, '{"seg": "%s", "n": %d}' % ("AB"[i % 2], i)) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id int, j string")
    prof = json_path_profile(df, "doc_id", "j")
    vals = json_value_profile(df, "doc_id", "j", top_k=8)
    schema = infer_schema(prof, values=vals, enum_max_cardinality=4)
    assert schema["properties"]["seg"]["enum"] == ["A", "B"]
    # n has 20 distinct values, truncated at top_k=8 > bound 4 -> no enum
    assert "enum" not in schema["properties"]["n"]

    check = spark.createDataFrame(
        [(100, '{"seg": "A", "n": 1}'), (101, '{"seg": "C", "n": 1}')],
        "doc_id int, j string",
    )
    res = RuleSet().add("inf", "j", schema, mode="json").apply(check)
    got = {r["doc_id"]: r["inf"] for r in res.df.collect()}
    assert got == {100: True, 101: False}
