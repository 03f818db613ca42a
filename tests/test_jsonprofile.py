"""JSON schema discovery (path/type profile) — round 5, SURVEY §2.F."""

from __future__ import annotations

from fences_spark.operators.jsonprofile import json_path_profile


def _profile(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, j string")
    out = json_path_profile(df, "doc_id", "j", **kw)
    return {(r["path"], r["jtype"]): (r["n"], r["n_docs"]) for r in out.collect()}


def test_paths_types_and_counts(spark):
    got = _profile(spark, [
        (1, '{"id": 5, "cust": {"key": 3, "seg": "A"}, '
            '"items": [{"p": 1, "q": 2.5}, {"p": 2}], "flag": true, "note": null}'),
        (2, '{"id": "x", "items": []}'),
        (3, 'not json'),          # malformed: excluded entirely
    ])
    assert got[("$", "object")] == (2, 2)
    # type CONFLICT surfaces as two rows for the same path
    assert got[("$.id", "number")] == (1, 1)
    assert got[("$.id", "string")] == (1, 1)
    # array indices collapse to []; n counts elements, n_docs documents
    assert got[("$.items", "array")] == (2, 2)
    assert got[("$.items[]", "object")] == (2, 1)
    assert got[("$.items[].p", "number")] == (2, 1)
    assert got[("$.items[].q", "number")] == (1, 1)
    assert got[("$.note", "null")] == (1, 1)
    assert got[("$.flag", "boolean")] == (1, 1)
    assert ("$.cust.key", "number") in got and ("$.cust.seg", "string") in got


def test_depth_bound(spark):
    deep = '{"a": {"b": {"c": {"d": {"e": 1}}}}}'
    got = _profile(spark, [(1, deep)], max_depth=3)
    assert ("$.a.b.c", "object") in got           # depth 3 reached
    assert not any(p.startswith("$.a.b.c.d") for p, _ in got)  # depth 4 cut
    got5 = _profile(spark, [(1, deep)], max_depth=5)
    assert ("$.a.b.c.d.e", "number") in got5


def test_scalar_and_array_roots(spark):
    got = _profile(spark, [(1, "42"), (2, "[1, \"two\"]"), (3, "null")])
    assert got[("$", "number")] == (1, 1)
    assert got[("$", "array")] == (1, 1)
    assert got[("$", "null")] == (1, 1)
    assert got[("$[]", "number")] == (1, 1)
    assert got[("$[]", "string")] == (1, 1)


def test_plan_is_pure_jvm(spark):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame([(1, '{"a": 1}')], "doc_id int, j string")
    out = json_path_profile(df, "doc_id", "j")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
