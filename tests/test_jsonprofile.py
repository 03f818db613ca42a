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


def _py_profile(docs, max_depth=3):
    """Independent pure-Python reference profiler."""
    from collections import defaultdict

    acc = defaultdict(lambda: [0, set()])

    def typ(v):
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, dict):
            return "object"
        if isinstance(v, list):
            return "array"
        if isinstance(v, str):
            return "string"
        if v is None:
            return "null"
        return "number"

    def walk(doc_id, path, v, depth):
        t = typ(v)
        acc[(path, t)][0] += 1
        acc[(path, t)][1].add(doc_id)
        if depth >= max_depth:
            return
        if isinstance(v, dict):
            for k, val in v.items():
                walk(doc_id, f"{path}.{k}", val, depth + 1)
        elif isinstance(v, list):
            for el in v:
                walk(doc_id, f"{path}[]", el, depth + 1)

    for doc_id, v in docs:
        walk(doc_id, "$", v, 0)
    return {k: (n, len(ids)) for k, (n, ids) in acc.items()}


def test_seeded_fuzz_vs_python_reference(spark):
    """200 random nested JSON docs (seeded): the Spark variant profile
    must equal an independently written pure-Python profiler exactly —
    paths, canonical types, occurrence and document counts."""
    import json
    import random
    import string

    rng = random.Random(20260821)
    keys = ["k" + c for c in string.ascii_lowercase[:8]]

    def rand_value(depth):
        r = rng.random()
        if depth >= 4 or r < 0.35:
            return rng.choice([
                rng.randint(-50, 50), rng.random() * 10, "s" + str(rng.randint(0, 9)),
                True, False, None,
            ])
        if r < 0.7:
            return {k: rand_value(depth + 1)
                    for k in rng.sample(keys, rng.randint(0, 4))}
        return [rand_value(depth + 1) for _ in range(rng.randint(0, 3))]

    docs = [(i, rand_value(0)) for i in range(200)]
    df = spark.createDataFrame(
        [(i, json.dumps(v)) for i, v in docs], "doc_id int, j string"
    )
    got = {(r["path"], r["jtype"]): (r["n"], r["n_docs"])
           for r in json_path_profile(df, "doc_id", "j").collect()}
    want = _py_profile(docs)
    assert got == want, {
        "missing": sorted(set(want) - set(got))[:5],
        "extra": sorted(set(got) - set(want))[:5],
        "diff": [(k, got[k], want[k]) for k in got if k in want and got[k] != want[k]][:5],
    }


def test_value_profile_topk_and_ranking(spark):
    from fences_spark.operators.jsonprofile import json_value_profile

    docs = [(i, '{"seg": "%s", "n": %d}' % ("AAB"[i % 3], i % 2)) for i in range(9)]
    df = spark.createDataFrame(docs, "doc_id int, j string")
    got = {(r["path"], r["jtype"], r["value"]): (r["n"], r["rk"]) for r in
           json_value_profile(df, "doc_id", "j", top_k=1).collect()}
    # top_k=1 keeps only the most frequent value per (path, jtype)
    assert got[("$.seg", "string", '"A"')] == (6, 1)
    assert ("$.seg", "string", '"B"') not in got
    # tie on $.n (0 x5? 0,1 alternate over 9 docs -> 0 five times)
    assert got[("$.n", "number", "0")] == (5, 1)


def test_value_profile_fuzz_vs_python(spark):
    """Seeded random docs: Spark value profile (top_k large enough to
    disable truncation) equals a pure-Python counter on rendered
    canonical JSON values."""
    import json
    import random
    from collections import Counter

    rng = random.Random(77)
    from fences_spark.operators.jsonprofile import json_value_profile

    docs = []
    for i in range(120):
        docs.append((i, {
            "a": rng.choice([1, 2, "x", True, None]),
            "b": {"c": rng.choice(["p", "q"])},
            "arr": [rng.choice([3, "y"]) for _ in range(rng.randint(0, 2))],
        }))
    df = spark.createDataFrame(
        [(i, json.dumps(v)) for i, v in docs], "doc_id int, j string"
    )
    got = {(r["path"], r["jtype"], r["value"]): r["n"] for r in
           json_value_profile(df, "doc_id", "j", top_k=100).collect()}

    def jt(v):
        if isinstance(v, bool):
            return "boolean"
        if v is None:
            return "null"
        if isinstance(v, str):
            return "string"
        return "number"

    want = Counter()
    for i, v in docs:
        want[("$.a", jt(v["a"]), json.dumps(v["a"]))] += 1
        want[("$.b.c", "string", json.dumps(v["b"]["c"]))] += 1
        for el in v["arr"]:
            want[("$.arr[]", jt(el), json.dumps(el))] += 1
    assert got == dict(want)
