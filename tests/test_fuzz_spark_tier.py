"""Random-JSON conformance through the SPARK tier.

The boundary-sample suites anchor the compiled predicates to
labeled samples; the hypothesis suite anchors the *driver-side
evaluator* to jsonschema on arbitrary JSON.  This suite closes the
remaining edge: a seeded random corpus of arbitrary JSON documents is
pushed through ``compile_json`` (variant-builtin tier where the shape
allows, Arrow-evaluator tier otherwise) in ONE Spark pass over all
fixture schemas, and every verdict must equal
``jsonschema.Draft202012Validator`` on the same round-tripped value —
the reference's accept/reject-equivalence harness
(test/json_schema/test_json_schema_test_suite.py:96-214) with Spark
in jsonschema's seat.
"""

from __future__ import annotations

import json
import random

import jsonschema
from pyspark.sql import functions as F

from fences_spark.compiler.jsonvalue import compile_json
from fences_spark.fixtures import DIALECT_ONLY, ORACLE_SPECS

# DIALECT_ONLY (fixtures.py): constructs jsonschema can't arbitrate —
# the `(a)&(b)` pattern extension, the nonstandard `datetime` format
# name, and the asserted content* keywords.

FORMAT_CHECKER = jsonschema.Draft202012Validator.FORMAT_CHECKER


def _edge_values() -> list:
    return [
        # numbers around the fixture boundaries + float-exactness traps
        0, -1, 1, 3, 5, 9, 15, 99, 100, 101, 102, 105, 1000000007,
        -(10**15), 10**15,
        0.1, 0.2, 0.3, 0.30000000000000004, 0.35, 0.5, 1.5, 2.0, 4.5,
        99.999, 100.0, 102.0, 1073741824.0, 1073741826.0,
        1e9, 1e300, -1e300, -0.0, 5e-324,
        # strings
        "", "ab", "abc", "x" * 10, "x" * 11, "org/repo", "a/b/c",
        "a@b.co", "not-an-email", "2024-01-01", "héllo wörld",
        "00000000-0000-0000-0000-000000000000", "10.0.0.1", "999.0.0.1",
        "public", "private", "PUBLIC",
        # booleans / null
        True, False, None,
        # arrays against arr_* and refs fixtures
        [], [1], [1, 2, 3], [1, 2, 3, 4], [1, "a"], ["a", "b"], [""],
        [0.3], [[1], [2]], [1, 1], [3, 4], [3, 1], [1, [2, [3]]],
        [{"v": 1}], [{"v": -1}], [{"x": 1}], [{"v": 1}, {"v": 0}],
        # objects against obj_* / logic_* / dep_* fixtures
        {}, {"foo": 1}, {"foo": None}, {"a": 1}, {"a": "s"},
        {"a": "x"}, {"a": "x", "b": 1}, {"a": "y", "c": 1}, {"c": 1},
        {"a": 1, "b": 2, "c": 3}, {"a": 1, "b": 2},
        {"x_1": 5}, {"x_1": -1}, {"x_1": 1.5}, {"x_1": 5, "name": "n"},
        {"name": 3}, {"longkey": 1}, {"abcd": 1}, {"abcde": 1},
        {"credit": 1}, {"credit": 1, "limit": 5},
        {"credit": 1, "limit": -2}, {"limit": "many"},
        {"country": "United States of America"}, {"country": "USA"},
        {"b": {"bb": "s"}}, {"b": {"bb": 3}}, {"b": 1},
    ]


def _random_value(rng: random.Random, depth: int = 0):
    kinds = ["int", "float", "str", "bool", "null"]
    if depth < 3:
        kinds += ["arr", "obj"] * 2
    k = rng.choice(kinds)
    if k == "int":
        return rng.choice([rng.randint(-5, 110), rng.randint(-(10**12), 10**12)])
    if k == "float":
        return rng.choice(
            [rng.uniform(-5, 110), rng.uniform(-1e9, 1e9), rng.random() * rng.choice([0.1, 3, 5])]
        )
    if k == "str":
        alphabet = "abx_./@-é ABC019"
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
    if k == "bool":
        return rng.random() < 0.5
    if k == "null":
        return None
    if k == "arr":
        return [_random_value(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    keys = ["a", "b", "c", "v", "foo", "x_1", "name", "credit", "limit", "bb"]
    return {
        rng.choice(keys): _random_value(rng, depth + 1)
        for _ in range(rng.randint(0, 4))
    }


def test_spark_tiers_agree_with_jsonschema_on_random_corpus(spark):
    rng = random.Random(20260817)
    corpus = _edge_values() + [_random_value(rng) for _ in range(150)]
    # round-trip through JSON text so Spark and jsonschema see the
    # exact same parsed value (and -0.0 / float formatting is shared)
    cells = [json.dumps(v) for v in corpus]
    parsed = [json.loads(c) for c in cells]

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cells)], ["idx", "cell"])

    names = sorted(set(ORACLE_SPECS) - DIALECT_ONLY)
    cols, tiers = [], {}
    for name in names:
        pred, tier = compile_json(ORACLE_SPECS[name], F.col("cell"))
        tiers[name] = tier
        cols.append(pred.alias(name))
    # both physical paths must actually be exercised
    assert len(set(tiers.values())) >= 2, tiers

    rows = {r["idx"]: r for r in df.select("idx", *cols).collect()}

    mismatches = []
    for name in names:
        validator = jsonschema.Draft202012Validator(
            ORACLE_SPECS[name], format_checker=FORMAT_CHECKER
        )
        for i, value in enumerate(parsed):
            ours = bool(rows[i][name])
            theirs = validator.is_valid(value)
            if ours != theirs:
                mismatches.append((name, tiers[name], value, ours, theirs))
    assert not mismatches, mismatches[:10]
