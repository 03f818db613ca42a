"""Per-keyword compiler plugins (compiler/plugins.py) — the validator
dual of the reference's Config.key_handlers/type_handlers extension
points (fences/json_schema/config.py:17-25): a custom x- keyword
registered once applies on BOTH tiers (typed/JVM Column and Arrow
evaluator UDF) with identical verdicts, and ships inside the pickled
evaluator to executor workers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fences_spark.compiler.plugins import (
    KeywordPlugin,
    register_keyword,
    unregister_keyword,
)
from fences_spark.compiler.ruleset import RuleSet


def _make_even_length() -> KeywordPlugin:
    # the predicates are LOCAL functions on purpose: cloudpickle ships
    # locals by value, while module-level functions pickle by
    # reference and executors cannot import a test module — the same
    # constraint real plugin authors hit (documented in KeywordPlugin)
    def column_pred(value, col, dtype):
        # vacuous unless asserted AND the value is a string column
        if value is not True or not isinstance(dtype, T.StringType):
            return F.lit(True)
        return F.length(col) % 2 == 0

    def py_pred(value, instance):
        if value is not True or not isinstance(instance, str):
            return True
        return len(instance) % 2 == 0

    return KeywordPlugin("x-even-length", column_pred, py_pred)


EVEN_LENGTH = _make_even_length()


@pytest.fixture()
def even_length_registered():
    register_keyword(EVEN_LENGTH)
    try:
        yield
    finally:
        unregister_keyword("x-even-length")


SCHEMA = {"type": "string", "minLength": 2, "x-even-length": True}


class TestPluginRegistry:
    def test_non_x_prefix_rejected(self):
        with pytest.raises(ValueError):
            register_keyword(
                KeywordPlugin(
                    "evenLength", EVEN_LENGTH.column_pred, EVEN_LENGTH.py_pred
                )
            )

    def test_unregistered_keyword_is_annotation_only(self, spark):
        df = spark.createDataFrame([("abc",), ("ab",)], "s string")
        res = RuleSet().add("r", "s", SCHEMA).apply(df)
        # x-even-length not registered: draft behavior, ignored
        assert [r["r"] for r in res.df.orderBy("s").collect()] == [True, True]


class TestPluginTiers:
    def test_typed_tier_applies_plugin(self, spark, even_length_registered):
        df = spark.createDataFrame([("abc",), ("ab",), ("a",), (None,)], "s string")
        res = RuleSet().add("r", "s", SCHEMA).apply(df)
        got = {r["s"]: r["r"] for r in res.df.collect()}
        # 'abc': odd length -> fail; 'ab': pass; 'a': minLength fail;
        # NULL: not a string instance -> schema type string fails null
        assert got == {"abc": False, "ab": True, "a": False, None: False}
        assert res.tiers["r"] == "typed"

    def test_arrow_tier_matches_typed(self, spark, even_length_registered):
        rows = [('"abcd"',), ('"abc"',), ('"a"',), ("null",), ("not json",)]
        df = spark.createDataFrame(rows, "j string")
        res = RuleSet().add("r", "j", SCHEMA, mode="json").apply(df)
        got = {r["j"]: r["r"] for r in res.df.collect()}
        assert got == {
            '"abcd"': True,     # len 4 even, >= 2
            '"abc"': False,     # odd length: plugin fires on the executor
            '"a"': False,       # minLength
            "null": False,      # type string
            "not json": False,  # malformed
        }
        # plugin keyword is outside the variant whitelist -> Arrow tier
        assert res.tiers["r"] == "arrow_udf"

    def test_plugin_in_nested_applicator(self, spark, even_length_registered):
        schema = {"anyOf": [{"type": "string", "x-even-length": True},
                            {"type": "string", "minLength": 5}]}
        df = spark.createDataFrame([("abcd",), ("abc",), ("abcde",)], "s string")
        res = RuleSet().add("r", "s", schema).apply(df)
        got = {r["s"]: r["r"] for r in res.df.collect()}
        assert got == {"abcd": True, "abc": False, "abcde": True}
