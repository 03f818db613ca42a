"""$vocabulary refusal policy (round-5 verdict item 4) — pinned
against the documented policy in fences_spark/schema/vocabulary.py.

The JSON-Schema-Test-Suite's vocabulary.json exercises custom
meta-schemas (e.g. draft2020-12/metaschema-no-validation.json); the
dialect excludes selective keyword DISABLING (documented,
scripts/jsts_corpus_ext.py:22-23), but a meta-schema that REQUIRES a
vocabulary the engine does not implement must now refuse loudly when
the meta-schema is resolvable via ``resources``.
"""

from __future__ import annotations

import pytest

from fences_spark.compiler.ruleset import RuleSet
from fences_spark.schema.vocabulary import (
    KNOWN_VOCABULARIES,
    UnknownVocabularyError,
    check_vocabularies,
)

META_URI = "https://example.test/meta/custom"


def _meta(vocab: dict) -> dict:
    return {
        "$id": META_URI,
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$vocabulary": vocab,
        "$dynamicAnchor": "meta",
        "allOf": [{"$ref": "https://json-schema.org/draft/2020-12/schema"}],
    }


UNKNOWN = "https://example.test/vocab/quantum-validation"


class TestCheckVocabularies:
    def test_required_unknown_vocabulary_raises(self):
        res = {META_URI: _meta({**{u: True for u in sorted(KNOWN_VOCABULARIES)[:2]},
                                UNKNOWN: True})}
        with pytest.raises(UnknownVocabularyError, match="quantum-validation"):
            check_vocabularies({"$schema": META_URI, "type": "string"}, res)

    def test_optional_unknown_vocabulary_allowed(self):
        res = {META_URI: _meta({UNKNOWN: False})}
        check_vocabularies({"$schema": META_URI, "type": "string"}, res)

    def test_known_2020_12_set_allowed(self):
        res = {META_URI: _meta({u: True for u in KNOWN_VOCABULARIES})}
        check_vocabularies({"$schema": META_URI, "type": "string"}, res)

    def test_unresolvable_meta_schema_ignored(self):
        # no resources: the $schema URI stays an annotation (reference
        # parity — it blacklists the suite's vocabulary cases outright)
        check_vocabularies({"$schema": META_URI, "type": "string"}, None)
        check_vocabularies(
            {"$schema": "https://json-schema.org/draft/2020-12/schema"}, None
        )

    def test_boolean_and_plain_schemas_noop(self):
        check_vocabularies(True)
        check_vocabularies(False)
        check_vocabularies({"type": "integer"})


class TestRuleSetRefusal:
    def test_add_raises_for_typed_and_json_modes(self):
        res = {META_URI: _meta({UNKNOWN: True})}
        schema = {"$schema": META_URI, "type": "string"}
        for mode in ("typed", "json"):
            with pytest.raises(UnknownVocabularyError, match="unimplemented"):
                RuleSet().add("r", "c", schema, mode=mode, resources=res)

    def test_compile_json_refuses_before_tier_fallback(self, spark):
        # the refusal must NOT be swallowed into the Arrow fallback:
        # compile_json raises instead of returning an arrow_udf tier
        from pyspark.sql import functions as F

        from fences_spark.compiler.jsonvalue import compile_json

        res = {META_URI: _meta({UNKNOWN: True})}
        with pytest.raises(UnknownVocabularyError):
            compile_json({"$schema": META_URI, "type": "string"}, F.col("x"), res)

    def test_no_validation_metaschema_documented_divergence(self, spark):
        """JSTS vocabulary.json's metaschema-no-validation requires only
        core+applicator — all KNOWN, so the engine accepts it; the
        suite expects `minLength` then to be IGNORED, but selective
        keyword disabling is outside the dialect (documented), so the
        engine still enforces it.  Pin the divergence explicitly."""
        meta = _meta(
            {
                "https://json-schema.org/draft/2020-12/vocab/core": True,
                "https://json-schema.org/draft/2020-12/vocab/applicator": True,
            }
        )
        res = {META_URI: meta}
        rs = RuleSet().add(
            "len_ok",
            "v",
            {"$schema": META_URI, "type": "string", "minLength": 3},
            mode="json",
            resources=res,
        )
        df = spark.createDataFrame([('"ab"',), ('"abcd"',)], ["v"])
        got = {r["v"]: r["len_ok"] for r in rs.apply(df).df.collect()}
        assert got == {'"ab"': False, '"abcd"': True}
