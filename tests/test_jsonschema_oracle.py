"""External-oracle conformance: the ``jsonschema`` package's
Draft202012Validator is the SAME oracle the reference anchors its
entire test suite to (test/json_schema/test_generate.py:16-36) — every
generated valid sample must pass it, every invalid sample must fail.

Two documented dialect divergences are excluded, mirroring the
reference's own keyword blacklist
(test_json_schema_test_suite.py:104-118):

- ``str_pattern_merged`` uses the normalizer's ``(a)&(b)``
  conjunction extension (normalize.py:154) — standard regex engines
  read the ``&`` literally;
- ``str_format_datetime`` uses the dialect's format name ``datetime``
  (fences/json_schema/parse.py:134-171) where draft-2020-12 registers
  ``date-time``; jsonschema treats the unknown name as
  annotation-only.

The flagship case is the reference's real-world AAS schema
(test/fixtures/json/aas_small.yaml, 1,224 lines, 98 $defs —
examples/asset_administration_shell/main.py:49-74): normalize it,
generate boundary samples, and require evaluator, Spark predicate,
and jsonschema to agree on every verdict.
"""

from __future__ import annotations

import json

import jsonschema
import pytest
from pyspark.sql import functions as F

from fences_spark.compiler.jsonvalue import compile_json
from fences_spark.fixtures import DIALECT_ONLY, ORACLE_SPECS
from fences_spark.schema.generate import generate_samples
from fences_spark.schema.normalize import normalize


FORMAT_CHECKER = jsonschema.Draft202012Validator.FORMAT_CHECKER


def _validator(schema):
    # format-assertion on: the dialect treats format as a constraint
    # (fences generates format-invalid samples expecting rejection)
    return jsonschema.Draft202012Validator(schema, format_checker=FORMAT_CHECKER)


@pytest.mark.parametrize("name", sorted(set(ORACLE_SPECS) - DIALECT_ONLY))
def test_fixture_verdicts_match_jsonschema(name):
    schema = ORACLE_SPECS[name]
    val = _validator(schema)
    samples = generate_samples(schema)
    assert samples, name
    for v, ours in samples:
        theirs = val.is_valid(v)
        assert ours == theirs, (
            f"{name}: engine={ours} jsonschema={theirs} value={json.dumps(v)[:200]}"
        )


@pytest.fixture(scope="module")
def aas_schema():
    import yaml

    with open("/root/reference/test/fixtures/json/aas_small.yaml") as f:
        return yaml.safe_load(f)


def test_aas_normalizes(aas_schema):
    norm = normalize(aas_schema)
    assert norm.get("anyOf") and len(norm.get("$defs", {})) >= 90


def test_aas_samples_agree_with_jsonschema(aas_schema):
    val = _validator(aas_schema)
    samples = generate_samples(aas_schema)
    nv = sum(1 for _, ok in samples if ok)
    assert nv >= 1 and len(samples) - nv >= 5  # both polarities present
    for v, ours in samples:
        assert val.is_valid(v) == ours, json.dumps(v)[:200]


def test_aas_spark_verdicts(spark, aas_schema):
    """The compiled Spark predicate reproduces the jsonschema oracle
    on the AAS boundary samples — the cluster-scale restatement of the
    reference's AAS example (examples/asset_administration_shell/
    main.py:49-74: confusion matrix must be diagonal)."""
    val = _validator(aas_schema)
    samples = generate_samples(aas_schema)
    rows = [(json.dumps(v), val.is_valid(v)) for v, _ in samples]
    df = spark.createDataFrame(rows, "sample_json string, expected boolean")
    pred, tier = compile_json(aas_schema, df["sample_json"])
    out = df.select("sample_json", "expected",
                    F.coalesce(pred, F.lit(False)).alias("got")).collect()
    off = [(r.sample_json[:120], r.expected, r.got) for r in out if r.expected != r.got]
    assert not off, f"[{tier}] off-diagonal: {off[:3]}"
