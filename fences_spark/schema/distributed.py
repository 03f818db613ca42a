"""The reference's headline workflow — generate labeled boundary
samples for a JSON schema, then score accept/reject agreement — run
distributed over a TABLE of schemas instead of one driver process.

Reference parity: fences' main loop parses one schema and emits its
valid/invalid samples single-process (reference
test/json_schema/test_json_schema_test_suite.py:120-133 iterates
suites; examples/asset_administration_shell/main.py:32-74 generates
and times one schema).  Here the unit of parallelism is the schema:
a corpus of schema documents partitions across executors, each Arrow
batch runs the same generator/evaluator the pytest gate uses, and the
ConfusionMatrix partial+final merge (reference core/util.py:114-137,
``__iadd__``) becomes pandas partials + a Spark groupBy sum.

Scale shape: generation is pure Python per schema (no builtin can
express it), so mapInPandas is the sanctioned boundary; per-schema
cost is independent, so the operator scales linearly with executors —
skew (one giant schema) is handled by repartitioning the schema table
by id before the map.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

SAMPLES_SCHEMA = "schema_id long, sample_json string, expected_valid boolean"
CONFUSION_SCHEMA = (
    "schema_id long, n_samples long, tp long, tn long, fp long, fn long"
)


def _sampler(method: str):
    """Resolve the per-schema sample generator.  ``enumerate`` is the
    per-keyword boundary enumeration (schema/generate.py);``cover`` is
    the reference's set-cover path generation (schema/pathcover.py,
    fences core/node.py:220-264) — fewer samples, combination
    coverage, same evaluator-labeled contract."""
    if method == "cover":
        from fences_spark.schema.pathcover import covering_samples

        return covering_samples
    from fences_spark.schema.generate import generate_samples

    return generate_samples


def generate_over(
    schemas: DataFrame, *, id_col: str = "schema_id", schema_col: str = "schema_json",
    method: str = "enumerate",
) -> DataFrame:
    """One row per fences-style boundary sample for every schema row:
    (schema_id, sample_json, expected_valid).  expected_valid is the
    repo evaluator's verdict — the same ground truth the pytest
    confusion-matrix gate pins against jsonschema."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        generate_samples = _sampler(method)

        for pdf in batches:
            out = {"schema_id": [], "sample_json": [], "expected_valid": []}
            for sid, sj in zip(pdf[id_col], pdf[schema_col]):
                for value, ok in generate_samples(json.loads(sj)):
                    out["schema_id"].append(sid)
                    out["sample_json"].append(json.dumps(value, sort_keys=True))
                    out["expected_valid"].append(bool(ok))
            yield pd.DataFrame(out)

    return schemas.repartition(F.col(id_col)).mapInPandas(op, SAMPLES_SCHEMA)


def confusion_over(
    schemas: DataFrame, *, id_col: str = "schema_id", schema_col: str = "schema_json",
    method: str = "enumerate",
) -> DataFrame:
    """Distributed ConfusionMatrix: generate every schema's samples and
    score our evaluator against the external ``jsonschema`` validator
    (the same oracle the pytest gate uses).  Emits per-schema counts
    (tp/tn from agreement, fp/fn from disagreement); partial counts are
    computed pandas-side per batch, merged by a Spark groupBy sum —
    the reference's ``__iadd__`` partial aggregation, distributed.
    Raises ImportError executor-side if jsonschema is unavailable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import jsonschema

        generate_samples = _sampler(method)

        cls = jsonschema.Draft202012Validator
        # format-assertion on, same as the pytest gate: the dialect
        # treats format as a constraint (fences generates
        # format-invalid samples expecting rejection)
        checker = cls.FORMAT_CHECKER

        for pdf in batches:
            rows = {k: [] for k in ("schema_id", "n_samples", "tp", "tn", "fp", "fn")}
            for sid, sj in zip(pdf[id_col], pdf[schema_col]):
                schema = json.loads(sj)
                oracle = cls(schema, format_checker=checker)
                tp = tn = fp = fn = n = 0
                for value, got in generate_samples(schema):
                    want = oracle.is_valid(value)
                    n += 1
                    if got and want:
                        tp += 1
                    elif not got and not want:
                        tn += 1
                    elif got and not want:
                        fp += 1
                    else:
                        fn += 1
                rows["schema_id"].append(sid)
                rows["n_samples"].append(n)
                rows["tp"].append(tp)
                rows["tn"].append(tn)
                rows["fp"].append(fp)
                rows["fn"].append(fn)
            yield pd.DataFrame(rows)

    partials = schemas.repartition(F.col(id_col)).mapInPandas(op, CONFUSION_SCHEMA)
    return partials.groupBy("schema_id").agg(
        F.sum("n_samples").alias("n_samples"),
        F.sum("tp").alias("tp"),
        F.sum("tn").alias("tn"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    )
