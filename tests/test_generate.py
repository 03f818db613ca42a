"""Boundary-sample generator: coverage (≥1 valid, ≥1 invalid per
satisfiable spec) and regex sampler correctness."""

from __future__ import annotations

import re

import pytest

from fences_spark.fixtures import ORACLE_SPECS, UNSATISFIABLE
from fences_spark.schema.generate import generate_samples, sample_matching, sample_regex


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
def test_sample_coverage(name):
    samples = generate_samples(ORACLE_SPECS[name])
    assert len(samples) >= 4, "too few boundary candidates"
    valid = [v for v, ok in samples if ok]
    invalid = [v for v, ok in samples if not ok]
    if name in UNSATISFIABLE:
        assert not valid
    else:
        assert valid, f"{name}: no valid sample generated"
    assert invalid, f"{name}: no invalid sample generated"


@pytest.mark.parametrize("pattern", [
    r"^[-\w.]+/[-\w.]+$",
    r"^[0-9a-f]{40}$",
    r"^[a-z]{2}$",
    r"abc",
    r"a+b*c?",
    r"(cat|dog)food",
    r"^x{3,}$",
    r"\d\d-\d\d",
    r"[A-Z][a-z]+",
])
def test_sample_regex_matches(pattern):
    s = sample_regex(pattern)
    assert s is not None
    assert re.search(pattern, s), (pattern, s)


def test_sample_matching_dialect():
    s = sample_matching("(^[a-z])&(!(^forbidden))")
    assert s is not None
    assert re.search("^[a-z]", s) and not re.search("^forbidden", s)


class TestDistributedGeneration:
    """The generator as a cluster job over a schemas table
    (fences_spark.schema.distributed): same samples as the driver-side
    generator, and a diagonal confusion matrix vs jsonschema."""

    def _schemas_df(self, spark, names):
        import json

        rows = [
            (i, n, json.dumps(ORACLE_SPECS[n])) for i, n in enumerate(sorted(names))
        ]
        return spark.createDataFrame(
            rows, "schema_id long, name string, schema_json string"
        )

    def test_generate_over_matches_driver(self, spark):
        import json

        from fences_spark.schema.distributed import generate_over

        names = sorted(ORACLE_SPECS)[:8]
        df = self._schemas_df(spark, names)
        got = {}
        for r in generate_over(df).collect():
            got.setdefault(r["schema_id"], set()).add(
                (r["sample_json"], r["expected_valid"])
            )
        for i, n in enumerate(names):
            want = {
                (json.dumps(v, sort_keys=True), ok)
                for v, ok in generate_samples(ORACLE_SPECS[n])
            }
            assert got[i] == want, f"{n}: distributed != driver-side samples"

    def test_confusion_is_diagonal(self, spark):
        pytest.importorskip("jsonschema")
        from fences_spark.schema.distributed import confusion_over

        from fences_spark.fixtures import DIALECT_ONLY

        names = sorted(set(ORACLE_SPECS) - DIALECT_ONLY)
        df = self._schemas_df(spark, names)
        rows = confusion_over(df).collect()
        assert len(rows) == len(names)
        bad = [r for r in rows if r["fp"] or r["fn"]]
        assert not bad, f"off-diagonal confusion rows: {bad[:3]}"
        assert all(r["n_samples"] == r["tp"] + r["tn"] for r in rows)

    def test_entry_query_shape(self, spark):
        from fences_spark.entry_queries import q_generate_confusion_fixtures

        out = q_generate_confusion_fixtures(spark, "/root/testdata/sf0.001")
        from fences_spark.fixtures import DIALECT_ONLY

        rows = out.collect()
        assert len(rows) == len(set(ORACLE_SPECS) - DIALECT_ONLY)
        assert all(r["fp"] == 0 and r["fn"] == 0 for r in rows)
