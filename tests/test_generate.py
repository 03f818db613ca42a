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
