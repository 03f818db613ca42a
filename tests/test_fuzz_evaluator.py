"""Property-based conformance fuzz: on ARBITRARY JSON values (not
just our generator's boundary samples), the engine's evaluator must
agree with ``jsonschema.Draft202012Validator`` for every fixture
schema.  This is the random-sampling leg of the reference's coverage
comparison (test_json_schema_test_suite.py:244-409, which races
fences against hypothesis-jsonschema) — here the random values come
from a plain recursive JSON strategy and conformance, not coverage,
is the property.
"""

from __future__ import annotations

import jsonschema
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fences_spark.fixtures import DIALECT_ONLY, ORACLE_SPECS
from fences_spark.schema.evaluator import Evaluator


FORMAT_CHECKER = jsonschema.Draft202012Validator.FORMAT_CHECKER

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(10**15), max_value=10**15)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(st.text(max_size=8), children, max_size=5),
    max_leaves=12,
)

SCHEMAS = sorted(set(ORACLE_SPECS) - DIALECT_ONLY)


@pytest.mark.parametrize("name", SCHEMAS)
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(value=json_values)
def test_evaluator_agrees_with_jsonschema_on_random_json(name, value):
    schema = ORACLE_SPECS[name]
    validator = jsonschema.Draft202012Validator(schema, format_checker=FORMAT_CHECKER)
    ours = Evaluator(schema).validate(value)
    theirs = validator.is_valid(value)
    assert ours == theirs, f"{name}: engine={ours} jsonschema={theirs} value={value!r}"


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(value=json_values)
def test_normalize_preserves_verdicts_on_random_json(name, value):
    """The reference's normalize-equivalence harness
    (test_json_schema_test_suite.py:96-214): the original and the
    DNF-normalized schema must accept/reject every instance
    identically (our evaluator knows the normalizer-internal NOT_*
    keywords, as the reference extends jsonschema for them)."""
    from fences_spark.schema.normalize import NormalizeError, normalize

    schema = ORACLE_SPECS[name]
    try:
        norm = normalize(schema)
    except NormalizeError:
        pytest.skip("normalizer declines schema")
    before = Evaluator(schema).validate(value)
    after = Evaluator(norm).validate(value)
    assert before == after, f"{name}: pre={before} post={after} value={value!r}"
