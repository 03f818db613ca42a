"""Frozen JSON-Schema-Test-Suite subset — accept/reject equivalence
across compile tiers.

The reference runs the official draft2020-12 suite through its
normalize→generate loop (test/json_schema/test_json_schema_test_suite.py:
96-409).  The suite submodule is not checked out in this sandbox (on
either side), so tests/fixtures/jsts/ vendors a frozen re-transcription
(scripts/build_jsts_corpus.py) in the suite's exact file format, and
this harness runs every case through:

1. the external ``jsonschema`` Draft202012Validator — arbitration: a
   wrong corpus label fails here, so the corpus carries no authority;
2. the Python/Arrow evaluator tier (schema/evaluator.py);
3. the Spark Column tier (compiler/jsonvalue.compile_json) over a
   DataFrame of the file's cases — one job per corpus file;
4. tier 3 again on the normalized schema (the reference's actual
   suite assertion: x and normalize(x) accept/reject identically,
   test_json_schema_test_suite.py:120-133).
"""

from __future__ import annotations

import glob
import json
import os

import jsonschema
import pytest
from pyspark.sql import functions as F

from fences_spark.compiler.jsonvalue import compile_json
from fences_spark.schema.evaluator import Evaluator
from fences_spark.schema.normalize import NormalizeError, normalize

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "jsts", "draft2020-12")
CORPUS_FILES = sorted(os.path.basename(p) for p in glob.glob(os.path.join(CORPUS_DIR, "*.json")))


def _load(fname):
    with open(os.path.join(CORPUS_DIR, fname)) as f:
        return json.load(f)


def test_corpus_present():
    """Suite-complete run (round 3): 43 files / 802 cases — every
    in-scope draft2020-12 suite file exists INCLUDING anchor.json,
    dynamicRef.json, and unknownKeyword.json (in scope since round 3b,
    beyond the reference's own blacklist; the remaining exclusions and
    why: scripts/jsts_corpus_ext.py module docstring), each run
    through 4 assertions (arbitration + 3 engine tiers)."""
    assert len(CORPUS_FILES) >= 43
    assert {"anchor.json", "dynamicRef.json", "unknownKeyword.json"} <= set(CORPUS_FILES)
    assert sum(len(s["tests"]) for f in CORPUS_FILES for s in _load(f)) >= 802


@pytest.mark.parametrize("fname", CORPUS_FILES)
def test_corpus_labels_arbitrated(fname):
    """The corpus itself must agree with the external validator —
    guards the transcription, independent of our engine."""
    for s in _load(fname):
        val = jsonschema.Draft202012Validator(s["schema"])
        for t in s["tests"]:
            got = val.is_valid(t["data"])
            assert got == t["valid"], (
                f"CORPUS BUG {fname} :: {s['description']} :: {t['description']}"
            )


@pytest.mark.parametrize("fname", CORPUS_FILES)
def test_evaluator_tier(fname):
    for s in _load(fname):
        ev = Evaluator(s["schema"])
        for t in s["tests"]:
            got = bool(ev.validate(t["data"]))
            assert got == t["valid"], (
                f"{fname} :: {s['description']} :: {t['description']}: "
                f"evaluator={got} suite={t['valid']}"
            )


def _spark_verdicts(spark, suites, schema_of):
    """One Spark job for a whole corpus file: every case is a row,
    per-suite predicates dispatched on suite_idx."""
    rows, preds, tiers = [], [], []
    for i, s in enumerate(suites):
        for j, t in enumerate(s["tests"]):
            rows.append((i, j, json.dumps(t["data"]), t["valid"]))
    df = spark.createDataFrame(
        rows, "suite_idx int, case_idx int, sample_json string, expected boolean"
    )
    verdict = F.lit(None).cast("boolean")
    for i, s in enumerate(suites):
        pred, tier = compile_json(schema_of(s), df["sample_json"])
        tiers.append(tier)
        verdict = F.when(df["suite_idx"] == i, F.coalesce(pred, F.lit(False))).otherwise(verdict)
    out = df.select("suite_idx", "case_idx", "expected", verdict.alias("got")).collect()
    return out, tiers


@pytest.mark.parametrize("fname", CORPUS_FILES)
def test_spark_tier(fname, spark):
    suites = _load(fname)
    out, tiers = _spark_verdicts(spark, suites, lambda s: s["schema"])
    for r in out:
        s = suites[r["suite_idx"]]
        t = s["tests"][r["case_idx"]]
        assert r["got"] == t["valid"], (
            f"{fname} [{tiers[r['suite_idx']]}] :: {s['description']} :: "
            f"{t['description']}: spark={r['got']} suite={t['valid']}"
        )


@pytest.mark.parametrize("fname", CORPUS_FILES)
def test_spark_tier_normalized(fname, spark):
    """normalize(x) must accept/reject exactly like x — the
    reference's suite assertion, over the Spark tier."""
    suites = _load(fname)
    normed = []
    for s in suites:
        try:
            normed.append({**s, "schema": normalize(s["schema"])})
        except NormalizeError:
            normed.append(s)  # normalizer declines: compile raw
    out, tiers = _spark_verdicts(spark, normed, lambda s: s["schema"])
    for r in out:
        s = suites[r["suite_idx"]]
        t = s["tests"][r["case_idx"]]
        assert r["got"] == t["valid"], (
            f"{fname} [normalized, {tiers[r['suite_idx']]}] :: {s['description']} :: "
            f"{t['description']}: spark={r['got']} suite={t['valid']}"
        )
