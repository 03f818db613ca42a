"""Format edge-vector conformance — the nine canned formats (+ byte)
arbitrated against external validators on official-suite edge inputs.

The reference asserts ``format`` (it generates valid/invalid samples per
format, /root/reference/fences/json_schema/parse.py:134-171) but the
vendored JSTS corpus deliberately excludes format.json and the
``optional/format/*.json`` edge vectors (scripts/jsts_corpus_ext.py).
This suite closes that gap:

* ``tests/fixtures/format_vectors.json`` vendors the official
  optional/format input STRINGS (plus systematic RFC edges) with NO
  labels — the expected verdict is computed at test time from an
  arbiter, so a transcription typo cannot grant authority.
* Arbiters: ``jsonschema.Draft202012Validator.FORMAT_CHECKER`` for
  date / time / date-time / ipv4 / ipv6 / uuid / email (backed by
  ``rfc3339_validator``, ``ipaddress``, ``uuid``); the installed
  jsonschema has NO active checker for hostname (needs ``fqdn``),
  duration (needs ``isoduration``) or byte, so those use in-test
  reference implementations derived from RFC 1123 §2.1, RFC 3339
  appendix A (procedural parser, not a regex — a regex arbitrating a
  regex proves nothing) and RFC 4648 §4 (decode + canonical re-encode).
* Documented dialect divergences are PINNED exactly: the dialect's
  email is the RFC 5321 dot-string shape while jsonschema's checker is
  literally ``"@" in instance`` — every vector where that matters is
  listed in EMAIL_DIALECT_STRICT and the test asserts the divergence
  set equals it (a new divergence OR a silently-vanished one fails).
* All three engine tiers run every vector: the Arrow evaluator
  (schema/evaluator.py), the variant/JSON Column tier
  (compiler/jsonvalue.py) and the typed Column tier
  (compiler/typed.py) — one Spark job per tier for the whole corpus.

``datetime`` (the XSD xs:dateTime alias used by schema/xsd.py) is
deliberately NOT arbitrated against RFC 3339: XML Schema requires the
offset to be optional, a documented dialect choice covered by
tests/test_xsd*.py.
"""

from __future__ import annotations

import base64
import json
import os
import re

import jsonschema
import pytest
from pyspark.sql import functions as F

from fences_spark.compiler.jsonvalue import compile_json
from fences_spark.compiler.typed import TypedCompiler
from fences_spark.schema.evaluator import Evaluator, format_regex

_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "format_vectors.json")
with open(_FIX) as _f:
    _RAW = json.load(_f)
_RAW.pop("_comment", None)

# programmatic hostname length-bound edges (RFC 1123: label ≤ 63, name ≤ 253)
_RAW["hostname"] = _RAW["hostname"] + [
    "a" * 63,                                   # max label — valid
    "a" * 64,                                   # label too long
    ".".join(["a" * 49] * 5 + ["abc"]),         # 253 chars — valid
    ".".join(["a" * 49] * 5 + ["abcd"]),        # 254 chars — too long
    ("a" * 63 + ".") * 3 + "a" * 61,            # 253 with max labels — valid
]

VECTORS: dict[str, list[str]] = _RAW
FORMATS = sorted(VECTORS)

_JS_FC = jsonschema.Draft202012Validator.FORMAT_CHECKER
_JS_ARBITRATED = {"date", "time", "date-time", "ipv4", "ipv6", "uuid", "email"}

# Dialect choice (documented at _FORMAT_REGEX, schema/evaluator.py):
# email is the RFC 5321 dot-string@RFC-1123-domain shape.  jsonschema's
# checker accepts any string containing "@", so these arbiter-valid
# vectors are dialect-invalid: quoted/dotted-edge local parts, spaces,
# IP-literal or underscore/edge-hyphen domains, single-label domains,
# and empty sides.  Exact-set pin — editing the regex or the corpus
# must touch this list consciously.
EMAIL_DIALECT_STRICT = frozenset({
    "joe.bloggs@[127.0.0.1]",
    ".test@example.com",
    "test.@example.com",
    "te..st@example.com",
    "joe bloggs@example.com",
    '"joe bloggs"@example.com',
    '"joe..bloggs"@example.com',
    "joe@bloggs@example.com",
    "user@example",
    "user@-example.com",
    "user@example-.com",
    "user@exa_mple.com",
    "@example.com",
    "user@",
    "user@example..com",
})


def _hostname_rfc1123(s: str) -> bool:
    """RFC 1123 §2.1 hostname: dot-separated LDH labels, label ≤ 63,
    total ≤ 253, no empty labels (so no trailing dot — the dialect
    validates hostnames, not DNS FQDN presentations)."""
    if not s or len(s) > 253:
        return False
    return all(
        1 <= len(lab) <= 63
        and re.fullmatch(r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?", lab)
        for lab in s.split(".")
    )


def _duration_rfc3339(s: str) -> bool:
    """RFC 3339 appendix A ``duration`` — procedural parser (no regex):
    ``P`` then either ``<digits>W`` alone, or date components Y/M/D in
    order followed by optional ``T`` + time components H/M/S in order
    (seconds may carry a decimal fraction); at least one component; no
    sign, no empty ``T``."""
    if not s.startswith("P"):
        return False
    body, i, n = s[1:], 0, len(s) - 1

    def _num(j: int, frac: bool) -> tuple[int, bool]:
        k = j
        while k < n and body[k].isdigit() and body[k].isascii():
            k += 1
        if k == j:
            return j, False
        if frac and k < n and body[k] == ".":
            k2 = k + 1
            while k2 < n and body[k2].isdigit() and body[k2].isascii():
                k2 += 1
            if k2 == k + 1:
                return j, False
            k = k2
        return k, True

    j, ok = _num(i, False)
    if ok and j < n and body[j] == "W":
        return j + 1 == n
    seen = False
    for unit in "YMD":
        j, ok = _num(i, False)
        if ok and j < n and body[j] == unit:
            i, seen = j + 1, True
    if i < n and body[i] == "T":
        i += 1
        tseen = False
        for unit in "HMS":
            j, ok = _num(i, unit == "S")
            if ok and j < n and body[j] == unit:
                i, tseen = j + 1, True
        if not tseen:
            return False
        seen = True
    return seen and i == n


def _byte_rfc4648(s: str) -> bool:
    """RFC 4648 §4 base64: decode strictly, then require the canonical
    re-encoding to round-trip (rejects excess padding like ``Zm9v====``
    and mid-stream padding, which ``b64decode`` tolerates)."""
    if len(s) % 4:
        return False
    try:
        return base64.b64encode(base64.b64decode(s, validate=True)).decode() == s
    except Exception:
        return False


def arbiter(fmt: str, s: str) -> bool:
    if fmt in _JS_ARBITRATED:
        return _JS_FC.conforms(s, fmt)
    if fmt == "hostname":
        return _hostname_rfc1123(s)
    if fmt == "duration":
        return _duration_rfc3339(s)
    if fmt == "byte":
        return _byte_rfc4648(s)
    raise AssertionError(fmt)


def expected(fmt: str, s: str) -> bool:
    """Arbiter verdict with the pinned dialect divergences applied."""
    if fmt == "email" and s in EMAIL_DIALECT_STRICT:
        return False
    return arbiter(fmt, s)


def test_vectors_present():
    assert set(FORMATS) >= {
        "date", "time", "date-time", "email", "hostname",
        "ipv4", "ipv6", "uuid", "duration", "byte",
    }
    assert sum(len(v) for v in VECTORS.values()) >= 280


def test_email_pin_is_exact():
    """The pinned divergence set must be exactly the observed
    arbiter-vs-dialect divergence set — no silent drift either way."""
    rx = re.compile(format_regex("email"))
    observed = {
        s for s in VECTORS["email"]
        if bool(rx.search(s)) != _JS_FC.conforms(s, "email")
    }
    assert observed == EMAIL_DIALECT_STRICT
    # and every pin is the strict direction: dialect rejects, arbiter accepts
    for s in EMAIL_DIALECT_STRICT:
        assert _JS_FC.conforms(s, "email") and not rx.search(s)


@pytest.mark.parametrize("fmt", FORMATS)
def test_regex_matches_arbiter(fmt):
    """Pure-Python regex tier == arbiter (modulo pins) — the fast
    exhaustive check; the Spark tiers below prove engine parity."""
    rx = re.compile(format_regex(fmt))
    for s in VECTORS[fmt]:
        got = bool(rx.search(s))
        assert got == expected(fmt, s), f"{fmt} {s!r}: regex={got}"


@pytest.mark.parametrize("fmt", FORMATS)
def test_evaluator_tier(fmt):
    ev = Evaluator({"format": fmt})
    for s in VECTORS[fmt]:
        got = bool(ev.validate(s))
        assert got == expected(fmt, s), f"{fmt} {s!r}: evaluator={got}"
    # format applies only to strings — annotation-pass for everything else
    assert ev.validate(12) and ev.validate(None) and ev.validate([s for s in ()])


def _rows():
    return [
        (i, j, json.dumps(s), s)
        for i, fmt in enumerate(FORMATS)
        for j, s in enumerate(VECTORS[fmt])
    ]


def test_spark_jsonvalue_tier(spark):
    """Variant/JSON Column tier — one job for the whole corpus."""
    df = spark.createDataFrame(
        _rows(), "fmt_idx int, case_idx int, sample_json string, raw string"
    )
    verdict = F.lit(None).cast("boolean")
    for i, fmt in enumerate(FORMATS):
        pred, _tier = compile_json({"format": fmt}, df["sample_json"])
        verdict = F.when(df["fmt_idx"] == i, F.coalesce(pred, F.lit(False))).otherwise(verdict)
    for r in df.select("fmt_idx", "case_idx", verdict.alias("got")).collect():
        fmt = FORMATS[r["fmt_idx"]]
        s = VECTORS[fmt][r["case_idx"]]
        assert r["got"] == expected(fmt, s), f"{fmt} {s!r}: jsonvalue={r['got']}"


def test_spark_typed_tier(spark):
    """Typed Column tier over a plain string column — one job."""
    df = spark.createDataFrame(
        _rows(), "fmt_idx int, case_idx int, sample_json string, raw string"
    )
    dtype = df.schema["raw"].dataType
    verdict = F.lit(None).cast("boolean")
    for i, fmt in enumerate(FORMATS):
        pred = TypedCompiler({"format": fmt}).compile(df["raw"], dtype)
        verdict = F.when(df["fmt_idx"] == i, F.coalesce(pred, F.lit(False))).otherwise(verdict)
    for r in df.select("fmt_idx", "case_idx", verdict.alias("got")).collect():
        fmt = FORMATS[r["fmt_idx"]]
        s = VECTORS[fmt][r["case_idx"]]
        assert r["got"] == expected(fmt, s), f"{fmt} {s!r}: typed={r['got']}"
