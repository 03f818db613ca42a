"""Pure-Python reference evaluator for the fences JSON-schema dialect
(JSON Schema draft-2020-12 subset).

This is the semantic bedrock of the engine: it defines, in one place,
what every constraint keyword *means*.  It is used

1. driver-side, as the oracle that labels generated boundary samples
   (tests assert the Spark predicates reproduce these labels exactly —
   the "diagonal confusion matrix" criterion of the reference test
   suite, /root/reference/test/json_schema/test_generate.py:26-36);
2. executor-side, wrapped in an Arrow-vectorized pandas UDF, as the
   fallback evaluator for schemas the built-in Column compiler cannot
   express (deep recursion, patternProperties, composite enums).

Keyword coverage mirrors the reference's keyword-operator table
(/root/reference/fences/json_schema/normalize.py:81-229 mergers and
inverters; /root/reference/fences/json_schema/parse.py:116-122 type
handlers), including the normalizer's internal negated keywords
``NOT_enum`` / ``NOT_const`` / ``NOT_multipleOf`` so normalized specs
evaluate identically to their originals.

Implementation is from scratch against the published JSON Schema
draft-2020-12 semantics; no code is taken from the reference.
"""

from __future__ import annotations

import math
import re
from fractions import Fraction
from typing import Any, Union

from fences_spark.schema.regex_dialect import compile_dialect_pattern

SchemaType = Union[dict, bool]

# Annotation-only keywords, ignored by evaluation (the reference drops
# them during normalization, fences/json_schema/normalize.py:16-27).
ANNOTATION_KEYWORDS = frozenset(
    {
        "description",
        "title",
        "$comment",
        "deprecated",
        "example",
        "examples",
        "discriminator",
        "default",
        "readOnly",
        "writeOnly",
        "$schema",
        "$id",
    }
)

# ---------------------------------------------------------------------------
# format registry — the nine canned formats of the reference
# (fences/json_schema/parse.py:134-171) plus base64 'byte'
# (parse.py:315-324).  Evaluated as regex / parse checks.
# ---------------------------------------------------------------------------

_FORMAT_REGEX: dict[str, str] = {
    "email": r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$",
    "hostname": r"^(?=.{1,253}$)[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$",
    "ipv4": r"^(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])$",
    "ipv6": r"^(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}$|^(?:[0-9A-Fa-f]{1,4}:)*:(?:[0-9A-Fa-f]{1,4}:)*[0-9A-Fa-f]{0,4}$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})?$",
    "datetime": r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:[Zz]|[+-]\d{2}:?\d{2})?$",
    "date-time": r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:[Zz]|[+-]\d{2}:?\d{2})?$",
    "duration": r"^-?P(?=\d|T\d)(?:\d+Y)?(?:\d+M)?(?:\d+W)?(?:\d+D)?(?:T(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?$",
    "byte": r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$",
}


def format_regex(name: str) -> str | None:
    """Anchored regex for a named format, or None if unknown (unknown
    formats validate everything, per draft-2020-12 annotation-only
    default)."""
    return _FORMAT_REGEX.get(name)


# ---------------------------------------------------------------------------
# type machinery — the reference's lattice (ALL_TYPES,
# fences/json_schema/normalize.py:37-44): integer is number+multipleOf 1.
# ---------------------------------------------------------------------------


def json_type(value: Any) -> str:
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float)):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, dict):
        return "object"
    if isinstance(value, (list, tuple)):
        return "array"
    raise TypeError(f"not a JSON value: {value!r}")


def _is_integer(value: Any) -> bool:
    return (
        isinstance(value, (int, float))
        and not isinstance(value, bool)
        and float(value) == math.floor(float(value))
        and math.isfinite(float(value))
    )


def _type_matches(value: Any, t: str) -> bool:
    if t == "integer":
        return _is_integer(value)
    return json_type(value) == t


def _deep_eq(a: Any, b: Any) -> bool:
    """JSON deep equality: 1 == 1.0 but True != 1 (bool is not number)."""
    ta, tb = json_type(a), json_type(b)
    if ta != tb:
        return False
    if ta == "number":
        return float(a) == float(b)
    if ta == "array":
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    if ta == "object":
        return a.keys() == b.keys() and all(_deep_eq(a[k], b[k]) for k in a)
    return a == b


def _multiple_of(value: Any, k: Any) -> bool:
    """Exact divisibility with ``jsonschema.Draft202012Validator``'s
    semantics (SURVEY.md §7 hard part (b): match jsonschema, not the
    reference's epsilon float-gcd, fences/json_schema/normalize.py:138-143):
    integer divisor → ``value % k == 0``; float divisor → the IEEE
    quotient must be an integer, with exact-Fraction fallback when the
    quotient overflows to infinity."""
    if isinstance(k, float):
        if k == 0.0:
            return False
        q = value / k
        try:
            return int(q) == q
        except OverflowError:
            return (Fraction(value) / Fraction(k)).denominator == 1
    if k == 0:
        return False
    return value % k == 0


_REGEX_CACHE: dict[str, re.Pattern] = {}


def _search(pattern: str, s: str) -> bool:
    rx = _REGEX_CACHE.get(pattern)
    if rx is None:
        rx = re.compile(pattern)
        _REGEX_CACHE[pattern] = rx
    return rx.search(s) is not None


def _pattern_ok(pattern: str, s: str) -> bool:
    """Evaluate a fences-dialect pattern (supports the normalizer's
    ``(a)&(b)`` conjunction and ``!(x)`` negation extensions,
    fences/json_schema/normalize.py:97,154) with unanchored search
    semantics (draft-2020-12 ``pattern``)."""
    conjuncts = compile_dialect_pattern(pattern)
    for java_rx, negated in conjuncts:
        hit = _search(java_rx, s)
        if hit == negated:
            return False
    return True


# ---------------------------------------------------------------------------
# the evaluator
# ---------------------------------------------------------------------------


class Evaluator:
    """Evaluates one schema against many instances.  Resolves local
    ``$ref`` pointers against the root schema and ``$defs`` (the
    reference inlines these with a sha1 memo,
    fences/json_schema/normalize.py:410-441; we resolve lazily with a
    dynamic-depth guard instead, which handles recursion without
    unrolling)."""

    MAX_DEPTH = 64

    def __init__(self, root: SchemaType):
        self.root = root

    # -- $ref resolution (local JSON pointers only, like the
    # reference's JsonPointer, fences/json_schema/json_pointer.py:5-57)
    def _resolve_ref(self, ref: str) -> SchemaType:
        if not ref.startswith("#"):
            raise ValueError(f"only local refs supported: {ref}")
        node: Any = self.root
        frag = ref[1:].lstrip("/")
        if frag:
            for raw in frag.split("/"):
                token = raw.replace("~1", "/").replace("~0", "~")
                if isinstance(node, list):
                    node = node[int(token)]
                else:
                    node = node[token]
        return node

    def validate(self, value: Any, schema: SchemaType | None = None, _depth: int = 0) -> bool:
        if _depth > self.MAX_DEPTH:
            # recursive schema deeper than any sane instance; treat as
            # invalid rather than recurse forever
            return False
        if schema is None:
            schema = self.root
        if schema is True:
            return True
        if schema is False:
            return False
        if not isinstance(schema, dict):
            raise TypeError(f"schema must be dict or bool: {schema!r}")

        s = schema
        v = value
        dep = _depth + 1

        if "$ref" in s:
            if not self.validate(v, self._resolve_ref(s["$ref"]), dep):
                return False

        # ---- type ----
        if "type" in s:
            ts = s["type"]
            ts = [ts] if isinstance(ts, str) else list(ts)
            # empty type list is always-false, matching the reference
            # suite behavior (test_json_schema_test_suite.py:71-84)
            if not any(_type_matches(v, t) for t in ts):
                return False

        # ---- enum / const (+ normalizer-internal negations) ----
        if "enum" in s and not any(_deep_eq(v, e) for e in s["enum"]):
            return False
        if "NOT_enum" in s and any(_deep_eq(v, e) for e in s["NOT_enum"]):
            return False
        if "const" in s and not _deep_eq(v, s["const"]):
            return False
        if "NOT_const" in s and _deep_eq(v, s["NOT_const"]):
            return False

        # ---- number keywords (vacuous on non-numbers) ----
        if json_type(v) == "number":
            fv = float(v)
            if "minimum" in s and fv < float(s["minimum"]):
                return False
            if "maximum" in s and fv > float(s["maximum"]):
                return False
            if "exclusiveMinimum" in s and fv <= float(s["exclusiveMinimum"]):
                return False
            if "exclusiveMaximum" in s and fv >= float(s["exclusiveMaximum"]):
                return False
            if "multipleOf" in s and not _multiple_of(v, s["multipleOf"]):
                return False
            if "NOT_multipleOf" in s and _multiple_of(v, s["NOT_multipleOf"]):
                return False

        # ---- string keywords ----
        if isinstance(v, str):
            if "minLength" in s and len(v) < s["minLength"]:
                return False
            if "maxLength" in s and len(v) > s["maxLength"]:
                return False
            if "pattern" in s and not _pattern_ok(s["pattern"], v):
                return False
            if "format" in s:
                rx = format_regex(s["format"])
                if rx is not None and not _search(rx, v):
                    return False

        # ---- array keywords ----
        if isinstance(v, (list, tuple)):
            n = len(v)
            if "minItems" in s and n < s["minItems"]:
                return False
            if "maxItems" in s and n > s["maxItems"]:
                return False
            if s.get("uniqueItems"):
                for i in range(n):
                    for j in range(i + 1, n):
                        if _deep_eq(v[i], v[j]):
                            return False
            if s.get("NOT_uniqueItems"):
                # normalizer-internal: at least one duplicate pair
                if not any(
                    _deep_eq(v[i], v[j]) for i in range(n) for j in range(i + 1, n)
                ):
                    return False
            prefix = s.get("prefixItems", [])
            for i, sub in enumerate(prefix):
                if i < n and not self.validate(v[i], sub, dep):
                    return False
            if "items" in s:
                for item in v[len(prefix):]:
                    if not self.validate(item, s["items"], dep):
                        return False
            if "contains" in s:
                hits = sum(1 for item in v if self.validate(item, s["contains"], dep))
                if hits < s.get("minContains", 1):
                    return False
                if "maxContains" in s and hits > s["maxContains"]:
                    return False

        # ---- object keywords ----
        if isinstance(v, dict):
            for k in s.get("required", []):
                if k not in v:
                    return False
            for k in s.get("NOT_required", []):
                # normalizer-internal: listed keys must be absent
                if k in v:
                    return False
            if "minProperties" in s and len(v) < s["minProperties"]:
                return False
            if "maxProperties" in s and len(v) > s["maxProperties"]:
                return False
            props = s.get("properties", {})
            for k, sub in props.items():
                if k in v and not self.validate(v[k], sub, dep):
                    return False
            pat_props = s.get("patternProperties", {})
            for pat, sub in pat_props.items():
                for k in v:
                    if _search(pat, k) and not self.validate(v[k], sub, dep):
                        return False
            if "additionalProperties" in s:
                ap = s["additionalProperties"]
                for k in v:
                    if k in props:
                        continue
                    if any(_search(pat, k) for pat in pat_props):
                        continue
                    if not self.validate(v[k], ap, dep):
                        return False
            if "propertyNames" in s:
                for k in v:
                    if not self.validate(k, s["propertyNames"], dep):
                        return False
            for trigger, needed in s.get("dependentRequired", {}).items():
                if trigger in v and any(k not in v for k in needed):
                    return False
            for trigger, sub in s.get("dependentSchemas", {}).items():
                if trigger in v and not self.validate(v, sub, dep):
                    return False

        # ---- logic ----
        if "allOf" in s and not all(self.validate(v, sub, dep) for sub in s["allOf"]):
            return False
        if "anyOf" in s and not any(self.validate(v, sub, dep) for sub in s["anyOf"]):
            return False
        if "oneOf" in s:
            # count-of-true == 1 (the reference expands this
            # quadratically for generation, normalize.py:469-481; for
            # evaluation counting is enough)
            if sum(1 for sub in s["oneOf"] if self.validate(v, sub, dep)) != 1:
                return False
        if "not" in s and self.validate(v, s["not"], dep):
            return False
        if "if" in s:
            if self.validate(v, s["if"], dep):
                if "then" in s and not self.validate(v, s["then"], dep):
                    return False
            else:
                if "else" in s and not self.validate(v, s["else"], dep):
                    return False

        return True


def validate(value: Any, schema: SchemaType) -> bool:
    """One-shot convenience: evaluate ``schema`` against ``value``."""
    return Evaluator(schema).validate(value)
