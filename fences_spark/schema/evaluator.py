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

import base64
import binascii
import json
import math
import re
import sys
from fractions import Fraction
from typing import Any, Union
from urllib.parse import unquote, urljoin

# shared empty-annotation sentinel: callers only read / union-copy it
_EMPTY: set = frozenset()  # type: ignore[assignment]


def _reject_json_constant(name: str) -> None:
    raise ValueError(f"non-JSON constant: {name}")


class SchemaDepthError(RuntimeError):
    """A same-instance-location applicator/$ref chain exceeded
    ``Evaluator.MAX_DEPTH`` — either a value-free ``$ref`` cycle
    (``{"$ref": "#"}`` chains, undecidable) or a finite static
    allOf/$ref tower deeper than the bound.  Deliberately NOT a
    ``ValueError``: a ValueError means *this instance is invalid*
    (malformed JSON), and conflating the two would let ``not`` flip a
    too-deep verdict into a spurious *valid*.  Subclasses
    RuntimeError so the Arrow UDF's malformed-JSON handler
    (``except (ValueError, TypeError)``) never swallows it — the task
    fails loudly with this message instead of mis-validating."""

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
        "$anchor",
        "$dynamicAnchor",
    }
)

# The schema-bearing positions of draft 2020-12 — the only places the
# $id/$anchor index walk descends into (enum/const values and unknown
# keywords are DATA; a "$id" inside them must not register).
_SUBSCHEMA_KEYS = frozenset(
    {
        "items", "additionalProperties", "contains", "propertyNames",
        "not", "if", "then", "else", "contentSchema",
        "unevaluatedItems", "unevaluatedProperties",
    }
)
_SUBSCHEMA_MAPS = frozenset(
    {"properties", "patternProperties", "dependentSchemas", "$defs", "definitions"}
)
_SUBSCHEMA_LISTS = frozenset({"allOf", "anyOf", "oneOf", "prefixItems"})


def uses_dynamic_scope(root: Any) -> bool:
    """True when validating ``root`` needs base-URI / dynamic-scope
    machinery beyond a single resource — any $dynamicRef or
    $dynamicAnchor, or a $id on a NON-root schema object (which
    re-bases refs inside its subtree).  The compile tiers route such
    documents to the Arrow evaluator; a root-level $id alone re-bases
    nothing and stays compilable."""

    def walk(node: Any, is_root: bool) -> bool:
        if not isinstance(node, dict):
            return False
        if "$dynamicRef" in node or "$dynamicAnchor" in node:
            return True
        if not is_root and isinstance(node.get("$id"), str) and node["$id"]:
            return True
        for k, v in node.items():
            if k in _SUBSCHEMA_KEYS and walk(v, False):
                return True
            if k in _SUBSCHEMA_MAPS and isinstance(v, dict):
                if any(walk(vv, False) for vv in v.values()):
                    return True
            if k in _SUBSCHEMA_LISTS and isinstance(v, list):
                if any(walk(vv, False) for vv in v):
                    return True
        return False

    return walk(root, True)

# ---------------------------------------------------------------------------
# format registry — the nine canned formats of the reference
# (fences/json_schema/parse.py:134-171) plus base64 'byte'
# (parse.py:315-324).  Evaluated as regex checks on every tier.
#
# Semantics (round 4) are arbitrated against
# jsonschema.Draft202012Validator.FORMAT_CHECKER on the official
# optional/format edge vectors (tests/test_format_vectors.py):
# date/date-time carry a real proleptic-Gregorian calendar (month
# lengths, leap years incl. the 100/400 century rule, year
# 0001-9999); time/date-time are RFC 3339 full-time (offset
# REQUIRED, hour 00-23, no leap seconds — the arbiter's
# rfc3339_validator rejects :60); ipv6 is the full RFC 4291 grammar
# (::-compression, IPv4-embedded tails, no zone-ids) matching
# Python ipaddress; duration is RFC 3339 appendix A (weeks
# exclusive of other units, T requires a following component, no
# sign).  Documented dialect choices: email/hostname stay the
# RFC-5321/1123-shaped regexes (stricter than jsonschema's
# trivial "@-in-string" email check; no quoted local parts or
# IP-literal domains); `datetime` (the XSD xs:dateTime alias,
# schema/xsd.py) keeps the permissive optional-offset shape XML
# requires.  Classes are ASCII-explicit ([0-9], never \d) so the
# Python, Java-(?U) and DuckDB engines agree on unicode digits.
# ---------------------------------------------------------------------------

# proleptic-Gregorian date, years 0001-9999 (both arbiters —
# rfc3339_validator and datetime.date — reject year 0000)
_DATE_BODY = (
    "(?!0000)(?:"
    "[0-9]{4}-(?:0[13578]|1[02])-(?:0[1-9]|[12][0-9]|3[01])"
    "|[0-9]{4}-(?:0[469]|11)-(?:0[1-9]|[12][0-9]|30)"
    "|[0-9]{4}-02-(?:0[1-9]|1[0-9]|2[0-8])"
    "|(?:[0-9]{2}(?:0[48]|[2468][048]|[13579][26])"
    "|(?:[02468][048]|[13579][26])00)-02-29"
    ")"
)
# RFC 3339 full-time: offset mandatory, no leap seconds
_TIME_BODY = (
    "(?:[01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](?:\\.[0-9]+)?"
    "(?:[Zz]|[+-](?:[01][0-9]|2[0-3]):[0-5][0-9])"
)
_V4_OCTET = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_V4_BODY = f"{_V4_OCTET}(?:\\.{_V4_OCTET}){{3}}"
_H16 = "[0-9A-Fa-f]{1,4}"
# RFC 4291 with ::-compression and IPv4-embedded tails, enumerated
# by leading-group count (each line: full h16 run | compressed run |
# compressed-with-v4-tail | bare ::)
_IPV6_BODY = (
    f"(?:{_H16}:){{7}}(?:{_H16}|:)"
    f"|(?:{_H16}:){{6}}(?::{_H16}|{_V4_BODY}|:)"
    f"|(?:{_H16}:){{5}}(?:(?::{_H16}){{1,2}}|:{_V4_BODY}|:)"
    f"|(?:{_H16}:){{4}}(?:(?::{_H16}){{1,3}}|(?::{_H16})?:{_V4_BODY}|:)"
    f"|(?:{_H16}:){{3}}(?:(?::{_H16}){{1,4}}|(?::{_H16}){{0,2}}:{_V4_BODY}|:)"
    f"|(?:{_H16}:){{2}}(?:(?::{_H16}){{1,5}}|(?::{_H16}){{0,3}}:{_V4_BODY}|:)"
    f"|{_H16}:(?:(?::{_H16}){{1,6}}|(?::{_H16}){{0,4}}:{_V4_BODY}|:)"
    f"|:(?:(?::{_H16}){{1,7}}|(?::{_H16}){{0,5}}:{_V4_BODY}|:)"
)

_FORMAT_REGEX: dict[str, str] = {
    # RFC 5321 dot-string local part (no leading/trailing/double dots)
    "email": r"^[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$",
    "hostname": r"^(?=.{1,253}$)[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$",
    "ipv4": f"^{_V4_BODY}$",
    "ipv6": f"^(?:{_IPV6_BODY})$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "date": f"^{_DATE_BODY}$",
    "time": f"^{_TIME_BODY}$",
    "datetime": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[Tt ][0-9]{2}:[0-9]{2}:[0-9]{2}(?:\.[0-9]+)?(?:[Zz]|[+-][0-9]{2}:?[0-9]{2})?$",
    "date-time": f"^{_DATE_BODY}[Tt]{_TIME_BODY}$",
    "duration": r"^P(?:[0-9]+W|(?=[0-9]|T[0-9])(?:[0-9]+Y)?(?:[0-9]+M)?(?:[0-9]+D)?(?:T(?=[0-9])(?:[0-9]+H)?(?:[0-9]+M)?(?:[0-9]+(?:\.[0-9]+)?S)?)?)$",
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

    def __init__(
        self,
        root: SchemaType,
        plugins: dict | None = None,
        resources: dict[str, SchemaType] | None = None,
    ) -> None:
        self.root = root
        # pre-registered external schema documents (URI → document):
        # the sandboxed analog of remote $ref resolution — documents
        # are supplied up front (like jsonschema's referencing
        # Registry), never fetched.  Their $ids/anchors/dynamicAnchors
        # index under their own base URIs, so cross-document $ref and
        # $dynamicRef work; an unregistered URI still raises.
        self._extra_resources = dict(resources or {})
        # freeze the plugin registry into this instance: on the driver
        # the current registry is snapshotted; executor-side
        # constructors (inside UDFs) must pass the snapshot captured in
        # the UDF closure at compile time — their own registry is empty
        if plugins is None:
            from fences_spark.compiler.plugins import snapshot

            plugins = snapshot()
        self._plugins = plugins
        # instance-depth recursion is bounded by the INPUT (schema
        # re-entry is capped separately by the no-progress guard), and
        # the scope wrapper costs one extra frame per nesting level —
        # give deep-but-legitimate instances headroom in both driver
        # and Arrow-worker processes (the test suite drives 240-level
        # nesting ≈ 1000 frames).  Bounded at 4000, NOT higher: the
        # limit also governs json.loads on hostile deep documents, and
        # a huge limit trades a clean RecursionError for a C-stack
        # segfault of the UDF worker
        if sys.getrecursionlimit() < 4000:
            sys.setrecursionlimit(4000)
        self._build_index()
        # dynamic scope: the chain of distinct schema RESOURCES entered
        # along the current evaluation path, outermost first — the
        # $dynamicRef search space (draft 2020-12 §8.2.3.2).  Instance
        # state, not a parameter: each Evaluator is single-threaded
        # (one per UDF worker / driver call site), and the _validate
        # wrapper pops in a finally, so a raising validate can't leak
        self._scope: list[str] = []

    # -- $id / $anchor / $dynamicAnchor index ---------------------------
    # Built once per instance by walking KNOWN schema positions only:
    # enum/const values and unknown keywords are data, so a "$id"
    # inside them never registers (the suite's unknownKeyword.json
    # semantics come free).
    def _build_index(self) -> None:
        self._resources: dict[str, Any] = {}
        self._anchors: dict[tuple[str, str], Any] = {}
        self._dyn_anchors: dict[tuple[str, str], Any] = {}
        self._base_of: dict[int, str] = {}

        def walk(node: Any, base: str) -> None:
            if not isinstance(node, dict):
                return
            rid = node.get("$id")
            if isinstance(rid, str) and rid:
                base = urljoin(base, rid) if base else rid
                self._resources.setdefault(base, node)
            # first-write-wins like _resources/_anchors: a dict object
            # reachable from two positions (e.g. the normalizer's
            # opaque passthrough shares $defs dicts) keeps the base of
            # its FIRST — original — position, so its anchors and its
            # base stay consistent
            self._base_of.setdefault(id(node), base)
            a = node.get("$anchor")
            if isinstance(a, str):
                self._anchors.setdefault((base, a), node)
            d = node.get("$dynamicAnchor")
            if isinstance(d, str):
                self._dyn_anchors.setdefault((base, d), node)
            for k, v in node.items():
                if k in _SUBSCHEMA_KEYS:
                    walk(v, base)
                elif k in _SUBSCHEMA_MAPS and isinstance(v, dict):
                    for vv in v.values():
                        walk(vv, base)
                elif k in _SUBSCHEMA_LISTS and isinstance(v, list):
                    for vv in v:
                        walk(vv, base)

        root_id = self.root.get("$id") if isinstance(self.root, dict) else None
        self._root_base = root_id if isinstance(root_id, str) and root_id else ""
        walk(self.root, "")
        self._resources.setdefault(self._root_base, self.root)
        if isinstance(self.root, dict):
            self._base_of.setdefault(id(self.root), self._root_base)
        for uri, doc in self._extra_resources.items():
            if isinstance(doc, dict):
                # the registry key is the retrieval URI; the document's
                # own $id (if any) registers too via the walk
                self._resources.setdefault(uri, doc)
                walk(doc, uri)
            else:
                self._resources.setdefault(uri, doc)
        # scope bookkeeping matters only when a second resource or a
        # $dynamicAnchor exists; everything else resolves statically
        self._scoped = len(self._resources) > 1 or bool(self._dyn_anchors)

    # -- $ref resolution: RFC 6901 pointers (like the reference's
    # JsonPointer, fences/json_schema/json_pointer.py:5-57), plus
    # $anchor names and in-document $id resource URIs resolved against
    # the referencing object's base; remote (out-of-document) resources
    # stay unsupported, like the reference
    def _resolve_ref(self, ref: str, base: str | None = None) -> SchemaType:
        if base is None:
            base = self._scope[-1] if self._scope else self._root_base
        uri, _, frag = ref.partition("#")
        target_base = (urljoin(base, uri) if base else uri) if uri else base
        node: Any = self._resources.get(target_base)
        if node is None:
            if uri:
                raise ValueError(f"only in-document refs supported: {ref}")
            node = self.root
        if not frag or frag.strip("/") == "":
            return node  # resource root: "", "#", "#/"
        if not frag.startswith("/"):
            # plain-name fragment = $anchor (a $dynamicAnchor also
            # registers as a plain anchor for non-dynamic $refs)
            name = unquote(frag)
            hit = self._anchors.get((target_base, name))
            if hit is None:
                hit = self._dyn_anchors.get((target_base, name))
            if hit is None:
                raise ValueError(f"unknown anchor: {ref}")
            return hit
        for raw in frag.lstrip("/").split("/"):
            # a $ref is a URI fragment: percent-decode first
            # (#/$defs/percent%25field → "percent%field"), then the
            # RFC 6901 ~-unescapes
            token = unquote(raw).replace("~1", "/").replace("~0", "~")
            if isinstance(node, list):
                node = node[int(token)]
            else:
                node = node[token]
        return node

    def _resolve_dynamic_ref(self, ref: str, holder: SchemaType) -> SchemaType:
        """$dynamicRef: resolve like $ref first; iff that initial
        target is a $dynamicAnchor of the referenced name (the spec's
        bookending rule), re-resolve to the FIRST resource in the
        dynamic scope (outermost-in) defining a $dynamicAnchor of that
        name; otherwise it behaves exactly like $ref."""
        base = self._base_of.get(id(holder))
        static = self._resolve_ref(ref, base)
        frag = unquote(ref.partition("#")[2])
        if (
            frag
            and not frag.startswith("/")
            and isinstance(static, dict)
            and static.get("$dynamicAnchor") == frag
        ):
            for b in self._scope:
                hit = self._dyn_anchors.get((b, frag))
                if hit is not None:
                    return hit
        return static

    def validate(self, value: Any, schema: SchemaType | None = None, _depth: int = 0) -> bool:
        return self._validate(value, schema, _depth)[0]

    def _validate(
        self, value: Any, schema: SchemaType | None = None, _depth: int = 0
    ) -> tuple[bool, set, set]:
        """Dynamic-scope bookkeeping wrapper: entering a schema object
        whose resource differs from the current scope top pushes that
        resource's base URI for the duration of the subtree — the
        resource chain ``_resolve_dynamic_ref`` searches.  Derived
        schema objects (normalizer/compiler-built wrappers) are not in
        the index and push nothing — refs inside them resolve against
        the innermost indexed resource.  All validation semantics live
        in ``_validate_inner``."""
        s = self.root if schema is None else schema
        if not self._scoped:
            # single-resource document, no $dynamicAnchor: the scope
            # chain can never influence resolution — skip the
            # bookkeeping on the hot path
            return self._validate_inner(value, s, _depth)
        pushed = False
        if isinstance(s, dict):
            b = self._base_of.get(id(s))
            if b is not None and (not self._scope or self._scope[-1] != b):
                self._scope.append(b)
                pushed = True
        try:
            return self._validate_inner(value, s, _depth)
        finally:
            if pushed:
                self._scope.pop()

    def _validate_inner(
        self, value: Any, schema: SchemaType | None = None, _depth: int = 0
    ) -> tuple[bool, set, set]:
        """Core evaluation with draft-2020-12 annotation collection:
        returns ``(ok, evaluated_property_names, evaluated_item_indices)``.
        The two sets feed ``unevaluatedProperties``/``unevaluatedItems``
        — a property/item counts as *evaluated* when matched by
        properties / patternProperties / additionalProperties /
        prefixItems / items / contains of this schema object, or by any
        **successful in-place applicator** at the same instance
        location ($ref, allOf, succeeding anyOf/oneOf branches,
        the taken if/then/else arm, triggered dependentSchemas).
        Sibling branches of a failed applicator contribute nothing,
        and annotations never cross into child locations — the exact
        visibility rules ``jsonschema.Draft202012Validator`` (the
        oracle, tests/test_fuzz_evaluator.py) implements.  The
        reference parses these keywords but never generates for them
        (fences/json_schema/parse.py:244-250); evaluation semantics
        here follow the spec, arbitrated by the oracle."""
        _none: set = _EMPTY
        if _depth > self.MAX_DEPTH:
            # NO-PROGRESS recursion bound: _depth counts only schema
            # re-entries over the SAME instance location ($ref chains,
            # in-place applicators) and resets to 0 on every descent
            # into a child value, so arbitrarily deep instances
            # validate exactly (parity past the compile tiers' unroll
            # bound is property-tested in test_compilers.py).  Hitting
            # the bound is a SCHEMA defect (value-free $ref cycle or a
            # >MAX_DEPTH static tower), not an instance verdict —
            # raise rather than return False, which `not` would flip
            # into a spurious valid (jsonschema likewise raises
            # RecursionError on $ref cycles)
            raise SchemaDepthError(
                f"applicator/$ref chain exceeds MAX_DEPTH={self.MAX_DEPTH} "
                "at one instance location (value-free $ref cycle or "
                "too-deep static schema tower)"
            )
        if schema is None:
            schema = self.root
        if schema is True:
            return True, _none, _none
        if schema is False:
            return False, _none, _none
        if not isinstance(schema, dict):
            raise TypeError(f"schema must be dict or bool: {schema!r}")

        s = schema
        v = value
        dep = _depth + 1
        # annotations this schema object accumulates for its own
        # unevaluated* keywords and for its caller (in-place merge)
        ev_props: set = set()
        ev_items: set = set()

        # x- plugin keywords snapshotted at construction
        # (compiler/plugins.py): pure assertions — no annotations, no
        # descent into children
        if self._plugins:
            for k in s:
                plugin = self._plugins.get(k)
                if plugin is not None and not plugin.py_pred(s[k], v):
                    return False, _none, _none

        if "$ref" in s:
            target = self._resolve_ref(s["$ref"], self._base_of.get(id(s)))
            ok, p, i = self._validate(v, target, dep)
            if not ok:
                return False, _none, _none
            ev_props |= p
            ev_items |= i
        if "$dynamicRef" in s:
            # in-place applicator like $ref: annotations merge
            target = self._resolve_dynamic_ref(s["$dynamicRef"], s)
            ok, p, i = self._validate(v, target, dep)
            if not ok:
                return False, _none, _none
            ev_props |= p
            ev_items |= i

        _fail = (False, _none, _none)

        # ---- type ----
        if "type" in s:
            ts = s["type"]
            ts = [ts] if isinstance(ts, str) else list(ts)
            # empty type list is always-false, matching the reference
            # suite behavior (test_json_schema_test_suite.py:71-84)
            if not any(_type_matches(v, t) for t in ts):
                return _fail

        # ---- enum / const (+ normalizer-internal negations) ----
        if "enum" in s and not any(_deep_eq(v, e) for e in s["enum"]):
            return _fail
        if "NOT_enum" in s and any(_deep_eq(v, e) for e in s["NOT_enum"]):
            return _fail
        if "const" in s and not _deep_eq(v, s["const"]):
            return _fail
        if "NOT_const" in s and _deep_eq(v, s["NOT_const"]):
            return _fail

        # ---- number keywords (vacuous on non-numbers) ----
        if json_type(v) == "number":
            fv = float(v)
            if "minimum" in s and fv < float(s["minimum"]):
                return _fail
            if "maximum" in s and fv > float(s["maximum"]):
                return _fail
            if "exclusiveMinimum" in s and fv <= float(s["exclusiveMinimum"]):
                return _fail
            if "exclusiveMaximum" in s and fv >= float(s["exclusiveMaximum"]):
                return _fail
            if "multipleOf" in s and not _multiple_of(v, s["multipleOf"]):
                return _fail
            if "NOT_multipleOf" in s and _multiple_of(v, s["NOT_multipleOf"]):
                return _fail

        # ---- string keywords ----
        if isinstance(v, str):
            if "minLength" in s and len(v) < s["minLength"]:
                return _fail
            if "maxLength" in s and len(v) > s["maxLength"]:
                return _fail
            if "pattern" in s and not _pattern_ok(s["pattern"], v):
                return _fail
            if "format" in s:
                rx = format_regex(s["format"])
                if rx is not None and not _search(rx, v):
                    return _fail
            # ---- content keywords (dialect choice: asserted) ----
            # draft 2020-12 makes contentEncoding/MediaType/Schema
            # annotation-only and the reference merely parses them
            # (fences/json_schema/parse.py:304-306); a *validator* that
            # ignores them is useless, so this dialect asserts them
            # (SURVEY.md §2.A: unbase64 round-trip predicate).  Fixtures
            # using them are DIALECT_ONLY vs the jsonschema oracle.
            if ("contentEncoding" in s or "contentMediaType" in s
                    or "contentSchema" in s):
                if not self._content_ok(v, s, dep):
                    return _fail

        # ---- array keywords ----
        if isinstance(v, (list, tuple)):
            n = len(v)
            if "minItems" in s and n < s["minItems"]:
                return _fail
            if "maxItems" in s and n > s["maxItems"]:
                return _fail
            if s.get("uniqueItems"):
                for i in range(n):
                    for j in range(i + 1, n):
                        if _deep_eq(v[i], v[j]):
                            return _fail
            if s.get("NOT_uniqueItems"):
                # normalizer-internal: at least one duplicate pair
                if not any(
                    _deep_eq(v[i], v[j]) for i in range(n) for j in range(i + 1, n)
                ):
                    return _fail
            prefix = s.get("prefixItems", [])
            for i, sub in enumerate(prefix):
                if i < n:
                    if not self.validate(v[i], sub, 0):
                        return _fail
                    ev_items.add(i)
            if "items" in s:
                for i in range(len(prefix), n):
                    if not self.validate(v[i], s["items"], 0):
                        return _fail
                    ev_items.add(i)
            if "contains" in s:
                hit_idx = [i for i in range(n) if self.validate(v[i], s["contains"], 0)]
                if len(hit_idx) < s.get("minContains", 1):
                    return _fail
                if "maxContains" in s and len(hit_idx) > s["maxContains"]:
                    return _fail
                # contains marks its matched items evaluated (2020-12)
                ev_items.update(hit_idx)

        # ---- object keywords ----
        if isinstance(v, dict):
            for k in s.get("required", []):
                if k not in v:
                    return _fail
            for k in s.get("NOT_required", []):
                # normalizer-internal: listed keys must be absent
                if k in v:
                    return _fail
            if "minProperties" in s and len(v) < s["minProperties"]:
                return _fail
            if "maxProperties" in s and len(v) > s["maxProperties"]:
                return _fail
            props = s.get("properties", {})
            for k, sub in props.items():
                if k in v:
                    if not self.validate(v[k], sub, 0):
                        return _fail
                    ev_props.add(k)
            pat_props = s.get("patternProperties", {})
            for pat, sub in pat_props.items():
                for k in v:
                    if _search(pat, k):
                        if not self.validate(v[k], sub, 0):
                            return _fail
                        ev_props.add(k)
            if "additionalProperties" in s:
                ap = s["additionalProperties"]
                for k in v:
                    if k in props:
                        continue
                    if any(_search(pat, k) for pat in pat_props):
                        continue
                    if not self.validate(v[k], ap, 0):
                        return _fail
                    ev_props.add(k)
            if "propertyNames" in s:
                # applies to the *names*, not the members: evaluates
                # no properties (spec annotation model)
                for k in v:
                    if not self.validate(k, s["propertyNames"], 0):
                        return _fail
            for trigger, needed in s.get("dependentRequired", {}).items():
                if trigger in v and any(k not in v for k in needed):
                    return _fail
            for trigger, sub in s.get("dependentSchemas", {}).items():
                if trigger in v:
                    ok, p, i = self._validate(v, sub, dep)
                    if not ok:
                        return _fail
                    ev_props |= p
                    ev_items |= i

        # ---- logic (in-place applicators: merge their annotations) --
        if "allOf" in s:
            for sub in s["allOf"]:
                ok, p, i = self._validate(v, sub, dep)
                if not ok:
                    return _fail
                ev_props |= p
                ev_items |= i
        if "anyOf" in s:
            # every succeeding branch contributes annotations, so no
            # short-circuit (a second matching branch can mark more
            # properties evaluated — spec §11 / jsonschema behavior)
            hit = False
            for sub in s["anyOf"]:
                ok, p, i = self._validate(v, sub, dep)
                if ok:
                    hit = True
                    ev_props |= p
                    ev_items |= i
            if not hit:
                return _fail
        if "oneOf" in s:
            # count-of-true == 1 (the reference expands this
            # quadratically for generation, normalize.py:469-481; for
            # evaluation counting is enough)
            wins = [self._validate(v, sub, dep) for sub in s["oneOf"]]
            if sum(1 for ok, _, _ in wins if ok) != 1:
                return _fail
            for ok, p, i in wins:
                if ok:
                    ev_props |= p
                    ev_items |= i
        if "not" in s and self.validate(v, s["not"], dep):
            return _fail
        if "if" in s:
            if_ok, if_p, if_i = self._validate(v, s["if"], dep)
            if if_ok:
                ev_props |= if_p
                ev_items |= if_i
                if "then" in s:
                    ok, p, i = self._validate(v, s["then"], dep)
                    if not ok:
                        return _fail
                    ev_props |= p
                    ev_items |= i
            else:
                if "else" in s:
                    ok, p, i = self._validate(v, s["else"], dep)
                    if not ok:
                        return _fail
                    ev_props |= p
                    ev_items |= i

        # ---- unevaluated* (run last: see every annotation above) ----
        if "unevaluatedProperties" in s and isinstance(v, dict):
            up = s["unevaluatedProperties"]
            for k in v:
                if k not in ev_props:
                    if not self.validate(v[k], up, 0):
                        return _fail
                    ev_props.add(k)
        if "unevaluatedItems" in s and isinstance(v, (list, tuple)):
            ui = s["unevaluatedItems"]
            for i in range(len(v)):
                if i not in ev_items:
                    if not self.validate(v[i], ui, 0):
                        return _fail
                    ev_items.add(i)

        return True, ev_props, ev_items

    def _content_ok(self, v: str, s: dict, dep: int) -> bool:
        """contentEncoding base64 → strict RFC-4648 decode;
        contentMediaType application/json → the (decoded) text parses;
        contentSchema → the parsed document validates.  Unknown
        encodings/media types assert nothing (annotation default)."""
        text = v
        if s.get("contentEncoding") == "base64":
            try:
                raw = base64.b64decode(v, validate=True)
            except (binascii.Error, ValueError):
                return False
            if base64.b64encode(raw).decode("ascii") != v:
                return False  # non-canonical padding/length
            try:
                text = raw.decode("utf-8")
            except UnicodeDecodeError:
                # valid base64 of non-text payload: only fails if a
                # text-media-type / contentSchema check needs the text
                return not (
                    s.get("contentMediaType") == "application/json"
                    or "contentSchema" in s
                )
        if s.get("contentMediaType") == "application/json" or (
            "contentSchema" in s and s.get("contentMediaType") in (None, "application/json")
        ):
            try:
                # strict JSON: NaN/Infinity are not JSON (python's
                # json.loads accepts them by default; the JVM tier's
                # try_parse_json rightly does not)
                doc = json.loads(text, parse_constant=_reject_json_constant)
            except (ValueError, TypeError):
                return False
            if "contentSchema" in s:
                return self.validate(doc, s["contentSchema"], 0)
        return True


def validate(value: Any, schema: SchemaType) -> bool:
    """One-shot convenience: evaluate ``schema`` against ``value``."""
    return Evaluator(schema).validate(value)
