"""Instance-side violation pointers for the fences JSON-schema dialect.

The JSON dual of the XSD per-element violation paths (schema/xsd.py
XmlPathCompiler): for an invalid instance, emit *(instance
JSON-pointer, failing keyword)* pairs locating every violation — the
first thing a user debugging a failing corpus wants.  Path vocabulary
follows the reference's JsonPointer rendering
(/root/reference/fences/json_schema/json_pointer.py:5-57): ``#`` for
the root, ``#/a/b/0`` for nested locations, RFC 6901 token escaping
(``~`` → ``~0``, ``/`` → ``~1``).

Error-location semantics are arbitrated against
``jsonschema.Draft202012Validator.iter_errors`` (the error oracle of
tests/test_pointers.py): each emitted pair corresponds to one
top-level jsonschema ValidationError as ``(absolute_path,
validator)``.  The pinned vocabulary, from empirical probes of
jsonschema 4.26:

- leaf assertions (type/enum/const/min*/max*/multipleOf/pattern/
  format/uniqueItems/minProperties/…) error at the CURRENT instance
  location with their own keyword — and, like jsonschema, keywords do
  not short-circuit each other (a value can fail both ``minLength``
  and ``pattern``);
- ``required``/``dependentRequired`` error at the OBJECT location;
- ``properties``/``patternProperties``/``prefixItems``/``items``
  (schema form)/``additionalProperties`` (schema form) descend —
  child errors carry the child path and the inner keyword;
- ``additionalProperties: false`` / ``items: false`` (beyond
  prefixItems) / ``unevaluatedProperties`` / ``unevaluatedItems``
  emit ONE error at the container location with their own keyword;
- ``propertyNames`` validates each key IN PLACE: inner keyword, path
  unchanged (jsonschema: ``('#', 'maxLength')``);
- ``anyOf`` (no branch matched), ``oneOf`` (match count ≠ 1),
  ``not`` and ``contains`` (zero items matched; otherwise
  ``minContains``/``maxContains``) emit one error at the current
  location with the combinator keyword;
- ``allOf``/``$ref``/``$dynamicRef``/``if``/``then``/``else``/
  ``dependentSchemas`` are in-place applicators: inner errors
  propagate unchanged.

Dialect choices (documented divergences from jsonschema, pinned in
tests): a ``false`` boolean schema errors at the instance location it
rejects with keyword ``"false"`` (jsonschema reports validator None
at an implementation-dependent position); ``format`` and ``content*``
are asserted (this dialect validates them; draft 2020-12 makes them
annotation-only).
"""

from __future__ import annotations

import base64
import binascii
import json
from typing import Any

from fences_spark.schema.evaluator import (
    Evaluator,
    SchemaType,
    _deep_eq,
    _multiple_of,
    _pattern_ok,
    _search,
    _type_matches,
    format_regex,
    json_type,
)

Path = tuple  # of str tokens (array indices already rendered as str)


def render_pointer(path: Path) -> str:
    """RFC 6901 rendering with the reference's ``#``-prefixed style
    (json_pointer.py:17-18: ``'#/' + '/'.join(elements)``; root = no
    elements → ``#``)."""
    if not path:
        return "#"
    return "#/" + "/".join(
        t.replace("~", "~0").replace("/", "~1") for t in path
    )


class PointerCollector:
    """Collects violation (pointer, keyword) pairs for one schema over
    many instances.  Wraps an :class:`Evaluator` for $ref/$dynamicRef
    resolution, dynamic-scope bookkeeping, plugin snapshots, and
    branch verdicts/annotations — the collector adds error
    localization, never re-defining verdict semantics.  Invariant
    (pinned by tests): ``errors(v) == []`` iff
    ``Evaluator(schema).validate(v)``."""

    def __init__(
        self,
        root: SchemaType,
        plugins: dict | None = None,
        resources: dict[str, SchemaType] | None = None,
    ) -> None:
        self._ev = Evaluator(root, plugins=plugins, resources=resources)
        self.root = self._ev.root

    # -- public ----------------------------------------------------------
    def errors(self, value: Any) -> list[tuple[str, str]]:
        """Sorted, de-duplicated (pointer, keyword) pairs; empty for a
        valid instance.  Raises SchemaDepthError on value-free $ref
        cycles, like the evaluator."""
        out: set[tuple[Path, str]] = set()
        self._collect(value, self.root, (), 0, out)
        return sorted((render_pointer(p), kw) for p, kw in out)

    # -- internals ---------------------------------------------------------
    def _branch(self, v: Any, s: SchemaType, depth: int) -> bool:
        """Branch verdict — always the evaluator's, so the two
        surfaces cannot drift."""
        return self._ev._validate(v, s, depth)[0]

    def _push_scope(self, s: SchemaType) -> bool:
        ev = self._ev
        if not ev._scoped or not isinstance(s, dict):
            return False
        b = ev._base_of.get(id(s))
        if b is not None and (not ev._scope or ev._scope[-1] != b):
            ev._scope.append(b)
            return True
        return False

    def _collect(
        self, v: Any, s: SchemaType, path: Path, depth: int, out: set
    ) -> None:
        """Dynamic-scope wrapper mirroring Evaluator._validate: the
        collector descends schema resources itself, so it must keep
        the evaluator's scope chain current for $dynamicRef
        resolution and for _branch/validate calls made mid-descent."""
        pushed = self._push_scope(s)
        try:
            return self._collect_inner(v, s, path, depth, out)
        finally:
            if pushed:
                self._ev._scope.pop()

    def _collect_inner(
        self, v: Any, s: SchemaType, path: Path, depth: int, out: set
    ) -> None:
        """Append every violation of ``s`` on ``v`` (at ``path``).
        Mirrors Evaluator._validate_inner keyword-for-keyword but
        collects instead of short-circuiting; annotation merging for
        unevaluated* reuses the evaluator's branch results."""
        if s is True:
            return
        if s is False:
            out.add((path, "false"))
            return
        if not isinstance(s, dict):
            raise TypeError(f"schema must be dict or bool: {s!r}")
        if depth > self._ev.MAX_DEPTH:
            # delegate the no-progress bound to the evaluator's raise
            self._ev._validate(v, s, depth)
            return
        dep = depth + 1

        if self._ev._plugins:
            for k in s:
                plugin = self._ev._plugins.get(k)
                if plugin is not None and not plugin.py_pred(s[k], v):
                    out.add((path, k))

        for ref_kw in ("$ref", "$dynamicRef"):
            if ref_kw in s:
                if ref_kw == "$ref":
                    target = self._ev._resolve_ref(
                        s["$ref"], self._ev._base_of.get(id(s))
                    )
                else:
                    target = self._ev._resolve_dynamic_ref(s["$dynamicRef"], s)
                if not self._branch(v, target, dep):
                    self._collect(v, target, path, dep, out)

        if "type" in s:
            ts = s["type"]
            ts = [ts] if isinstance(ts, str) else list(ts)
            if not any(_type_matches(v, t) for t in ts):
                out.add((path, "type"))

        if "enum" in s and not any(_deep_eq(v, e) for e in s["enum"]):
            out.add((path, "enum"))
        if "NOT_enum" in s and any(_deep_eq(v, e) for e in s["NOT_enum"]):
            out.add((path, "NOT_enum"))
        if "const" in s and not _deep_eq(v, s["const"]):
            out.add((path, "const"))
        if "NOT_const" in s and _deep_eq(v, s["NOT_const"]):
            out.add((path, "NOT_const"))

        if json_type(v) == "number":
            fv = float(v)
            if "minimum" in s and fv < float(s["minimum"]):
                out.add((path, "minimum"))
            if "maximum" in s and fv > float(s["maximum"]):
                out.add((path, "maximum"))
            if "exclusiveMinimum" in s and fv <= float(s["exclusiveMinimum"]):
                out.add((path, "exclusiveMinimum"))
            if "exclusiveMaximum" in s and fv >= float(s["exclusiveMaximum"]):
                out.add((path, "exclusiveMaximum"))
            if "multipleOf" in s and not _multiple_of(v, s["multipleOf"]):
                out.add((path, "multipleOf"))
            if "NOT_multipleOf" in s and _multiple_of(v, s["NOT_multipleOf"]):
                out.add((path, "NOT_multipleOf"))

        if isinstance(v, str):
            if "minLength" in s and len(v) < s["minLength"]:
                out.add((path, "minLength"))
            if "maxLength" in s and len(v) > s["maxLength"]:
                out.add((path, "maxLength"))
            if "pattern" in s and not _pattern_ok(s["pattern"], v):
                out.add((path, "pattern"))
            if "format" in s:
                rx = format_regex(s["format"])
                if rx is not None and not _search(rx, v):
                    out.add((path, "format"))
            if ("contentEncoding" in s or "contentMediaType" in s
                    or "contentSchema" in s):
                self._content_errors(v, s, path, dep, out)

        if isinstance(v, (list, tuple)):
            n = len(v)
            if "minItems" in s and n < s["minItems"]:
                out.add((path, "minItems"))
            if "maxItems" in s and n > s["maxItems"]:
                out.add((path, "maxItems"))
            if s.get("uniqueItems") and any(
                _deep_eq(v[i], v[j]) for i in range(n) for j in range(i + 1, n)
            ):
                out.add((path, "uniqueItems"))
            if s.get("NOT_uniqueItems") and not any(
                _deep_eq(v[i], v[j]) for i in range(n) for j in range(i + 1, n)
            ):
                out.add((path, "NOT_uniqueItems"))
            prefix = s.get("prefixItems", [])
            for i, sub in enumerate(prefix):
                if i < n:
                    self._collect(v[i], sub, path + (str(i),), 0, out)
            if "items" in s:
                if s["items"] is False:
                    # jsonschema: one 'items' error at the array
                    # location ("Expected at most N items")
                    if n > len(prefix):
                        out.add((path, "items"))
                else:
                    for i in range(len(prefix), n):
                        self._collect(v[i], s["items"], path + (str(i),), 0, out)
            if "contains" in s:
                hits = sum(
                    1 for i in range(n) if self._ev.validate(v[i], s["contains"], 0)
                )
                max_c = s.get("maxContains", n)
                min_c = s.get("minContains", 1)
                if hits > max_c:
                    # maxContains short-circuits minContains (jsonschema
                    # _keywords.contains returns after the max error)
                    out.add((path, "maxContains"))
                elif hits < min_c:
                    # zero matches → 'contains'; a short match count
                    # against an explicit bound → 'minContains'
                    out.add((path, "contains" if not hits else "minContains"))

        if isinstance(v, dict):
            for k in s.get("required", []):
                if k not in v:
                    out.add((path, "required"))
            for k in s.get("NOT_required", []):
                if k in v:
                    out.add((path, "NOT_required"))
            if "minProperties" in s and len(v) < s["minProperties"]:
                out.add((path, "minProperties"))
            if "maxProperties" in s and len(v) > s["maxProperties"]:
                out.add((path, "maxProperties"))
            props = s.get("properties", {})
            for k, sub in props.items():
                if k in v:
                    self._collect(v[k], sub, path + (k,), 0, out)
            pat_props = s.get("patternProperties", {})
            for pat, sub in pat_props.items():
                for k in v:
                    if _search(pat, k):
                        self._collect(v[k], sub, path + (k,), 0, out)
            if "additionalProperties" in s:
                ap = s["additionalProperties"]
                extra = [
                    k for k in v
                    if k not in props
                    and not any(_search(pat, k) for pat in pat_props)
                ]
                if ap is False:
                    # one error at the object (jsonschema lists the
                    # unexpected keys in a single message)
                    if extra:
                        out.add((path, "additionalProperties"))
                else:
                    for k in extra:
                        self._collect(v[k], ap, path + (k,), 0, out)
            if "propertyNames" in s:
                for k in v:
                    # names validate IN PLACE: inner keyword, path
                    # unchanged (probed jsonschema behavior)
                    self._collect(k, s["propertyNames"], path, 0, out)
            for trigger, needed in s.get("dependentRequired", {}).items():
                if trigger in v and any(k not in v for k in needed):
                    out.add((path, "dependentRequired"))
            for trigger, sub in s.get("dependentSchemas", {}).items():
                if trigger in v and not self._branch(v, sub, dep):
                    self._collect(v, sub, path, dep, out)

        if "allOf" in s:
            for sub in s["allOf"]:
                if not self._branch(v, sub, dep):
                    self._collect(v, sub, path, dep, out)
        if "anyOf" in s:
            if not any(self._branch(v, sub, dep) for sub in s["anyOf"]):
                out.add((path, "anyOf"))
        if "oneOf" in s:
            if sum(1 for sub in s["oneOf"] if self._branch(v, sub, dep)) != 1:
                out.add((path, "oneOf"))
        if "not" in s and self._ev.validate(v, s["not"], dep):
            out.add((path, "not"))
        if "if" in s:
            arm = "then" if self._branch(v, s["if"], dep) else "else"
            if arm in s and not self._branch(v, s[arm], dep):
                self._collect(v, s[arm], path, dep, out)

        # unevaluated*: one error at the container.  Evaluated-key /
        # evaluated-index sets use jsonschema's ERROR-TIME semantics
        # (_utils.find_evaluated_*_by_schema — e.g. a FAILING $ref
        # still contributes its keys, `items` present marks every
        # index), which deliberately differ from the spec's
        # valid-annotation semantics the evaluator uses for the
        # VERDICT.  The divergence never breaks the errors()==[] iff
        # valid invariant: jsonschema's sets are a superset of the
        # spec sets on every VALID instance, and on an invalid one
        # some other error has already been collected.
        if "unevaluatedProperties" in s and isinstance(v, dict):
            up = s["unevaluatedProperties"]
            keys = self._js_evaluated_keys(v, s)
            if any(
                k not in keys and not self._ev.validate(v[k], up, 0) for k in v
            ):
                out.add((path, "unevaluatedProperties"))
        if "unevaluatedItems" in s and isinstance(v, (list, tuple)):
            ui = s["unevaluatedItems"]
            idxs = self._js_evaluated_indexes(v, s)
            if any(
                i not in idxs and not self._ev.validate(v[i], ui, 0)
                for i in range(len(v))
            ):
                out.add((path, "unevaluatedItems"))

    # -- jsonschema error-time evaluated-key/index sets --------------------
    def _js_evaluated_keys(self, v: dict, s: SchemaType) -> set:
        """Faithful port of jsonschema
        ``_utils.find_evaluated_property_keys_by_schema`` (4.26):
        $ref/$dynamicRef and triggered dependentSchemas recurse
        UNCONDITIONALLY; properties count by key presence alone;
        additionalProperties/unevaluatedProperties subschemas count
        every instance key whose value validates; allOf/anyOf/oneOf
        branches count only when the branch is valid; if/then/else
        per the taken arm."""
        if not isinstance(s, dict):
            return set()
        pushed = self._push_scope(s)
        try:
            keys: set = set()
            if "$ref" in s:
                target = self._ev._resolve_ref(
                    s["$ref"], self._ev._base_of.get(id(s))
                )
                keys |= self._js_evaluated_keys(v, target)
            if "$dynamicRef" in s:
                target = self._ev._resolve_dynamic_ref(s["$dynamicRef"], s)
                keys |= self._js_evaluated_keys(v, target)
            keys |= s.get("properties", {}).keys() & v.keys()
            for kw in ("additionalProperties", "unevaluatedProperties"):
                if kw in s:
                    keys |= {
                        k for k, val in v.items()
                        if self._ev.validate(val, s[kw], 0)
                    }
            for pat in s.get("patternProperties", {}):
                keys |= {k for k in v if _search(pat, k)}
            for trigger, sub in s.get("dependentSchemas", {}).items():
                if trigger in v:
                    keys |= self._js_evaluated_keys(v, sub)
            for kw in ("allOf", "oneOf", "anyOf"):
                for sub in s.get(kw, []):
                    if self._ev.validate(v, sub, 0):
                        keys |= self._js_evaluated_keys(v, sub)
            if "if" in s:
                if self._ev.validate(v, s["if"], 0):
                    keys |= self._js_evaluated_keys(v, s["if"])
                    if "then" in s:
                        keys |= self._js_evaluated_keys(v, s["then"])
                elif "else" in s:
                    keys |= self._js_evaluated_keys(v, s["else"])
            return keys
        finally:
            if pushed:
                self._ev._scope.pop()

    def _js_evaluated_indexes(self, v, s: SchemaType) -> set:
        """Faithful port of jsonschema
        ``_utils.find_evaluated_item_indexes_by_schema`` (4.26): any
        ``items`` keyword (even False) marks EVERY index and returns
        early; prefixItems marks its full static range; contains /
        unevaluatedItems mark indexes whose value validates;
        branch/arm rules as for keys (no dependentSchemas)."""
        if not isinstance(s, dict):
            return set()
        pushed = self._push_scope(s)
        try:
            if "items" in s:
                return set(range(len(v)))
            idxs: set = set()
            if "$ref" in s:
                target = self._ev._resolve_ref(
                    s["$ref"], self._ev._base_of.get(id(s))
                )
                idxs |= self._js_evaluated_indexes(v, target)
            if "$dynamicRef" in s:
                target = self._ev._resolve_dynamic_ref(s["$dynamicRef"], s)
                idxs |= self._js_evaluated_indexes(v, target)
            if "prefixItems" in s:
                idxs |= set(range(len(s["prefixItems"])))
            if "if" in s:
                if self._ev.validate(v, s["if"], 0):
                    idxs |= self._js_evaluated_indexes(v, s["if"])
                    if "then" in s:
                        idxs |= self._js_evaluated_indexes(v, s["then"])
                elif "else" in s:
                    idxs |= self._js_evaluated_indexes(v, s["else"])
            for kw in ("contains", "unevaluatedItems"):
                if kw in s:
                    idxs |= {
                        i for i, x in enumerate(v)
                        if self._ev.validate(x, s[kw], 0)
                    }
            for kw in ("allOf", "oneOf", "anyOf"):
                for sub in s.get(kw, []):
                    if self._ev.validate(v, sub, 0):
                        idxs |= self._js_evaluated_indexes(v, sub)
            return idxs
        finally:
            if pushed:
                self._ev._scope.pop()

    def _content_errors(
        self, v: str, s: dict, path: Path, dep: int, out: set
    ) -> None:
        """Mirror Evaluator._content_ok with per-stage attribution:
        bad base64 → contentEncoding; unparseable JSON →
        contentMediaType (or contentSchema when only it forces the
        parse); contentSchema mismatch → contentSchema."""
        text = v
        if s.get("contentEncoding") == "base64":
            try:
                raw = base64.b64decode(v, validate=True)
            except (binascii.Error, ValueError):
                out.add((path, "contentEncoding"))
                return
            if base64.b64encode(raw).decode("ascii") != v:
                out.add((path, "contentEncoding"))
                return
            try:
                text = raw.decode("utf-8")
            except UnicodeDecodeError:
                if (s.get("contentMediaType") == "application/json"
                        or "contentSchema" in s):
                    out.add((path, "contentMediaType"
                             if s.get("contentMediaType") == "application/json"
                             else "contentSchema"))
                return
        if s.get("contentMediaType") == "application/json" or (
            "contentSchema" in s
            and s.get("contentMediaType") in (None, "application/json")
        ):
            try:
                from fences_spark.schema.evaluator import _reject_json_constant

                doc = json.loads(text, parse_constant=_reject_json_constant)
            except (ValueError, TypeError):
                out.add((path, "contentMediaType"
                         if "contentMediaType" in s else "contentSchema"))
                return
            if "contentSchema" in s and not self._ev.validate(
                doc, s["contentSchema"], 0
            ):
                out.add((path, "contentSchema"))


def violation_pointers(
    value: Any, schema: SchemaType, resources: dict | None = None
) -> list[tuple[str, str]]:
    """One-shot convenience: (pointer, keyword) pairs for one value."""
    return PointerCollector(schema, resources=resources).errors(value)
