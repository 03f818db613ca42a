"""Compile a fences-dialect schema against a column holding a JSON
*document as text* (e.g. an events ``props`` cell, or the fixture
``sample_json`` column).

Two tiers:

1. **Builtin tier** — compiles to ``try_parse_json`` +
   ``schema_of_variant`` / ``try_variant_get`` Column algebra:
   JVM-side, codegen'd, no Python.  Covers scalar keywords, nested
   objects/arrays (``array<variant>`` / ``map<string,variant>`` casts
   drive items/prefixItems/contains, patternProperties/propertyNames/
   additionalProperties, dependent*), bounded-unroll local ``$ref``,
   and the content* round-trip (``_content_pred``).
2. **Arrow tier** — the residue (composite enum literals,
   ``uniqueItems`` deep equality, ``unevaluated*`` annotation
   tracking, recursion past the unroll bound) runs the reference
   evaluator (fences_spark.schema.evaluator) inside a *vectorized
   pandas UDF*: one Python invocation per Arrow batch, never per row,
   per the north-rule constraint (BASELINE.json:15 "no per-row
   Python").

``compile_json(schema, col)`` tries tier 1 and falls back to tier 2.
"""

from __future__ import annotations

import functools
import json
import operator
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import Column, functions as F

from fences_spark.compiler import CompileError, lower_unevaluated
from fences_spark.compiler.typed import _require_portable_regex
from fences_spark.schema.evaluator import (
    Evaluator,
    SchemaType,
    format_regex,
    uses_dynamic_scope,
)
from fences_spark.schema.regex_dialect import compile_dialect_pattern, to_java_regex

# ---------------------------------------------------------------------------
# tier 2: Arrow-vectorized evaluator UDF
# ---------------------------------------------------------------------------


def json_eval_udf(schema: SchemaType, resources: dict | None = None) -> Any:
    """Return a pandas UDF (boolean) evaluating ``schema`` over a JSON
    string column.  The schema (and any pre-registered external
    resource documents) is captured in the closure and shipped once
    per task, not per row; execution is one Python call per Arrow
    batch."""
    schema_blob = json.dumps(schema)
    resources_blob = json.dumps(resources or {})
    # snapshot the x- keyword plugin registry HERE, on the driver — the
    # executor worker that runs this UDF has an empty registry
    from fences_spark.compiler.plugins import snapshot

    plugins = snapshot()

    @F.pandas_udf("boolean")
    def _eval(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ev = Evaluator(
            json.loads(schema_blob),
            plugins=plugins,
            resources=json.loads(resources_blob),
        )
        for s in batches:
            def one(x: Any) -> bool:
                if x is None:
                    return ev.validate(None)
                try:
                    return ev.validate(json.loads(x))
                except (ValueError, TypeError):
                    return False
            yield s.map(one).astype("boolean")

    return _eval


def compile_json_udf(
    schema: SchemaType, col: Column, resources: dict | None = None
) -> Column:
    return json_eval_udf(schema, resources)(col)


# ---------------------------------------------------------------------------
# tier 1: VariantType builtins (flat subset)
# ---------------------------------------------------------------------------

_NUM_PREFIXES = ("BIGINT", "DOUBLE", "DECIMAL", "FLOAT", "INT", "SMALLINT", "TINYINT")

_SUPPORTED_VARIANT_KEYWORDS = frozenset(
    {
        "type", "enum", "NOT_enum", "const", "NOT_const",
        "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
        "multipleOf", "NOT_multipleOf",
        "minLength", "maxLength", "pattern", "format",
        "minItems", "maxItems", "items", "prefixItems",
        "contains", "minContains", "maxContains",
        "required", "NOT_required", "properties",
        "minProperties", "maxProperties",
        "patternProperties", "propertyNames", "additionalProperties",
        "dependentRequired", "dependentSchemas",
        "contentEncoding", "contentMediaType", "contentSchema",
        "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
        "$ref",
    }
) | frozenset(
    {
        "description", "title", "$comment", "deprecated", "example",
        "examples", "default", "$schema", "$id", "$anchor",
    }
)

# identifier keys use direct variant path extraction ($.k); anything
# else goes through the map<string,variant> cast (no path escaping)
_SIMPLE_KEY = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_MAX_REF_DEPTH = 12


def _tv(v: Column) -> Column:
    return F.schema_of_variant(v)


def _is_number(v: Column) -> Column:
    t = _tv(v)
    return functools.reduce(operator.or_, [t.startswith(p) for p in _NUM_PREFIXES])


def _is_integer_variant(v: Column) -> Column:
    num = F.try_variant_get(v, "$", "double")
    return _is_number(v) & (F.pmod(num, F.lit(1.0)) == F.lit(0.0))


def _type_pred(v: Column, ts: list[str]) -> Column:
    t = _tv(v)
    opts: list[Column] = []
    for x in ts:
        if x == "string":
            opts.append(t == F.lit("STRING"))
        elif x == "number":
            opts.append(_is_number(v))
        elif x == "integer":
            opts.append(_is_integer_variant(v))
        elif x == "boolean":
            opts.append(t == F.lit("BOOLEAN"))
        elif x == "null":
            opts.append(F.is_variant_null(v))
        elif x == "array":
            opts.append(t.startswith("ARRAY"))
        elif x == "object":
            opts.append(t.startswith("OBJECT") | t.startswith("STRUCT"))
        else:
            raise CompileError(f"unknown type {x}")
    return functools.reduce(operator.or_, opts) if opts else F.lit(False)


class VariantCompiler:
    """Flat-subset compiler over a variant expression.  Raises
    CompileError on anything it cannot express exactly."""

    def __init__(self, root: SchemaType):
        from fences_spark.schema.evaluator import uses_dynamic_scope

        if uses_dynamic_scope(root):
            # $dynamicRef / $dynamicAnchor / non-root $id need the
            # dynamic-scope resolution only the Arrow evaluator
            # carries; plain $anchor in a single-resource document
            # compiles fine (static resolution via the evaluator index)
            raise CompileError("dynamic-scope document: Arrow tier required")
        self.root = root
        self.evaluator = Evaluator(root)

    def compile(self, v: Column) -> Column:
        return self._compile(self.root, v, 0)

    def _compile(self, s: SchemaType, v: Column, depth: int = 0) -> Column:
        if s is True:
            return F.lit(True)
        if s is False:
            return F.lit(False)
        unsupported = set(s) - _SUPPORTED_VARIANT_KEYWORDS
        if s is self.root:
            unsupported.discard("$defs")  # ref targets, resolved at compile time
        if unsupported:
            raise CompileError(f"variant tier cannot express: {sorted(unsupported)}")

        preds: list[Column] = []

        if "$ref" in s:
            # compile-time inline with bounded unroll, exactly the
            # typed tier's strategy (typed.py _MAX_REF_DEPTH); schemas
            # recursing past the bound fall back to the Arrow tier
            if depth > _MAX_REF_DEPTH:
                raise CompileError(f"$ref deeper than {_MAX_REF_DEPTH}: {s['$ref']}")
            # an unresolvable ref (typo'd anchor, unregistered URI)
            # raises ValueError here and propagates: the Arrow tier
            # would hit the same error per task, so failing fast at
            # compile is strictly better (registry-backed schemas
            # never reach this compiler — compile_json routes them
            # to the Arrow tier before trying this tier)
            target = self.evaluator._resolve_ref(s["$ref"])
            preds.append(self._compile(target, v, depth + 1))
        t = _tv(v)
        is_str = t == F.lit("STRING")
        is_num = _is_number(v)
        sval = F.try_variant_get(v, "$", "string")
        nval = F.try_variant_get(v, "$", "double")

        if "type" in s:
            ts = s["type"]
            preds.append(_type_pred(v, [ts] if isinstance(ts, str) else list(ts)))

        for key, invert in (("enum", False), ("NOT_enum", True)):
            if key in s:
                p = self._enum_pred(s[key], v, t, sval, nval, is_num)
                preds.append(~p if invert else p)
        for key, invert in (("const", False), ("NOT_const", True)):
            if key in s:
                p = self._enum_pred([s[key]], v, t, sval, nval, is_num)
                preds.append(~p if invert else p)

        def num_gate(p: Column) -> Column:
            return F.when(is_num, p).otherwise(F.lit(True))

        if "minimum" in s:
            preds.append(num_gate(nval >= F.lit(float(s["minimum"]))))
        if "maximum" in s:
            preds.append(num_gate(nval <= F.lit(float(s["maximum"]))))
        if "exclusiveMinimum" in s:
            preds.append(num_gate(nval > F.lit(float(s["exclusiveMinimum"]))))
        if "exclusiveMaximum" in s:
            preds.append(num_gate(nval < F.lit(float(s["exclusiveMaximum"]))))
        for key, invert in (("multipleOf", False), ("NOT_multipleOf", True)):
            if key in s:
                k = s[key]
                if k == 0:
                    p = F.lit(False)
                elif not isinstance(k, float):
                    # integer divisor: jsonschema uses exact modulo
                    p = F.pmod(nval, F.lit(float(k))) == F.lit(0.0)
                else:
                    # float divisor: IEEE quotient must be an integer.
                    # pmod, not floor: F.floor returns BIGINT and
                    # overflows for |q| > 2^63; pmod(±inf,1.0)=NaN
                    # keeps overflow-to-inf invalid.
                    q = nval / F.lit(k)
                    p = F.pmod(q, F.lit(1.0)) == F.lit(0.0)
                preds.append(num_gate(~p if invert else p))

        def str_gate(p: Column) -> Column:
            return F.when(is_str, p).otherwise(F.lit(True))

        if "minLength" in s:
            preds.append(str_gate(F.length(sval) >= F.lit(int(s["minLength"]))))
        if "maxLength" in s:
            preds.append(str_gate(F.length(sval) <= F.lit(int(s["maxLength"]))))
        if "pattern" in s:
            for rx, negated in compile_dialect_pattern(s["pattern"]):
                p = sval.rlike(to_java_regex(rx))
                preds.append(str_gate(~p if negated else p))
        if "format" in s:
            rx = format_regex(s["format"])
            if rx is not None:
                preds.append(str_gate(sval.rlike(to_java_regex(rx))))
        if "contentEncoding" in s or "contentMediaType" in s or "contentSchema" in s:
            preds.append(str_gate(self._content_pred(s, sval, depth)))

        is_arr = t.startswith("ARRAY")

        def arr_gate(p: Column) -> Column:
            return F.when(is_arr, p).otherwise(F.lit(True))

        arr = F.try_variant_get(v, "$", "array<variant>")
        if "minItems" in s:
            preds.append(arr_gate(F.size(arr) >= F.lit(int(s["minItems"]))))
        if "maxItems" in s:
            preds.append(arr_gate(F.size(arr) <= F.lit(int(s["maxItems"]))))
        prefix = s.get("prefixItems", [])
        for i, sub in enumerate(prefix):
            elem = F.element_at(arr, i + 1)
            preds.append(
                arr_gate(
                    F.when(F.size(arr) > i, self._compile(sub, elem, depth)).otherwise(F.lit(True))
                )
            )
        if "items" in s:
            items_s = s["items"]
            tail = (
                F.slice(arr, len(prefix) + 1, F.greatest(F.size(arr) - len(prefix), F.lit(0)))
                if prefix
                else arr
            )
            preds.append(arr_gate(F.forall(tail, lambda x: self._compile(items_s, x, depth))))
        if "contains" in s:
            c_s = s["contains"]
            hits = F.size(F.filter(arr, lambda x: self._compile(c_s, x, depth)))
            preds.append(arr_gate(hits >= F.lit(int(s.get("minContains", 1)))))
            if "maxContains" in s:
                preds.append(arr_gate(hits <= F.lit(int(s["maxContains"]))))

        is_obj = t.startswith("OBJECT") | t.startswith("STRUCT")

        def obj_gate(p: Column) -> Column:
            return F.when(is_obj, p).otherwise(F.lit(True))

        # identifier keys extract directly ($.k — no map materialization);
        # the map<string,variant> cast serves key-set keywords and
        # non-identifier key names
        m = F.try_variant_get(v, "$", "map<string,variant>")

        def member(k: str) -> Column:
            if _SIMPLE_KEY.match(k):
                return F.try_variant_get(v, f"$.{k}", "variant")
            return F.element_at(m, k)

        for k in s.get("required", []):
            preds.append(obj_gate(member(k).isNotNull()))
        for k in s.get("NOT_required", []):
            # normalizer-internal: listed keys must be absent
            preds.append(obj_gate(member(k).isNull()))
        props = s.get("properties", {})
        for k, sub in props.items():
            child = member(k)
            preds.append(
                obj_gate(
                    F.when(child.isNull(), F.lit(True)).otherwise(self._compile(sub, child, depth))
                )
            )
        if "minProperties" in s:
            preds.append(obj_gate(F.size(m) >= F.lit(int(s["minProperties"]))))
        if "maxProperties" in s:
            preds.append(obj_gate(F.size(m) <= F.lit(int(s["maxProperties"]))))
        pat_props = s.get("patternProperties", {})
        for pat in pat_props:
            _require_portable_regex(pat)
        for pat, sub in pat_props.items():
            jpat = to_java_regex(pat)
            sub_s = sub
            matching = F.map_filter(m, lambda k, _: k.rlike(jpat))
            preds.append(
                obj_gate(
                    F.forall(F.map_values(matching), lambda x: self._compile(sub_s, x, depth))
                )
            )
        if "additionalProperties" in s:
            ap = s["additionalProperties"]
            listed = F.array(*[F.lit(k) for k in props]) if props else None
            ap_pats = [to_java_regex(p) for p in pat_props]

            def _is_other(k: Column) -> Column:
                other = ~F.array_contains(listed, k) if listed is not None else F.lit(True)
                for jp in ap_pats:
                    other = other & ~k.rlike(jp)
                return other

            others = F.map_filter(m, lambda k, _: _is_other(k))
            preds.append(
                obj_gate(F.forall(F.map_values(others), lambda x: self._compile(ap, x, depth)))
            )
        if "propertyNames" in s:
            pn = s["propertyNames"]
            preds.append(
                obj_gate(F.forall(F.map_keys(m), lambda k: self._compile_on_string(pn, k)))
            )
        for trigger, needed in s.get("dependentRequired", {}).items():
            present = functools.reduce(
                operator.and_, [member(k).isNotNull() for k in needed], F.lit(True)
            )
            preds.append(
                obj_gate(F.when(member(trigger).isNotNull(), present).otherwise(F.lit(True)))
            )
        for trigger, sub in s.get("dependentSchemas", {}).items():
            preds.append(
                obj_gate(
                    F.when(
                        member(trigger).isNotNull(), self._compile(sub, v, depth)
                    ).otherwise(F.lit(True))
                )
            )

        if "allOf" in s:
            preds.extend(self._compile(sub, v, depth) for sub in s["allOf"])
        if "anyOf" in s:
            opts = [self._compile(sub, v, depth) for sub in s["anyOf"]]
            preds.append(functools.reduce(operator.or_, opts) if opts else F.lit(False))
        if "oneOf" in s:
            counts = [self._compile(sub, v, depth).cast("int") for sub in s["oneOf"]]
            preds.append(
                functools.reduce(operator.add, counts) == F.lit(1) if counts else F.lit(False)
            )
        if "not" in s:
            preds.append(~self._compile(s["not"], v, depth))
        if "if" in s:
            if_p = self._compile(s["if"], v, depth)
            then_p = self._compile(s["then"], v, depth) if "then" in s else F.lit(True)
            else_p = self._compile(s["else"], v, depth) if "else" in s else F.lit(True)
            preds.append(F.when(if_p, then_p).otherwise(else_p))

        if not preds:
            return F.lit(True)
        return functools.reduce(operator.and_, preds)

    def _enum_pred(
        self,
        values: list[Any],
        v: Column,
        t: Column,
        sval: Column,
        nval: Column,
        is_num: Column,
    ) -> Column:
        opts: list[Column] = []
        for e in values:
            if e is None:
                opts.append(F.is_variant_null(v))
            elif isinstance(e, bool):
                opts.append(
                    (t == F.lit("BOOLEAN"))
                    & (F.try_variant_get(v, "$", "boolean") == F.lit(e))
                )
            elif isinstance(e, (int, float)):
                opts.append(is_num & (nval == F.lit(float(e))))
            elif isinstance(e, str):
                opts.append((t == F.lit("STRING")) & (sval == F.lit(e)))
            else:
                raise CompileError("composite enum literal needs the UDF tier")
        return functools.reduce(operator.or_, opts) if opts else F.lit(False)

    # canonical-length RFC-4648 base64 (no whitespace, exact padding);
    # the re-encode round-trip below additionally pins the padding BITS
    # to zero, matching the evaluator's b64encode(b64decode(v)) == v
    _B64_CANONICAL = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"

    def _content_pred(self, s: dict, sval: Column, depth: int) -> Column:
        """content* assertions on a string value, mirroring
        ``Evaluator._content_ok`` exactly: contentEncoding base64 →
        unbase64 round-trip (SURVEY.md §2.A); contentMediaType
        application/json → try_parse_json non-null; contentSchema →
        compiled sub-predicate over the parsed variant.  Unknown
        encodings / media types assert nothing.  The rlike guard keeps
        ANSI-mode unbase64 from throwing on malformed input."""
        enc = s.get("contentEncoding")
        mt = s.get("contentMediaType")
        has_schema = "contentSchema" in s
        json_needed = mt == "application/json" or (
            has_schema and mt in (None, "application/json")
        )

        def json_check(txt: Column) -> Column:
            if not json_needed:
                return F.lit(True)
            doc = F.try_parse_json(txt)
            p = doc.isNotNull()
            if has_schema:
                p = p & self._compile(s["contentSchema"], doc, depth)
            return p

        if enc == "base64":
            raw = F.unbase64(sval)
            body = F.base64(raw) == sval
            if json_needed:
                body = body & F.when(
                    F.is_valid_utf8(raw), json_check(raw.cast("string"))
                ).otherwise(F.lit(False))
            return F.when(sval.rlike(self._B64_CANONICAL), body).otherwise(F.lit(False))
        return json_check(sval)

    _STRING_KEY_KEYWORDS = frozenset(
        {
            "type", "minLength", "maxLength", "pattern", "format",
            "enum", "const",
            "description", "title", "$comment", "deprecated",
            "example", "examples", "default",
        }
    )

    def _compile_on_string(self, s: SchemaType, k: Column) -> Column:
        """A ``propertyNames`` sub-schema applied to a map KEY — always
        a plain string column, so only string-applicable keywords are
        meaningful; anything else falls back to the Arrow tier."""
        if s is True:
            return F.lit(True)
        if s is False:
            return F.lit(False)
        unsupported = set(s) - self._STRING_KEY_KEYWORDS
        if unsupported:
            raise CompileError(f"propertyNames sub-schema too rich: {sorted(unsupported)}")
        preds: list[Column] = []
        if "type" in s:
            ts = s["type"]
            ts = [ts] if isinstance(ts, str) else list(ts)
            if "string" not in ts:
                return F.lit(False)  # no key can be a non-string
        if "minLength" in s:
            preds.append(F.length(k) >= F.lit(int(s["minLength"])))
        if "maxLength" in s:
            preds.append(F.length(k) <= F.lit(int(s["maxLength"])))
        if "pattern" in s:
            for rx, negated in compile_dialect_pattern(s["pattern"]):
                p = k.rlike(to_java_regex(rx))
                preds.append(~p if negated else p)
        if "format" in s:
            rx = format_regex(s["format"])
            if rx is not None:
                preds.append(k.rlike(to_java_regex(rx)))
        for kw in ("enum", "const"):
            if kw in s:
                members = s[kw] if kw == "enum" else [s[kw]]
                strs = [e for e in members if isinstance(e, str)]
                preds.append(k.isin(strs) if strs else F.lit(False))
        if not preds:
            return F.lit(True)
        return functools.reduce(operator.and_, preds)


def compile_json(
    schema: SchemaType, col: Column, resources: dict | None = None
) -> tuple[Column, str]:
    """Compile a schema against a JSON-text column.  Returns
    ``(predicate, tier)`` with tier in {"variant", "arrow_udf"}.

    ``resources`` pre-registers external schema documents (URI →
    document) for cross-document $ref/$dynamicRef — resolved from the
    registry, never fetched; such schemas compile on the Arrow tier.

    A malformed JSON cell is invalid; a SQL-NULL cell is evaluated as
    JSON null (consistent with the typed compiler)."""
    # BEFORE tier selection: a meta-schema requiring an unimplemented
    # vocabulary must refuse to compile on EVERY tier — inside the
    # try it would be swallowed into the Arrow fallback
    from fences_spark.schema.vocabulary import check_vocabularies

    check_vocabularies(schema, resources)
    try:
        if resources:
            raise CompileError("external resource registry: Arrow tier")
        if uses_dynamic_scope(schema):
            # checked BEFORE lowering: the Arrow tier must receive the
            # ORIGINAL schema (lower_unevaluated declines $dynamicRef
            # beside unevaluated*, but route-first is belt and braces)
            raise CompileError("dynamic-scope document: Arrow tier")
        schema = lower_unevaluated(schema)
        v = F.try_parse_json(col)
        pred = VariantCompiler(schema).compile(v)
        null_verdict = Evaluator(schema).validate(None)
        full = (
            F.when(col.isNull(), F.lit(null_verdict))
            .when(v.isNull(), F.lit(False))  # malformed JSON text
            .otherwise(pred)
        )
        return full, "variant"
    except CompileError:
        return compile_json_udf(schema, col, resources), "arrow_udf"
