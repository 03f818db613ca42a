"""Compile a fences-dialect schema into a pure built-in
``pyspark.sql.Column`` predicate over a *typed* column.

Every keyword of the reference's operator table
(/root/reference/fences/json_schema/normalize.py:81-229,
fences/json_schema/parse.py:116-122) maps to a JVM-side expression —
``rlike``, ``length``, ``isin``, comparison, ``forall``/``filter``/
``size``/``element_at``, ``getField``/``map_contains_key`` — so the
whole predicate stays inside whole-stage codegen; no Python runs per
row.  Schemas the builtin algebra cannot express (unbounded
recursion, composite-literal enums on nested types) raise
:class:`CompileError`; the RuleSet then falls back to the
Arrow-vectorized evaluator UDF.

Null convention for typed data: SQL NULL is JSON ``null`` at the top
level of a column, while a NULL *field inside a struct/map* means "key
absent" (Spark structs cannot distinguish absent from null).  The
null-branch verdict is computed at compile time with the reference
evaluator, so three-valued logic never leaks into a verdict.
"""

from __future__ import annotations

import functools
import operator
import re
from typing import Any

from pyspark.sql import Column, functions as F, types as T

from fences_spark.compiler import CompileError, lower_unevaluated
from fences_spark.schema.evaluator import Evaluator, SchemaType, format_regex
from fences_spark.schema.regex_dialect import compile_dialect_pattern, to_java_regex

_MAX_REF_DEPTH = 12

_NUMERIC_TYPES = (
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)
_INTEGRAL_TYPES = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)


def _json_type_of(dtype: T.DataType) -> str:
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, _NUMERIC_TYPES):
        return "number"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        # timestamps surface as formatted strings in JSON terms
        return "string"
    if isinstance(dtype, T.NullType):
        return "null"
    raise CompileError(f"unsupported Spark type for typed compile: {dtype}")


_JAVA_ONLY_REGEX = ("\\p{", "\\P{", "\\x{", "*+", "++", "?+", "\\Q", "\\E")


def _require_portable_regex(pat: str) -> None:
    """Map-tier patternProperties keys match with Java regex (rlike)
    while the evaluator ground truth uses Python re — restrict to the
    common subset so the two tiers can never return different verdicts
    for the same schema.  Non-portable patterns raise CompileError and
    fall back to the Arrow evaluator tier (Python semantics)."""
    try:
        re.compile(pat)
    except re.error as exc:
        raise CompileError(f"pattern {pat!r} not valid in Python re: {exc}") from exc
    for marker in _JAVA_ONLY_REGEX:
        if marker in pat:
            raise CompileError(
                f"pattern {pat!r} uses Java-only construct {marker!r}; UDF tier handles it"
            )


def _all(preds: list[Column]) -> Column:
    if not preds:
        return F.lit(True)
    return functools.reduce(operator.and_, preds)


def _any(preds: list[Column]) -> Column:
    if not preds:
        return F.lit(False)
    return functools.reduce(operator.or_, preds)


class TypedCompiler:
    """Compiles ``root`` (and its ``$defs``) against typed columns."""

    def __init__(self, root: SchemaType, max_ref_depth: int = _MAX_REF_DEPTH):
        from fences_spark.schema.evaluator import uses_dynamic_scope

        if uses_dynamic_scope(root):
            # $dynamicRef / $dynamicAnchor / non-root $id: dynamic-scope
            # resolution lives only in the Arrow evaluator
            raise CompileError("dynamic-scope document: Arrow tier required")
        # applicator-free unevaluated* lowers to additionalProperties/
        # items at compile time; annotation-needing shapes raise here
        # and callers fall back to the Arrow evaluator
        self.root = lower_unevaluated(root)
        self.evaluator = Evaluator(self.root)
        self.max_ref_depth = max_ref_depth

    # ------------------------------------------------------------------
    def compile(self, col: Column, dtype: T.DataType) -> Column:
        return self._compile(self.root, col, dtype, 0)

    # ------------------------------------------------------------------
    def _null_verdict(self, schema: SchemaType) -> bool:
        """Compile-time verdict of ``schema`` on JSON null (drives the
        NULL branch; the evaluator handles $refs)."""
        return self.evaluator.validate(None, schema)

    def _compile(self, schema: SchemaType, col: Column, dtype: T.DataType, depth: int) -> Column:
        if schema is True:
            return F.lit(True)
        if schema is False:
            return F.lit(False)
        if not isinstance(schema, dict):
            raise CompileError(f"schema must be dict or bool: {schema!r}")
        nonnull = self._compile_nonnull(schema, col, dtype, depth)
        return F.when(col.isNull(), F.lit(self._null_verdict(schema))).otherwise(nonnull)

    # ------------------------------------------------------------------
    def _compile_nonnull(
        self, s: dict, col: Column, dtype: T.DataType, depth: int
    ) -> Column:
        """Predicate assuming ``col`` is non-null."""
        preds: list[Column] = []
        jt = _json_type_of(dtype)

        if "$ref" in s:
            if depth > self.max_ref_depth:
                raise CompileError(f"$ref deeper than {self.max_ref_depth}: {s['$ref']}")
            # unresolvable refs raise ValueError and propagate —
            # fail-fast at compile; registry-backed rules skip this
            # compiler entirely (ruleset.Rule.compile)
            target = self.evaluator._resolve_ref(s["$ref"])
            preds.append(self._compile_nonnull_dispatch(target, col, dtype, depth + 1))

        # ---- type: decided at compile time from the Spark dtype ----
        if "type" in s:
            ts = s["type"]
            ts = [ts] if isinstance(ts, str) else list(ts)
            if jt in ts:
                pass  # always satisfied for non-null values
            elif "integer" in ts and jt == "number":
                preds.append(self._integral_pred(col, dtype))
            else:
                return F.lit(False)

        # ---- enum / const ----
        for key, invert in (("enum", False), ("NOT_enum", True)):
            if key in s:
                p = self._enum_pred(s[key], col, dtype)
                preds.append(~p if invert else p)
        for key, invert in (("const", False), ("NOT_const", True)):
            if key in s:
                p = self._enum_pred([s[key]], col, dtype)
                preds.append(~p if invert else p)

        # ---- number keywords ----
        if jt == "number":
            if "minimum" in s:
                preds.append(col >= F.lit(float(s["minimum"])))
            if "maximum" in s:
                preds.append(col <= F.lit(float(s["maximum"])))
            if "exclusiveMinimum" in s:
                preds.append(col > F.lit(float(s["exclusiveMinimum"])))
            if "exclusiveMaximum" in s:
                preds.append(col < F.lit(float(s["exclusiveMaximum"])))
            if "multipleOf" in s:
                preds.append(self._multiple_pred(col, dtype, s["multipleOf"]))
            if "NOT_multipleOf" in s:
                preds.append(~self._multiple_pred(col, dtype, s["NOT_multipleOf"]))

        # ---- string keywords ----
        if jt == "string":
            scol = col.cast("string") if not isinstance(dtype, T.StringType) else col
            if "minLength" in s:
                preds.append(F.length(scol) >= F.lit(int(s["minLength"])))
            if "maxLength" in s:
                preds.append(F.length(scol) <= F.lit(int(s["maxLength"])))
            if "pattern" in s:
                for rx, negated in compile_dialect_pattern(s["pattern"]):
                    p = scol.rlike(to_java_regex(rx))
                    preds.append(~p if negated else p)
            if "format" in s:
                rx = format_regex(s["format"])
                if rx is not None:
                    preds.append(scol.rlike(to_java_regex(rx)))
            if "contentEncoding" in s or "contentMediaType" in s or "contentSchema" in s:
                # delegate to the variant compiler's content predicate
                # (unbase64 round-trip + try_parse_json + compiled
                # contentSchema over the parsed variant); lazy import —
                # jsonvalue imports this module at load time
                from fences_spark.compiler.jsonvalue import VariantCompiler

                vc = VariantCompiler(self.root)
                preds.append(vc._content_pred(s, scol, 0))

        # ---- array keywords ----
        if isinstance(dtype, T.ArrayType):
            preds.extend(self._array_preds(s, col, dtype, depth))

        # ---- object keywords ----
        if isinstance(dtype, T.StructType):
            preds.extend(self._struct_preds(s, col, dtype, depth))
        elif isinstance(dtype, T.MapType):
            preds.extend(self._map_preds(s, col, dtype, depth))

        # ---- logic ----
        if "allOf" in s:
            preds.extend(self._compile_dispatchable(sub, col, dtype, depth) for sub in s["allOf"])
        if "anyOf" in s:
            preds.append(_any([self._compile_dispatchable(sub, col, dtype, depth) for sub in s["anyOf"]]))
        if "oneOf" in s:
            counts = [
                self._compile_dispatchable(sub, col, dtype, depth).cast("int")
                for sub in s["oneOf"]
            ]
            preds.append(functools.reduce(operator.add, counts) == F.lit(1))
        if "not" in s:
            preds.append(~self._compile_dispatchable(s["not"], col, dtype, depth))
        if "if" in s:
            if_p = self._compile_dispatchable(s["if"], col, dtype, depth)
            then_p = (
                self._compile_dispatchable(s["then"], col, dtype, depth)
                if "then" in s
                else F.lit(True)
            )
            else_p = (
                self._compile_dispatchable(s["else"], col, dtype, depth)
                if "else" in s
                else F.lit(True)
            )
            preds.append(F.when(if_p, then_p).otherwise(else_p))

        # unsupported-on-typed keywords → UDF fallback (annotation
        # tracking lives on the Arrow evaluator tier); content* is
        # handled natively in the string branch above and is vacuous
        # for every non-string dtype (evaluator semantics)
        for k in ("unevaluatedProperties", "unevaluatedItems"):
            if k in s:
                raise CompileError(f"keyword {k} not supported in typed compile")

        # ---- registered x- plugin keywords (compiler/plugins.py) ----
        from fences_spark.compiler.plugins import registered_in

        for plugin in registered_in(s):
            preds.append(plugin.column_pred(s[plugin.keyword], col, dtype))

        return _all(preds)

    # -- helpers -------------------------------------------------------

    def _compile_dispatchable(self, schema: SchemaType, col: Column, dtype: T.DataType, depth: int) -> Column:
        """Sub-schema on the same (non-null) value."""
        return self._compile_nonnull_dispatch(schema, col, dtype, depth)

    def _compile_nonnull_dispatch(self, schema: SchemaType, col: Column, dtype: T.DataType, depth: int) -> Column:
        if schema is True:
            return F.lit(True)
        if schema is False:
            return F.lit(False)
        return self._compile_nonnull(schema, col, dtype, depth)

    def _integral_pred(self, col: Column, dtype: T.DataType) -> Column:
        if isinstance(dtype, _INTEGRAL_TYPES):
            return F.lit(True)
        return F.pmod(col, F.lit(1.0)) == F.lit(0.0)

    def _multiple_pred(self, col: Column, dtype: T.DataType, k: Any) -> Column:
        """Exact jsonschema multipleOf semantics (divisor type decides
        the algorithm, as in jsonschema._keywords.multipleOf): integer
        divisor → modulo; float divisor → IEEE quotient is an integer.
        Known divergence: a quotient overflowing to ±inf evaluates
        invalid here, where jsonschema's Fraction fallback could accept
        (needs |value/k| > 1.8e308 — unreachable for real rulesets)."""
        if k == 0:
            return F.lit(False)
        if not isinstance(k, float):
            if isinstance(dtype, _INTEGRAL_TYPES):
                return F.pmod(col, F.lit(int(k))) == F.lit(0)
            return F.pmod(col.cast("double"), F.lit(float(k))) == F.lit(0.0)
        # pmod keeps the quotient check in pure double arithmetic:
        # F.floor returns BIGINT and overflows for |q| > 2^63 (e.g.
        # 1e300 / 0.1), wrongly rejecting exact-integer quotients.
        # pmod(±inf, 1.0) is NaN, and NaN == 0.0 is false, so the
        # overflow-to-inf case stays invalid as documented.
        q = col.cast("double") / F.lit(k)
        return F.pmod(q, F.lit(1.0)) == F.lit(0.0)

    def _enum_pred(self, values: list[Any], col: Column, dtype: T.DataType) -> Column:
        """Membership against literals representable in ``dtype``
        (deep equality for composites is UDF territory)."""
        jt = _json_type_of(dtype)
        if jt == "string" and isinstance(dtype, T.StringType):
            lits = [v for v in values if isinstance(v, str)]
            return col.isin(lits) if lits else F.lit(False)
        if jt == "number":
            lits = [float(v) for v in values
                    if isinstance(v, (int, float)) and not isinstance(v, bool)]
            return col.cast("double").isin(lits) if lits else F.lit(False)
        if jt == "boolean":
            lits = [v for v in values if isinstance(v, bool)]
            return col.isin(lits) if lits else F.lit(False)
        raise CompileError(f"enum over {dtype} needs the UDF fallback")

    # -- arrays --------------------------------------------------------

    def _element_pred(self, schema: SchemaType, elem: Column, etype: T.DataType, depth: int) -> Column:
        nv = F.lit(self._null_verdict(schema))
        if schema is True:
            return F.lit(True)
        if schema is False:
            return F.lit(False)
        return F.when(elem.isNull(), nv).otherwise(
            self._compile_nonnull_dispatch(schema, elem, etype, depth)
        )

    def _array_preds(self, s: dict, col: Column, dtype: T.ArrayType, depth: int) -> list[Column]:
        preds: list[Column] = []
        et = dtype.elementType
        if "minItems" in s:
            preds.append(F.size(col) >= F.lit(int(s["minItems"])))
        if "maxItems" in s:
            preds.append(F.size(col) <= F.lit(int(s["maxItems"])))
        if s.get("uniqueItems"):
            preds.append(F.size(col) == F.size(F.array_distinct(col)))
        if s.get("NOT_uniqueItems"):
            preds.append(F.size(col) != F.size(F.array_distinct(col)))
        prefix = s.get("prefixItems", [])
        for i, sub in enumerate(prefix):
            idx = F.element_at(col, i + 1)
            preds.append(
                F.when(F.size(col) > i, self._element_pred(sub, idx, et, depth)).otherwise(True)
            )
        if "items" in s:
            sub = s["items"]
            if prefix:
                sliced = F.slice(col, len(prefix) + 1, F.greatest(F.size(col) - len(prefix), F.lit(0)))
            else:
                sliced = col
            preds.append(F.forall(sliced, lambda x: self._element_pred(sub, x, et, depth)))
        if "contains" in s:
            sub = s["contains"]
            hits = F.size(F.filter(col, lambda x: self._element_pred(sub, x, et, depth)))
            preds.append(hits >= F.lit(int(s.get("minContains", 1))))
            if "maxContains" in s:
                preds.append(hits <= F.lit(int(s["maxContains"])))
        return preds

    # -- objects (struct) ----------------------------------------------

    def _struct_preds(self, s: dict, col: Column, dtype: T.StructType, depth: int) -> list[Column]:
        preds: list[Column] = []
        fields = {f.name: f.dataType for f in dtype.fields}
        for k in s.get("required", []):
            if k not in fields:
                return [F.lit(False)]
            preds.append(col.getField(k).isNotNull())
        for k in s.get("NOT_required", []):
            if k in fields:
                preds.append(col.getField(k).isNull())
        props = s.get("properties", {})
        for k, sub in props.items():
            if k not in fields:
                continue  # key can never be present → constraint vacuous
            fcol = col.getField(k)
            # NULL field = key absent (typed-data convention) → vacuous
            preds.append(
                F.when(fcol.isNull(), F.lit(True)).otherwise(
                    self._compile_nonnull_dispatch(sub, fcol, fields[k], depth)
                )
            )
        pat_props = s.get("patternProperties", {})
        for pat, sub in pat_props.items():
            # plain search semantics, mirroring the evaluator
            # (evaluator.py:323-327); field names known at compile time
            for k in fields:
                if re.search(pat, k):
                    fcol = col.getField(k)
                    preds.append(
                        F.when(fcol.isNull(), F.lit(True)).otherwise(
                            self._compile_nonnull_dispatch(sub, fcol, fields[k], depth)
                        )
                    )
        if "additionalProperties" in s:
            ap = s["additionalProperties"]
            extra = [k for k in fields
                     if k not in props
                     and not any(re.search(p, k) for p in pat_props)]
            for k in extra:
                fcol = col.getField(k)
                preds.append(
                    F.when(fcol.isNull(), F.lit(True)).otherwise(
                        self._compile_nonnull_dispatch(ap, fcol, fields[k], depth)
                    )
                )
        if "propertyNames" in s:
            # key set is static for a struct: fold each present field's
            # name verdict at compile time with the reference evaluator
            for k in fields:
                ok = self.evaluator.validate(k, s["propertyNames"])
                if not ok:
                    preds.append(col.getField(k).isNull())
        n_present = functools.reduce(
            operator.add,
            [col.getField(k).isNotNull().cast("int") for k in fields],
            F.lit(0),
        )
        if "minProperties" in s:
            preds.append(n_present >= F.lit(int(s["minProperties"])))
        if "maxProperties" in s:
            preds.append(n_present <= F.lit(int(s["maxProperties"])))
        for trigger, needed in s.get("dependentRequired", {}).items():
            if trigger not in fields:
                continue
            have = _all(
                [col.getField(k).isNotNull() if k in fields else F.lit(False) for k in needed]
            )
            preds.append(F.when(col.getField(trigger).isNotNull(), have).otherwise(True))
        for trigger, sub in s.get("dependentSchemas", {}).items():
            if trigger not in fields:
                continue  # trigger can never be present → vacuous
            whole = self._compile_dispatchable(sub, col, dtype, depth)
            preds.append(F.when(col.getField(trigger).isNotNull(), whole).otherwise(True))
        return preds

    # -- objects (map<string, T>) ----------------------------------------

    def _map_preds(self, s: dict, col: Column, dtype: T.MapType, depth: int) -> list[Column]:
        if not isinstance(dtype.keyType, T.StringType):
            raise CompileError("object schema over a map requires string keys")
        preds: list[Column] = []
        vt = dtype.valueType
        for k in s.get("required", []):
            preds.append(F.map_contains_key(col, k))
        for k in s.get("NOT_required", []):
            preds.append(~F.map_contains_key(col, k))
        props = s.get("properties", {})
        for k, sub in props.items():
            v = F.element_at(col, F.lit(k))
            preds.append(
                F.when(
                    F.map_contains_key(col, k),
                    self._element_pred(sub, v, vt, depth),
                ).otherwise(True)
            )
        pat_props = s.get("patternProperties", {})
        for pat in pat_props:
            _require_portable_regex(pat)
        for pat, sub in pat_props.items():
            jpat = to_java_regex(pat)
            # map_filter requires a 2-arg lambda; eager call makes the
            # jpat closure capture safe inside the loop
            matching = F.map_filter(col, lambda k, _: k.rlike(jpat))
            preds.append(
                F.forall(F.map_values(matching), lambda v: self._element_pred(sub, v, vt, depth))
            )
        if "additionalProperties" in s:
            ap = s["additionalProperties"]
            listed = F.array(*[F.lit(k) for k in props]) if props else F.array().cast("array<string>")

            def _is_other(k: Column) -> Column:
                other = ~F.array_contains(listed, k)
                for p in pat_props:
                    other = other & ~k.rlike(to_java_regex(p))
                return other

            others = F.map_filter(col, lambda k, _: _is_other(k))
            preds.append(
                F.forall(F.map_values(others), lambda v: self._element_pred(ap, v, vt, depth))
            )
        if "propertyNames" in s:
            sub = s["propertyNames"]
            preds.append(
                F.forall(F.map_keys(col),
                         lambda k: self._compile_dispatchable(sub, k, T.StringType(), depth))
            )
        if "minProperties" in s:
            preds.append(F.size(col) >= F.lit(int(s["minProperties"])))
        if "maxProperties" in s:
            preds.append(F.size(col) <= F.lit(int(s["maxProperties"])))
        for trigger, needed in s.get("dependentRequired", {}).items():
            have = _all([F.map_contains_key(col, k) for k in needed])
            preds.append(F.when(F.map_contains_key(col, trigger), have).otherwise(True))
        for trigger, sub in s.get("dependentSchemas", {}).items():
            whole = self._compile_dispatchable(sub, col, dtype, depth)
            preds.append(F.when(F.map_contains_key(col, trigger), whole).otherwise(True))
        return preds


def compile_typed(schema: SchemaType, col: Column, dtype: T.DataType) -> Column:
    """Compile ``schema`` against a typed column; raises CompileError
    when the builtin algebra cannot express it."""
    return TypedCompiler(schema).compile(col, dtype)
