"""Violation-pointer compilation: typed builtin tier + Arrow tier.

The JSON dual of the XSD path tiers (schema/xsd.py XmlPathCompiler /
compile_xml_paths_udf): for each row, an ``array<struct<pointer
string, keyword string>>`` locating every violation, with the exact
(pointer, keyword) vocabulary of
:mod:`fences_spark.schema.pointers` (arbitrated against
``jsonschema.Draft202012Validator`` error paths — see that module's
docstring for the pinned vocabulary and reference citation
/root/reference/fences/json_schema/json_pointer.py:5-57).

Tiering mirrors the boolean compilers: :class:`TypedPointerCompiler`
builds the array with pure built-in Column expressions (``when`` /
``transform`` / ``slice`` / ``getField`` — zero Python per row,
whole-stage codegen); schemas outside its algebra raise
:class:`CompileError` and callers fall back to the Arrow-vectorized
:func:`pointer_udf` running the reference
:class:`~fences_spark.schema.pointers.PointerCollector` per batch.

Unsupported on the typed tier (Arrow fallback): map-typed object
columns, ``unevaluatedProperties/Items`` (lowering them would rename
the reported keyword), ``content*`` (stage attribution needs the
decode pipeline), composite-literal enums — each raises CompileError.
"""

from __future__ import annotations

import functools
import json
import operator
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from fences_spark.compiler import CompileError
from fences_spark.compiler.typed import TypedCompiler, _json_type_of
from fences_spark.schema.evaluator import SchemaType, format_regex
from fences_spark.schema.pointers import PointerCollector
from fences_spark.schema.regex_dialect import compile_dialect_pattern, to_java_regex

ENTRY_TYPE = "array<struct<pointer:string,keyword:string>>"

_POINTER_OPAQUE = (
    "unevaluatedProperties",
    "unevaluatedItems",
    "contentEncoding",
    "contentMediaType",
    "contentSchema",
)


def _esc(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def _contains_opaque_kw(s: Any) -> bool:
    if isinstance(s, dict):
        if any(k in s for k in _POINTER_OPAQUE):
            return True
        return any(_contains_opaque_kw(v) for v in s.values())
    if isinstance(s, list):
        return any(_contains_opaque_kw(x) for x in s)
    return False


class TypedPointerCompiler(TypedCompiler):
    """Schema → Column of violation entries over a typed column.

    Inherits the boolean predicate builders (branch verdicts for
    anyOf/oneOf/not/if and element predicates) so entry conditions and
    the boolean tier can never disagree.  Unlike the boolean tier,
    keywords do NOT short-circuit (a static type mismatch still
    descends into properties — jsonschema error-list semantics)."""

    def __init__(self, root: SchemaType, max_ref_depth: int = 12):
        if _contains_opaque_kw(root):
            # lower_unevaluated (super().__init__) would rewrite
            # unevaluated* to additionalProperties/items and RENAME the
            # reported keyword — route to the Arrow tier instead
            raise CompileError("unevaluated*/content* pointers: Arrow tier")
        super().__init__(root, max_ref_depth=max_ref_depth)
        self._collector = PointerCollector(self.root)

    # -- building blocks -------------------------------------------------
    def _empty(self) -> Column:
        return F.expr("array()").cast(ENTRY_TYPE)

    def _one(self, bad: Column, path: Column, kw: Column | str) -> Column:
        kwc = F.lit(kw) if isinstance(kw, str) else kw
        return F.array(
            F.when(bad, F.struct(path.alias("pointer"), kwc.alias("keyword")))
        )

    def _static(self, path: Column, errs: list[tuple[str, str]]) -> Column:
        """Literal entries (pointer suffixes re-rooted at ``path``) —
        used for compile-time-decidable verdicts (NULL branches,
        static propertyNames)."""
        if not errs:
            return self._empty()
        return F.array(
            *[
                F.struct(
                    F.concat(path, F.lit(ptr[1:])).alias("pointer"),
                    F.lit(kw).alias("keyword"),
                )
                for ptr, kw in errs
            ]
        )

    def _null_errors(self, schema: SchemaType, path: Column) -> Column:
        return self._static(path, self._collector_errors_of(schema, None))

    def _collector_errors_of(self, schema: SchemaType, value: Any):
        if not isinstance(schema, (dict, bool)):
            return []
        try:
            return PointerCollector(
                schema, plugins=self._collector._ev._plugins
            ).errors(value)
        except Exception as e:  # noqa: BLE001
            # Rooting a fresh collector at the SUBSCHEMA loses the root
            # resolution scope: a $ref inside items/prefixItems/
            # propertyNames (e.g. "#/$defs/x") raises KeyError here.
            # Surface it as CompileError so the caller's Arrow fallback
            # (which runs the collector rooted at the FULL schema, refs
            # intact) engages instead of crashing RuleSet.pointers.
            raise CompileError(f"sub-collector cannot evaluate: {e!r}") from e

    # -- entry point -------------------------------------------------------
    def compile_pointers(self, col: Column, dtype: T.DataType) -> Column:
        body = self._entries(self.root, col, dtype, F.lit("#"), 0)
        out = F.when(col.isNull(), self._null_errors(self.root, F.lit("#"))).otherwise(
            body
        )
        return F.array_sort(
            F.array_distinct(F.filter(out, lambda e: e.isNotNull()))
        )

    # -- recursion -----------------------------------------------------------
    def _entries(
        self, s: SchemaType, col: Column, dtype: T.DataType, path: Column, depth: int
    ) -> Column:
        """Entries for non-null ``col``; mirrors
        PointerCollector._collect keyword-for-keyword."""
        if s is True:
            return self._empty()
        if s is False:
            return self._one(F.lit(True), path, "false")
        if not isinstance(s, dict):
            raise CompileError(f"schema must be dict or bool: {s!r}")
        for k in _POINTER_OPAQUE:
            if k in s:
                raise CompileError(f"keyword {k} pointers: Arrow tier")
        parts: list[Column] = []
        jt = _json_type_of(dtype)

        if "$ref" in s:
            if depth > self.max_ref_depth:
                raise CompileError(f"$ref deeper than {self.max_ref_depth}")
            target = self.evaluator._resolve_ref(s["$ref"])
            parts.append(self._entries(target, col, dtype, path, depth + 1))

        if "type" in s:
            ts = s["type"]
            ts = [ts] if isinstance(ts, str) else list(ts)
            if jt in ts:
                pass
            elif "integer" in ts and jt == "number":
                parts.append(
                    self._one(~self._integral_pred(col, dtype), path, "type")
                )
            else:
                parts.append(self._one(F.lit(True), path, "type"))

        for key in ("enum", "NOT_enum", "const", "NOT_const"):
            if key in s:
                vals = s[key] if key.endswith("enum") else [s[key]]
                p = self._enum_pred(vals, col, dtype)
                bad = p if key.startswith("NOT_") else ~p
                parts.append(self._one(bad, path, key))

        if jt == "number":
            if "minimum" in s:
                parts.append(self._one(col < F.lit(float(s["minimum"])), path, "minimum"))
            if "maximum" in s:
                parts.append(self._one(col > F.lit(float(s["maximum"])), path, "maximum"))
            if "exclusiveMinimum" in s:
                parts.append(
                    self._one(col <= F.lit(float(s["exclusiveMinimum"])), path, "exclusiveMinimum")
                )
            if "exclusiveMaximum" in s:
                parts.append(
                    self._one(col >= F.lit(float(s["exclusiveMaximum"])), path, "exclusiveMaximum")
                )
            if "multipleOf" in s:
                parts.append(
                    self._one(~self._multiple_pred(col, dtype, s["multipleOf"]), path, "multipleOf")
                )
            if "NOT_multipleOf" in s:
                parts.append(
                    self._one(self._multiple_pred(col, dtype, s["NOT_multipleOf"]), path, "NOT_multipleOf")
                )

        if jt == "string":
            scol = col.cast("string") if not isinstance(dtype, T.StringType) else col
            if "minLength" in s:
                parts.append(self._one(F.length(scol) < F.lit(int(s["minLength"])), path, "minLength"))
            if "maxLength" in s:
                parts.append(self._one(F.length(scol) > F.lit(int(s["maxLength"])), path, "maxLength"))
            if "pattern" in s:
                sub_ok = [
                    ~scol.rlike(to_java_regex(rx)) if negated else scol.rlike(to_java_regex(rx))
                    for rx, negated in compile_dialect_pattern(s["pattern"])
                ]
                parts.append(
                    self._one(~functools.reduce(operator.and_, sub_ok), path, "pattern")
                )
            if "format" in s:
                rx = format_regex(s["format"])
                if rx is not None:
                    parts.append(
                        self._one(~scol.rlike(to_java_regex(rx)), path, "format")
                    )

        if isinstance(dtype, T.ArrayType):
            parts.extend(self._array_entries(s, col, dtype, path, depth))
        if isinstance(dtype, T.StructType):
            parts.extend(self._struct_entries(s, col, dtype, path, depth))
        elif isinstance(dtype, T.MapType):
            if any(
                k in s
                for k in (
                    "required", "NOT_required", "properties", "patternProperties",
                    "additionalProperties", "propertyNames", "minProperties",
                    "maxProperties", "dependentRequired", "dependentSchemas",
                )
            ):
                raise CompileError("map-typed object pointers: Arrow tier")

        if "allOf" in s:
            for sub in s["allOf"]:
                parts.append(self._entries(sub, col, dtype, path, depth))
        if "anyOf" in s:
            any_ok = functools.reduce(
                operator.or_,
                [self._compile_nonnull_dispatch(sub, col, dtype, depth) for sub in s["anyOf"]],
            )
            parts.append(self._one(~any_ok, path, "anyOf"))
        if "oneOf" in s:
            counts = [
                self._compile_nonnull_dispatch(sub, col, dtype, depth).cast("int")
                for sub in s["oneOf"]
            ]
            parts.append(
                self._one(functools.reduce(operator.add, counts) != F.lit(1), path, "oneOf")
            )
        if "not" in s:
            parts.append(
                self._one(self._compile_nonnull_dispatch(s["not"], col, dtype, depth), path, "not")
            )
        if "if" in s:
            if_p = self._compile_nonnull_dispatch(s["if"], col, dtype, depth)
            then_e = (
                self._entries(s["then"], col, dtype, path, depth)
                if "then" in s
                else self._empty()
            )
            else_e = (
                self._entries(s["else"], col, dtype, path, depth)
                if "else" in s
                else self._empty()
            )
            parts.append(F.when(if_p, then_e).otherwise(else_e))

        from fences_spark.compiler.plugins import registered_in

        for plugin in registered_in(s):
            parts.append(
                self._one(~plugin.column_pred(s[plugin.keyword], col, dtype), path, plugin.keyword)
            )

        if not parts:
            return self._empty()
        return F.flatten(F.array(*parts))

    # -- arrays ----------------------------------------------------------
    def _elem_entries(
        self, sub: SchemaType, elem: Column, etype: T.DataType, epath: Column, depth: int
    ) -> Column:
        """Entries for one array element / struct field value, with
        the typed-data null convention: a NULL element is JSON null —
        its verdict (and error set) is compile-time static."""
        return F.when(elem.isNull(), self._null_errors(sub, epath)).otherwise(
            self._entries(sub, elem, etype, epath, depth)
        )

    def _array_entries(
        self, s: dict, col: Column, dtype: T.ArrayType, path: Column, depth: int
    ) -> list[Column]:
        parts: list[Column] = []
        et = dtype.elementType
        if "minItems" in s:
            parts.append(self._one(F.size(col) < F.lit(int(s["minItems"])), path, "minItems"))
        if "maxItems" in s:
            parts.append(self._one(F.size(col) > F.lit(int(s["maxItems"])), path, "maxItems"))
        if s.get("uniqueItems"):
            parts.append(
                self._one(F.size(col) != F.size(F.array_distinct(col)), path, "uniqueItems")
            )
        if s.get("NOT_uniqueItems"):
            parts.append(
                self._one(F.size(col) == F.size(F.array_distinct(col)), path, "NOT_uniqueItems")
            )
        prefix = s.get("prefixItems", [])
        for i, sub in enumerate(prefix):
            item = F.element_at(col, i + 1)
            epath = F.concat(path, F.lit(f"/{i}"))
            parts.append(
                F.when(F.size(col) > i, self._elem_entries(sub, item, et, epath, depth))
                .otherwise(self._empty())
            )
        if "items" in s:
            sub = s["items"]
            if sub is False:
                parts.append(
                    self._one(F.size(col) > F.lit(len(prefix)), path, "items")
                )
            else:
                if prefix:
                    sliced = F.slice(
                        col, len(prefix) + 1,
                        F.greatest(F.size(col) - len(prefix), F.lit(0)),
                    )
                else:
                    sliced = col
                off = len(prefix)
                parts.append(
                    F.flatten(
                        F.transform(
                            sliced,
                            lambda x, i: self._elem_entries(
                                sub, x, et,
                                F.concat(path, F.lit("/"), (i + F.lit(off)).cast("string")),
                                depth,
                            ),
                        )
                    )
                )
        if "contains" in s:
            sub = s["contains"]
            hits = F.size(F.filter(col, lambda x: self._element_pred(sub, x, et, depth)))
            min_c = int(s.get("minContains", 1))
            kw = F.when(hits == 0, F.lit("contains")).otherwise(F.lit("minContains"))
            parts.append(self._one(hits < F.lit(min_c), path, kw))
            if "maxContains" in s:
                parts.append(
                    self._one(hits > F.lit(int(s["maxContains"])), path, "maxContains")
                )
        return parts

    # -- structs -----------------------------------------------------------
    def _struct_entries(
        self, s: dict, col: Column, dtype: T.StructType, path: Column, depth: int
    ) -> list[Column]:
        parts: list[Column] = []
        fields = {f.name: f.dataType for f in dtype.fields}

        def fpath(k: str) -> Column:
            return F.concat(path, F.lit("/" + _esc(k)))

        for k in s.get("required", []):
            bad = F.lit(True) if k not in fields else col.getField(k).isNull()
            parts.append(self._one(bad, path, "required"))
        for k in s.get("NOT_required", []):
            if k in fields:
                parts.append(self._one(col.getField(k).isNotNull(), path, "NOT_required"))
        props = s.get("properties", {})
        for k, sub in props.items():
            if k not in fields:
                continue  # key can never be present → vacuous
            f = col.getField(k)
            parts.append(
                F.when(f.isNull(), self._empty()).otherwise(
                    self._entries_dispatch(sub, f, fields[k], fpath(k), depth)
                )
            )
        pat_props = s.get("patternProperties", {})
        for pat, sub in pat_props.items():
            for k in fields:
                if re.search(pat, k):
                    f = col.getField(k)
                    parts.append(
                        F.when(f.isNull(), self._empty()).otherwise(
                            self._entries_dispatch(sub, f, fields[k], fpath(k), depth)
                        )
                    )
        if "additionalProperties" in s:
            ap = s["additionalProperties"]
            extra = [
                k for k in fields
                if k not in props and not any(re.search(p, k) for p in pat_props)
            ]
            if ap is False:
                if extra:
                    any_extra = functools.reduce(
                        operator.or_, [col.getField(k).isNotNull() for k in extra]
                    )
                    parts.append(self._one(any_extra, path, "additionalProperties"))
            else:
                for k in extra:
                    f = col.getField(k)
                    parts.append(
                        F.when(f.isNull(), self._empty()).otherwise(
                            self._entries_dispatch(ap, f, fields[k], fpath(k), depth)
                        )
                    )
        if "propertyNames" in s:
            # key set static for a struct → per-key error list is a
            # compile-time constant, gated on key presence; names
            # validate IN PLACE (path unchanged, inner keyword)
            for k in fields:
                errs = self._collector_errors_of(s["propertyNames"], k)
                if errs:
                    parts.append(
                        F.when(col.getField(k).isNotNull(), self._static(path, errs))
                        .otherwise(self._empty())
                    )
        n_present = functools.reduce(
            operator.add,
            [col.getField(k).isNotNull().cast("int") for k in fields],
            F.lit(0),
        )
        if "minProperties" in s:
            parts.append(self._one(n_present < F.lit(int(s["minProperties"])), path, "minProperties"))
        if "maxProperties" in s:
            parts.append(self._one(n_present > F.lit(int(s["maxProperties"])), path, "maxProperties"))
        for trigger, needed in s.get("dependentRequired", {}).items():
            if trigger not in fields:
                continue
            have = functools.reduce(
                operator.and_,
                [col.getField(k).isNotNull() if k in fields else F.lit(False) for k in needed],
                F.lit(True),
            )
            parts.append(
                self._one(col.getField(trigger).isNotNull() & ~have, path, "dependentRequired")
            )
        for trigger, sub in s.get("dependentSchemas", {}).items():
            if trigger not in fields:
                continue
            parts.append(
                F.when(
                    col.getField(trigger).isNotNull(),
                    self._entries_dispatch(sub, col, dtype, path, depth),
                ).otherwise(self._empty())
            )
        return parts

    def _entries_dispatch(
        self, s: SchemaType, col: Column, dtype: T.DataType, path: Column, depth: int
    ) -> Column:
        return self._entries(s, col, dtype, path, depth)


def compile_typed_pointers(
    schema: SchemaType, col: Column, dtype: T.DataType
) -> Column:
    """Typed builtin tier; raises CompileError outside its algebra."""
    return TypedPointerCompiler(schema).compile_pointers(col, dtype)


# ---------------------------------------------------------------------------
# Arrow tier: PointerCollector over a JSON-string column
# ---------------------------------------------------------------------------

def pointer_udf(
    schema: SchemaType, resources: dict | None = None, *, gated: bool = False
) -> Any:
    """Arrow-vectorized pointer extraction for a column of JSON text.
    Schema + resources ship once per task in the closure; one Python
    call per Arrow batch.  A malformed JSON cell reports a single
    root-level ``(#, json)`` entry (parse failure has no deeper
    location); a SQL-NULL cell is JSON null.

    ``gated=True`` flips the NULL convention: a SQL-NULL input means
    "this row doesn't need pointers" and short-circuits to ``[]``.
    Callers pass ``F.when(gate, json_col)`` so passing rows cross the
    Arrow boundary as nulls and cost ~nothing Python-side — how
    per-failing-rule gating keeps the Arrow tier defect-rate-
    proportional even in un-filterable (streaming) projections."""
    schema_blob = json.dumps(schema)
    resources_blob = json.dumps(resources or {})
    from fences_spark.compiler.plugins import snapshot

    plugins = snapshot()

    @F.pandas_udf(ENTRY_TYPE)
    def _ptr(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pc = PointerCollector(
            json.loads(schema_blob),
            plugins=plugins,
            resources=json.loads(resources_blob),
        )
        for srs in batches:
            def one(x: Any) -> list:
                if x is None:
                    if gated:
                        return []
                    doc = None
                else:
                    try:
                        doc = json.loads(x)
                    except (ValueError, TypeError):
                        return [{"pointer": "#", "keyword": "json"}]
                return [
                    {"pointer": p, "keyword": k} for p, k in pc.errors(doc)
                ]
            yield srs.map(one)

    return _ptr


def compile_json_pointers(
    schema: SchemaType, col: Column, resources: dict | None = None
) -> tuple[Column, str]:
    """Violation pointers for a JSON-text column (Arrow tier — text
    is dynamically typed, so the typed algebra does not apply)."""
    return pointer_udf(schema, resources)(col), "arrow_udf"


def compile_pointers(
    schema: SchemaType, col: Column, dtype: T.DataType
) -> tuple[Column, str]:
    """Violation pointers for a typed column: builtin tier first,
    Arrow fallback via to_json round-trip (same tiering contract as
    compile_typed / compile_json)."""
    try:
        return compile_typed_pointers(schema, col, dtype), "typed_builtin"
    except CompileError:
        return pointer_udf(schema)(F.to_json(col)), "arrow_udf"
