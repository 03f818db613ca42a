"""OpenAPI front end: validate a table of HTTP request records
against an OpenAPI spec.

The reference parses OpenAPI specs into a typed model — ``OpenApi /
Operation / Parameter / RequestBody`` (fences/open_api/open_api.py:
33-211) with parameter serialization styles simple/form + explode
(fences/open_api/format.py:7-56) — and *generates* valid/invalid
``Request`` objects per operation (fences/open_api/generate.py:
198-225).  Our engine implements the dual at cluster scale: given a
DataFrame of request logs ``(method, path, query map<string,string>,
body json-string)``, route each row to its operation (path-template
regex), deserialize parameters per the simple/form styles, and
evaluate every embedded fences-dialect schema as a vectorized
predicate — builtins for scalars/arrays (whole-stage codegen), the
variant/Arrow tier for JSON bodies.

Components references ``#/components/schemas/X`` are inlined with a
bounded-depth rewrite (the reference threads ``components`` through
every schema for the same purpose, open_api.py:68,101).
"""

from __future__ import annotations

import copy
import functools
import operator
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, functions as F, types as T

from fences_spark.compiler import CompileError
from fences_spark.compiler.jsonvalue import compile_json
from fences_spark.compiler.typed import compile_typed
from fences_spark.schema.normalize import normalize

_MAX_COMPONENT_DEPTH = 12


class OpenApiError(Exception):
    pass


# ---------------------------------------------------------------------------
# Spec model
# ---------------------------------------------------------------------------

def _inline_components(schema: Any, components: dict, depth: int = 0) -> Any:
    if depth > _MAX_COMPONENT_DEPTH:
        raise OpenApiError("components $ref nesting too deep (recursive spec?)")
    if isinstance(schema, dict):
        ref = schema.get("$ref")
        if isinstance(ref, str) and ref.startswith("#/components/schemas/"):
            name = ref.rsplit("/", 1)[1]
            try:
                target = components["schemas"][name]
            except KeyError:
                raise OpenApiError(f"unresolved component schema {name!r}")
            merged = {k: v for k, v in schema.items() if k != "$ref"}
            inlined = _inline_components(copy.deepcopy(target), components, depth + 1)
            if not isinstance(inlined, dict):
                # boolean schema target (OpenAPI 3.1): siblings cannot
                # merge into it; the bool wins
                return inlined
            inlined.update(merged)
            return inlined
        return {k: _inline_components(v, components, depth + 1)
                for k, v in schema.items()}
    if isinstance(schema, list):
        return [_inline_components(v, components, depth + 1) for v in schema]
    return schema


@dataclass
class Parameter:
    name: str
    position: str          # query | header | path | cookie
    required: bool
    # simple | form | spaceDelimited | pipeDelimited | deepObject.
    # The reference raises on anything beyond simple/form
    # (fences/open_api/format.py:51-56); the three extra query styles
    # are implemented here because real specs use them:
    # space/pipeDelimited change the array item separator, deepObject
    # serializes object properties as separate `name[prop]` query keys.
    style: str
    explode: bool
    schema: dict


# query-only styles are rejected elsewhere by parse_spec
_STYLES_BY_POSITION = {
    "path": {"simple"},
    "header": {"simple"},
    "query": {"form", "spaceDelimited", "pipeDelimited", "deepObject"},
    "cookie": {"form"},
}
_ARRAY_SEPARATORS = {"spaceDelimited": " ", "pipeDelimited": "|"}


@dataclass
class RequestBody:
    required: bool
    schema: dict


@dataclass
class Operation:
    operation_id: str
    method: str
    path: str
    parameters: list[Parameter] = field(default_factory=list)
    request_body: Optional[RequestBody] = None
    # status key ("200" | "4XX" | "default") → application/json schema
    # (None when the response declares no JSON content)
    responses: dict[str, Optional[dict]] = field(default_factory=dict)

    def path_regex(self) -> tuple[str, list[str]]:
        """Template → anchored regex + ordered path-param names."""
        names: list[str] = []
        out: list[str] = []
        for piece in re.split(r"(\{[^{}/]+\})", self.path):
            if piece.startswith("{") and piece.endswith("}"):
                names.append(piece[1:-1])
                out.append("([^/]+)")
            else:
                out.append(re.escape(piece))
        return "".join(out), names


_HTTP_METHODS = {"get", "put", "post", "delete", "options", "head", "patch", "trace"}


def parse_spec(spec: dict) -> dict[str, Operation]:
    components = spec.get("components", {})
    ops: dict[str, Operation] = {}
    for path, path_item in spec.get("paths", {}).items():
        # path items carry non-operation fields (summary, description,
        # servers, shared parameters) alongside the method keys
        shared_params = path_item.get("parameters", [])
        for method, op in path_item.items():
            if method.lower() not in _HTTP_METHODS:
                continue
            params = []
            op_param_keys = {(p.get("name"), p.get("in"))
                             for p in op.get("parameters", [])}
            inherited = [p for p in shared_params
                         if (p.get("name"), p.get("in")) not in op_param_keys]
            for idx, p in enumerate(list(op.get("parameters", [])) + inherited):
                pos = p["in"]
                style = p.get("style", "form" if pos in ("query", "cookie") else "simple")
                if style not in _STYLES_BY_POSITION.get(pos, set()):
                    raise OpenApiError(
                        f"parameter {p.get('name')!r} in {path} {method}: "
                        f"style {style!r} is not valid for position {pos!r}"
                    )
                params.append(Parameter(
                    name=p["name"],
                    position=pos,
                    # path params are implicitly required (reference
                    # default, open_api.py:73)
                    required=bool(p.get("required", pos == "path")),
                    style=style,
                    explode=bool(p.get("explode", False)),
                    schema=_inline_components(p.get("schema", {}), components),
                ))
            seen = {(p.name, p.position) for p in params}
            if len(seen) != len(params):
                raise OpenApiError(f"duplicate parameter in {path} {method}")
            body = None
            rb = op.get("requestBody")
            if rb is not None:
                content = rb.get("content", {}).get("application/json", {})
                body = RequestBody(
                    required=bool(rb.get("required", True)),
                    schema=_inline_components(content.get("schema", {}), components),
                )
            responses: dict[str, Optional[dict]] = {}
            for status_key, resp in op.get("responses", {}).items():
                key = str(status_key)
                if not (key.isdigit() or key == "default"
                        or re.fullmatch(r"[1-5]XX", key)):
                    raise OpenApiError(f"bad response status key {key!r}")
                content = resp.get("content", {}).get("application/json", {})
                schema = content.get("schema")
                responses[key] = (
                    _inline_components(schema, components) if schema is not None
                    else None
                )
            op_id = op.get("operationId") or f"{method}_{path}"
            ops[op_id] = Operation(op_id, method.upper(), path, params, body,
                                   responses)
    if not ops:
        raise OpenApiError("spec declares no operations")
    return ops


# ---------------------------------------------------------------------------
# Lexical predicates: schema over a *string-serialized* parameter value
# ---------------------------------------------------------------------------

def _all(preds: list[Column]) -> Column:
    return functools.reduce(operator.and_, preds) if preds else F.lit(True)


def _any(preds: list[Column]) -> Column:
    return functools.reduce(operator.or_, preds) if preds else F.lit(False)


def _lex_scalar_option(s: dict, col: Column) -> Column:
    """One DNF option evaluated against a serialized scalar (simple/
    form style renders numbers/bools via str(), format.py:7-24)."""
    types = s.get("type", ["number", "boolean", "string"])
    alts: list[Column] = []
    if "number" in types:
        num = col.try_cast("double")
        preds = [num.isNotNull()]
        sub = {k: v for k, v in s.items()
               if k in ("minimum", "maximum", "exclusiveMinimum",
                        "exclusiveMaximum", "multipleOf", "NOT_multipleOf")}
        if sub:
            preds.append(compile_typed({"anyOf": [sub]}, num, T.DoubleType()))
        if "enum" in s:
            nvals = [v for v in s["enum"] if isinstance(v, (int, float))
                     and not isinstance(v, bool)]
            preds.append(num.isin([float(v) for v in nvals]) if nvals else F.lit(False))
        if "NOT_enum" in s:
            nvals = [float(v) for v in s["NOT_enum"] if isinstance(v, (int, float))
                     and not isinstance(v, bool)]
            if nvals:
                preds.append(~num.isin(nvals))
        alts.append(_all(preds))
    if "boolean" in types:
        preds = [col.isin("true", "false")]
        if "enum" in s:
            bvals = [("true" if v else "false") for v in s["enum"]
                     if isinstance(v, bool)]
            preds.append(col.isin(bvals) if bvals else F.lit(False))
        alts.append(_all(preds))
    if "string" in types:
        sub = {k: v for k, v in s.items()
               if k in ("minLength", "maxLength", "pattern", "format")}
        sub["type"] = ["string"]
        if "enum" in s:
            svals = [v for v in s["enum"] if isinstance(v, str)]
            if not svals:
                alts.append(F.lit(False))
                sub = None
            else:
                sub["enum"] = svals
        if sub is not None:
            alts.append(compile_typed({"anyOf": [sub]}, col, T.StringType()))
    return _any(alts)


def lexical_pred(schema: Any, col: Column, sep: str = ",") -> Column:
    """Predicate for a serialized parameter value (NULL → False; the
    caller folds in required/absent semantics).  ``sep`` is the array
    item separator of the parameter's style: ',' for simple/form,
    ' ' for spaceDelimited, '|' for pipeDelimited."""
    norm = normalize(schema)
    opts = norm.get("anyOf", [])
    alts: list[Column] = []
    for s in opts:
        types = s.get("type", ["number", "boolean", "string", "array"])
        if "array" in types and ("items" in s or "prefixItems" in s
                                 or "minItems" in s or "maxItems" in s):
            # simple/form styles join items with ',' (format.py:14-15);
            # spaceDelimited/pipeDelimited swap the separator only
            arr = F.split(col, re.escape(sep))
            preds: list[Column] = []
            if "minItems" in s:
                preds.append(F.size(arr) >= int(s["minItems"]))
            if "maxItems" in s:
                preds.append(F.size(arr) <= int(s["maxItems"]))
            items = s.get("items")
            if isinstance(items, dict) and items:
                item_opt = normalize(items).get("anyOf", [])
                preds.append(F.forall(
                    arr, lambda x: _any([_lex_scalar_option(o, x) for o in item_opt])))
            alts.append(_all(preds))
        scalar_types = [t for t in types if t in ("number", "boolean", "string")]
        if scalar_types:
            alts.append(_lex_scalar_option({**s, "type": scalar_types}, col))
    return F.coalesce(_any(alts), F.lit(False))


# ---------------------------------------------------------------------------
# Validator
# ---------------------------------------------------------------------------

class OpenApiValidator:
    """Route request rows to operations and evaluate every declared
    check.  One pass, no shuffle: routing and all predicates are
    projections; aggregations are the caller's choice."""

    def __init__(self, spec: dict) -> None:
        self.operations = parse_spec(spec)

    def validate(
        self,
        df: DataFrame,
        method_col: str = "method",
        path_col: str = "path",
        query_col: str = "query",
        body_col: str = "body",
        headers_col: str = "headers",
        cookies_col: str = "cookies",
    ) -> DataFrame:
        method = F.upper(F.col(method_col))
        path = F.col(path_col)
        have_query = query_col in df.columns
        have_body = body_col in df.columns
        # header names are case-insensitive (RFC 9110 §5.1): the map is
        # probed with the lowercased declared name, so ingest should
        # lowercase header keys (cookie names stay case-sensitive)
        have_headers = headers_col in df.columns
        have_cookies = cookies_col in df.columns

        op_id: Column = F.lit(None).cast("string")
        row_valid: Column = F.lit(False)
        failed: Column = F.array(F.lit("__no_route__"))

        # chain in reverse so the first declared operation wins
        for op in reversed(list(self.operations.values())):
            rx, path_names = op.path_regex()
            anchored = "\\A(?:" + rx + ")\\z"
            match = (method == op.method) & F.coalesce(path.rlike(anchored), F.lit(False))

            checks: list[tuple[str, Column]] = []
            for p in op.parameters:
                cname = f"{p.position}.{p.name}"
                if p.position == "path":
                    idx = path_names.index(p.name) + 1
                    raw = F.regexp_extract(path, anchored, idx)
                    checks.append((cname, lexical_pred(p.schema, raw)))
                elif p.position == "query" and have_query and p.style == "deepObject":
                    # deepObject serializes each object property as its
                    # own query key `name[prop]`: validate every
                    # declared property's value lexically, required
                    # properties must be present; the parameter itself
                    # is "absent" iff none of its keys appear.
                    # (additionalProperties is not enforced — the map's
                    # undeclared keys are out of this check's scope,
                    # like undeclared plain query params.)
                    schema = p.schema if isinstance(p.schema, dict) else {}
                    prop_schemas = schema.get("properties", {})
                    required_props = set(schema.get("required", []))
                    preds: list[Column] = []
                    present_any: Column = F.lit(False)
                    for prop, ps in prop_schemas.items():
                        raw = F.element_at(
                            F.col(query_col), f"{p.name}[{prop}]"
                        )
                        present_any = present_any | raw.isNotNull()
                        absent_ok = F.lit(prop not in required_props)
                        preds.append(
                            F.when(raw.isNull(), absent_ok)
                            .otherwise(lexical_pred(ps, raw))
                        )
                    ok = F.when(~present_any, F.lit(not p.required)) \
                         .otherwise(_all(preds))
                    checks.append((cname, ok))
                elif p.position == "query" and have_query:
                    raw = F.element_at(F.col(query_col), p.name)
                    sep = _ARRAY_SEPARATORS.get(p.style, ",")
                    ok = F.when(raw.isNull(), F.lit(not p.required)) \
                         .otherwise(lexical_pred(p.schema, raw, sep=sep))
                    checks.append((cname, ok))
                elif p.position == "header" and have_headers:
                    raw = F.element_at(F.col(headers_col), p.name.lower())
                    ok = F.when(raw.isNull(), F.lit(not p.required)) \
                         .otherwise(lexical_pred(p.schema, raw))
                    checks.append((cname, ok))
                elif p.position == "cookie" and have_cookies:
                    raw = F.element_at(F.col(cookies_col), p.name)
                    ok = F.when(raw.isNull(), F.lit(not p.required)) \
                         .otherwise(lexical_pred(p.schema, raw))
                    checks.append((cname, ok))
            if op.request_body is not None and have_body:
                body = F.col(body_col)
                schema_ok, _tier = compile_json(op.request_body.schema, body)
                ok = F.when(body.isNull(), F.lit(not op.request_body.required)) \
                     .otherwise(schema_ok)
                checks.append(("body", ok))

            valid = _all([c for _n, c in checks])
            fails = F.filter(
                F.array(*[F.when(~F.coalesce(c, F.lit(False)), F.lit(n))
                          for n, c in checks]) if checks else F.array().cast("array<string>"),
                lambda x: x.isNotNull())
            op_id = F.when(match, F.lit(op.operation_id)).otherwise(op_id)
            row_valid = F.when(match, F.coalesce(valid, F.lit(False))).otherwise(row_valid)
            failed = F.when(match, fails).otherwise(failed)

        return df.withColumns({
            "operation_id": op_id,
            "row_valid": row_valid,
            "failed_checks": failed,
        })

    def validate_responses(
        self,
        df: DataFrame,
        method_col: str = "method",
        path_col: str = "path",
        status_col: str = "status",
        body_col: str = "body",
    ) -> DataFrame:
        """Validate a table of HTTP *response* records against the
        spec's per-operation ``responses`` section — the dual of the
        reference's ``Response`` spec model (fences/open_api/
        open_api.py:33-211; the reference only *parses* responses,
        its generator fires requests — generate.py:78-84 — so the
        evaluation semantics are ours): a row is valid iff its status
        code is declared (exact code, then ``NXX`` range, then
        ``default`` — the OpenAPI resolution order) and, when the
        matched response declares an ``application/json`` schema, the
        body is non-null and satisfies it.

        Same execution shape as :meth:`validate`: routing, status
        resolution, and every body predicate are ONE projection pass
        — no shuffle, no UDF for builtin-tier schemas.
        """
        method = F.upper(F.col(method_col))
        path = F.col(path_col)
        status = F.col(status_col).cast("int")
        have_body = body_col in df.columns

        op_id: Column = F.lit(None).cast("string")
        row_valid: Column = F.lit(False)
        failed: Column = F.array(F.lit("__no_route__"))

        for op in reversed(list(self.operations.values())):
            rx, _names = op.path_regex()
            anchored = "\\A(?:" + rx + ")\\z"
            match = (method == op.method) & F.coalesce(path.rlike(anchored), F.lit(False))

            exact = [k for k in op.responses if k.isdigit()]
            ranges = [k for k in op.responses if re.fullmatch(r"[1-5]XX", k)]
            has_default = "default" in op.responses

            def _status_match(key: str) -> Column:
                if key == "default":
                    return F.lit(True)
                if key.isdigit():
                    return status == int(key)
                lo = int(key[0]) * 100
                return (status >= lo) & (status <= lo + 99)

            resolution = exact + ranges + (["default"] if has_default else [])
            declared: Column = F.lit(False)
            for k in resolution:
                declared = declared | _status_match(k)
            checks: list[tuple[str, Column]] = [("status_declared", declared)]

            if have_body:
                body = F.col(body_col)
                # undeclared status: body unchecked (status_declared
                # already fails the row); build the when-chain in
                # reverse so the most specific key wins
                body_ok: Column = F.lit(True)
                for k in reversed(resolution):
                    schema = op.responses[k]
                    if schema is None:
                        pred: Column = F.lit(True)
                    else:
                        ok, _tier = compile_json(schema, body)
                        pred = F.when(body.isNull(), F.lit(False)) \
                               .otherwise(F.coalesce(ok, F.lit(False)))
                    body_ok = F.when(_status_match(k), pred).otherwise(body_ok)
                checks.append(("body", body_ok))

            valid = _all([c for _n, c in checks])
            fails = F.filter(
                F.array(*[F.when(~F.coalesce(c, F.lit(False)), F.lit(n))
                          for n, c in checks]),
                lambda x: x.isNotNull())
            op_id = F.when(match, F.lit(op.operation_id)).otherwise(op_id)
            row_valid = F.when(match, F.coalesce(valid, F.lit(False))).otherwise(row_valid)
            failed = F.when(match, fails).otherwise(failed)

        return df.withColumns({
            "operation_id": op_id,
            "row_valid": row_valid,
            "failed_checks": failed,
        })

    def verdicts(self, validated: DataFrame) -> DataFrame:
        return (
            validated.groupBy("operation_id")
            .agg(F.sum(F.col("row_valid").cast("long")).alias("n_valid"),
                 F.sum((~F.col("row_valid")).cast("long")).alias("n_invalid"))
        )
