"""XSD-subset front end: compile an XML Schema (the reference's
dialect subset) into the engine's fences-dialect JSON schemas, and
validate XML-valued cells through the same evaluator.

Mirrors the reference's XSD surface (structural parity only — written
from scratch against the public XSD spec):

- tag handlers ``element / sequence / choice / all / simpleType /
  complexType / simpleContent / attribute / extension / restriction``
  (/root/reference/fences/xml_schema/parse.py:12-28);
- built-in types ``xs:string, xs:dateTime, xs:positiveInteger,
  xs:integer, xs:boolean, xs:unsignedInt, xs:unsignedShort,
  xs:unsignedByte, xs:int, xs:double, xs:decimal``
  (xml_schema/parse.py:29-79);
- restrictions ``pattern / minLength / maxLength / enumeration`` plus
  the numeric ``minInclusive / maxInclusive / minExclusive /
  maxExclusive`` facets (xml_schema/parse.py:80-84,174-199);
- ``minOccurs`` / ``maxOccurs`` repetition (parse.py:285-309) →
  array ``minItems`` / ``maxItems``;
- attribute ``use=required`` / ``fixed`` (parse.py:370-414) →
  ``required`` / ``const`` on an ``@name`` property;
- named-type resolution (``resolve_type``, parse.py:475-488) →
  driver-side dict lookup (cycle-safe via a visiting set).

Spark integration: the produced schema is the ordinary dialect, so
typed columns go through the builtin compiler; **XML text cells** are
validated with :func:`compile_xml_udf` — an Arrow-vectorized pandas
UDF that shreds each document with ``xml.etree`` (schema-aware type
coercion) and runs the pure-Python evaluator.  No per-row Python
outside the Arrow batch loop (BASELINE.json:15).
"""

from __future__ import annotations

import functools
import operator
import xml.etree.ElementTree as ET
from typing import Any

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fences_spark.compiler import CompileError
from fences_spark.schema.evaluator import Evaluator, SchemaType, format_regex
from fences_spark.schema.regex_dialect import compile_dialect_pattern, to_java_regex

_XS = "{http://www.w3.org/2001/XMLSchema}"

# built-in simple types → dialect schema (reference list,
# xml_schema/parse.py:29-79)
_BUILTIN_TYPES: dict[str, dict] = {
    "xs:string": {"type": "string"},
    "xs:dateTime": {"type": "string", "format": "datetime"},
    "xs:boolean": {"type": "boolean"},
    "xs:integer": {"type": "integer"},
    "xs:int": {"type": "integer", "minimum": -(2**31), "maximum": 2**31 - 1},
    "xs:positiveInteger": {"type": "integer", "minimum": 1},
    "xs:nonNegativeInteger": {"type": "integer", "minimum": 0},
    "xs:unsignedInt": {"type": "integer", "minimum": 0, "maximum": 2**32 - 1},
    "xs:unsignedShort": {"type": "integer", "minimum": 0, "maximum": 2**16 - 1},
    "xs:unsignedByte": {"type": "integer", "minimum": 0, "maximum": 2**8 - 1},
    "xs:double": {"type": "number"},
    "xs:decimal": {"type": "number"},
}


def _local(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def _strip_ns_prefix(name: str) -> str:
    """'tns:Foo' → 'Foo' (named types are matched by local name)."""
    return name.split(":", 1)[1] if ":" in name and not name.startswith("xs:") else name


class XsdError(ValueError):
    pass


class XsdCompiler:
    """One XSD document → {element_name: dialect_schema}."""

    def __init__(self, xsd_text: str):
        self.root = ET.fromstring(xsd_text)
        if _local(self.root.tag) != "schema":
            raise XsdError("root element must be xs:schema")
        self.named_types: dict[str, ET.Element] = {}
        self.named_elements: dict[str, ET.Element] = {}
        for child in self.root:
            tag = _local(child.tag)
            name = child.get("name")
            if not name:
                continue
            if tag in ("simpleType", "complexType"):
                self.named_types[name] = child
            elif tag == "element":
                self.named_elements[name] = child
        self._resolving: set[str] = set()

    # -- public ----------------------------------------------------------

    def element_schemas(self) -> dict[str, dict]:
        """Schema per top-level element (the validation entry points —
        the reference builds one graph per root element,
        xml_schema/parse.py:491-520)."""
        return {name: self.element_schema(el) for name, el in self.named_elements.items()}

    # -- type resolution --------------------------------------------------

    def _resolve_named(self, name: str) -> dict:
        name = _strip_ns_prefix(name)
        if name in _BUILTIN_TYPES:
            return dict(_BUILTIN_TYPES[name])
        if name not in self.named_types:
            raise XsdError(f"unresolved type {name!r}")
        if name in self._resolving:
            raise XsdError(f"recursive type {name!r} unsupported")
        self._resolving.add(name)
        try:
            return self._type_schema(self.named_types[name])
        finally:
            self._resolving.discard(name)

    def _type_schema(self, node: ET.Element) -> dict:
        tag = _local(node.tag)
        if tag == "simpleType":
            return self._simple_type(node)
        if tag == "complexType":
            return self._complex_type(node)
        raise XsdError(f"unexpected type node {tag}")

    # -- simple types -----------------------------------------------------

    def _simple_type(self, node: ET.Element) -> dict:
        restriction = node.find(f"{_XS}restriction")
        if restriction is None:
            raise XsdError("simpleType without restriction unsupported")
        base = restriction.get("base", "xs:string")
        schema = self._resolve_named(base)
        numeric = schema.get("type") in ("number", "integer")

        enum_vals: list[Any] = []
        for facet in restriction:
            f_tag = _local(facet.tag)
            val = facet.get("value", "")
            if f_tag == "pattern":
                # XSD patterns are implicitly anchored; the dialect's
                # evaluator applies prefix-match semantics, so anchor
                # the tail explicitly.
                schema["pattern"] = f"^(?:{val})$"
            elif f_tag == "minLength":
                schema["minLength"] = int(val)
            elif f_tag == "maxLength":
                schema["maxLength"] = int(val)
            elif f_tag == "enumeration":
                enum_vals.append(self._coerce(val, schema) if numeric else val)
            elif f_tag == "minInclusive":
                schema["minimum"] = self._coerce(val, schema)
            elif f_tag == "maxInclusive":
                schema["maximum"] = self._coerce(val, schema)
            elif f_tag == "minExclusive":
                schema["exclusiveMinimum"] = self._coerce(val, schema)
            elif f_tag == "maxExclusive":
                schema["exclusiveMaximum"] = self._coerce(val, schema)
        if enum_vals:
            schema["enum"] = enum_vals
        return schema

    @staticmethod
    def _coerce(text: str, schema: dict) -> Any:
        t = schema.get("type")
        if t == "integer":
            return int(text)
        if t == "number":
            return float(text)
        return text

    # -- complex types ----------------------------------------------------

    def _complex_type(self, node: ET.Element) -> dict:
        props: dict[str, dict] = {}
        required: list[str] = []

        complex_content = node.find(f"{_XS}complexContent")
        if complex_content is not None:
            # type inheritance: extension merges the base complex
            # type's properties with the extension's own content
            # (reference handler list, xml_schema/parse.py:12-28)
            ext = complex_content.find(f"{_XS}extension")
            if ext is None:
                raise XsdError("complexContent without extension unsupported")
            base = self._resolve_named(ext.get("base", ""))
            if base.get("type") != "object":
                raise XsdError("complexContent base must be a complex type")
            merged_props = dict(base.get("properties", {}))
            merged_req = list(base.get("required", []))
            own = self._complex_type_body(ext)
            merged_props.update(own.get("properties", {}))
            for k in own.get("required", []):
                if k not in merged_req:
                    merged_req.append(k)
            out: dict = {"type": "object", "properties": merged_props}
            if merged_req:
                out["required"] = merged_req
            if "oneOf" in own:
                out["oneOf"] = own["oneOf"]
            return out

        simple_content = node.find(f"{_XS}simpleContent")
        if simple_content is not None:
            ext = simple_content.find(f"{_XS}extension")
            if ext is None:
                raise XsdError("simpleContent without extension unsupported")
            text_schema = self._resolve_named(ext.get("base", "xs:string"))
            props["#text"] = text_schema
            required.append("#text")
            for attr in ext.findall(f"{_XS}attribute"):
                self._add_attribute(attr, props, required)
            return {"type": "object", "properties": props, "required": required}

        return self._complex_type_body(node)

    def _complex_type_body(self, node: ET.Element) -> dict:
        """Groups + attributes of a complexType or extension node."""
        props: dict[str, dict] = {}
        required: list[str] = []
        for group_tag in ("sequence", "all", "choice"):
            group = node.find(f"{_XS}{group_tag}")
            if group is None:
                continue
            choice = group_tag == "choice"
            names = []
            for el in group.findall(f"{_XS}element"):
                name = el.get("name") or _strip_ns_prefix(el.get("ref", ""))
                if not name:
                    raise XsdError("element without name/ref")
                names.append(name)
                props[name] = self._element_occurs_schema(el)
                if not choice and el.get("minOccurs", "1") != "0":
                    required.append(name)
            # xs:any wildcard (reference handler list, parse.py:12-28):
            # extra elements allowed — the dialect's object semantics
            # already permit unknown keys unless additionalProperties
            # restricts them, so the wildcard needs no constraint
            if choice and names:
                # exactly-one of the alternatives present
                return {
                    "type": "object",
                    "properties": props,
                    "oneOf": [{"required": [n]} for n in names],
                }
        for attr in node.findall(f"{_XS}attribute"):
            self._add_attribute(attr, props, required)

        out: dict = {"type": "object", "properties": props}
        if required:
            out["required"] = required
        return out

    def _add_attribute(self, attr: ET.Element, props: dict, required: list[str]) -> None:
        name = "@" + (attr.get("name") or "")
        schema = self._attr_schema(attr)
        fixed = attr.get("fixed")
        if fixed is not None:
            schema = {**schema, "const": self._coerce(fixed, schema)}
        props[name] = schema
        if attr.get("use") == "required":
            required.append(name)

    def _attr_schema(self, attr: ET.Element) -> dict:
        t = attr.get("type")
        if t:
            return self._resolve_named(t)
        inline = attr.find(f"{_XS}simpleType")
        if inline is not None:
            return self._simple_type(inline)
        return {"type": "string"}

    # -- elements ---------------------------------------------------------

    def element_schema(self, el: ET.Element) -> dict:
        """Schema for one element declaration (ignoring occurs — that
        belongs to the parent context)."""
        ref = el.get("ref")
        if ref:
            name = _strip_ns_prefix(ref)
            if name not in self.named_elements:
                raise XsdError(f"unresolved element ref {name!r}")
            return self.element_schema(self.named_elements[name])
        t = el.get("type")
        if t:
            return self._resolve_named(t)
        inline = el.find(f"{_XS}simpleType")
        if inline is not None:
            return self._simple_type(inline)
        inline = el.find(f"{_XS}complexType")
        if inline is not None:
            return self._complex_type(inline)
        return {"type": "string"}

    def _element_occurs_schema(self, el: ET.Element) -> dict:
        """minOccurs/maxOccurs → scalar or array schema
        (xml_schema/parse.py:285-309)."""
        item = self.element_schema(el)
        min_o = int(el.get("minOccurs", "1"))
        max_o_raw = el.get("maxOccurs", "1")
        max_o = None if max_o_raw == "unbounded" else int(max_o_raw)
        if max_o == 1:
            return item
        arr: dict = {"type": "array", "items": item, "minItems": min_o}
        if max_o is not None:
            arr["maxItems"] = max_o
        return arr


def parse_xsd(xsd_text: str) -> dict[str, dict]:
    """XSD text → {root_element_name: dialect_schema}."""
    return XsdCompiler(xsd_text).element_schemas()


# ---------------------------------------------------------------------------
# XML instance shredding (schema-aware, so '42' under an integer-typed
# element compares numerically — XSD's value space, not lexical space)
# ---------------------------------------------------------------------------


def _leaf_coerce(text: str | None, schema: dict) -> Any:
    text = text if text is not None else ""
    t = schema.get("type")
    if t == "integer":
        try:
            return int(text.strip())
        except ValueError:
            return text  # fails the type check downstream, as it should
    if t == "number":
        try:
            return float(text.strip())
        except ValueError:
            return text
    if t == "boolean":
        s = text.strip()
        if s in ("true", "1"):
            return True
        if s in ("false", "0"):
            return False
        return text
    return text


def xml_to_value(elem: ET.Element, schema: SchemaType) -> Any:
    """Convert one XML element to a dialect value, coercing leaf text
    by the schema's declared types."""
    if not isinstance(schema, dict):
        schema = {}
    props = schema.get("properties", {})
    if schema.get("type") == "object" or props:
        out: dict[str, Any] = {}
        for k, v in elem.attrib.items():
            out["@" + k] = _leaf_coerce(v, props.get("@" + k, {}))
        if "#text" in props:
            out["#text"] = _leaf_coerce(elem.text, props["#text"])
        by_name: dict[str, list[ET.Element]] = {}
        for child in elem:
            by_name.setdefault(_local(child.tag), []).append(child)
        for name, children in by_name.items():
            child_schema = props.get(name, {})
            if isinstance(child_schema, dict) and child_schema.get("type") == "array":
                item = child_schema.get("items", {})
                out[name] = [xml_to_value(c, item) for c in children]
            elif len(children) == 1:
                out[name] = xml_to_value(children[0], child_schema)
            else:
                out[name] = [xml_to_value(c, child_schema) for c in children]
        return out
    if len(elem) == 0 and not elem.attrib:
        return _leaf_coerce(elem.text, schema)
    # untyped structural fallback
    return {_local(c.tag): xml_to_value(c, {}) for c in elem}


def validate_xml(xml_text: str, schema: SchemaType) -> bool:
    """Driver-side single-document check (the pytest oracle path)."""
    try:
        elem = ET.fromstring(xml_text)
    except ET.ParseError:
        return False
    return Evaluator(schema).validate(xml_to_value(elem, schema))


# ---------------------------------------------------------------------------
# JVM builtin tier: ``from_xml`` + lexical predicates
#
# XSD validation is fundamentally *lexical* (an XML document is all
# text; the schema defines lexical spaces), so the fast path parses the
# document with Spark's native ``from_xml`` into an all-string struct
# and compiles the dialect checks as Column algebra over it —
# whole-stage codegen, no Python.  Faithfulness choices:
#
# - every element field is declared ``array<...>`` so duplicated
#   children of a maxOccurs=1 element are *visible* (size == 1 check)
#   instead of silently last-wins;
# - ``ignoreSurroundingSpaces=false`` preserves string values exactly;
#   numeric/boolean lexical checks apply ``trim`` themselves (the
#   evaluator's ``text.strip()``);
# - malformed documents surface via ``columnNameOfCorruptRecord``;
# - integer/number lexical spaces are the XSD ones ([+-]?digits etc.),
#   checked by regex before any cast.
#
# Documented relaxation: ``from_xml`` cannot see *undeclared*
# attributes on simple-typed leaf elements (it drops them), so a
# document abusing a scalar leaf with attributes passes here but fails
# the Arrow tier; schemas needing that strictness use
# ``compile_xml_udf``.  Everything else falls back automatically:
# :func:`compile_xml` tries this tier and drops to the Arrow UDF on
# ``CompileError``.
# ---------------------------------------------------------------------------

_INT_LEX = "^[+-]?[0-9]+$"
_NUM_LEX = r"^[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?$"
_CORRUPT = "_corrupt_record"
_XML_OPTS = {
    "attributePrefix": "@",
    "valueTag": "#text",
    "columnNameOfCorruptRecord": _CORRUPT,
    "ignoreSurroundingSpaces": "false",
}

_LEAF_KEYWORDS = frozenset(
    {
        "type", "format", "pattern", "minLength", "maxLength",
        "enum", "const", "minimum", "maximum",
        "exclusiveMinimum", "exclusiveMaximum",
    }
)
_OBJECT_KEYWORDS = frozenset({"type", "properties", "required", "oneOf"})
_ARRAY_KEYWORDS = frozenset({"type", "items", "minItems", "maxItems"})


def _is_object_schema(s: Any) -> bool:
    return isinstance(s, dict) and s.get("type") == "object"


def _is_array_schema(s: Any) -> bool:
    return isinstance(s, dict) and s.get("type") == "array"


def _xml_field_type(s: dict) -> T.DataType:
    if _is_object_schema(s):
        fields = []
        for k, sub in s.get("properties", {}).items():
            if k.startswith("@") or k == "#text":
                fields.append(T.StructField(k, T.StringType()))
            elif _is_array_schema(sub):
                fields.append(T.StructField(k, T.ArrayType(_xml_field_type(sub.get("items", {})))))
            else:
                # array-wrapped scalar: duplicate children stay visible
                fields.append(T.StructField(k, T.ArrayType(_xml_field_type(sub))))
        return T.StructType(fields)
    return T.StringType()


def spark_xml_schema(schema: SchemaType) -> T.StructType:
    """``from_xml`` schema for a dialect schema produced by
    :func:`parse_xsd` (plus the corrupt-record sentinel).  A
    simple-typed root element reads its text through the valueTag."""
    if _is_object_schema(schema):
        fields = list(_xml_field_type(schema).fields)
    else:
        fields = [T.StructField("#text", T.StringType())]
    return T.StructType(fields + [T.StructField(_CORRUPT, T.StringType())])


class XmlBuiltinCompiler:
    """Dialect-schema → Column predicate over a ``from_xml`` struct."""

    def compile(self, schema: SchemaType, col: Column) -> Column:
        parsed = F.from_xml(F.coalesce(col, F.lit("")), spark_xml_schema(schema), _XML_OPTS)
        if _is_object_schema(schema):
            body = self._object_pred(schema, parsed)
        else:
            # simple-typed root: the evaluator shreds missing text to ''
            body = self._leaf_pred(schema, F.coalesce(parsed.getField("#text"), F.lit("")))
        return parsed.getField(_CORRUPT).isNull() & body

    def _object_pred(self, s: dict, col: Column) -> Column:
        unsupported = set(s) - _OBJECT_KEYWORDS
        if unsupported:
            raise CompileError(f"XML builtin tier cannot express: {sorted(unsupported)}")
        preds: list[Column] = []
        props = s.get("properties", {})
        for k in s.get("required", []):
            if k == "#text":
                continue  # always present to the evaluator ('' when empty)
            preds.append(col.getField(k).isNotNull())
        for k, sub in props.items():
            f = col.getField(k)
            if k == "#text":
                # the Arrow tier shreds a missing text node to '' —
                # xml_to_value coerces elem.text None → ""
                preds.append(self._leaf_pred(sub, F.coalesce(f, F.lit(""))))
            elif k.startswith("@"):
                preds.append(
                    F.when(f.isNotNull(), self._leaf_pred(sub, f)).otherwise(F.lit(True))
                )
            elif _is_array_schema(sub):
                bad = set(sub) - _ARRAY_KEYWORDS
                if bad:
                    raise CompileError(f"XML array schema too rich: {sorted(bad)}")
                item = sub.get("items", {})
                p = F.forall(f, lambda x: self._value_pred(item, x))
                if "minItems" in sub:
                    p = p & (F.size(f) >= F.lit(int(sub["minItems"])))
                if "maxItems" in sub:
                    p = p & (F.size(f) <= F.lit(int(sub["maxItems"])))
                preds.append(F.when(f.isNotNull(), p).otherwise(F.lit(True)))
            else:
                # maxOccurs=1 element: exactly one child, then the
                # value predicate (two children make the evaluator see
                # a list, failing the scalar type check)
                p = (F.size(f) == F.lit(1)) & self._value_pred(sub, F.element_at(f, 1))
                preds.append(F.when(f.isNotNull(), p).otherwise(F.lit(True)))
        for opt in s.get("oneOf", []):
            # only the choice encoding {"required": [name]} is emitted
            # by parse_xsd; anything richer falls back
            if not (isinstance(opt, dict) and set(opt) == {"required"} and len(opt["required"]) == 1):
                raise CompileError("XML builtin tier supports only choice-style oneOf")
        if s.get("oneOf"):
            count = functools.reduce(
                operator.add,
                [col.getField(o["required"][0]).isNotNull().cast("int") for o in s["oneOf"]],
            )
            preds.append(count == F.lit(1))
        return functools.reduce(operator.and_, preds) if preds else F.lit(True)

    def _value_pred(self, s: dict, c: Column) -> Column:
        if _is_object_schema(s):
            return self._object_pred(s, c)
        return self._leaf_pred(s, c)

    def _leaf_pred(self, s: dict, c: Column) -> Column:
        if not isinstance(s, dict):
            if s in (True, {}):
                return F.lit(True)
            raise CompileError(f"XML leaf schema must be a dict: {s!r}")
        unsupported = set(s) - _LEAF_KEYWORDS
        if unsupported:
            raise CompileError(f"XML leaf keywords unsupported: {sorted(unsupported)}")
        t = s.get("type")
        preds: list[Column] = []
        if t in ("integer", "number"):
            tv = F.trim(c)
            preds.append(tv.rlike(_INT_LEX if t == "integer" else _NUM_LEX))
            # try_cast: ANSI cast would throw on lexical failures even
            # though the rlike conjunct already rejects the row (AND
            # does not short-circuit); FALSE & NULL stays FALSE
            nv = tv.try_cast("double")
            if "minimum" in s:
                preds.append(nv >= F.lit(float(s["minimum"])))
            if "maximum" in s:
                preds.append(nv <= F.lit(float(s["maximum"])))
            if "exclusiveMinimum" in s:
                preds.append(nv > F.lit(float(s["exclusiveMinimum"])))
            if "exclusiveMaximum" in s:
                preds.append(nv < F.lit(float(s["exclusiveMaximum"])))
            for kw in ("enum", "const"):
                if kw in s:
                    members = s[kw] if kw == "enum" else [s[kw]]
                    nums = [float(e) for e in members if isinstance(e, (int, float))]
                    preds.append(
                        functools.reduce(operator.or_, [nv == F.lit(x) for x in nums])
                        if nums
                        else F.lit(False)
                    )
        elif t == "boolean":
            tv = F.trim(c)
            preds.append(tv.isin("true", "false", "1", "0"))
            for kw in ("enum", "const"):
                if kw in s:
                    members = s[kw] if kw == "enum" else [s[kw]]
                    lex: list[str] = []
                    for e in members:
                        if e is True:
                            lex += ["true", "1"]
                        elif e is False:
                            lex += ["false", "0"]
                    preds.append(tv.isin(lex) if lex else F.lit(False))
        elif t == "string" or t is None:
            if "minLength" in s:
                preds.append(F.length(c) >= F.lit(int(s["minLength"])))
            if "maxLength" in s:
                preds.append(F.length(c) <= F.lit(int(s["maxLength"])))
            if "pattern" in s:
                for rx, negated in compile_dialect_pattern(s["pattern"]):
                    p = c.rlike(to_java_regex(rx))
                    preds.append(~p if negated else p)
            if "format" in s:
                rx = format_regex(s["format"])
                if rx is not None:
                    preds.append(c.rlike(to_java_regex(rx)))
            for kw in ("enum", "const"):
                if kw in s:
                    members = s[kw] if kw == "enum" else [s[kw]]
                    strs = [e for e in members if isinstance(e, str)]
                    preds.append(c.isin(strs) if strs else F.lit(False))
        else:
            raise CompileError(f"XML leaf type unsupported: {t!r}")
        return functools.reduce(operator.and_, preds) if preds else F.lit(True)


def compile_xml(schema: SchemaType, col: Column) -> tuple[Column, str]:
    """Compile an XSD-derived dialect schema against an XML-text
    column.  Returns ``(predicate, tier)``, trying the JVM builtin
    tier first and falling back to the Arrow evaluator UDF."""
    try:
        return XmlBuiltinCompiler().compile(schema, col), "xml_builtin"
    except CompileError:
        return compile_xml_udf(schema, col), "arrow_udf"


def compile_xml_udf(schema: SchemaType, col: Column) -> Column:
    """Arrow-vectorized verdict for a column of XML documents.

    The schema is closed over the UDF (broadcast with the task
    binary); each Arrow batch is shredded and evaluated in one Python
    call — the only permitted Python execution form
    (BASELINE.json:15)."""
    from pyspark.sql.functions import pandas_udf

    frozen = schema

    @pandas_udf(T.BooleanType())
    def _verdict(batch: pd.Series) -> pd.Series:
        ev = Evaluator(frozen)

        def one(doc: Any) -> bool:
            if doc is None:
                return False
            try:
                elem = ET.fromstring(doc)
            except ET.ParseError:
                return False
            return ev.validate(xml_to_value(elem, frozen))

        return batch.map(one)

    return _verdict(F.coalesce(col, F.lit("")))


# ---------------------------------------------------------------------------
# Per-element violation paths (NormalizedXPath diagnostics)
#
# The reference threads a NormalizedXPath — "/order[0]/item[2]/price[0]",
# one (tag, per-tag sibling index) step per element — through its XSD
# parsing for precise per-element diagnostics
# (/root/reference/fences/xml_schema/xpath.py:12-36, surfaced via
# xml_schema/exception.py:2 and parse.py:3).  The same path grammar is
# emitted here by both compile tiers, from the validation itself:
#
# - value defect at a leaf element        →  <parent>/<tag>[<i>]
# - attribute defect (bad value, missing) →  <parent>/@<name>
# - text-node defect                      →  <parent>/#text
# - missing required child                →  <parent>/<tag>   (no index:
#                                            there is nothing to select)
# - occurrence defect (scalar tag count ≠ 1, min/maxItems)
#                                         →  <parent>/<tag>
# - choice (oneOf) violation              →  <parent>
# - malformed document                    →  /
#
# Paths are deduped + sorted per document; a document is valid iff the
# array is empty (pinned against compile_xml in tests/test_xsd_paths.py).
# ---------------------------------------------------------------------------


def xml_violation_paths(doc: Any, schema: SchemaType, root_tag: str = "root") -> list[str]:
    """Driver/Arrow-side per-element violation paths for one document."""
    if doc is None:
        return ["/"]
    try:
        elem = ET.fromstring(doc)
    except ET.ParseError:
        return ["/"]
    out: set[str] = set()
    _walk_paths(elem, schema, f"/{root_tag}[0]", out)
    return sorted(out)


def _walk_paths(elem: ET.Element, s: SchemaType, path: str, out: set[str]) -> None:
    if not _is_object_schema(s):
        # scalar leaf: structure where text is expected is a defect
        # (mirrors xml_to_value's untyped-structural fallback, which
        # the evaluator's scalar type check then rejects)
        leaf = s if isinstance(s, dict) else {}
        if len(elem) or elem.attrib or not Evaluator(leaf).validate(
            _leaf_coerce(elem.text, leaf)
        ):
            out.add(path)
        return
    props = s.get("properties", {})
    required = set(s.get("required", []))
    for k, sub in props.items():
        if k == "#text":
            if not Evaluator(sub).validate(_leaf_coerce(elem.text, sub)):
                out.add(f"{path}/#text")
        elif k.startswith("@"):
            name = k[1:]
            if name in elem.attrib:
                if not Evaluator(sub).validate(_leaf_coerce(elem.attrib[name], sub)):
                    out.add(f"{path}/@{name}")
            elif k in required:
                out.add(f"{path}/@{name}")
    by_name: dict[str, list[ET.Element]] = {}
    for child in elem:
        by_name.setdefault(_local(child.tag), []).append(child)
    for k, sub in props.items():
        if k == "#text" or k.startswith("@"):
            continue
        children = by_name.get(k, [])
        if _is_array_schema(sub):
            item = sub.get("items", {})
            if children or k in required:
                if "minItems" in sub and len(children) < int(sub["minItems"]):
                    out.add(f"{path}/{k}")
                if "maxItems" in sub and len(children) > int(sub["maxItems"]):
                    out.add(f"{path}/{k}")
            for j, c in enumerate(children):
                _walk_paths(c, item, f"{path}/{k}[{j}]", out)
        elif not children:
            if k in required:
                out.add(f"{path}/{k}")
        elif len(children) > 1:
            out.add(f"{path}/{k}")
        else:
            _walk_paths(children[0], sub, f"{path}/{k}[0]", out)
    if s.get("oneOf"):
        cnt = sum(
            1
            for o in s["oneOf"]
            if isinstance(o, dict) and by_name.get((o.get("required") or [""])[0])
        )
        if cnt != 1:
            out.add(path)


class XmlPathCompiler(XmlBuiltinCompiler):
    """Dialect-schema → Column of violation paths (array<string>) over
    a ``from_xml`` struct — same supported subset (and the same
    CompileError fallback) as the boolean builtin tier, same path
    grammar as the Arrow tier above."""

    _EMPTY = "array()"

    def _empty(self) -> Column:
        return F.expr("array()").cast("array<string>")

    def compile_paths(self, schema: SchemaType, col: Column, root_tag: str) -> Column:
        parsed0 = F.from_xml(F.coalesce(col, F.lit("")), spark_xml_schema(schema), _XML_OPTS)
        root = F.lit(f"/{root_tag}[0]")

        # bind the parsed struct ONCE via a 1-element transform lambda:
        # the path expression references it a dozen-plus times, and each
        # syntactic reference would re-run from_xml per row (Generate is
        # outside whole-stage codegen, so no CSE rescues it)
        def body(parsed: Column) -> Column:
            if _is_object_schema(schema):
                arr = self._object_paths(schema, parsed, root)
            else:
                leaf_bad = ~self._leaf_pred(
                    schema, F.coalesce(parsed.getField("#text"), F.lit(""))
                )
                arr = F.array(F.when(leaf_bad, root))
            arr = (
                F.when(parsed.getField(_CORRUPT).isNotNull(), F.array(F.lit("/")))
                .otherwise(arr)
            )
            return F.array_sort(F.array_distinct(F.filter(arr, lambda x: x.isNotNull())))

        return F.element_at(F.transform(F.array(parsed0), body), 1)

    def _object_paths(self, s: dict, col: Column, prefix: Column) -> Column:
        unsupported = set(s) - _OBJECT_KEYWORDS
        if unsupported:
            raise CompileError(f"XML builtin tier cannot express: {sorted(unsupported)}")
        parts: list[Column] = []
        props = s.get("properties", {})
        for k in s.get("required", []):
            if k == "#text":
                continue
            name = "/@" + k[1:] if k.startswith("@") else "/" + k
            parts.append(
                F.array(F.when(col.getField(k).isNull(), F.concat(prefix, F.lit(name))))
            )
        for k, sub in props.items():
            f = col.getField(k)
            if k == "#text":
                bad = ~self._leaf_pred(sub, F.coalesce(f, F.lit("")))
                parts.append(F.array(F.when(bad, F.concat(prefix, F.lit("/#text")))))
            elif k.startswith("@"):
                bad = f.isNotNull() & ~self._leaf_pred(sub, f)
                parts.append(F.array(F.when(bad, F.concat(prefix, F.lit("/@" + k[1:])))))
            elif _is_array_schema(sub):
                extra = set(sub) - _ARRAY_KEYWORDS
                if extra:
                    raise CompileError(f"XML array schema too rich: {sorted(extra)}")
                parts.append(self._array_field_paths(k, sub, f, prefix))
            else:
                parts.append(self._scalar_field_paths(k, sub, f, prefix))
        if s.get("oneOf"):
            for opt in s["oneOf"]:
                if not (
                    isinstance(opt, dict)
                    and set(opt) == {"required"}
                    and len(opt["required"]) == 1
                ):
                    raise CompileError("XML builtin tier supports only choice-style oneOf")
            count = functools.reduce(
                operator.add,
                [col.getField(o["required"][0]).isNotNull().cast("int") for o in s["oneOf"]],
            )
            parts.append(F.array(F.when(count != F.lit(1), prefix)))
        if not parts:
            return self._empty()
        return F.flatten(F.array(*parts))

    def _value_paths(self, s: SchemaType, c: Column, path: Column) -> Column:
        if _is_object_schema(s):
            return self._object_paths(s, c, path)
        if not isinstance(s, dict):
            if s in (True, {}):
                return self._empty()
            raise CompileError(f"XML leaf schema must be a dict: {s!r}")
        return F.array(F.when(~self._leaf_pred(s, c), path))

    def _array_field_paths(self, k: str, sub: dict, f: Column, prefix: Column) -> Column:
        # a bound method call freezes k/sub/prefix — no late-binding
        # lambda capture across the caller's loop
        item = sub.get("items", {})
        item_paths = F.flatten(
            F.transform(
                f,
                lambda x, i: self._value_paths(
                    item, x, F.concat(prefix, F.lit(f"/{k}["), i.cast("string"), F.lit("]"))
                ),
            )
        )
        occ: list[Column] = []
        if "minItems" in sub:
            occ.append(F.size(f) < F.lit(int(sub["minItems"])))
        if "maxItems" in sub:
            occ.append(F.size(f) > F.lit(int(sub["maxItems"])))
        body = item_paths
        if occ:
            occ_bad = functools.reduce(operator.or_, occ)
            body = F.concat(
                F.array(F.when(occ_bad, F.concat(prefix, F.lit("/" + k)))), item_paths
            )
        return F.when(f.isNotNull(), body).otherwise(self._empty())

    def _scalar_field_paths(self, k: str, sub: SchemaType, f: Column, prefix: Column) -> Column:
        sub_paths = self._value_paths(
            sub, F.element_at(f, 1), F.concat(prefix, F.lit(f"/{k}[0]"))
        )
        combined = (
            F.when(F.size(f) != F.lit(1), F.array(F.concat(prefix, F.lit("/" + k))))
            .otherwise(sub_paths)
        )
        return F.when(f.isNotNull(), combined).otherwise(self._empty())


def compile_xml_paths_udf(schema: SchemaType, col: Column, root_tag: str) -> Column:
    """Arrow-vectorized violation paths for a column of XML documents."""
    from pyspark.sql.functions import pandas_udf

    frozen = schema

    @pandas_udf(T.ArrayType(T.StringType()))
    def _paths(batch: pd.Series) -> pd.Series:
        return batch.map(lambda d: xml_violation_paths(d, frozen, root_tag))

    return _paths(col)


def compile_xml_paths(schema: SchemaType, col: Column, root_tag: str) -> tuple[Column, str]:
    """Per-element violation paths for an XML-text column: JVM builtin
    tier first, Arrow evaluator fallback — mirroring compile_xml."""
    try:
        return XmlPathCompiler().compile_paths(schema, col, root_tag), "xml_builtin"
    except CompileError:
        return compile_xml_paths_udf(schema, col, root_tag), "arrow_udf"
