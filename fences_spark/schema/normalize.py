"""DNF normalizer for the fences JSON-schema dialect.

Re-derives, from scratch, the semantics of the reference normalizer
(/root/reference/fences/json_schema/normalize.py:557-579): rewrite an
arbitrary schema into ``{'anyOf': [option, ...]}`` where each option
is a *conjunctive* dict of merged keywords — OR of ANDs — with
``$defs`` preserved for recursion.  Each keyword has the three
behaviors of the reference's operator table (SURVEY.md §2.A):

- **simplifiers** — const→enum, integer→number∧multipleOf 1,
  dependentRequired→presence-combo anyOf, if/then/else→implication
  disjunction (reference: normalize.py:296-407);
- **inverters** — keyword-wise De Morgan for ``not`` elimination,
  producing the internal ``NOT_enum``/``NOT_const``/``NOT_multipleOf``
  keywords (reference: normalize.py:61-120);
- **mergers** — conjunction of two options folds keyword-pairwise:
  max/min for bounds, set-intersection for enum/type, union for
  required, lcm for multipleOf (float-gcd), ``(a)&(b)`` for pattern,
  allOf for items, zip-and-pad for prefixItems, key-pairing with
  additionalProperties folding for properties (reference:
  normalize.py:123-229).

Where the reference has no merger for a keyword pair (e.g. two
``contains``), we keep both under an explicit ``allOf`` inside the
option instead of failing — a documented relaxation of the reference's
flatness invariant (our evaluator handles allOf natively, and
*evaluation* is the goal here; fences needs strict flatness only for
path enumeration).

Equivalence contract, tested in tests/test_normalize.py: for every
schema S and instance v, ``validate(v, S) == validate(v, normalize(S))``
— the reference's own "normalize equivalence" harness
(test_json_schema_test_suite.py:96-214) restated with our evaluator.
"""

from __future__ import annotations

import hashlib
import json
import math
from fractions import Fraction
from typing import Any

from fences_spark.schema.evaluator import ANNOTATION_KEYWORDS, SchemaType

ALL_TYPES = ["number", "boolean", "string", "null", "object", "array"]
# 'integer' is intentionally absent: it rewrites to number ∧ multipleOf 1
# (the reference makes the same choice, normalize.py:36-44)

NORM_TRUE = {"anyOf": [{}]}
NORM_FALSE = {"anyOf": []}


class NormalizeError(Exception):
    pass


def _canon(s: Any) -> str:
    return json.dumps(s, sort_keys=True, separators=(",", ":"))


def _sha(s: Any) -> str:
    return hashlib.sha1(_canon(s).encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# float gcd/lcm (multipleOf merging) — epsilon-tolerant like the
# dialect requires (reference: normalize.py:138-147)
# ---------------------------------------------------------------------------


def _float_gcd(a: float, b: float, rtol: float = 1e-05, atol: float = 1e-08) -> float:
    t = min(abs(a), abs(b))
    while abs(b) > rtol * t + atol:
        a, b = b, math.fmod(a, b)
    return abs(a)


def _float_lcm(a: float, b: float) -> float:
    # Exact path first: JSON numbers are decimal text, so interpret
    # each float via its shortest round-trip repr as an exact decimal
    # fraction and take the true lcm.  The tolerant float path below
    # mis-merges ill-conditioned pairs — lcm(1, 0.123456789) must be
    # 123456789 (suite case "float division = inf"), not ~10.00007,
    # which silently ACCEPTS non-multiples like 1e308 after an
    # integer+multipleOf type merge.
    try:
        fa = Fraction(repr(float(a)))
        fb = Fraction(repr(float(b)))
        if fa and fb:
            g = Fraction(
                math.gcd(fa.numerator * fb.denominator, fb.numerator * fa.denominator),
                fa.denominator * fb.denominator,
            )
            v = abs(fa * fb / g)
            fv = float(v)
            if math.isfinite(fv) and Fraction(fv) == v:
                return int(fv) if fv.is_integer() else fv
    except (ValueError, OverflowError, ZeroDivisionError):
        pass
    # epsilon-tolerant fallback when the exact lcm is not a
    # representable double (reference: normalize.py:138-147)
    g = _float_gcd(a, b)
    if g == 0:
        return 0.0
    v = abs(a * b) / g
    return int(v) if float(v).is_integer() else v


# ---------------------------------------------------------------------------
# simplifiers
# ---------------------------------------------------------------------------


def _simplify_type(s: dict) -> dict:
    if "type" not in s:
        return s
    ts = s["type"]
    ts = [ts] if isinstance(ts, str) else list(ts)
    out = dict(s)
    if "integer" in ts:
        rest = [t for t in ts if t != "integer"]
        if "number" in rest:
            out["type"] = rest
        else:
            # integer alone → number ∧ multipleOf lcm(1, existing)
            number_opt = dict(out)
            number_opt["type"] = rest + ["number"]
            mo = _float_lcm(1.0, float(out["multipleOf"])) if "multipleOf" in out else 1
            if rest:
                # {int, others}: number-branch carries multipleOf 1;
                # other types unaffected by multipleOf (vacuous)
                number_opt["multipleOf"] = mo
                out = number_opt
            else:
                number_opt["multipleOf"] = mo
                out = number_opt
    else:
        out["type"] = ts
    return out


def _simplify_const(s: dict) -> dict:
    if "const" not in s:
        return s
    out = dict(s)
    c = out.pop("const")
    if "enum" in out:
        out["enum"] = [e for e in out["enum"] if _canon(e) == _canon(c)]
    else:
        out["enum"] = [c]
    return out


def _simplify_dependent_required(s: dict) -> dict:
    """a present ⇒ b,c present — rewritten to an allOf of per-trigger
    anyOf options (reference: normalize.py:378-407)."""
    if "dependentRequired" not in s:
        return s
    out = dict(s)
    deps = out.pop("dependentRequired")
    clauses = []
    for trigger, needed in deps.items():
        clauses.append(
            {
                "anyOf": [
                    # trigger absent …
                    {"not": {"required": [trigger]}},
                    # … or all needed present
                    {"required": list(needed)},
                ]
            }
        )
    if clauses:
        out.setdefault("allOf", [])
        out["allOf"] = list(out["allOf"]) + clauses
    return out


def _simplify_if_then_else(s: dict) -> dict:
    """(if∧then) ∨ (¬if∧else) (reference: normalize.py:322-363)."""
    if "if" not in s:
        out = dict(s)
        out.pop("then", None)
        out.pop("else", None)
        return out
    out = dict(s)
    s_if = out.pop("if")
    s_then = out.pop("then", True)
    s_else = out.pop("else", True)
    clause = {"anyOf": [{"allOf": [s_if, s_then]}, {"allOf": [{"not": s_if}, s_else]}]}
    out.setdefault("allOf", [])
    out["allOf"] = list(out["allOf"]) + [clause]
    return out


# ---------------------------------------------------------------------------
# inverters (¬keyword → keyword'), reference: normalize.py:61-120
# ---------------------------------------------------------------------------


def _invert(s: SchemaType) -> dict:
    """Return a schema equivalent to {"not": s} with `not` eliminated
    at this level: an anyOf of single-keyword inversions (De Morgan —
    ¬(k1 ∧ k2) = ¬k1 ∨ ¬k2)."""
    if s is True:
        return {"anyOf": []}  # never valid
    if s is False:
        return {}  # always valid
    options: list[dict] = []
    for k, v in s.items():
        if k in ANNOTATION_KEYWORDS or k == "$defs":
            continue
        options.extend(_invert_keyword(k, v, s))
    if not options:
        return {"anyOf": []}  # ¬(always true) = always false
    return {"anyOf": options}


def _invert_keyword(k: str, v: Any, s: dict) -> list[dict]:
    if k == "type":
        ts = [v] if isinstance(v, str) else list(v)
        expanded = set()
        for t in ts:
            expanded.add("number" if t == "integer" else t)
        inv = [t for t in ALL_TYPES if t not in expanded]
        out = [{"type": inv}]
        if "integer" in ts and "number" not in ts:
            # non-integral numbers also violate type:integer
            out.append({"type": ["number"], "NOT_multipleOf": 1})
        return out
    if k == "enum":
        return [{"NOT_enum": v}]
    if k == "NOT_enum":
        return [{"enum": v}]
    if k == "const":
        return [{"NOT_const": v}]
    if k == "NOT_const":
        return [{"const": v}]
    if k == "minimum":
        return [{"type": ["number"], "exclusiveMaximum": v}]
    if k == "maximum":
        return [{"type": ["number"], "exclusiveMinimum": v}]
    if k == "exclusiveMinimum":
        return [{"type": ["number"], "maximum": v}]
    if k == "exclusiveMaximum":
        return [{"type": ["number"], "minimum": v}]
    if k == "multipleOf":
        return [{"type": ["number"], "NOT_multipleOf": v}]
    if k == "NOT_multipleOf":
        return [{"type": ["number"], "multipleOf": v}]
    if k == "minLength":
        return [{"type": ["string"], "maxLength": v - 1}]
    if k == "maxLength":
        return [{"type": ["string"], "minLength": v + 1}]
    if k == "pattern":
        return [{"type": ["string"], "pattern": f"!({v})"}]
    if k == "format":
        # reference drops format on inversion (normalize.py:98);
        # we preserve semantics with a negated-format marker only if
        # the format is known — otherwise vacuous
        from fences_spark.schema.evaluator import format_regex

        rx = format_regex(v)
        if rx is None:
            return []
        return [{"type": ["string"], "pattern": f"!({rx})"}]
    if k == "minItems":
        return [{"type": ["array"], "maxItems": v - 1}]
    if k == "maxItems":
        return [{"type": ["array"], "minItems": v + 1}]
    if k == "items":
        # ¬(∀ items) = array with ≥1 violating item
        return [{"type": ["array"], "contains": _invert_full(v)}]
    if k == "prefixItems":
        out = []
        for i, sub in enumerate(v):
            out.append(
                {
                    "type": ["array"],
                    "minItems": i + 1,
                    "prefixItems": [True] * i + [_invert_full(sub)],
                }
            )
        return out
    if k == "contains":
        return [{"type": ["array"], "items": _invert_full(v)}]
    if k == "uniqueItems":
        if v:
            return [{"type": ["array"], "NOT_uniqueItems": True}]
        return []
    if k == "NOT_uniqueItems":
        return [{"type": ["array"], "uniqueItems": True}]
    if k == "required":
        # ¬(all present) = ∃ key absent (reference rewrites to
        # properties {k: False}, normalize.py:93; we use an explicit
        # NOT_required so structs without the key stay expressible)
        return [{"type": ["object"], "NOT_required": [key]} for key in v]
    if k == "NOT_required":
        return [{"type": ["object"], "required": v}]
    if k == "properties":
        # ¬(∀ present keys valid) = ∃ key present ∧ invalid
        out = []
        for key, sub in v.items():
            out.append(
                {"type": ["object"], "required": [key], "properties": {key: _invert_full(sub)}}
            )
        return out
    if k == "additionalProperties":
        raise NormalizeError("cannot invert additionalProperties")
    if k in ("minProperties",):
        return [{"type": ["object"], "maxProperties": v - 1}]
    if k in ("maxProperties",):
        return [{"type": ["object"], "minProperties": v + 1}]
    if k == "anyOf":
        # ¬(A ∨ B) = ¬A ∧ ¬B
        return [{"allOf": [_invert_full(sub) for sub in v]}]
    if k == "allOf":
        return [{"anyOf": [_invert_full(sub) for sub in v]}]
    if k == "oneOf":
        # ¬(exactly one) = none ∨ (≥2)
        none = {"allOf": [_invert_full(sub) for sub in v]}
        pairs = []
        for i in range(len(v)):
            for j in range(i + 1, len(v)):
                pairs.append({"allOf": [v[i], v[j]]})
        return [none] + pairs
    if k == "not":
        return [v if isinstance(v, dict) else ({} if v is True else {"anyOf": []})]
    if k in ("if", "then", "else"):
        # handled by simplification before inversion
        raise NormalizeError("invert called before if/then/else simplification")
    if k == "dependentRequired":
        raise NormalizeError("invert called before dependentRequired simplification")
    if k == "$ref":
        # refs inside `not` payloads are inlined before inversion
        # (_denormalize_for_invert); reaching here means recursion
        raise NormalizeError("cannot invert a recursive $ref")
    raise NormalizeError(f"no inverter for keyword {k}")


def _invert_full(s: SchemaType) -> dict:
    """{"not": s} as a schema dict (deferred; expanded when that
    branch is itself normalized)."""
    if s is True:
        return False  # type: ignore[return-value]
    if s is False:
        return True  # type: ignore[return-value]
    return {"not": s}


# ---------------------------------------------------------------------------
# mergers (conjunction of two options), reference: normalize.py:123-229
# ---------------------------------------------------------------------------


def _merge_type(a: list, b: list) -> list:
    return [t for t in a if t in b]


def _merge_enum(a: list, b: list) -> list:
    bc = {_canon(x) for x in b}
    return [x for x in a if _canon(x) in bc]


def _merge_properties(a: dict, b: dict, ap_a: Any, ap_b: Any) -> dict:
    """Pair per-key sub-schemas, folding each side's
    additionalProperties into keys it doesn't list (reference:
    normalize.py:164-195)."""
    out: dict[str, Any] = {}
    for k in set(a) | set(b):
        sa = a.get(k, ap_a if ap_a is not None else True)
        sb = b.get(k, ap_b if ap_b is not None else True)
        out[k] = {"allOf": [sa, sb]}
    return out


_SIMPLE_MERGERS = {
    "minimum": max,
    "exclusiveMinimum": max,
    "minLength": max,
    "minItems": max,
    "minProperties": max,
    "minContains": max,
    "maximum": min,
    "exclusiveMaximum": min,
    "maxLength": min,
    "maxItems": min,
    "maxProperties": min,
    "maxContains": min,
    "multipleOf": _float_lcm,
    "pattern": lambda a, b: f"({a})&({b})",
    "format": lambda a, b: a,  # keep-first (reference: normalize.py:158)
    "required": lambda a, b: sorted(set(a) | set(b)),
    "NOT_required": lambda a, b: sorted(set(a) | set(b)),
    "type": _merge_type,
    "enum": _merge_enum,
    "NOT_enum": lambda a, b: a + [x for x in b if _canon(x) not in {_canon(y) for y in a}],
    "items": lambda a, b: {"allOf": [a, b]},
    "uniqueItems": lambda a, b: a or b,
    "NOT_uniqueItems": lambda a, b: a or b,
    "additionalProperties": lambda a, b: {"allOf": [a, b]},
    "propertyNames": lambda a, b: {"allOf": [a, b]},
}


def _merge_prefix_items(a: list, b: list, items_a: Any, items_b: Any) -> list:
    """Zip positional schemas, padding the shorter side with its
    ``items`` schema (reference: normalize.py:198-223)."""
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        sa = a[i] if i < len(a) else (items_a if items_a is not None else True)
        sb = b[i] if i < len(b) else (items_b if items_b is not None else True)
        out.append({"allOf": [sa, sb]})
    return out


_OBJ_GROUP = ("properties", "patternProperties", "additionalProperties")


def merge_options(a: dict, b: dict) -> dict:
    """Conjunction of two flat options into one option.

    Scoped keyword groups need care: ``additionalProperties`` means
    "keys not in MY adjacent properties/patternProperties" and
    ``items`` means "positions past MY adjacent prefixItems", so
    copying one side's ``properties``/``patternProperties``/
    ``prefixItems`` next to the other side's ``additionalProperties``/
    ``items`` silently re-scopes the latter (caught by the vendored
    JSON-Schema-Test-Suite cases "additionalProperties does not look
    in applicators" / "items does not look in applicators"):

    * properties × additionalProperties without patternProperties:
      synthesize an empty ``properties`` on the bare side so the
      key-pairing fold sees both sides' additionalProperties;
    * patternProperties + additionalProperties across sides: no flat
      adjacent form preserves both scopes — keep b's whole object
      group as a literal allOf branch (the documented relaxation);
    * prefixItems × items: synthesize an empty ``prefixItems`` on the
      items-only side so zip-padding conjoins its items into every
      positional slot;
    * min/maxContains are inert without an adjacent ``contains``
      (draft 2020-12) and must not strengthen the other side's —
      drop strays, and branch b's contains-group when both sides
      carry one.
    """
    a, b = dict(a), dict(b)
    extra_allof: list = []

    # drop inert min/maxContains (no adjacent contains)
    for side in (a, b):
        if "contains" not in side:
            side.pop("minContains", None)
            side.pop("maxContains", None)
    # both sides constrain contains: keep b's group as its own branch
    if "contains" in a and "contains" in b:
        grp = {k: b.pop(k) for k in ("contains", "minContains", "maxContains") if k in b}
        extra_allof.append(grp)

    ga = [k for k in _OBJ_GROUP if k in a]
    gb = [k for k in _OBJ_GROUP if k in b]
    if ga and gb:
        has_pp = "patternProperties" in a or "patternProperties" in b
        has_ap = "additionalProperties" in a or "additionalProperties" in b
        if has_pp and has_ap:
            # un-flattenable scope interaction: branch b's group intact
            extra_allof.append({k: b.pop(k) for k in gb})
        elif has_ap:
            a.setdefault("properties", {})
            b.setdefault("properties", {})

    # items applies to ALL positions when no prefixItems is adjacent:
    # give the items-only side an empty prefixItems so the zip-pad
    # folds its items into the other side's positional slots
    if ("prefixItems" in a) != ("prefixItems" in b):
        if "prefixItems" not in a and "items" in a:
            a["prefixItems"] = []
        if "prefixItems" not in b and "items" in b:
            b["prefixItems"] = []

    out = dict(a)
    for k, v in b.items():
        if k in ANNOTATION_KEYWORDS:
            continue
        if k not in out:
            out[k] = v
            continue
        if k == "prefixItems":
            out[k] = _merge_prefix_items(out[k], v, a.get("items"), b.get("items"))
        elif k == "properties":
            out[k] = _merge_properties(
                out[k], v, a.get("additionalProperties"), b.get("additionalProperties")
            )
        elif k == "items" and ("prefixItems" in a or "prefixItems" in b):
            out[k] = {"allOf": [out[k], v]}
        elif k in _SIMPLE_MERGERS:
            out[k] = _SIMPLE_MERGERS[k](out[k], v)
        elif k == "allOf":
            out[k] = list(out[k]) + list(v)
        else:
            # no merger (contains, $ref, …): keep both under allOf
            extra_allof.append({k: v})
    if extra_allof:
        out.setdefault("allOf", [])
        out["allOf"] = list(out["allOf"]) + extra_allof
    return out


# ---------------------------------------------------------------------------
# normalize: schema → DNF
# ---------------------------------------------------------------------------

# Keywords whose semantics DNF restructuring cannot preserve:
# unevaluated* reads the annotation set of its *own* schema object
# (merging sibling allOf branches into it would grow that set), and
# content* has no sound conjunction merger.  The reference parses but
# never generates these (fences/json_schema/parse.py:244-250,304-306);
# our evaluator asserts them, so the normalizer must leave any schema
# containing them intact.
OPAQUE_KEYWORDS = frozenset(
    {
        "unevaluatedProperties",
        "unevaluatedItems",
        "contentEncoding",
        "contentMediaType",
        "contentSchema",
        # identifier/dynamic-scope keywords: DNF restructuring moves
        # subtrees, which would detach $anchor names from their "#name"
        # refs and change the resource chain $dynamicRef resolves
        # against — pass through untouched (the Arrow tier evaluates
        # them natively; non-root $id is caught by uses_dynamic_scope
        # in normalize() below)
        "$anchor",
        "$dynamicAnchor",
        "$dynamicRef",
    }
)


def contains_opaque(s: Any) -> bool:
    """True if the schema tree uses any normalization-opaque keyword."""
    if isinstance(s, dict):
        if OPAQUE_KEYWORDS & s.keys():
            return True
        return any(contains_opaque(v) for v in s.values())
    if isinstance(s, list):
        return any(contains_opaque(x) for x in s)
    return False


class Normalizer:
    def __init__(self, root: SchemaType):
        self.root = root
        self.defs: dict[str, SchemaType] = {}
        self._memo: dict[str, str] = {}  # canonical-hash → def key (cycle-safe)
        self._in_progress: set[str] = set()

    # resolve local pointer against the ORIGINAL root (one cached
    # resolver: Evaluator.__init__ walks the whole document to build
    # its ref index, so a fresh instance per ref would make ref-heavy
    # normalization O(refs × schema size))
    def _resolve_ref(self, ref: str) -> SchemaType:
        if not hasattr(self, "_ref_resolver"):
            from fences_spark.schema.evaluator import Evaluator

            self._ref_resolver = Evaluator(self.root)
        return self._ref_resolver._resolve_ref(ref)

    def normalize(self) -> dict:
        from fences_spark.schema.evaluator import uses_dynamic_scope

        if contains_opaque(self.root) or uses_dynamic_scope(self.root):
            # DNF restructuring is not annotation-safe: folding an
            # allOf branch's `properties` into a sibling changes which
            # keys count as *evaluated* for unevaluatedProperties/
            # Items, and content* conjuncts have no sound merger.
            # Normalization is an optimization, not a requirement — a
            # schema using these keywords passes through as ONE opaque
            # option (the Arrow-evaluator tier handles it unchanged;
            # verdict equivalence holds trivially).
            body: dict[str, Any] = {"anyOf": [self.root]}
            if isinstance(self.root, dict) and isinstance(self.root.get("$defs"), dict):
                body["$defs"] = self.root["$defs"]
            return body
        body = self._norm(self.root)
        # carry the ORIGINAL $defs too: nested refs inside property/
        # item sub-schemas are left in place (they are normalized
        # lazily when compiled), so their pointers must keep resolving
        defs: dict[str, Any] = {}
        if isinstance(self.root, dict) and isinstance(self.root.get("$defs"), dict):
            defs.update(self.root["$defs"])
        defs.update(self.defs)
        if defs:
            body = dict(body)
            body["$defs"] = defs
        return body

    def _norm(self, s: SchemaType) -> dict:
        """Normalize one subschema to {'anyOf': [flat options]} with
        refs rewritten to point into self.defs (sha-keyed memo —
        the reference's recursion-surviving trick,
        normalize.py:518-531)."""
        if s is True:
            return {"anyOf": [{}]}
        if s is False:
            return {"anyOf": []}
        key = _sha(s)
        if key in self._in_progress or key in self._memo:
            # recursion (or reuse): reference a named def
            self._memo.setdefault(key, f"d{key}")
            return {"anyOf": [{"$ref": f"#/$defs/d{key}"}]}
        self._in_progress.add(key)
        try:
            options = self._to_dnf(s)
        finally:
            self._in_progress.discard(key)
        result = {"anyOf": options}
        if key in self._memo:  # a recursive backlink was created
            self.defs[f"d{key}"] = result
            return {"anyOf": [{"$ref": f"#/$defs/d{key}"}]}
        return result

    def _to_dnf(self, s: dict) -> list[dict]:
        s = {k: v for k, v in s.items() if k not in ANNOTATION_KEYWORDS and k != "$defs"}

        # inline non-recursive refs by conjunction
        if "$ref" in s:
            target = self._resolve_ref(s.pop("$ref"))
            tnorm = self._norm(target)
            s.setdefault("allOf", [])
            s["allOf"] = list(s["allOf"]) + [tnorm]

        s = _simplify_const(s)
        s = _simplify_type(s)
        s = _simplify_dependent_required(s)
        s = _simplify_if_then_else(s)

        # eliminate `not` via keyword inversion
        if "not" in s:
            inv = _invert(self._denormalize_for_invert(s.pop("not")))
            s.setdefault("allOf", [])
            s["allOf"] = list(s["allOf"]) + [inv]

        # gather OR sources
        branches: list[list[dict]] = []
        if "anyOf" in s:
            subs = s.pop("anyOf")
            opts: list[dict] = []
            for sub in subs:
                opts.extend(self._options_of(sub))
            branches.append(opts)
        if "oneOf" in s:
            subs = s.pop("oneOf")
            opts = []
            for i, sub in enumerate(subs):
                conj = [sub] + [{"not": o} for j, o in enumerate(subs) if j != i]
                opts.extend(self._options_of({"allOf": conj}))
            branches.append(opts)
        allofs = s.pop("allOf", [])

        base = [s]  # the remaining flat keywords form one option
        for sub in allofs:
            sub_opts = self._options_of(sub)
            base = [merge_options(x, y) for x in base for y in sub_opts]
        for opts in branches:
            base = [merge_options(x, y) for x in base for y in opts]
        # drop statically-false options (empty type intersection)
        out = []
        for o in base:
            if "type" in o and isinstance(o["type"], list) and not o["type"]:
                continue
            if "enum" in o and not o["enum"]:
                continue
            out.append(o)
        return out

    def _options_of(self, sub: SchemaType) -> list[dict]:
        n = self._norm(sub)
        if list(n.keys()) == ["anyOf"]:
            return n["anyOf"] if n["anyOf"] else [{"enum": []}]  # false → unsatisfiable option
        return [n]

    def _denormalize_for_invert(self, s: SchemaType) -> SchemaType:
        """Inversion operates on raw keyword dicts; pre-simplify the
        conditional/dependent sugar and inline refs so _invert never
        sees them (a ref inverted in place would dangle — the pointer
        targets the *original* document, not the normalized one)."""
        if not isinstance(s, dict):
            return s
        s = self._inline_refs_deep(s, 0)
        return _simplify_if_then_else(_simplify_dependent_required(_simplify_const(s)))

    def _inline_refs_deep(self, s: Any, depth: int) -> Any:
        if depth > 32:
            raise NormalizeError("recursive $ref inside not payload")
        if isinstance(s, dict):
            if "$ref" in s:
                target = self._resolve_ref(s["$ref"])
                rest = {k: v for k, v in s.items() if k != "$ref"}
                merged = {"allOf": [rest, target]} if rest else target
                return self._inline_refs_deep(merged, depth + 1)  # count ref-follows only
            return {k: self._inline_refs_deep(v, depth) for k, v in s.items()}
        if isinstance(s, list):
            return [self._inline_refs_deep(x, depth) for x in s]
        return s


def _relocate_relative_refs(root: SchemaType) -> SchemaType:
    """Rewrite local refs that point OUTSIDE $defs (#/properties/foo,
    #/prefixItems/0, #/allOf/1, …) to relocated $defs copies.

    Normalization re-roots the schema body (everything becomes anyOf
    options), so only ``#`` (whose accept set is preserved by
    construction) and ``#/$defs/…`` pointers survive restructuring;
    any other pointer would dangle.  Relocating the target subtree
    into $defs up front keeps those refs resolvable and is accept-set
    neutral — the copy equals the pointed-at subtree.

    enum/const values are never descended into: a ``$ref`` key inside
    a literal is DATA (suite case "naive replacement of $ref with its
    destination is not correct"), not a reference."""
    if not isinstance(root, dict):
        return root
    from urllib.parse import urljoin

    from fences_spark.schema.evaluator import Evaluator

    resolver = Evaluator(root)
    # A root-level $id makes URI-form refs to the SAME document legal
    # ({"$id": "http://x/r.json", "$ref": "http://x/r.json#/…"}), but
    # DNF output drops $id — canonicalize such refs to fragment-only
    # form ("#/…") so they survive normalization (and then relocate
    # like any other local pointer).  Refs based in a DIFFERENT
    # resource stay untouched: they raise in the original evaluator
    # too, so the validate-equivalence invariant holds either way.
    _rid = root.get("$id")
    root_base = _rid if isinstance(_rid, str) and _rid else ""

    def canonical(ref: str) -> str:
        uri, _, frag = ref.partition("#")
        if uri and root_base and urljoin(root_base, uri) == root_base:
            return "#" + frag
        return ref

    relocated: dict[str, str] = {}
    new_defs: dict[str, Any] = {}
    existing = root.get("$defs") if isinstance(root.get("$defs"), dict) else {}

    def def_name(ref: str) -> str:
        base = "reloc_" + ref[2:].replace("/", "_").replace("~", "_").replace("%", "_")
        name = base
        i = 0
        while name in existing or name in new_defs:
            i += 1
            name = f"{base}_{i}"
        return name

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("enum", "const"):
                    out[k] = v
                elif k == "$ref" and isinstance(v, str):
                    c = canonical(v)
                    if (
                        c.startswith("#/")
                        and not c.startswith("#/$defs/")
                        # "#/" (any all-slash fragment) resolves to the
                        # root like "#" — a root self-ref survives
                        # re-rooting by construction and must NOT
                        # become a root copy
                        and c[1:].lstrip("/") != ""
                    ):
                        if c not in relocated:
                            name = def_name(c)
                            relocated[c] = name  # set BEFORE walking: cycle-safe
                            new_defs[name] = None
                            new_defs[name] = walk(resolver._resolve_ref(c))
                        out[k] = f"#/$defs/{relocated[c]}"
                    else:
                        # canonicalized form (fragment-only when the
                        # ref's base IS the root resource) — the DNF
                        # output drops $id, so the URI spelling would
                        # dangle
                        out[k] = c
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    out_root = walk(root)
    if new_defs:
        defs = dict(out_root.get("$defs") or {})
        defs.update(new_defs)
        out_root["$defs"] = defs
    return out_root


def normalize(schema: SchemaType) -> dict:
    """Normalize to DNF: {'anyOf': [conjunctive options], '$defs': …}."""
    from fences_spark.schema.evaluator import uses_dynamic_scope

    if contains_opaque(schema) or uses_dynamic_scope(schema):
        # opaque passthrough: skip ref relocation too — its resolver
        # works against the document root and a dynamic-scope doc's
        # pointers may be based in a nested $id resource
        return Normalizer(schema).normalize()
    return Normalizer(_relocate_relative_refs(schema)).normalize()


def check_normalized(s: dict) -> list[str]:
    """Structural invariants of a normalized schema (reference:
    normalize.py:582-633).  Returns a list of violations (empty =
    ok).  Our relaxation: options may carry an 'allOf' of unmergeable
    keyword pairs."""
    problems = []
    if not isinstance(s, dict) or "anyOf" not in s:
        return ["root must be {'anyOf': [...]}"]
    for opt in s["anyOf"]:
        if not isinstance(opt, dict):
            problems.append(f"option not a dict: {opt!r}")
            continue
        for bad in ("not", "if", "then", "else", "oneOf", "dependentRequired", "const", "anyOf"):
            if bad in opt:
                problems.append(f"option contains {bad}")
        if "type" in opt and not isinstance(opt["type"], list):
            problems.append("type not a list")
    return problems
