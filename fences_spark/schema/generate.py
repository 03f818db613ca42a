"""Boundary-sample generator — the fixture oracle.

The reference enumerates decision-graph paths to produce a minimal
set of valid samples plus invalid samples that each cross exactly one
constraint boundary ("placing fences", /root/reference/README.md:4-12,
fences/core/node.py:220-264).  We re-derive that behavior as direct
recursive boundary synthesis (not a port): for every keyword we emit
the boundary-valid and boundary-violating candidate values the
reference's per-keyword generators imply (e.g. minimum → m and m-1,
fences/json_schema/parse.py:402-431; minLength → n and n-1 chars,
parse.py:302-335; enum → members and the guaranteed-miss string,
parse.py:219-232), then label every candidate with the reference
evaluator.  The labeled set is the ground truth the Spark predicates
must reproduce exactly — a diagonal confusion matrix
(fences/core/util.py:86-153, test_generate.py:26-36).

Candidates whose evaluator label disagrees with the *intent* (e.g. a
violation masked by an anyOf branch) are still kept — the label is
what matters, not the intent.
"""

from __future__ import annotations

import itertools
import re
from typing import Any

from fences_spark.schema.evaluator import Evaluator, SchemaType, format_regex
from fences_spark.schema.regex_dialect import compile_dialect_pattern

# canned valid/invalid strings per format — mirrors the reference's
# format-sample table (fences/json_schema/parse.py:134-171)
FORMAT_SAMPLES: dict[str, tuple[str, str]] = {
    "email": ("user@example.com", "not-an-email"),
    "hostname": ("example.com", "-bad_host-"),
    "ipv4": ("192.168.0.1", "999.999.1.1"),
    "ipv6": ("2001:db8::1", "zz::g"),
    "uuid": ("123e4567-e89b-12d3-a456-426614174000", "not-a-uuid"),
    "date": ("2024-01-31", "31/01/2024"),
    "time": ("13:45:30Z", "1:99"),
    "datetime": ("2024-01-31T13:45:30Z", "yesterday noon"),
    "date-time": ("2024-01-31T13:45:30Z", "yesterday noon"),
    "duration": ("P1DT2H", "1 day"),
    "byte": ("aGVsbG8=", "!!!not-base64!!!"),
}


# ---------------------------------------------------------------------------
# tiny regex sampler for the dialect subset (concat, |, groups,
# quantifiers, classes, ranges) — the generation dual of
# fences/regex/parse.py, re-derived from the regex grammar itself.
# ---------------------------------------------------------------------------

_CLASS_SAMPLE = {"w": "a", "W": "-", "d": "7", "D": "x", "s": " ", "S": "x"}


def _sample_class(body: str) -> str:
    """First concrete char of a [...] body (negation: pick something
    not excluded — best-effort, evaluator relabels anyway)."""
    if body.startswith("^"):
        pool = "aZ9-_./:@ !"
        try:
            rx = re.compile(f"[{body}]")
            for ch in pool:
                if rx.match(ch):
                    return ch
        except re.error:
            pass
        return "a"
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            return _CLASS_SAMPLE.get(nxt, nxt)
        if i + 2 < len(body) and body[i + 1] == "-":
            return ch  # range start
        return ch
    return "a"


def sample_regex(pattern: str, max_len: int = 64) -> str | None:
    """Produce one string matching ``pattern`` (dialect subset), or
    None if the pattern uses constructs the sampler doesn't cover.
    The caller always verifies with re.search."""
    out: list[str] = []
    i = 0
    n = len(pattern)

    def repeat_last(unit: str, min_n: int) -> None:
        out.append(unit * min_n)

    last_unit = ""
    while i < n:
        c = pattern[i]
        if c in "^$":
            i += 1
            continue
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            last_unit = _CLASS_SAMPLE.get(nxt, nxt)
            out.append(last_unit)
            i += 2
            continue
        if c == "[":
            j = pattern.find("]", i + 1)
            while j != -1 and pattern[j - 1] == "\\":
                j = pattern.find("]", j + 1)
            if j == -1:
                return None
            last_unit = _sample_class(pattern[i + 1 : j])
            out.append(last_unit)
            i = j + 1
            continue
        if c == "(":
            # find matching paren
            depth = 0
            j = i
            while j < n:
                if pattern[j] == "\\":
                    j += 2
                    continue
                if pattern[j] == "(":
                    depth += 1
                elif pattern[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j >= n:
                return None
            inner = pattern[i + 1 : j]
            if inner.startswith("?:"):
                inner = inner[2:]
            elif inner.startswith("?"):
                return None  # lookarounds unsupported
            # alternation: take the first top-level branch
            branch = _first_branch(inner)
            sub = sample_regex(branch, max_len)
            if sub is None:
                return None
            last_unit = sub
            out.append(sub)
            i = j + 1
            continue
        if c == "|":
            # top-level alternation: what we built so far is a full match
            break
        if c in "*+?{":
            if not out:
                return None
            out_last = out.pop()
            unit = last_unit if last_unit else out_last
            prefix = out_last[: len(out_last) - len(unit)] if out_last.endswith(unit) else out_last
            if c == "*":
                out.append(prefix)
                i += 1
            elif c == "+":
                out.append(prefix + unit)
                i += 1
            elif c == "?":
                out.append(prefix)
                i += 1
            else:
                j = pattern.find("}", i)
                if j == -1:
                    return None
                spec = pattern[i + 1 : j]
                m = spec.split(",")[0]
                try:
                    cnt = int(m) if m else 0
                except ValueError:
                    return None
                out.append(prefix + unit * cnt)
                i = j + 1
            continue
        if c == ".":
            last_unit = "x"
            out.append("x")
            i += 1
            continue
        last_unit = c
        out.append(c)
        i += 1
    s = "".join(out)
    return s[: max_len * 4]


def _first_branch(p: str) -> str:
    depth = 0
    i = 0
    while i < len(p):
        c = p[i]
        if c == "\\":
            i += 2
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            return p[:i]
        i += 1
    return p


def sample_matching(pattern: str) -> str | None:
    """A string satisfying the full dialect pattern (all conjuncts,
    no negated hit), verified with the evaluator's own matcher."""
    conjuncts = compile_dialect_pattern(pattern)
    positives = [rx for rx, neg in conjuncts if not neg]
    base = sample_regex(positives[0]) if positives else "sample"
    if base is None:
        return None
    ok = all(re.search(rx, base) for rx, neg in conjuncts if not neg) and not any(
        re.search(rx, base) for rx, neg in conjuncts if neg
    )
    return base if ok else None


# ---------------------------------------------------------------------------
# candidate synthesis
# ---------------------------------------------------------------------------

_GENERIC_POOL: list[Any] = [None, True, False, 0, 1, -1, 3.5, "", "x", "hello world",
                            [], [1, 2], {}, {"k": 1}]


def _string_candidates(s: dict) -> list[Any]:
    out: list[Any] = []
    if "minLength" in s:
        n = int(s["minLength"])
        out += ["x" * n, "x" * max(n - 1, 0)]
    if "maxLength" in s:
        n = int(s["maxLength"])
        out += ["y" * n, "y" * (n + 1)]
    if "pattern" in s:
        m = sample_matching(s["pattern"])
        if m is not None:
            out.append(m)
        out += ["definitely no match ###", ""]
    if "format" in s and s["format"] in FORMAT_SAMPLES:
        good, bad = FORMAT_SAMPLES[s["format"]]
        out += [good, bad]
    if "contentEncoding" in s or "contentMediaType" in s or "contentSchema" in s:
        out += _content_candidates(s)
    if not out:
        out = ["sample-string", ""]
    return out


def _content_candidates(s: dict) -> list[str]:
    """Boundary strings for the content* assertions: decodable /
    non-decodable base64, JSON / non-JSON payloads, and (when a
    contentSchema is present) payloads built from its own boundary
    candidates — labels come from the evaluator as always."""
    import base64 as _b64
    import json as _json

    payloads: list[str] = ['{"k": 1}', "not json", ""]
    if "contentSchema" in s and isinstance(s["contentSchema"], (dict, bool)):
        sub = s["contentSchema"]
        ev = Evaluator(sub)
        for cand in generate_candidates(sub, ev)[:8]:
            try:
                payloads.append(_json.dumps(cand))
            except (TypeError, ValueError):
                continue
    out: list[str] = []
    if s.get("contentEncoding") == "base64":
        out += [_b64.b64encode(p.encode("utf-8")).decode("ascii") for p in payloads]
        out += ["!!!not-base64!!!", "aGVsbG8", _b64.b64encode(b"\xff\xfe").decode("ascii")]
        # cross-tier parity traps: non-canonical padding bits ("aa=="
        # decodes but re-encodes to "aQ=="), embedded whitespace, and
        # base64 of a non-JSON-constant payload
        out += ["aa==", "aGVs bG8=", "aGVsbG8=\n", _b64.b64encode(b"NaN").decode("ascii")]
    else:
        out += payloads
        # python json.loads accepts NaN/Infinity; strict JSON must not
        out += ["NaN", "Infinity", '{"k": NaN}', " {} ", "[1, 2,]"]
    return out


def _number_candidates(s: dict) -> list[Any]:
    out: list[Any] = []
    for k, deltas in (
        ("minimum", (0, -1, 1, -0.001)),
        ("maximum", (0, 1, -1, 0.001)),
        ("exclusiveMinimum", (0, 1, 0.001)),
        ("exclusiveMaximum", (0, -1, -0.001)),
    ):
        if k in s:
            base = float(s[k])
            out += [base + d for d in deltas]
    for k in ("multipleOf", "NOT_multipleOf"):
        if k in s:
            m = float(s[k])
            lo = float(s.get("minimum", s.get("exclusiveMinimum", 0)))
            snap = (int(lo / m) + 1) * m if m else lo
            out += [snap, snap + m, snap + m / 2 if m else snap, snap + 1]
    if not out:
        out = [0, 1, -7, 3.5, 1e6]
    # integers where possible (exercise the integer/number lattice)
    out += [int(x) for x in out if float(x).is_integer()]
    return out


def _array_candidates(s: dict, ev: Evaluator, depth: int) -> list[Any]:
    items = s.get("items", s.get("contains", True))
    elem_pool = [c for c in generate_candidates(items if isinstance(items, (dict, bool)) else True, ev, depth + 1)]
    good_elems = [e for e in elem_pool if ev.validate(e, items if isinstance(items, (dict, bool)) else True)] or [1]
    bad_elems = [e for e in elem_pool if not ev.validate(e, items if isinstance(items, (dict, bool)) else True)]
    sizes = {0, 1, 2}
    for k in ("minItems", "maxItems", "minContains", "maxContains"):
        if k in s:
            v = int(s[k])
            sizes |= {max(v - 1, 0), v, v + 1}
    out: list[Any] = []
    for n in sorted(sizes):
        out.append((good_elems * (n // len(good_elems) + 1))[:n])
    if bad_elems:
        out.append([bad_elems[0]])
        out.append([good_elems[0], bad_elems[0]])
    if "contains" in s:
        c = s["contains"]
        c_goods = [e for e in elem_pool if ev.validate(e, c)]
        if c_goods:
            lo = int(s.get("minContains", 1))
            hi = int(s.get("maxContains", lo + 1))
            filler = [e for e in good_elems if not ev.validate(e, c)]
            for n in {max(lo - 1, 0), lo, hi, hi + 1}:
                arr = (c_goods * (n // len(c_goods) + 1))[:n]
                out.append(arr)
                if filler:
                    out.append(arr + [filler[0]])
    if "prefixItems" in s:
        pref = []
        for sub in s["prefixItems"]:
            cands = generate_candidates(sub, ev, depth + 1)
            goods = [c for c in cands if ev.validate(c, sub)]
            pref.append(goods[0] if goods else "x")
        out.append(pref)
        if pref:
            bads = [c for c in generate_candidates(s["prefixItems"][0], ev, depth + 1)
                    if not ev.validate(c, s["prefixItems"][0])]
            if bads:
                out.append([bads[0]] + pref[1:])
    if s.get("uniqueItems") or s.get("NOT_uniqueItems"):
        g = good_elems[0]
        out += [[g, g], [g]]
    if "unevaluatedItems" in s:
        # fences at the unevaluated boundary: the prefix alone, and
        # the prefix plus one extra item drawn from the
        # unevaluatedItems schema's own candidates (labels from the
        # evaluator, which tracks evaluated-item annotations)
        base = []
        for sub in s.get("prefixItems", []):
            goods = [c for c in generate_candidates(sub, ev, depth + 1)
                     if ev.validate(c, sub)]
            base.append(goods[0] if goods else 1)
        ui = s["unevaluatedItems"]
        pool = generate_candidates(ui if isinstance(ui, (dict, bool)) else True, ev, depth + 1)
        out.append(list(base))
        for e in (pool[:4] or ["zz"]):
            out.append(base + [e])
    return out


def _object_candidates(s: dict, ev: Evaluator, depth: int) -> list[Any]:
    props: dict[str, Any] = s.get("properties", {})
    required = list(s.get("required", []))
    keys = list(dict.fromkeys(list(props) + required))
    good: dict[str, Any] = {}
    per_key_bad: dict[str, Any] = {}
    for k in keys:
        sub = props.get(k, True)
        cands = generate_candidates(sub, ev, depth + 1)
        goods = [c for c in cands if ev.validate(c, sub)]
        bads = [c for c in cands if not ev.validate(c, sub)]
        good[k] = goods[0] if goods else 1
        if bads:
            per_key_bad[k] = bads[0]
    out: list[Any] = [dict(good), {}]
    for k in required:  # omit one required key at a time
        out.append({kk: v for kk, v in good.items() if kk != k})
    for k, bad in per_key_bad.items():  # corrupt one property at a time
        d = dict(good)
        d[k] = bad
        out.append(d)
    if ("additionalProperties" in s or "maxProperties" in s
            or "patternProperties" in s or "unevaluatedProperties" in s):
        d = dict(good)
        d["zz_extra_key"] = "extra"
        out.append(d)
        d2 = dict(good)
        d2["zz_extra_key"] = 123456
        out.append(d2)
    if "unevaluatedProperties" in s:
        # extra keys drawn from the unevaluatedProperties schema's own
        # candidate fences (evaluator labels them via annotations)
        up = s["unevaluatedProperties"]
        pool = generate_candidates(up if isinstance(up, (dict, bool)) else True, ev, depth + 1)
        for c in pool[:4]:
            out.append({**good, "zz_uneval": c})
    if "minProperties" in s:
        n = int(s["minProperties"])
        pool = {f"k{i}": i for i in range(n + 1)}
        out += [dict(itertools.islice(pool.items(), n)),
                dict(itertools.islice(pool.items(), max(n - 1, 0)))]
    for trigger, needed in s.get("dependentRequired", {}).items():
        d = dict(good)
        d[trigger] = good.get(trigger, 1)
        for kk in needed:
            d[kk] = good.get(kk, 1)
        out.append(dict(d))
        d2 = dict(d)
        for kk in needed:
            d2.pop(kk, None)
        out.append(d2)
    for pat, sub in s.get("patternProperties", {}).items():
        # one key matching the pattern, with a conforming and a
        # violating value (pattern fences, evaluator decides verdicts)
        key = _sample_for_pattern(pat)
        if key is not None:
            cands = generate_candidates(sub, ev, depth + 1)
            goods = [c for c in cands if ev.validate(c, sub)]
            bads = [c for c in cands if not ev.validate(c, sub)]
            if goods:
                out.append({**good, key: goods[0]})
            if bads:
                out.append({**good, key: bads[0]})
    if "propertyNames" in s:
        sub = s["propertyNames"]
        name_cands = [c for c in generate_candidates(sub, ev, depth + 1)
                      if isinstance(c, str)]
        ok_names = [c for c in name_cands if ev.validate(c, sub)]
        bad_names = [c for c in name_cands if not ev.validate(c, sub)]
        if ok_names:
            out.append({**good, ok_names[0]: 1})
        if bad_names:
            out.append({**good, bad_names[0]: 1})
    for trigger, sub in s.get("dependentSchemas", {}).items():
        base = dict(good)
        base[trigger] = good.get(trigger, 1)
        out.append(dict(base))
        # whole-object variants from the dependent schema's own fences
        for cand in _object_candidates(sub, ev, depth + 1) if isinstance(sub, dict) else []:
            if isinstance(cand, dict):
                out.append({**cand, trigger: base[trigger]})
    return out


def _sample_for_pattern(pat: str) -> str | None:
    """A short string matching ``pat`` — literal prefix heuristic
    good enough for the fixture patterns (^-anchored literals)."""
    import re as _re

    literal = pat.lstrip("^").rstrip("$")
    if _re.escape(literal) == literal and literal:
        candidate = literal
    else:
        candidate = literal.replace("[a-z]", "a").replace("[0-9]", "1")
        candidate = candidate.replace("+", "").replace("*", "")
    try:
        if _re.search(pat, candidate):
            return candidate
    except _re.error:
        return None
    return None


def generate_candidates(schema: SchemaType, ev: Evaluator | None = None, depth: int = 0) -> list[Any]:
    """All boundary candidates for ``schema`` (unlabeled)."""
    if ev is None:
        ev = Evaluator(schema)
    if depth > 6:
        return [1, "x", None]
    if schema is True or schema is False:
        return list(_GENERIC_POOL)
    s = schema
    out: list[Any] = []
    if "enum" in s:
        out += list(s["enum"])
        # the guaranteed-miss sample (reference: parse.py:229 uses
        # '#'*(maxlen+1) — longer than any member)
        longest = max((len(str(e)) for e in s["enum"]), default=1)
        out.append("#" * (longest + 1))
    if "NOT_enum" in s:
        out += list(s["NOT_enum"]) + ["something-else"]
    if "const" in s:
        out += [s["const"], "#not-const#"]
    if "NOT_const" in s:
        out += [s["NOT_const"], "#not-const#"]

    ts = s.get("type")
    ts = [ts] if isinstance(ts, str) else (list(ts) if ts else None)

    if ts is None or any(t in ("number", "integer") for t in ts) or any(
        k in s for k in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf", "NOT_multipleOf")
    ):
        out += _number_candidates(s)
    if ts is None or "string" in ts or any(
        k in s for k in ("minLength", "maxLength", "pattern", "format",
                         "contentEncoding", "contentMediaType", "contentSchema")
    ):
        out += _string_candidates(s)
    if ts is None or "array" in ts or any(
        k in s for k in ("items", "prefixItems", "contains", "minItems", "maxItems",
                         "uniqueItems", "unevaluatedItems")
    ):
        out += _array_candidates(s, ev, depth)
    if ts is None or "object" in ts or any(
        k in s for k in ("properties", "required", "additionalProperties", "minProperties",
                         "maxProperties", "dependentRequired", "patternProperties",
                         "propertyNames", "dependentSchemas", "unevaluatedProperties")
    ):
        out += _object_candidates(s, ev, depth)
    if ts and "boolean" in ts:
        out += [True, False]
    if ts and "null" in ts:
        out.append(None)

    for combo_key in ("anyOf", "allOf", "oneOf"):
        for sub in s.get(combo_key, []):
            if isinstance(sub, (dict, bool)):
                out += generate_candidates(sub, ev, depth + 1)
    if "allOf" in s:
        # conjunction needs candidates satisfying ALL branches: merge
        # the per-branch valid dicts (union of keys)
        merged: dict[str, Any] = {}
        merged_ok = True
        for sub in s["allOf"]:
            if not isinstance(sub, (dict, bool)):
                merged_ok = False
                break
            goods = [c for c in generate_candidates(sub, ev, depth + 1)
                     if isinstance(c, dict) and ev.validate(c, sub)]
            if goods:
                merged.update(goods[0])
        if merged_ok and merged:
            out.append(merged)
    if "not" in s and isinstance(s["not"], (dict, bool)):
        out += generate_candidates(s["not"], ev, depth + 1)
    for cond_key in ("if", "then", "else"):
        if cond_key in s and isinstance(s[cond_key], (dict, bool)):
            out += generate_candidates(s[cond_key], ev, depth + 1)
    if "$ref" in s and depth <= 6:
        try:
            out += generate_candidates(ev._resolve_ref(s["$ref"]), ev, depth + 1)
        except Exception:
            pass

    out += [None, True, 0, "", [], {}]

    # dedupe by canonical form, preserving order
    import json as _json

    seen: set[str] = set()
    uniq = []
    for v in out:
        try:
            key = _json.dumps(v, sort_keys=True)
        except (TypeError, ValueError):
            continue
        tag = f"{type(v).__name__}:{key}"  # keep 1 vs True vs 1.0 distinct
        if tag not in seen:
            seen.add(tag)
            uniq.append(v)
    return uniq


def generate_samples(schema: SchemaType) -> list[tuple[Any, bool]]:
    """Labeled boundary samples: [(value, expected_valid), ...].
    Every candidate is labeled by the reference evaluator — the
    ground truth Spark must reproduce exactly."""
    ev = Evaluator(schema)
    return [(v, ev.validate(v)) for v in generate_candidates(schema, ev)]
