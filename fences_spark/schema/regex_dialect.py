"""fences regex-dialect front end.

The reference defines a regex dialect (grammar at
/root/reference/bin/regex.lark:1-113, consumed by
fences/regex/parse.py) whose constructs — concatenation, alternation,
groups, quantifiers, character classes/groups, anchors, escapes — are
a common subset of Python ``re``, Java ``java.util.regex`` (Spark
``rlike``) and RE2 (DuckDB ``regexp_matches``).  On top of that, the
reference's *normalizer* produces two extensions when merging or
inverting patterns (fences/json_schema/normalize.py:154 and :97):

- conjunction:  ``(a)&(b)``  — the string must match both a and b
- negation:     ``!(x)``     — the string must not match x

Neither is expressible in a single Java regex without lookaheads, so
we split them at compile time into a conjunct list; the Spark compiler
turns the list into ``rlike(a) & rlike(b) & ~rlike(x)`` — one
whole-stage-codegen'd JVM expression, no UDF.

Semantics note: draft-2020-12 ``pattern`` is an unanchored *search*
(Python ``re.search``), which is exactly what ``rlike`` and DuckDB
``regexp_matches`` do, so translated leaves pass through unchanged.
(The reference's own regex test oracle uses prefix ``re.match``
semantics for *generated* strings, /root/reference/test/regex/
test_parse.py:18-20 — that is a generation concern, not evaluation.)
"""

from __future__ import annotations

# (regex, negated) conjuncts; regex is Python/RE2-portable — wrap with
# to_java_regex() before handing to Spark rlike
Conjunct = tuple[str, bool]


def to_java_regex(rx: str) -> str:
    """Prepare a dialect conjunct for Java ``rlike``: Java's
    ``\\w \\d \\s \\b`` are ASCII-only by default while the oracle
    (Python ``re``, per draft-2020-12 ECMA semantics) is Unicode-aware —
    ``(?U)`` (UNICODE_CHARACTER_CLASS) aligns them.  The flag is
    Java-only: never feed the result to RE2 (DuckDB) or Python."""
    return "(?U)" + rx


def _strip_outer_parens(p: str) -> str:
    """Remove one pair of outer parens if they wrap the whole pattern."""
    if not (p.startswith("(") and p.endswith(")")):
        return p
    if p.startswith("(?"):
        return p  # non-capturing/flag group — stripping breaks syntax
    depth = 0
    for i, ch in enumerate(p):
        if ch == "\\":
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0 and i != len(p) - 1:
                return p  # outer paren closes early; not a full wrap
    return p[1:-1]


def _split_top_level_amp(p: str) -> list[str]:
    """Split ``(a)&(b)&(c)`` on top-level ``&`` (outside any group or
    character class, not escaped)."""
    parts: list[str] = []
    depth = 0
    in_class = False
    cur: list[str] = []
    i = 0
    while i < len(p):
        ch = p[i]
        if ch == "\\" and i + 1 < len(p):
            cur.append(p[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            cur.append(ch)
        elif ch == "[":
            in_class = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "&" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def compile_dialect_pattern(pattern: str) -> list[Conjunct]:
    """Compile a fences-dialect pattern into ``[(regex, negated), ...]``
    conjuncts, each a plain Java/RE2/Python-compatible regex evaluated
    with search semantics.  The instance matches iff every
    non-negated conjunct matches and no negated conjunct matches."""
    out: list[Conjunct] = []
    for part in _split_top_level_amp(pattern):
        part = part.strip()
        negated = False
        # alternately unwrap redundant (…) wrappers left by the
        # merger and !(…) negation markers until fixpoint
        while True:
            if part.startswith("!(") and part.endswith(")"):
                inner = _strip_outer_parens(part[1:])
                if inner != part[1:]:
                    part = inner
                    negated = not negated
                    continue
            stripped = _strip_outer_parens(part)
            if stripped != part and stripped:
                part = stripped
                continue
            break
        out.append((part, negated))
    return out
