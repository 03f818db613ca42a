"""EBNF-style grammar front end (validator dual of the reference's
grammar dialect).

The reference models grammars as ``Dict[NonTerminal, RightHandSide]``
with combinators ``Terminal`` / ``NonTerminal`` / ``Concatenation``
(``+``) / ``Alternative`` (``|`` or list) / ``Repetition``
(``* (start, stop)``) / ``CharacterRange``, and *generates* valid
sample strings from them (fences/grammar/types.py:5-98,
fences/grammar/convert.py:46-142; valid-only generation per
README.md:485).  Our engine implements the dual at cluster scale:
**decide membership of a string column in the grammar's language**.

Two compilation tiers, chosen automatically:

1. **Regular tier (pure JVM).**  If the nonterminal dependency graph
   is acyclic, the grammar denotes a regular language; we compile it
   to a single Java/RE2/Python-compatible regex and evaluate with
   ``rlike`` under whole-stage codegen — no Python anywhere.  The
   reference's own Repetition semantics (open ``{m,}`` bounds,
   fences/grammar/convert.py:108-115 caps generation at start+3; we
   keep the true unbounded semantics for validation) map 1:1 onto
   regex quantifiers.

2. **Context-free tier (Arrow-vectorized).**  Recursive grammars
   (e.g. the JSON grammar of the reference's own test,
   test/grammar/test_generate.py:30-147) get an Earley recognizer —
   handles any CFG incl. ambiguity and ε-productions — run inside an
   Arrow-batched pandas UDF with per-batch dedup of repeated values.
   This is the sanctioned escape hatch (vectorized Arrow transfer, no
   row-at-a-time Python UDF registration).

Fixture synthesis mirrors the reference: :func:`generate_samples`
emits one valid string per alternative (min-length greedy completion,
the ``generate_paths`` analog), so external acceptors (``json.loads``)
can anchor pytest oracles exactly like
test/grammar/test_generate.py:13-28.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple, Union

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


class GrammarError(Exception):
    pass


# ---------------------------------------------------------------------------
# Dialect model — same combinator surface as the reference
# ---------------------------------------------------------------------------

class RightHandSide:
    def __add__(self, other: "Rhs") -> "Concatenation":
        return Concatenation([self, other])

    def __radd__(self, other: "Rhs") -> "Concatenation":
        return Concatenation([other, self])

    def __or__(self, other: "Rhs") -> "Alternative":
        return Alternative([self, other])

    def __ror__(self, other: "Rhs") -> "Alternative":
        return Alternative([other, self])

    def __mul__(self, bounds: Tuple[int, Optional[int]]) -> "Repetition":
        assert len(bounds) == 2
        return Repetition(self, bounds[0], bounds[1])


class Terminal(RightHandSide):
    def __init__(self, value: str) -> None:
        self.value = value


class NonTerminal(RightHandSide):
    def __init__(self, name: str) -> None:
        self.name = name

    def __hash__(self) -> int:  # usable as Grammar dict key
        return hash(("nt", self.name))

    def __eq__(self, other) -> bool:
        return isinstance(other, NonTerminal) and other.name == self.name


class Concatenation(RightHandSide):
    def __init__(self, elements: List["Rhs"]) -> None:
        self.elements = elements

    def __add__(self, other: "Rhs") -> "Concatenation":
        if isinstance(other, Concatenation):
            return Concatenation(self.elements + other.elements)
        return Concatenation(self.elements + [other])


class Alternative(RightHandSide):
    def __init__(self, elements: List["Rhs"]) -> None:
        self.elements = elements

    def __or__(self, other: "Rhs") -> "Alternative":
        if isinstance(other, Alternative):
            return Alternative(self.elements + other.elements)
        return Alternative(self.elements + [other])


class Repetition(RightHandSide):
    def __init__(self, element: "Rhs", start: int, stop: Optional[int]) -> None:
        if stop is not None and stop < start:
            raise GrammarError("repetition stop < start")
        self.element = element
        self.start = start
        self.stop = stop


class CharacterRange(RightHandSide):
    """Inclusive codepoint range; open ends mean 0 / U+10FFFF.  (The
    reference caps at 0x10FFF, fences/grammar/types.py:73 — a typo'd
    Unicode max that would reject all astral-plane characters; the
    validator uses the true maximum so e.g. emoji inside JSON strings
    validate exactly as ``json.loads`` accepts them.)"""

    UNICODE_MAX = 0x10FFFF

    def __init__(self, start: Optional[str], stop: Optional[str]) -> None:
        self.start = 0 if start is None else ord(start)
        self.stop = self.UNICODE_MAX if stop is None else ord(stop)
        if self.start > self.stop:
            raise GrammarError("range stop before start")


Rhs = Union[RightHandSide, str, list]
Grammar = Dict[Union[NonTerminal, str], Rhs]


# ---------------------------------------------------------------------------
# Normalization → productions over char-level atoms
# ---------------------------------------------------------------------------
# Atom encodings: ("c", ch) single char; ("r", lo, hi) char range;
# ("n", name) nonterminal reference.  Each production is a tuple of
# atoms; each nonterminal owns a list of productions (alternatives).

Atom = Tuple
Productions = Dict[str, List[Tuple[Atom, ...]]]


def _nt_name(key: Union[NonTerminal, str]) -> str:
    return key.name if isinstance(key, NonTerminal) else str(key)


class _Normalizer:
    def __init__(self) -> None:
        self.prods: Productions = {}
        self._aux = 0

    def fresh(self, hint: str) -> str:
        self._aux += 1
        return f"_{hint}{self._aux}"

    def add(self, name: str, seqs: List[Tuple[Atom, ...]]) -> None:
        self.prods.setdefault(name, []).extend(seqs)

    def seq_of(self, rhs: Rhs) -> List[Tuple[Atom, ...]]:
        """Flatten an RHS into its list of alternative atom-sequences,
        introducing auxiliary nonterminals for nested repetition."""
        if isinstance(rhs, str):
            return [tuple(("c", ch) for ch in rhs)]
        if isinstance(rhs, Terminal):
            return self.seq_of(rhs.value)
        if isinstance(rhs, NonTerminal):
            return [(("n", rhs.name),)]
        if isinstance(rhs, CharacterRange):
            return [(("r", rhs.start, rhs.stop),)]
        if isinstance(rhs, list) or isinstance(rhs, Alternative):
            elems = rhs if isinstance(rhs, list) else rhs.elements
            out: List[Tuple[Atom, ...]] = []
            for e in elems:
                out.extend(self.seq_of(e))
            return out
        if isinstance(rhs, Concatenation):
            combos: List[Tuple[Atom, ...]] = [()]
            for e in rhs.elements:
                alts = self.seq_of(e)
                if len(alts) == 1:
                    combos = [c + alts[0] for c in combos]
                else:  # factor nested alternation through an aux nonterminal
                    aux = self.fresh("alt")
                    self.add(aux, alts)
                    combos = [c + (("n", aux),) for c in combos]
            return combos
        if isinstance(rhs, Repetition):
            alts = self.seq_of(rhs.element)
            if len(alts) == 1 and len(alts[0]) == 1:
                unit = alts[0]
            else:
                aux = self.fresh("rep")
                self.add(aux, alts)
                unit = (("n", aux),)
            head = unit * rhs.start
            if rhs.stop is None:
                # unbounded tail: T → ε | unit T
                tail = self.fresh("star")
                self.add(tail, [(), unit + (("n", tail),)])
                return [head + (("n", tail),)]
            # bounded tail: chain of optionals
            extra = rhs.stop - rhs.start
            seq = head
            for _ in range(extra):
                opt = self.fresh("opt")
                self.add(opt, [(), unit + ()])
                seq = seq + (("n", opt),)
            return [seq]
        raise GrammarError(f"unknown RHS element: {rhs!r}")


def to_productions(grammar: Grammar, start: Union[NonTerminal, str]) -> Tuple[Productions, str]:
    norm = _Normalizer()
    for key, rhs in grammar.items():
        norm.add(_nt_name(key), norm.seq_of(rhs))
    start_name = _nt_name(start)
    if start_name not in norm.prods:
        raise GrammarError(f"start nonterminal {start_name!r} not defined")
    for name, seqs in norm.prods.items():
        for seq in seqs:
            for atom in seq:
                if atom[0] == "n" and atom[1] not in norm.prods:
                    raise GrammarError(f"undefined nonterminal {atom[1]!r} in {name!r}")
    return norm.prods, start_name


def _is_recursive(prods: Productions) -> bool:
    # cycle detection over the nonterminal dependency graph
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {n: WHITE for n in prods}
    def visit(n: str) -> bool:
        color[n] = GRAY
        for seq in prods[n]:
            for atom in seq:
                if atom[0] == "n":
                    c = color[atom[1]]
                    if c == GRAY:
                        return True
                    if c == WHITE and visit(atom[1]):
                        return True
        color[n] = BLACK
        return False
    return any(color[n] == WHITE and visit(n) for n in list(prods))


# ---------------------------------------------------------------------------
# Tier 1: acyclic grammar → regex (Java/RE2/Python common subset)
# ---------------------------------------------------------------------------

_CLASS_ESCAPE = set("\\]^-[&")


def _class_char(cp: int) -> str:
    ch = chr(cp)
    if ch in _CLASS_ESCAPE:
        return "\\" + ch
    if cp < 0x20 or cp == 0x7F:
        # \xNN (two hex digits) parses in Java regex, RE2 AND Python
        # re; the \x{...} form is Java/RE2-only and breaks the
        # driver-side accepts() path
        return "\\x%02x" % cp
    return ch


def _range_class(lo: int, hi: int) -> str:
    if lo == hi:
        return re.escape(chr(lo))
    return f"[{_class_char(lo)}-{_class_char(hi)}]"


def _rhs_nt_deps(rhs: Rhs, out: set) -> None:
    """Collect nonterminal names referenced by an RHS tree."""
    if isinstance(rhs, NonTerminal):
        out.add(rhs.name)
    elif isinstance(rhs, Concatenation):
        for e in rhs.elements:
            _rhs_nt_deps(e, out)
    elif isinstance(rhs, Alternative):
        for e in rhs.elements:
            _rhs_nt_deps(e, out)
    elif isinstance(rhs, list):
        for e in rhs:
            _rhs_nt_deps(e, out)
    elif isinstance(rhs, Repetition):
        _rhs_nt_deps(rhs.element, out)


def grammar_is_recursive(grammar: Grammar) -> bool:
    """Cycle detection on the ORIGINAL nonterminal graph (not the
    normalized productions: unbounded Repetition desugars into a
    self-recursive tail there, which would misclassify every `{m,}`
    grammar as recursive and cost it the pure-JVM regex tier)."""
    deps: Dict[str, set] = {}
    for key, rhs in grammar.items():
        s: set = set()
        _rhs_nt_deps(rhs, s)
        deps[_nt_name(key)] = s
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {n: WHITE for n in deps}

    def visit(n: str) -> bool:
        color[n] = GRAY
        for m in deps.get(n, ()):
            c = color.get(m, BLACK)
            if c == GRAY:
                return True
            if c == WHITE and visit(m):
                return True
        color[n] = BLACK
        return False

    return any(color[n] == WHITE and visit(n) for n in list(deps))


def regex_of(grammar: Grammar, start: Union[NonTerminal, str]) -> str:
    """Compile an **acyclic** grammar to an unanchored regex body by
    walking the raw RHS tree — bounded AND unbounded Repetition map to
    native quantifiers ({m,n} / {m,}).  Raises GrammarError on
    recursion among nonterminals."""
    if grammar_is_recursive(grammar):
        raise GrammarError("grammar is recursive; regex tier unavailable")
    by_name: Dict[str, Rhs] = {_nt_name(k): v for k, v in grammar.items()}
    start_name = _nt_name(start)
    if start_name not in by_name:
        raise GrammarError(f"start nonterminal {start_name!r} not defined")
    memo: Dict[str, str] = {}

    def nt(name: str) -> str:
        if name not in by_name:
            raise GrammarError(f"undefined nonterminal {name!r}")
        if name not in memo:
            memo[name] = rx(by_name[name])
        return memo[name]

    def group(body: str) -> str:
        return "(?:" + body + ")"

    def rx(rhs: Rhs) -> str:
        if isinstance(rhs, str):
            return re.escape(rhs)
        if isinstance(rhs, Terminal):
            return re.escape(rhs.value)
        if isinstance(rhs, NonTerminal):
            return group(nt(rhs.name))
        if isinstance(rhs, CharacterRange):
            return _range_class(rhs.start, rhs.stop)
        if isinstance(rhs, list) or isinstance(rhs, Alternative):
            elems = rhs if isinstance(rhs, list) else rhs.elements
            return group("|".join(rx(e) for e in elems))
        if isinstance(rhs, Concatenation):
            return "".join(rx(e) for e in rhs.elements)
        if isinstance(rhs, Repetition):
            body = group(rx(rhs.element))
            if rhs.stop is None:
                return body + "{%d,}" % rhs.start
            return body + "{%d,%d}" % (rhs.start, rhs.stop)
        raise GrammarError(f"unknown RHS element: {rhs!r}")

    return nt(start_name)


# ---------------------------------------------------------------------------
# Tier 2: Earley recognizer (any CFG, ε-productions, ambiguity)
# ---------------------------------------------------------------------------

def _nullable_set(prods: Productions) -> set:
    nullable: set = set()
    changed = True
    while changed:
        changed = False
        for name, seqs in prods.items():
            if name in nullable:
                continue
            for seq in seqs:
                if all(a[0] == "n" and a[1] in nullable for a in seq):
                    nullable.add(name)
                    changed = True
                    break
    return nullable


def earley_accepts(prods: Productions, start: str, s: str,
                   nullable: Optional[set] = None) -> bool:
    """Earley recognition with the Aycock–Horspool nullable fix."""
    if nullable is None:
        nullable = _nullable_set(prods)
    n = len(s)
    # item: (name, alt_index, dot, origin)
    charts: List[set] = [set() for _ in range(n + 1)]
    ROOT = "\x00root"
    all_prods = dict(prods)
    all_prods[ROOT] = [((("n", start),))]
    for i, _seq in enumerate(all_prods[ROOT]):
        charts[0].add((ROOT, i, 0, 0))

    for pos in range(n + 1):
        chart = charts[pos]
        work = list(chart)
        while work:
            item = work.pop()
            name, ai, dot, origin = item
            seq = all_prods[name][ai]
            if dot < len(seq):
                atom = seq[dot]
                if atom[0] == "n":
                    # predict
                    for bi in range(len(all_prods[atom[1]])):
                        new = (atom[1], bi, 0, pos)
                        if new not in chart:
                            chart.add(new)
                            work.append(new)
                    if atom[1] in nullable:  # nullable advance
                        new = (name, ai, dot + 1, origin)
                        if new not in chart:
                            chart.add(new)
                            work.append(new)
                elif pos < n:
                    # scan
                    ch = s[pos]
                    ok = (atom[0] == "c" and ch == atom[1]) or \
                         (atom[0] == "r" and atom[1] <= ord(ch) <= atom[2])
                    if ok:
                        charts[pos + 1].add((name, ai, dot + 1, origin))
            else:
                # complete
                for parent in list(charts[origin]):
                    pname, pai, pdot, porigin = parent
                    pseq = all_prods[pname][pai]
                    if pdot < len(pseq) and pseq[pdot] == ("n", name):
                        new = (pname, pai, pdot + 1, porigin)
                        if new not in chart:
                            chart.add(new)
                            work.append(new)
    return any(it[0] == ROOT and it[2] == 1 for it in charts[n])


# ---------------------------------------------------------------------------
# Compiled surface
# ---------------------------------------------------------------------------

class CompiledGrammar:
    """Validator for one grammar: `.column(col)` yields a Boolean
    Column (NULL input → false, matching RuleSet null semantics)."""

    def __init__(self, grammar: Grammar, start: Union[NonTerminal, str] = "start") -> None:
        self.prods, self.start = to_productions(grammar, start)
        # tier choice keys off the ORIGINAL nonterminal graph: an
        # unbounded Repetition desugars to a self-recursive tail in
        # self.prods but is a plain {m,} quantifier in regex
        self.is_recursive = grammar_is_recursive(grammar)
        self.regex: Optional[str] = None
        if not self.is_recursive:
            self.regex = regex_of(grammar, start)
        self._nullable = _nullable_set(self.prods)

    # -- driver-side (tests / fixtures) -------------------------------------
    def accepts(self, s: str) -> bool:
        if self.regex is not None:
            return re.fullmatch(self.regex, s) is not None
        return earley_accepts(self.prods, self.start, s, self._nullable)

    # -- Spark --------------------------------------------------------------
    def column(self, col: Column) -> Column:
        if self.regex is not None:
            # \A..\z anchors: exact full match in both Java and RE2
            # (Java $ would tolerate a trailing newline)
            return F.coalesce(col.rlike("\\A(?:" + self.regex + ")\\z"), F.lit(False))
        prods, start, nullable = self.prods, self.start, self._nullable

        from pyspark.sql.types import BooleanType

        @F.pandas_udf(BooleanType())
        def _match(ser: pd.Series) -> pd.Series:
            uniq = {}
            for v in ser.dropna().unique():
                uniq[v] = earley_accepts(prods, start, v, nullable)
            return ser.map(lambda v: uniq.get(v, False) if v is not None else False)

        return _match(col)

    def sql_full_match(self, expr: str) -> str:
        """DuckDB oracle predicate for the regex tier."""
        if self.regex is None:
            raise GrammarError("recursive grammar has no single-regex oracle")
        rx = "\\A(?:" + self.regex + ")\\z"
        return f"regexp_matches({expr}, '{rx.replace(chr(39), chr(39)*2)}')"


# ---------------------------------------------------------------------------
# Fixture synthesis: one valid sample per alternative (generate_paths analog)
# ---------------------------------------------------------------------------

def generate_samples(grammar: Grammar, start: Union[NonTerminal, str] = "start",
                     max_samples: int = 200) -> List[str]:
    """Valid-only generation mirroring the reference (README.md:485):
    cover every alternative of every nonterminal at least once, each
    sample completed by greedy min-length derivation."""
    prods, start_name = to_productions(grammar, start)

    # min-length per nonterminal (Dijkstra-ish fixpoint; None = unreachable)
    INF = float("inf")
    minlen: Dict[str, float] = {n: INF for n in prods}
    changed = True
    while changed:
        changed = False
        for name, seqs in prods.items():
            for seq in seqs:
                total = 0.0
                for a in seq:
                    total += 1 if a[0] in ("c", "r") else minlen[a[1]]
                    if total == INF:
                        break
                if total < minlen[name]:
                    minlen[name] = total
                    changed = True

    samples: List[str] = []
    seen: set = set()
    for name, seqs in prods.items():
        for ai, seq in enumerate(seqs):
            if len(samples) >= max_samples:
                break
            if minlen[name] == INF:
                continue
            # derive the start symbol, steering one derivation through
            # (name, ai): only feasible directly when name is reachable
            # on a min path — cheap approximation: derive name via alt ai,
            # embedded at the start if name==start, else skip embedding
            # and record the local fragment only when start reaches name.
            if any(minlen[a[1]] == INF if a[0] == "n" else False for a in seq):
                continue
            out: List[str] = []
            ok = _emit_through(prods, minlen, start_name, name, ai, out)
            if not ok:
                continue
            s = "".join(out)
            if s not in seen:
                seen.add(s)
                samples.append(s)
    return samples


def _emit_through(prods: Productions, minlen, cur: str, target: str,
                  target_alt: int, out: List[str], depth: int = 0,
                  used: bool = False) -> bool:
    """Greedy derivation of `cur` that routes through alternative
    `target_alt` of `target` exactly once if reachable; min-length
    everywhere else.  Returns True if the target alternative was used."""
    if depth > 200:
        return used

    reach: Dict[str, bool] = {}

    def reaches(name: str, seen_: frozenset = frozenset()) -> bool:
        if name == target:
            return True
        if name in reach:
            return reach[name]
        if name in seen_:
            return False
        r = any(a[0] == "n" and reaches(a[1], seen_ | {name})
                for seq in prods[name] for a in seq)
        reach[name] = r
        return r

    if cur == target and not used:
        seq = prods[cur][target_alt]
        used = True
    else:
        # prefer a min-cost alternative; if target not yet used, prefer
        # one whose nonterminals can reach the target
        def cost(seq):
            return sum(1 if a[0] in ("c", "r") else minlen[a[1]] for a in seq)
        cands = sorted(range(len(prods[cur])), key=lambda i: cost(prods[cur][i]))
        pick = cands[0]
        if not used:
            for i in cands:
                if any(a[0] == "n" and reaches(a[1]) for a in prods[cur][i]):
                    pick = i
                    break
        seq = prods[cur][pick]

    for a in seq:
        if a[0] == "c":
            out.append(a[1])
        elif a[0] == "r":
            out.append(chr(a[1]))
        else:
            sub_used = _emit_through(prods, minlen, a[1], target, target_alt,
                                     out, depth + 1, used)
            used = used or sub_used
    return used
