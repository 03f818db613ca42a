"""Set-cover path-minimal sample generation — the reference's headline
algorithm, re-derived.

fences builds a decision graph per schema and emits "as many paths
until all nodes in the graph are reached" (reference
fences/core/node.py:220-264 ``generate_paths``): transitions are
distance-labeled by a forward BFS from the root (``_analyze_forwards``,
node.py:197-204) and a backward satisfiability distance from valid
leaves (``_analyze_backwards``, node.py:206-218); each round greedily
targets an uncovered leaf, walks backward to the root along minimal
``_len_to_root`` transitions (node.py:161-175), then forward again,
steering every off-path decision toward the nearest valid leaf so the
emitted instance crosses at most the one fence it targets
(``_generate``/``_forward``, node.py:128-196).  One path covers many
nodes at once, so the sample set is a greedy set cover of the graph —
far fewer samples than the product of per-keyword candidates, while
still guaranteeing every boundary (leaf) and every OR-branch is
exercised at least once.

This module is that algorithm rebuilt on our own graph model (not a
port of the C-like node classes):

* ``GLeaf``    — a concrete value fence (or the ABSENT sentinel that
  drops an object key), with a local validity *intent*.
* ``GAlt``     — choose exactly one child (anyOf/oneOf branches, the
  per-position candidate pool, present-vs-absent for a property).
  fences' plain ``Decision`` (all_transitions=False).
* ``GSeq``     — take all children and combine their values
  (object = one child per property (+ optional extra-key slot),
  array = one child per item slot).  fences' ``Decision`` with
  all_transitions=True; the combiner replaces the mutating
  ``apply()``/KeyReference protocol (json_schema/parse.py:16-106).

``$ref`` targets are memoized so the graph is a DAG exactly where the
reference's is (shared subtrees are covered once, not per call site).
The emitted instance is always labeled by the full Evaluator — the
leaf intent only *steers* generation; masked violations (e.g. an
invalid branch value that another anyOf branch accepts) keep their
true label, same contract as schema/generate.py.

Leaf value pools come from the per-keyword boundary candidates in
schema/generate.py, so coverage is a superset of the enumeration
generator's; what this module adds is the reference's minimality and
combination guarantee.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterator

from fences_spark.schema.evaluator import Evaluator, SchemaType
from fences_spark.schema.generate import generate_candidates

__all__ = [
    "ABSENT",
    "GAlt",
    "GLeaf",
    "GNode",
    "GSeq",
    "PathEntry",
    "build_graph",
    "covering_samples",
    "generate_paths",
]

_INF = float("inf")


class _Absent:
    """Sentinel leaf value: omit this key / item slot entirely."""

    def __repr__(self) -> str:  # pragma: no cover
        return "ABSENT"


ABSENT = _Absent()

# caps keeping graphs small on adversarial schemas (the reference
# bounds recursion through its normalize/ref handling instead)
_MAX_DEPTH = 5
_MAX_LEAVES_PER_ALT = 48
_MAX_ARRAY_SLOTS = 3


class GNode:
    __slots__ = ("incoming", "len_to_root", "len_to_valid")

    def __init__(self) -> None:
        # (parent, child_idx) pairs — a DAG via $ref memoization
        self.incoming: list[tuple["GNode", int]] = []
        self.len_to_root: float = _INF
        self.len_to_valid: float = _INF


class GLeaf(GNode):
    __slots__ = ("value", "intent_valid")

    def __init__(self, value: Any, intent_valid: bool) -> None:
        super().__init__()
        self.value = value
        self.intent_valid = intent_valid
        self.len_to_valid = 0 if intent_valid else _INF


class GAlt(GNode):
    """Choose exactly one child."""

    __slots__ = ("children",)

    def __init__(self, children: list[GNode]) -> None:
        super().__init__()
        self.children = children
        for idx, c in enumerate(children):
            c.incoming.append((self, idx))


class GSeq(GNode):
    """Take all children in order; ``combine`` builds the value."""

    __slots__ = ("children", "kind", "keys")

    def __init__(self, children: list[GNode], kind: str, keys: list[str] | None = None) -> None:
        super().__init__()
        self.children = children
        self.kind = kind  # "object" | "array"
        self.keys = keys or []
        for idx, c in enumerate(children):
            c.incoming.append((self, idx))

    def combine(self, vals: list[Any]) -> Any:
        if self.kind == "object":
            return {k: v for k, v in zip(self.keys, vals) if not isinstance(v, _Absent)}
        return [v for v in vals if not isinstance(v, _Absent)]


@dataclass
class PathEntry:
    """One generated sample: the assembled instance, its true label
    (Evaluator verdict), the targeted leaf's intent, and the decision
    path (consumed pre-order, fences node.py:96-126 ``execute``)."""

    value: Any
    expected_valid: bool
    target_intent_valid: bool
    path: list[int] = field(default_factory=list)


# ---------------------------------------------------------------------------
# graph construction
# ---------------------------------------------------------------------------


def _leaf_pool(schema: SchemaType, ev: Evaluator, depth: int) -> list[GLeaf]:
    """Per-position fence leaves from the boundary-candidate
    enumerator, intent-labeled by the sub-schema's local verdict."""
    cands = generate_candidates(schema, ev, depth)[:_MAX_LEAVES_PER_ALT]
    leaves = []
    for v in cands:
        try:
            ok = ev.validate(v, schema)
        except Exception:
            ok = False
        leaves.append(GLeaf(v, ok))
    return leaves or [GLeaf(None, False)]


def _types_of(s: dict) -> list[str] | None:
    ts = s.get("type")
    if ts is None:
        return None
    return [ts] if isinstance(ts, str) else list(ts)


def _build(schema: SchemaType, ev: Evaluator, depth: int, memo: dict[str, GNode]) -> GNode:
    if not isinstance(schema, dict) or depth >= _MAX_DEPTH:
        return GAlt(list(_leaf_pool(schema, ev, depth)))

    s = schema
    alts: list[GNode] = []
    ts = _types_of(s)

    # compositional object: one slot per declared property, so one
    # path can cross a fence in property A while holding B valid —
    # the combination coverage enumeration alone cannot give
    props = s.get("properties")
    if isinstance(props, dict) and props and (ts is None or "object" in ts):
        required = set(s.get("required", []))
        keys: list[str] = []
        children: list[GNode] = []
        for key in list(props)[:12]:
            sub = props[key]
            keys.append(key)
            present = _ref_build(sub, ev, depth + 1, memo)
            absent = GLeaf(ABSENT, key not in required)
            children.append(GAlt([present, absent]))
        for key in sorted(required - set(props))[:4]:
            keys.append(key)
            children.append(GAlt([_build(True, ev, depth + 1, memo), GLeaf(ABSENT, False)]))
        ap = s.get("additionalProperties")
        if ap is False:
            keys.append("x~extra")
            children.append(GAlt([GLeaf(ABSENT, True), GLeaf("zzz", False)]))
        elif isinstance(ap, dict):
            keys.append("x~extra")
            children.append(GAlt([GLeaf(ABSENT, True), _ref_build(ap, ev, depth + 1, memo)]))
        alts.append(GSeq(children, "object", keys))

    # compositional array: minItems-many mandatory item slots
    items = s.get("items")
    if isinstance(items, (dict, bool)) and (ts is None or "array" in ts):
        n = max(int(s.get("minItems", 0) or 0), 1)
        n = min(n, _MAX_ARRAY_SLOTS)
        slots = [_ref_build(items, ev, depth + 1, memo) for _ in range(n)]
        alts.append(GSeq(slots, "array"))

    # OR branches: each branch subgraph is an alternative — the cover
    # guarantee then forces >=1 path through every branch
    for combo in ("anyOf", "oneOf"):
        for sub in s.get(combo, []):
            if isinstance(sub, (dict, bool)):
                alts.append(_ref_build(sub, ev, depth + 1, memo))

    # the per-keyword boundary fences (whole-instance candidates)
    alts.extend(_leaf_pool(s, ev, depth))
    if len(alts) == 1:
        return alts[0]
    return GAlt(alts)


def _ref_build(schema: SchemaType, ev: Evaluator, depth: int, memo: dict[str, GNode]) -> GNode:
    """Build with $ref memoization → shared subgraphs, like the
    reference's Reference.resolve (core/node.py:53-94)."""
    if isinstance(schema, dict) and set(schema) == {"$ref"}:
        # key by actual depth: recursion terminates via _MAX_DEPTH
        # (depth strictly increases per nesting level); same-depth
        # call sites (e.g. sibling array slots) share one subgraph
        key = f"{schema['$ref']}@{depth}"
        if key in memo:
            return memo[key]
        try:
            target = ev._resolve_ref(schema["$ref"])
        except Exception:
            return GAlt(list(_leaf_pool(schema, ev, depth)))
        node = _build(target, ev, depth, memo)
        memo[key] = node
        return node
    return _build(schema, ev, depth, memo)


def build_graph(schema: SchemaType, ev: Evaluator | None = None) -> GNode:
    ev = ev or Evaluator(schema)
    root = _ref_build(schema, ev, 0, {})
    _analyze(root)
    return root


# ---------------------------------------------------------------------------
# distance labeling (fences node.py:197-218)
# ---------------------------------------------------------------------------


def _iter_nodes(root: GNode) -> Iterator[GNode]:
    seen: set[int] = set()
    stack = [root]
    while stack:
        n = stack.pop()
        if id(n) in seen:
            continue
        seen.add(id(n))
        yield n
        if isinstance(n, (GAlt, GSeq)):
            stack.extend(n.children)


def _analyze(root: GNode) -> None:
    nodes = list(_iter_nodes(root))

    # forward BFS: len_to_root
    for n in nodes:
        n.len_to_root = _INF
    root.len_to_root = 0
    frontier = [root]
    while frontier:
        nxt = []
        for n in frontier:
            if isinstance(n, (GAlt, GSeq)):
                for c in n.children:
                    if c.len_to_root > n.len_to_root + 1:
                        c.len_to_root = n.len_to_root + 1
                        nxt.append(c)
        frontier = nxt

    # backward satisfiability distance: len_to_valid
    # Alt = 1 + min(children); Seq = 1 + max(children) (all must hold).
    # Fixpoint iteration — the DAG may interleave Alt/Seq arbitrarily.
    for n in nodes:
        if not isinstance(n, GLeaf):
            n.len_to_valid = _INF
    changed = True
    while changed:
        changed = False
        for n in nodes:
            if isinstance(n, GAlt):
                d = 1 + min((c.len_to_valid for c in n.children), default=_INF)
            elif isinstance(n, GSeq):
                d = 1 + max((c.len_to_valid for c in n.children), default=_INF)
            else:
                continue
            if d < n.len_to_valid:
                n.len_to_valid = d
                changed = True


# ---------------------------------------------------------------------------
# greedy path cover (fences node.py:128-264)
# ---------------------------------------------------------------------------


def _gen_min(node: GNode, path: list[int], covered: set[int]) -> None:
    """Steer toward the nearest valid leaf (fences _generate)."""
    covered.add(id(node))
    if isinstance(node, GLeaf):
        return
    if isinstance(node, GSeq):
        for c in node.children:
            _gen_min(c, path, covered)
        return
    best, best_d = 0, _INF
    for idx, c in enumerate(node.children):
        if c.len_to_valid < best_d:
            best, best_d = idx, c.len_to_valid
    path.append(best)
    _gen_min(node.children[best], path, covered)


def _backward(leaf: GNode) -> list[tuple[GNode, int]]:
    """Minimal-len_to_root chain leaf→root as (parent, child_idx),
    returned root-first (fences _backward, node.py:161-175)."""
    chain: list[tuple[GNode, int]] = []
    node = leaf
    while node.incoming:
        parent, idx = min(node.incoming, key=lambda pi: pi[0].len_to_root)
        chain.append((parent, idx))
        node = parent
    chain.reverse()
    return chain


def _forward(node: GNode, chain: list[tuple[GNode, int]], ci: int,
             path: list[int], covered: set[int]) -> None:
    """Follow the backward chain down, generating minimal-valid
    everywhere off-path (fences _forward, node.py:177-196)."""
    covered.add(id(node))
    if isinstance(node, GLeaf):
        return
    on_path = ci < len(chain) and chain[ci][0] is node
    if isinstance(node, GSeq):
        for idx, c in enumerate(node.children):
            if on_path and idx == chain[ci][1]:
                _forward(c, chain, ci + 1, path, covered)
            else:
                _gen_min(c, path, covered)
        return
    if on_path:
        idx = chain[ci][1]
        path.append(idx)
        _forward(node.children[idx], chain, ci + 1, path, covered)
    else:
        _gen_min(node, path, covered)


def _execute(node: GNode, path: list[int], i: int) -> tuple[int, Any]:
    """Assemble the instance by consuming the path pre-order
    (fences execute, node.py:96-126)."""
    if isinstance(node, GLeaf):
        return i, node.value
    if isinstance(node, GSeq):
        vals = []
        for c in node.children:
            i, v = _execute(c, path, i)
            vals.append(v)
        return i, node.combine(vals)
    idx = path[i]
    return _execute(node.children[idx], path, i + 1)


def generate_paths(root: GNode, ev: Evaluator) -> Iterator[PathEntry]:
    """Greedy set cover: emit paths until every leaf is covered,
    valid-intent leaves first — the reference's generate_paths loop
    (node.py:220-264)."""
    valid_leaves = [n for n in _iter_nodes(root) if isinstance(n, GLeaf) and n.intent_valid]
    invalid_leaves = [n for n in _iter_nodes(root) if isinstance(n, GLeaf) and not n.intent_valid]
    to_visit: list[GLeaf] = valid_leaves + invalid_leaves

    while to_visit:
        target = to_visit[0]
        chain = _backward(target)
        path: list[int] = []
        covered: set[int] = set()
        _forward(root, chain, 0, path, covered)
        i, value = _execute(root, path, 0)
        assert i == len(path), "path not fully consumed"
        try:
            label = bool(ev.validate(value))
        except Exception:
            label = False
        yield PathEntry(value, label, target.intent_valid, path)
        to_visit = [n for n in to_visit if id(n) not in covered]


def covering_samples(schema: SchemaType) -> list[tuple[Any, bool]]:
    """The path-cover dual of generate.generate_samples: a labeled,
    deduplicated covering sample set.  Every graph leaf (and so every
    boundary candidate and every anyOf/oneOf branch) is exercised by
    at least one sample; instances are labeled by the full Evaluator."""
    ev = Evaluator(schema)
    root = build_graph(schema, ev)
    out: list[tuple[Any, bool]] = []
    seen: set[str] = set()
    for entry in generate_paths(root, ev):
        try:
            key = f"{type(entry.value).__name__}:{json.dumps(entry.value, sort_keys=True)}"
        except (TypeError, ValueError):
            continue
        if key in seen:
            continue
        seen.add(key)
        out.append((entry.value, entry.expected_valid))
    return out
