"""DOT rendering of compiled rule sets — the analog of the
reference's decision-graph visualizer (fences/core/render.py:28-40,
which renders Decision/Leaf/Reference nodes via pydot).

Our engine never materializes a decision graph; its compiled artifact
is the normalized DNF predicate tree per rule.  This renders that
tree with the same visual vocabulary: rectangles for decision nodes
(OR across ``anyOf`` options, AND within an option — the reference's
``all_transitions`` flag, core/node.py:284), plain leaves per
constraint keyword, and yellow reference nodes for ``$defs`` links
(core/render.py:20-23).  Emits a plain DOT string (no pydot
dependency); feed it to graphviz if installed.
"""

from __future__ import annotations

import json
from typing import Any

from fences_spark.schema.normalize import normalize

_STRUCTURAL = {"anyOf", "$defs", "$ref"}


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


class _Dot:
    def __init__(self) -> None:
        self.lines: list[str] = []
        self._n = 0
        # structured duals of the DOT text, for the SVG layout
        self.nodes: dict[str, dict[str, str]] = {}
        self.edges: list[tuple[str, str, str | None]] = []

    def node(self, label: str, **attrs: str) -> str:
        nid = f"n{self._n}"
        self._n += 1
        parts = [f'label="{_esc(label)}"'] + [f'{k}="{v}"' for k, v in attrs.items()]
        self.lines.append(f"  {nid} [{', '.join(parts)}];")
        self.nodes[nid] = {"label": label, **attrs}
        return nid

    def edge(self, a: str, b: str, label: str | None = None) -> None:
        suffix = f' [label="{_esc(label)}"]' if label is not None else ""
        self.lines.append(f"  {a} -> {b}{suffix};")
        self.edges.append((a, b, label))


def _schema_nodes(dot: _Dot, schema: Any, defs_ids: dict[str, str]) -> str:
    if schema is True or schema == {}:
        return dot.node("true", color="green")
    if schema is False:
        return dot.node("false", color="red")
    ref = schema.get("$ref")
    if ref is not None:
        key = ref.rsplit("/", 1)[-1] or ref  # root self-ref "#/" keeps the pointer
        nid = dot.node(f"-> {key}", fillcolor="yellow", style="filled")
        if key in defs_ids:
            dot.edge(nid, defs_ids[key], label="$ref")
        return nid
    options = schema.get("anyOf", [schema])
    if "anyOf" in schema and not options:
        # NORM_FALSE: an empty disjunction accepts nothing
        return dot.node("false", color="red")
    if len(options) > 1:
        or_id = dot.node("OR", shape="rect")
        for idx, opt in enumerate(options):
            dot.edge(or_id, _option_nodes(dot, opt, defs_ids), label=str(idx))
        return or_id
    return _option_nodes(dot, options[0], defs_ids)


def _option_nodes(dot: _Dot, opt: Any, defs_ids: dict[str, str]) -> str:
    if not isinstance(opt, dict):
        return _schema_nodes(dot, opt, defs_ids)
    if "$ref" in opt:
        return _schema_nodes(dot, opt, defs_ids)
    keywords = {k: v for k, v in opt.items() if k not in _STRUCTURAL}
    if not keywords:
        # NORM_TRUE option: no constraints ⇒ always-valid leaf
        return dot.node("true", color="green")
    and_id = dot.node("ALL", shape="rect")
    for k, v in keywords.items():
        if k in ("properties", "items", "prefixItems", "contains",
                 "additionalProperties", "patternProperties",
                 "dependentSchemas") and isinstance(v, (dict, list, bool)):
            subs = (v.items() if isinstance(v, dict) and k in (
                        "properties", "patternProperties", "dependentSchemas")
                    else enumerate(v) if isinstance(v, list)
                    else [("", v)])
            for name, sub in subs:
                kid = dot.node(f"{k}[{name}]" if name != "" else k, shape="rect")
                dot.edge(and_id, kid)
                dot.edge(kid, _schema_nodes(dot, sub, defs_ids))
        else:
            leaf = dot.node(f"{k}: {json.dumps(v, default=str)[:40]}")
            dot.edge(and_id, leaf)
    return and_id


def _emit_schema(dot: _Dot, schema: Any, root_label: str) -> None:
    """Normalize one schema and emit its $defs subgraphs plus a
    doubleoctagon root pointing at the DNF tree."""
    norm = normalize(schema)
    defs_ids: dict[str, str] = {}
    for key in norm.get("$defs", {}):
        defs_ids[key] = dot.node(f"$defs/{key}", shape="rect",
                                 fillcolor="lightgray", style="filled")
    for key, sub in norm.get("$defs", {}).items():
        dot.edge(defs_ids[key], _schema_nodes(dot, sub, defs_ids))
    root = dot.node(root_label, shape="doubleoctagon")
    dot.edge(root, _schema_nodes(dot, {k: v for k, v in norm.items()
                                       if k != "$defs"}, defs_ids))


def _render(dot: _Dot) -> str:
    return "digraph rules {\n" + "\n".join(dot.lines) + "\n}\n"


def schema_dot(schema: Any, name: str = "rule") -> str:
    """DOT digraph of one rule's normalized DNF tree."""
    dot = _Dot()
    _emit_schema(dot, schema, name)
    return _render(dot)


def ruleset_dot(ruleset) -> str:
    """One digraph for a whole RuleSet: a doubleoctagon root per rule
    labeled ``rule_id @ column [mode]``."""
    dot = _Dot()
    for r in ruleset.rules:
        _emit_schema(dot, r.schema, f"{r.rule_id} @ {r.column} [{r.mode}]")
    return _render(dot)


# ---------------------------------------------------------------------------
# SVG rendering (no graphviz/pydot — pure-python layered layout)
# ---------------------------------------------------------------------------
#
# The reference rasterizes its decision graph through pydot → graphviz
# (core/render.py:28-40) and degrades gracefully when pydot is absent.
# This sandbox has neither, so the raster path is a small built-in
# layered layout: BFS levels from the roots, nodes ordered by first
# visit, straight edges with arrowheads.  Not graphviz-quality — but a
# real image with the same visual vocabulary (rect decisions, yellow
# $ref nodes, green/red boolean leaves).

_CHAR_W = 7.2        # monospace-ish label width estimate, px/char
_NODE_H = 26
_H_GAP = 18
_V_GAP = 52


def _xesc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace('"', "&quot;"))


def _svg_layout(dot: _Dot) -> str:
    nodes, edges = dot.nodes, dot.edges
    if not nodes:
        return '<svg xmlns="http://www.w3.org/2000/svg" width="10" height="10"/>'
    indeg = {nid: 0 for nid in nodes}
    adj: dict[str, list[str]] = {nid: [] for nid in nodes}
    for a, b, _ in edges:
        adj[a].append(b)
        indeg[b] += 1
    roots = [nid for nid in nodes if indeg[nid] == 0] or [next(iter(nodes))]
    # BFS min-depth levels; $ref back-links can form cycles, so a node
    # keeps its first (shallowest) level
    level: dict[str, int] = {}
    frontier = list(roots)
    for r in roots:
        level[r] = 0
    while frontier:
        nxt: list[str] = []
        for nid in frontier:
            for child in adj[nid]:
                if child not in level:
                    level[child] = level[nid] + 1
                    nxt.append(child)
        frontier = nxt
    for nid in nodes:  # disconnected safety
        level.setdefault(nid, 0)

    by_level: dict[int, list[str]] = {}
    for nid in nodes:  # dict preserves creation order = DFS emit order
        by_level.setdefault(level[nid], []).append(nid)

    pos: dict[str, tuple[float, float, float]] = {}  # x-center, y-top, width
    width = 0.0
    for lvl in sorted(by_level):
        x = _H_GAP
        for nid in by_level[lvl]:
            w = max(36.0, len(nodes[nid]["label"]) * _CHAR_W + 16)
            pos[nid] = (x + w / 2, _V_GAP / 2 + lvl * (_NODE_H + _V_GAP), w)
            x += w + _H_GAP
        width = max(width, x)
    height = _V_GAP / 2 + (max(by_level) + 1) * (_NODE_H + _V_GAP)

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width:.0f}" '
        f'height="{height:.0f}" font-family="monospace" font-size="12">',
        '<defs><marker id="arr" viewBox="0 0 10 10" refX="9" refY="5" '
        'markerWidth="7" markerHeight="7" orient="auto-start-reverse">'
        '<path d="M 0 0 L 10 5 L 0 10 z"/></marker></defs>',
    ]
    for a, b, lbl in edges:
        ax, ay, _ = pos[a]
        bx, by, _ = pos[b]
        y1, y2 = ay + _NODE_H, by
        if by <= ay:  # back/side edge (e.g. $ref into an earlier level)
            y1, y2 = ay + _NODE_H / 2, by + _NODE_H / 2
        out.append(
            f'<line x1="{ax:.1f}" y1="{y1:.1f}" x2="{bx:.1f}" y2="{y2:.1f}" '
            'stroke="black" marker-end="url(#arr)"/>'
        )
        if lbl is not None:
            mx, my = (ax + bx) / 2, (y1 + y2) / 2 - 3
            out.append(f'<text x="{mx:.1f}" y="{my:.1f}" fill="gray">{_xesc(lbl)}</text>')
    for nid, attrs in nodes.items():
        x, y, w = pos[nid]
        fill = attrs.get("fillcolor", "white")
        stroke = attrs.get("color", "black")
        shape = attrs.get("shape", "ellipse")
        label = _xesc(attrs["label"])
        if shape in ("rect", "doubleoctagon"):
            out.append(
                f'<rect x="{x - w / 2:.1f}" y="{y:.1f}" width="{w:.1f}" '
                f'height="{_NODE_H}" fill="{fill}" stroke="{stroke}"/>'
            )
            if shape == "doubleoctagon":
                out.append(
                    f'<rect x="{x - w / 2 - 3:.1f}" y="{y - 3:.1f}" width="{w + 6:.1f}" '
                    f'height="{_NODE_H + 6}" fill="none" stroke="{stroke}"/>'
                )
        else:
            out.append(
                f'<ellipse cx="{x:.1f}" cy="{y + _NODE_H / 2:.1f}" rx="{w / 2:.1f}" '
                f'ry="{_NODE_H / 2}" fill="{fill}" stroke="{stroke}"/>'
            )
        out.append(
            f'<text x="{x:.1f}" y="{y + _NODE_H / 2 + 4:.1f}" '
            f'text-anchor="middle">{label}</text>'
        )
    out.append("</svg>")
    return "\n".join(out)


def schema_svg(schema: Any, name: str = "rule") -> str:
    """SVG image of one rule's normalized DNF tree."""
    dot = _Dot()
    _emit_schema(dot, schema, name)
    return _svg_layout(dot)


def ruleset_svg(ruleset) -> str:
    """SVG image of a whole RuleSet (one root per rule)."""
    dot = _Dot()
    for r in ruleset.rules:
        _emit_schema(dot, r.schema, f"{r.rule_id} @ {r.column} [{r.mode}]")
    return _svg_layout(dot)
