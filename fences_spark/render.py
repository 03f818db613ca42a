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

    def node(self, label: str, **attrs: str) -> str:
        nid = f"n{self._n}"
        self._n += 1
        parts = [f'label="{_esc(label)}"'] + [f'{k}="{v}"' for k, v in attrs.items()]
        self.lines.append(f"  {nid} [{', '.join(parts)}];")
        return nid

    def edge(self, a: str, b: str, label: str | None = None) -> None:
        suffix = f' [label="{_esc(label)}"]' if label is not None else ""
        self.lines.append(f"  {a} -> {b}{suffix};")


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
