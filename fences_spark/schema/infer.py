"""Schema inference: turn a JSON path/type profile into a
draft-2020-12 schema — closing the loop with the validators
(data → profile → schema → RuleSet).

The heavy lifting is distributed (`operators.jsonprofile.
json_path_profile` — one variant-explode pass over the corpus); this
module consumes the resulting (path, jtype, n, n_docs) relation,
whose row count is the SCHEMA size, not the data size, so collecting
it to the driver is metadata-scale by construction (same argument as
reading a snapshot log).

Inference policy (pinned by tests/test_infer.py):

- a path observed with one type gets that type; multiple observed
  types become ``{"type": [...]}`` — with per-type object/array
  facets lifted into ``anyOf`` when a structured type is among them;
- an object property is ``required`` iff it appears in EVERY object
  occurrence of its parent (Σ over the child's types of n equals the
  parent's object-occurrence n);
- array ``items`` comes from the collapsed ``[]`` child; an array
  with no observed elements gets no ``items`` constraint;
- schemas stay OPEN (no ``additionalProperties: false``): inference
  from a sample must not reject unseen-but-legal keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STRUCTURED = ("object", "array")


def _parse_path(path: str) -> list[str]:
    """'$' → []; '$.a.b[]' → ['a', 'b', '[]'] (keys are alnum by the
    profiler's construction — the profile renders dots/brackets only
    as step separators)."""
    assert path.startswith("$"), path
    steps: list[str] = []
    buf = ""
    for ch in path[1:]:
        if ch == ".":
            if buf:
                steps.append(buf)
            buf = ""
        elif ch == "[":
            if buf:
                steps.append(buf)
            buf = "["
        elif ch == "]":
            assert buf == "[", path
            steps.append("[]")
            buf = ""
        else:
            buf += ch
    if buf:
        steps.append(buf)
    return steps


class _Node:
    def __init__(self) -> None:
        self.types: dict[str, int] = {}  # jtype -> n occurrences
        self.children: dict[str, _Node] = {}  # key or '[]' -> node
        self.enum: list | None = None  # observed closed value set

    def child(self, step: str) -> "_Node":
        return self.children.setdefault(step, _Node())


def infer_schema(
    profile: DataFrame | list,
    *,
    values: DataFrame | list | None = None,
    enum_max_cardinality: int | None = None,
) -> dict | bool:
    """Build a draft-2020-12 schema dict from a profile produced by
    :func:`fences_spark.operators.jsonprofile.json_path_profile`
    (a DataFrame, or pre-collected rows with the same four fields).
    An empty profile (no valid JSON at all) yields ``True`` — the
    schema that accepts anything, since nothing was observed.

    With ``values`` (a :func:`json_value_profile` result) and
    ``enum_max_cardinality`` set, a scalar-only path whose observed
    distinct values number at most the bound gets an ``enum``
    constraint.  Caller contract: generate the value profile with
    ``top_k > enum_max_cardinality`` — a field truncated at top_k then
    shows more than the bound and is correctly rejected, so a
    truncated sample can never produce a too-tight enum."""
    import json as _json

    rows = profile.collect() if isinstance(profile, DataFrame) else profile
    root = _Node()
    for r in rows:
        node = root
        for step in _parse_path(r["path"] if not isinstance(r, tuple) else r[0]):
            node = node.child(step)
        jtype = r["jtype"] if not isinstance(r, tuple) else r[1]
        n = int(r["n"] if not isinstance(r, tuple) else r[2])
        node.types[jtype] = node.types.get(jtype, 0) + n
    if not root.types:
        return True
    if values is not None and enum_max_cardinality is not None:
        vrows = values.collect() if isinstance(values, DataFrame) else values
        by_path: dict[str, list] = {}
        for r in vrows:
            by_path.setdefault(r["path"], []).append(r["value"])
        for path, texts in by_path.items():
            if len(texts) > enum_max_cardinality:
                continue
            node = root
            try:
                for step in _parse_path(path):
                    node = node.children[step]
            except KeyError:
                continue  # value row for a path the type profile lacks
            if any(t in _STRUCTURED for t in node.types):
                continue  # enum only for scalar-only paths
            node.enum = sorted(
                (_json.loads(t) for t in texts),
                key=lambda v: _json.dumps(v),
            )
    return _schema_of(root)


def _facet(node: _Node, jtype: str) -> dict:
    """Schema fragment for ONE observed type of a node."""
    out: dict = {"type": jtype}
    if jtype == "object":
        props = {}
        required = []
        parent_n = node.types.get("object", 0)
        for key, child in sorted(node.children.items()):
            if key == "[]":
                continue
            props[key] = _schema_of(child)
            if parent_n > 0 and sum(child.types.values()) == parent_n:
                required.append(key)
        if props:
            out["properties"] = props
        if required:
            out["required"] = required
    elif jtype == "array":
        elem = node.children.get("[]")
        if elem is not None and elem.types:
            out["items"] = _schema_of(elem)
    return out


def _schema_of(node: _Node) -> dict:
    types = sorted(node.types)
    if len(types) == 1:
        out = _facet(node, types[0])
    elif any(t in _STRUCTURED for t in types):
        # mixed structured/scalar: per-type facets under anyOf so the
        # object/array constraints only bind their own type
        return {"anyOf": [_facet(node, t) for t in types]}
    else:
        out = {"type": types}
    if node.enum is not None:
        out["enum"] = node.enum
    return out
