"""DOT rendering of compiled rule trees — visual vocabulary parity
with the reference's graph renderer (fences/core/render.py:6-40:
rect decisions, ALL tag, yellow $ref nodes, green/red leaves)."""

import re

from fences_spark.render import ruleset_dot, schema_dot


def _balanced(dot: str) -> bool:
    return dot.count("{") == dot.count("}") and dot.startswith("digraph")


def test_simple_conjunction():
    dot = schema_dot({"type": "string", "minLength": 1, "pattern": "^a+$"})
    assert _balanced(dot)
    assert 'label="ALL"' in dot            # AND decision (all_transitions)
    assert "minLength: 1" in dot
    assert "pattern:" in dot


def test_anyof_renders_or_with_indexed_edges():
    dot = schema_dot({"anyOf": [{"type": "string"}, {"type": "number", "minimum": 0}]})
    assert 'label="OR"' in dot
    assert '[label="0"]' in dot and '[label="1"]' in dot


def test_boolean_schemas_green_red():
    assert 'color="green"' in schema_dot(True)
    assert 'color="red"' in schema_dot({"anyOf": [False]})


def test_root_self_ref_yellow_no_infinite_descent():
    dot = schema_dot({"type": "object", "properties": {"child": {"$ref": "#/"}}})
    assert _balanced(dot)
    assert 'fillcolor="yellow"' in dot
    assert re.search(r'label="-> #/"', dot)


def test_defs_recursion_links_back_to_def_subgraph():
    schema = {"$defs": {"node": {"type": "object",
                                 "properties": {"next": {"$ref": "#/$defs/node"}}}},
              "$ref": "#/$defs/node"}
    dot = schema_dot(schema)
    assert _balanced(dot)
    assert "$defs/node" in dot
    # both the root and the def body point at the SAME def node via
    # yellow reference leaves — the cycle renders finitely
    assert dot.count('fillcolor="yellow"') == 2
    assert dot.count('[label="$ref"]') == 2


def test_ruleset_dot_one_root_per_rule(spark):
    from fences_spark.compiler.ruleset import RuleSet

    rs = (RuleSet()
          .add("a", "x", {"type": "string"})
          .add("b", "y", {"type": "number", "minimum": 0}, mode="typed"))
    dot = ruleset_dot(rs)
    assert _balanced(dot)
    assert dot.count("doubleoctagon") == 2
    assert "a @ x [typed]" in dot and "b @ y [typed]" in dot


# ---------------------------------------------------------------------------
# SVG rendering (built-in layered layout — the raster path the
# reference reaches through pydot/graphviz, core/render.py:28-40)
# ---------------------------------------------------------------------------

from fences_spark.render import ruleset_svg, schema_svg  # noqa: E402


def _is_svg(s: str) -> bool:
    return s.startswith("<svg") and s.rstrip().endswith("</svg>") and "xmlns" in s


def test_svg_simple_conjunction():
    svg = schema_svg({"type": "string", "minLength": 1, "pattern": "^a+$"})
    assert _is_svg(svg)
    assert ">ALL<" in svg
    assert "minLength: 1" in svg
    # every node drew a shape and a label
    assert svg.count("<text") >= svg.count("<rect") - 1


def test_svg_boolean_colors():
    assert 'stroke="green"' in schema_svg(True)
    assert 'stroke="red"' in schema_svg({"anyOf": [False]})


def test_svg_ref_is_yellow_and_edges_have_arrowheads():
    svg = schema_svg(
        {"$defs": {"node": {"type": "object",
                            "properties": {"next": {"$ref": "#/$defs/node"}}}},
         "$ref": "#/$defs/node"}
    )
    assert _is_svg(svg)
    assert 'fill="yellow"' in svg
    assert 'marker-end="url(#arr)"' in svg
    # recursive $ref must not loop the layout
    assert svg.count("<svg") == 1


def test_svg_escapes_labels():
    svg = schema_svg({"pattern": '<a>&"b"'})
    assert "&lt;a&gt;" in svg and "&amp;" in svg


def test_ruleset_svg_multi_root():
    from fences_spark.compiler.ruleset import Rule, RuleSet

    rs = RuleSet([
        Rule("r1", "lang", {"enum": ["py", "go"]}, mode="typed"),
        Rule("r2", "content", {"type": "string", "minLength": 1}, mode="typed"),
    ])
    svg = ruleset_svg(rs)
    assert _is_svg(svg)
    assert "r1 @ lang [typed]" in svg and "r2 @ content [typed]" in svg
