"""JVM builtin XML tier (from_xml + lexical predicates): verdict
parity with the Arrow-tier oracle (``validate_xml`` — ElementTree
shred + evaluator) over mutation corpora for every XSD test shape,
plus tier routing.

XSD validation is lexical, so the builtin tier checks XSD lexical
spaces by regex before casting — the evaluator's ``_leaf_coerce``
restated as Column algebra.  Cross-tier traps covered: duplicated
maxOccurs=1 children (array-wrapped fields keep them visible),
whitespace around numbers vs inside strings, empty text nodes,
malformed documents, missing/fixed attributes, choice cardinality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fences_spark.schema.xsd import (
    compile_xml,
    compile_xml_udf,
    parse_xsd,
    validate_xml,
)
from test_xsd import (
    CHOICE_XSD,
    ENUM_BOUNDS_XSD,
    INVALID_PERSONS,
    PERSON_XSD,
    SIMPLE_CONTENT_XSD,
    VALID_PERSON,
)

ORDER_XSD = """
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="order">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="priority">
          <xs:simpleType><xs:restriction base="xs:string">
            <xs:pattern value="[1-5]-[A-Z ]+"/></xs:restriction></xs:simpleType>
        </xs:element>
        <xs:element name="total">
          <xs:simpleType><xs:restriction base="xs:double">
            <xs:minExclusive value="0"/></xs:restriction></xs:simpleType>
        </xs:element>
        <xs:element name="item" minOccurs="0" maxOccurs="3">
          <xs:simpleType><xs:restriction base="xs:string">
            <xs:minLength value="1"/></xs:restriction></xs:simpleType>
        </xs:element>
      </xs:sequence>
      <xs:attribute name="id" use="required">
        <xs:simpleType><xs:restriction base="xs:positiveInteger"/></xs:simpleType>
      </xs:attribute>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""

ORDER_DOCS = [
    "<order id='7'><priority>3-HIGH</priority><total>5.5</total></order>",
    "<order id='7'><priority>3-HIGH</priority><total>5.5</total><item>a</item><item>b</item></order>",
    "<order id='7'><priority>3-HIGH</priority><total>5.5</total>"
    "<item>a</item><item>a</item><item>a</item><item>a</item></order>",
    "<order id='7'><priority>3-HIGH</priority><total>-5.5</total></order>",
    "<order id='0'><priority>3-HIGH</priority><total>5.5</total></order>",
    "<order><priority>3-HIGH</priority><total>5.5</total></order>",
    "<order id='7'><priority>9-BAD</priority><total>5.5</total></order>",
    "<order id='7'><total>5.5</total></order>",
    # duplicated maxOccurs=1 element must stay visible
    "<order id='7'><priority>3-HIGH</priority><priority>2-LOW</priority><total>5.5</total></order>",
    "<order id='7'><priority>3-HIGH</priority><total>abc</total></order>",
    # numeric lexical space: surrounding whitespace ok, exponent ok
    "<order id='7'><priority>3-HIGH</priority><total> 5.5 </total></order>",
    "<order id='+12'><priority>3-HIGH</priority><total>1e2</total></order>",
    # open content: undeclared extra element permitted by the dialect
    "<order id='7'><priority>3-HIGH</priority><total>5.5</total><extra>x</extra></order>",
    "<order id='7'><priority>3-HIGH</priority><total></total></order>",
    "<order id='7'><priority>3-HIGH</priority><total>5.5</total><item></item></order>",
    "not xml",
    "",
]

PERSON_DOCS = [VALID_PERSON] + list(INVALID_PERSONS.values()) + [
    '<person version="1"><id>ab</id><age> 30 </age><tag>x</tag><tag>y</tag></person>',
    '<person version="1"><id>ab</id><age>30</age><nick></nick><tag>x</tag></person>',
    '<person version="1" kind="employee"><id>ab</id><id>cd</id><age>30</age><tag>x</tag></person>',
]

CHOICE_DOCS = [
    "<contact><email>a@b.c</email></contact>",
    "<contact><phone>123</phone></contact>",
    "<contact/>",
    "<contact><email>a@b.c</email><phone>123</phone></contact>",
    "<contact><email>a</email><email>b</email></contact>",
]

PRICE_DOCS = [
    '<price currency="EUR">9.99</price>',
    "<price>9.99</price>",
    '<price currency="EUR">cheap</price>',
    '<price currency="EUR"></price>',
    '<price currency="EUR"/>',
]

LVL_DOCS = ["<lvl>1</lvl>", "<lvl>9</lvl>", "<lvl>10</lvl>", "<lvl>0</lvl>", "<lvl>x</lvl>"]
COLOR_DOCS = ["<color>red</color>", "<color>blue</color>", "<color></color>"]


def _assert_parity(spark, schema, docs):
    pred, tier = compile_xml(schema, F.col("x"))
    assert tier == "xml_builtin", "corpus schema must route to the builtin tier"
    df = spark.createDataFrame([(d,) for d in docs], ["x"])
    got = [bool(r[0]) for r in df.select(pred).collect()]
    exp = [validate_xml(d, schema) for d in docs]
    mism = [(d, g, e) for d, g, e in zip(docs, got, exp) if g != e]
    assert not mism, mism
    # at least one of each verdict, or the corpus proves nothing
    assert any(exp) and not all(exp)


def test_order_parity(spark):
    _assert_parity(spark, parse_xsd(ORDER_XSD)["order"], ORDER_DOCS)


def test_person_parity(spark):
    _assert_parity(spark, parse_xsd(PERSON_XSD)["person"], PERSON_DOCS)


def test_choice_parity(spark):
    _assert_parity(spark, parse_xsd(CHOICE_XSD)["contact"], CHOICE_DOCS)


def test_simple_content_parity(spark):
    _assert_parity(spark, parse_xsd(SIMPLE_CONTENT_XSD)["price"], PRICE_DOCS)


def test_enum_bounds_parity(spark):
    schemas = parse_xsd(ENUM_BOUNDS_XSD)
    _assert_parity(spark, schemas["lvl"], LVL_DOCS)
    _assert_parity(spark, schemas["color"], COLOR_DOCS)


def test_unsupported_schema_falls_back(spark):
    # a dialect schema the lexical tier cannot express (multipleOf has
    # no XSD facet) must drop to the Arrow evaluator UDF
    schema = {
        "type": "object",
        "properties": {"n": {"type": "integer", "multipleOf": 3}},
        "required": ["n"],
    }
    pred, tier = compile_xml(schema, F.col("x"))
    assert tier == "arrow_udf"
    df = spark.createDataFrame([("<r><n>9</n></r>",), ("<r><n>10</n></r>",)], ["x"])
    assert [bool(r[0]) for r in df.select(pred).collect()] == [True, False]


def test_ruleset_mode_xml_routes_builtin(spark):
    from fences_spark.compiler.ruleset import RuleSet

    schema = parse_xsd(ORDER_XSD)["order"]
    df = spark.createDataFrame([(d,) for d in ORDER_DOCS], ["doc"])
    rs = RuleSet().add("order_ok", "doc", schema, mode="xml")
    res = rs.apply(df)
    assert res.tiers["order_ok"] == "xml_builtin"
    got = [r["order_ok"] for r in res.df.collect()]
    assert got == [validate_xml(d, schema) for d in ORDER_DOCS]


def test_builtin_plan_has_no_python(spark):
    """The builtin tier's physical plan must contain no Python
    boundary (BatchEvalPython/ArrowEvalPython)."""
    schema = parse_xsd(ORDER_XSD)["order"]
    pred, _ = compile_xml(schema, F.col("x"))
    df = spark.createDataFrame([(d,) for d in ORDER_DOCS], ["x"]).select(pred.alias("ok"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
