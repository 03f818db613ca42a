"""Per-element XSD violation paths (NormalizedXPath diagnostics).

Reference parity target: fences threads a NormalizedXPath
("/order[0]/item[2]/price[0]") through XSD parsing
(/root/reference/fences/xml_schema/xpath.py:12-36); here the same
path grammar is emitted by both compile tiers, and both must agree
with each other, with hand-planted defects, and with the boolean
verdict (valid ⇔ no paths).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fences_spark.schema.xsd import (
    XmlPathCompiler,
    compile_xml,
    compile_xml_paths,
    compile_xml_paths_udf,
    parse_xsd,
    xml_violation_paths,
)

ORDER_XSD = """
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="order">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="priority">
          <xs:simpleType>
            <xs:restriction base="xs:string">
              <xs:pattern value="[1-5]-[A-Z ]+"/>
            </xs:restriction>
          </xs:simpleType>
        </xs:element>
        <xs:element name="item" minOccurs="0" maxOccurs="unbounded">
          <xs:complexType>
            <xs:sequence>
              <xs:element name="price">
                <xs:simpleType>
                  <xs:restriction base="xs:double">
                    <xs:minExclusive value="0"/>
                  </xs:restriction>
                </xs:simpleType>
              </xs:element>
            </xs:sequence>
            <xs:attribute name="sku" use="required"/>
          </xs:complexType>
        </xs:element>
        <xs:element name="total">
          <xs:simpleType>
            <xs:restriction base="xs:double">
              <xs:minExclusive value="0"/>
            </xs:restriction>
          </xs:simpleType>
        </xs:element>
      </xs:sequence>
      <xs:attribute name="id" use="required">
        <xs:simpleType>
          <xs:restriction base="xs:positiveInteger"/>
        </xs:simpleType>
      </xs:attribute>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""

DOCS: list[tuple[str, str, list[str]]] = [
    ("valid",
     '<order id="7"><priority>1-URGENT</priority>'
     '<item sku="a"><price>10.5</price></item>'
     '<item sku="b"><price>2</price></item>'
     '<total>12.5</total></order>',
     []),
    ("bad_item_price_and_missing_sku",
     '<order id="7"><priority>1-URGENT</priority>'
     '<item sku="a"><price>10.5</price></item>'
     '<item sku="b"><price>0</price></item>'
     '<item><price>-3</price></item>'
     '<total>12.5</total></order>',
     ["/order[0]/item[1]/price[0]",
      "/order[0]/item[2]/@sku",
      "/order[0]/item[2]/price[0]"]),
    ("bad_root_attr_and_total",
     '<order id="0"><priority>1-URGENT</priority><total>-1</total></order>',
     ["/order[0]/@id", "/order[0]/total[0]"]),
    ("missing_required",
     '<order id="7"><total>5</total></order>',
     ["/order[0]/priority"]),
    ("duplicated_scalar",
     '<order id="7"><priority>1-URGENT</priority>'
     '<total>5</total><total>6</total></order>',
     ["/order[0]/total"]),
    ("bad_pattern",
     '<order id="7"><priority>9-wat</priority><total>5</total></order>',
     ["/order[0]/priority[0]"]),
    ("malformed",
     '<order id="7"><priority>1-URGENT</priority',
     ["/"]),
    ("missing_item_price",
     '<order id="7"><priority>1-URGENT</priority>'
     '<item sku="a"></item><total>5</total></order>',
     ["/order[0]/item[0]/price"]),
]


@pytest.fixture(scope="module")
def schema():
    return parse_xsd(ORDER_XSD)["order"]


def test_arrow_paths_match_expected(schema):
    for name, doc, want in DOCS:
        got = xml_violation_paths(doc, schema, "order")
        assert got == want, (name, got, want)


def test_jvm_tier_matches_arrow_tier(spark, schema):
    df = spark.createDataFrame([(n, d) for n, d, _ in DOCS], ["name", "x"])
    jvm = XmlPathCompiler().compile_paths(schema, F.col("x"), "order")
    arrow = compile_xml_paths_udf(schema, F.col("x"), "order")
    rows = df.select("name", jvm.alias("jvm"), arrow.alias("arrow")).collect()
    want = {n: w for n, _, w in DOCS}
    for r in rows:
        assert list(r["jvm"]) == list(r["arrow"]) == want[r["name"]], (
            r["name"], list(r["jvm"]), list(r["arrow"]), want[r["name"]]
        )


def test_paths_consistent_with_boolean_verdict(spark, schema):
    """valid ⇔ empty path array, on the default-dispatch tier."""
    df = spark.createDataFrame([(n, d) for n, d, _ in DOCS], ["name", "x"])
    ok, tier_b = compile_xml(schema, F.col("x"))
    paths, tier_p = compile_xml_paths(schema, F.col("x"), "order")
    assert tier_b == tier_p == "xml_builtin"
    bad = df.select("name", ok.alias("ok"), F.size(paths).alias("n")).collect()
    for r in bad:
        assert r["ok"] == (r["n"] == 0), (r["name"], r["ok"], r["n"])


def test_fallback_dispatch_on_rich_schema(spark):
    """A schema beyond the builtin subset must fall back to the Arrow
    paths UDF, and still agree with the driver-side walker."""
    rich = {
        "type": "object",
        "properties": {"a": {"type": "string", "weird": 1}},
    }
    col, tier = compile_xml_paths(rich, F.col("x"), "r")
    assert tier == "arrow_udf"
    df = spark.createDataFrame([("<r><a>x</a></r>",)], ["x"])
    got = df.select(col.alias("p")).first()["p"]
    assert list(got) == xml_violation_paths("<r><a>x</a></r>", rich, "r")
