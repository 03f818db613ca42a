"""XSD-subset front end (SURVEY.md §2.E): XSD → dialect schema →
evaluator / Spark pandas-UDF verdicts over XML text cells.

Structural parity target: the reference's XSD surface
(/root/reference/fences/xml_schema/parse.py — tag handlers :12-28,
built-in types :29-79, restrictions :80-84,174-199, occurs :285-309,
attributes :370-414); test shapes modeled on the reference's own XSD
suite (/root/reference/test/xml_schema/test_generate.py:20-47).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fences_spark.schema.xsd import parse_xsd, validate_xml

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'

PERSON_XSD = f"""
<xs:schema {XS}>
  <xs:simpleType name="ShortId">
    <xs:restriction base="xs:string">
      <xs:pattern value="[a-z]{{2,8}}"/>
      <xs:minLength value="2"/>
      <xs:maxLength value="8"/>
    </xs:restriction>
  </xs:simpleType>
  <xs:element name="person">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="id" type="ShortId"/>
        <xs:element name="age" type="xs:unsignedByte"/>
        <xs:element name="nick" type="xs:string" minOccurs="0"/>
        <xs:element name="tag" type="xs:string" minOccurs="1" maxOccurs="3"/>
      </xs:sequence>
      <xs:attribute name="version" type="xs:positiveInteger" use="required"/>
      <xs:attribute name="kind" type="xs:string" fixed="employee"/>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


@pytest.fixture(scope="module")
def person_schema():
    schemas = parse_xsd(PERSON_XSD)
    assert set(schemas) == {"person"}
    return schemas["person"]


VALID_PERSON = (
    '<person version="1" kind="employee">'
    "<id>ab</id><age>30</age><tag>x</tag></person>"
)

INVALID_PERSONS = {
    "bad_pattern": '<person version="1"><id>AB</id><age>30</age><tag>x</tag></person>',
    "age_range": '<person version="1"><id>ab</id><age>300</age><tag>x</tag></person>',
    "age_not_int": '<person version="1"><id>ab</id><age>old</age><tag>x</tag></person>',
    "missing_required_attr": "<person><id>ab</id><age>30</age><tag>x</tag></person>",
    "version_not_positive": '<person version="0"><id>ab</id><age>30</age><tag>x</tag></person>',
    "fixed_attr_violated": '<person version="1" kind="boss"><id>ab</id><age>30</age><tag>x</tag></person>',
    "missing_element": '<person version="1"><age>30</age><tag>x</tag></person>',
    "too_many_tags": (
        '<person version="1"><id>ab</id><age>30</age>'
        "<tag>a</tag><tag>b</tag><tag>c</tag><tag>d</tag></person>"
    ),
    "not_xml": "person version=1",
}


def test_schema_shape(person_schema):
    props = person_schema["properties"]
    assert props["id"]["pattern"] == "^(?:[a-z]{2,8})$"
    assert props["age"] == {"type": "integer", "minimum": 0, "maximum": 255}
    assert props["tag"] == {
        "type": "array",
        "items": {"type": "string"},
        "minItems": 1,
        "maxItems": 3,
    }
    assert "nick" not in person_schema["required"]
    assert "@version" in person_schema["required"]
    assert props["@kind"]["const"] == "employee"


def test_valid_instance(person_schema):
    assert validate_xml(VALID_PERSON, person_schema)
    # optional element present, repeated tag within bounds
    ok = (
        '<person version="7" kind="employee"><id>zz</id><age>0</age>'
        "<nick>n</nick><tag>a</tag><tag>b</tag></person>"
    )
    assert validate_xml(ok, person_schema)


@pytest.mark.parametrize("label", sorted(INVALID_PERSONS))
def test_invalid_instances(person_schema, label):
    assert not validate_xml(INVALID_PERSONS[label], person_schema), label


CHOICE_XSD = f"""
<xs:schema {XS}>
  <xs:element name="contact">
    <xs:complexType>
      <xs:choice>
        <xs:element name="email" type="xs:string"/>
        <xs:element name="phone" type="xs:string"/>
      </xs:choice>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def test_choice_exactly_one():
    schema = parse_xsd(CHOICE_XSD)["contact"]
    assert validate_xml("<contact><email>a@b.c</email></contact>", schema)
    assert validate_xml("<contact><phone>123</phone></contact>", schema)
    assert not validate_xml("<contact/>", schema)
    assert not validate_xml(
        "<contact><email>a@b.c</email><phone>123</phone></contact>", schema
    )


SIMPLE_CONTENT_XSD = f"""
<xs:schema {XS}>
  <xs:element name="price">
    <xs:complexType>
      <xs:simpleContent>
        <xs:extension base="xs:decimal">
          <xs:attribute name="currency" type="xs:string" use="required"/>
        </xs:extension>
      </xs:simpleContent>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def test_simple_content_with_attribute():
    schema = parse_xsd(SIMPLE_CONTENT_XSD)["price"]
    assert validate_xml('<price currency="EUR">9.99</price>', schema)
    assert not validate_xml("<price>9.99</price>", schema)
    assert not validate_xml('<price currency="EUR">cheap</price>', schema)


ENUM_BOUNDS_XSD = f"""
<xs:schema {XS}>
  <xs:simpleType name="Level">
    <xs:restriction base="xs:integer">
      <xs:minInclusive value="1"/>
      <xs:maxExclusive value="10"/>
    </xs:restriction>
  </xs:simpleType>
  <xs:element name="lvl" type="Level"/>
  <xs:element name="color">
    <xs:simpleType>
      <xs:restriction base="xs:string">
        <xs:enumeration value="red"/>
        <xs:enumeration value="green"/>
      </xs:restriction>
    </xs:simpleType>
  </xs:element>
</xs:schema>
"""


def test_numeric_bounds_and_enum():
    schemas = parse_xsd(ENUM_BOUNDS_XSD)
    lvl, color = schemas["lvl"], schemas["color"]
    assert validate_xml("<lvl>1</lvl>", lvl)
    assert validate_xml("<lvl>9</lvl>", lvl)
    assert not validate_xml("<lvl>10</lvl>", lvl)
    assert not validate_xml("<lvl>0</lvl>", lvl)
    assert validate_xml("<color>red</color>", color)
    assert not validate_xml("<color>blue</color>", color)


def test_spark_xml_mode(spark, person_schema):
    """RuleSet mode='xml': Arrow-UDF verdicts match the driver-side
    evaluator exactly (diagonal confusion — SURVEY.md §5)."""
    from fences_spark.compiler.ruleset import RuleSet

    rows = [(VALID_PERSON, True)] + [(x, False) for x in INVALID_PERSONS.values()]
    df = spark.createDataFrame(rows, ["doc", "truth"])
    rs = RuleSet().add("person_ok", "doc", person_schema, mode="xml")
    res = rs.apply(df)
    got = {r["doc"]: r["person_ok"] for r in res.df.collect()}
    for doc, truth in rows:
        assert got[doc] == truth, doc
    conf = res.confusion("truth").collect()[0]
    assert conf["valid_rejected"] == 0 and conf["invalid_accepted"] == 0


class TestComplexContent:
    XSD = """
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:complexType name="BaseT">
    <xs:sequence>
      <xs:element name="id" type="xs:positiveInteger"/>
      <xs:any minOccurs="0"/>
    </xs:sequence>
    <xs:attribute name="version" use="required"/>
  </xs:complexType>
  <xs:element name="thing">
    <xs:complexType>
      <xs:complexContent>
        <xs:extension base="BaseT">
          <xs:sequence>
            <xs:element name="label" type="xs:string"/>
          </xs:sequence>
          <xs:attribute name="extra" type="xs:int"/>
        </xs:extension>
      </xs:complexContent>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""

    def test_extension_merges_base(self):
        from fences_spark.schema.xsd import parse_xsd, validate_xml
        schema = parse_xsd(self.XSD)["thing"]
        props = schema["properties"]
        assert set(props) >= {"id", "label", "@version", "@extra"}
        assert set(schema["required"]) == {"id", "@version", "label"}
        ok = '<thing version="1"><id>5</id><label>x</label></thing>'
        missing_label = '<thing version="1"><id>5</id></thing>'
        missing_version = '<thing><id>5</id><label>x</label></thing>'
        bad_base_id = '<thing version="1"><id>0</id><label>x</label></thing>'
        wildcard_extra = ('<thing version="1"><id>5</id><label>x</label>'
                          '<anything>zz</anything></thing>')
        assert validate_xml(ok, schema)
        assert not validate_xml(missing_label, schema)
        assert not validate_xml(missing_version, schema)
        assert not validate_xml(bad_base_id, schema)       # base facet enforced
        assert validate_xml(wildcard_extra, schema)        # xs:any permits extras


def test_xml_rule_in_pointer_diagnostics_does_not_abort(spark, person_schema):
    """A mixed ruleset (XML + JSON-pointer-capable rules) under
    pointer_entries_per_rule: the XML rule has no JSON-pointer
    vocabulary (its diagnostics are XPath-shaped) — it must contribute
    its failing-rule element with an EMPTY pointers array, not abort
    the run with CompileError (round-4 review finding)."""
    from pyspark.sql import functions as F

    from fences_spark.compiler.ruleset import RuleSet

    bad_xml = next(iter(INVALID_PERSONS.values()))
    df = spark.createDataFrame(
        [(VALID_PERSON, "ok"), (bad_xml, "")], ["doc", "tag"]
    )
    rs = RuleSet()
    rs.add("person_ok", "doc", person_schema, mode="xml")
    rs.add("tag_present", "tag", {"type": "string", "minLength": 1})
    res = rs.apply(df)
    ann = res.df.withColumn("vp", rs.pointer_entries_per_rule(res.df))
    rows = {r["tag"]: r for r in ann.collect()}
    bad = rows[""]
    got = {e["rule_id"]: [(p["pointer"], p["keyword"]) for p in e["pointers"]]
           for e in bad["vp"]}
    assert got == {"person_ok": [], "tag_present": [("#", "minLength")]}
    assert rows["ok"]["vp"] == []
