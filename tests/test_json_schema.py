"""Port of the reference's SchemaAnalyzerTest (json/SchemaAnalyzerTest.java:
21-150) — JSON-Schema walk, draft-version keyword gating, the
INTERSECT/UNION lattice, and the Avro-type election, asserted structurally
against the reference's own fixture files."""

from __future__ import annotations

from decimal import Decimal

import pytest

from avro_conversions_spark.schema import (
    AnalysisFailure,
    ArrayType,
    DecimalType,
    EnumType,
    LogicalType,
    NumberRange,
    PrimitiveType,
    RecordType,
    from_avsc,
    infer_read_schema,
    load_json_schema,
    to_write_type,
)

FIXTURES = "/root/reference/src/test/resources/opwvhk/avro/json"


def load(name: str):
    return load_json_schema(f"{FIXTURES}/{name}")


# ---------------------------------------------------------------- the walk


def test_draft4_semantics():
    """SchemaAnalyzerTest.java:21-37: boolean exclusive bounds; const,
    contentEncoding, if/then/else and contains ignored; $ref replaces."""
    p = load("draft4-schema.json")
    # root $ref replaced the sibling title/description entirely
    assert p.effective_title() == "TestCase"
    assert p.description is None
    assert p.get_type() == "object"
    assert p.required == ["number", "choice", "text"]
    num = p.properties["number"]
    # fraction in the bound -> NOT an integer range in draft 4
    assert "integer" not in num.types and "number" in num.types
    assert num.number_range == NumberRange(Decimal(0), True, Decimal("123.0"), False)
    choice = p.properties["choice"]
    assert choice.enum_values == ["no", "maybe"]  # const ignored in draft 4
    text = p.properties["text"]
    assert text.is_nullable() and text.default == "abc"
    assert text.content_encoding is None  # draft < 7
    items = p.properties["names"].item_props
    # tuple items + additionalItems apply; contains is ignored
    assert items.types == {"string", "number", "null"}
    # 'foo' from the ignored if/then must not appear
    assert "foo" not in p.properties


def test_draft6_semantics():
    """SchemaAnalyzerTest.java:39-55: numeric exclusive bounds; const joins
    enums; contains applies; zero fractions allowed in integer ranges."""
    p = load("draft6-schema.json")
    num = p.properties["number"]
    assert {"integer", "number"} <= num.types  # 123.0 is integral now
    assert num.number_range == NumberRange(Decimal(0), True, Decimal("123.0"), False)
    # const 'yes' INTERSECT enum [yes, no] -> [yes]
    assert p.properties["choice"].enum_values == ["yes"]
    items = p.properties["names"].item_props
    # single 'items' + 'contains'; additionalItems and unevaluatedItems ignored
    assert items.types == {"null", "boolean"}
    assert items.effective_title() == "items"


def test_draft7_semantics():
    """SchemaAnalyzerTest.java:57-68: contentEncoding and if/then/else."""
    p = load("draft7-schema.json")
    assert set(p.required) == {"choice", "number"}
    assert p.properties["bytes"].content_encoding == "base64"
    # if/then/else UNION (maybe ∪ missing ∪ reason) INTERSECTed into root
    assert p.properties["choice"].enum_values == ["maybe"]
    assert p.properties["missing"].get_type() == "string"
    assert p.properties["reason"].get_type() == "string"


def test_draft2020_semantics():
    """SchemaAnalyzerTest.java:80-97: prefixItems/unevaluatedItems, $ref as
    INTERSECT sibling, enum unions, recursion."""
    p = load("draft2020-12-schema.json")
    assert p.effective_title() == "TestCase"
    bag = p.properties["mixedBag"].item_props
    assert bag.types == {"string", "number", "boolean", "null"}
    lst = p.properties["list"].item_props
    assert lst.types == {"string"}
    small = p.properties["smallNumber"]
    assert small.effective_title() == "int"
    assert {"integer", "number"} <= small.types
    assert small.number_range == NumberRange(Decimal(0), False, Decimal(2147483648), False)
    assert p.properties["multipleChoice"].enum_values[:2] == ["x", "y"]
    assert len(p.properties["multipleChoice"].enum_values) == 3
    assert p.properties["stillAnEnum"].enum_values == ["x", "y"]
    droste = p.properties["droste"]
    assert droste.properties["droste"] is droste  # recursion-safe memoization


def test_invalid_and_null_schemas():
    """SchemaAnalyzerTest.java:138-140."""
    with pytest.raises(AnalysisFailure):
        load("invalid.schema.json")
    with pytest.raises(ValueError, match="no applicable types"):
        infer_read_schema(load("null.schema.json"))


# ------------------------------------------------------------- the election


def test_avro_election_matches_reference_fixture():
    """TestRecord.schema.json -> Avro, vs the reference's expected
    TestRecordAll.avsc (SchemaAnalyzerTest.java:142-148), structurally."""
    rt, nullable = infer_read_schema(load("TestRecord.schema.json"))
    exp, _ = from_avsc(open(f"{FIXTURES}/TestRecordAll.avsc").read())
    assert isinstance(rt, RecordType) and rt.name == "TestCase"
    got = {f.name: f for f in rt.fields}
    want = {f.name: f for f in exp.fields}
    assert set(got) == set(want)
    for name in want:
        g, w = got[name], want[name]
        assert g.nullable == w.nullable, name
        if name == "weirdStuff":
            continue  # recursive record: checked below
        assert type(g.type) is type(w.type), name
        if isinstance(w.type, DecimalType):
            assert (g.type.precision, g.type.scale) == (w.type.precision, w.type.scale)
        if isinstance(w.type, (PrimitiveType, LogicalType)):
            assert g.type.kind == w.type.kind, name
        if isinstance(w.type, EnumType):
            assert g.type.symbols == w.type.symbols
        if isinstance(w.type, ArrayType):
            assert g.type.items.kind == w.type.items.kind
        if w.has_default and w.default is not None:
            assert g.default == w.default, name
    ws = got["weirdStuff"].type
    assert isinstance(ws, RecordType) and ws.name == "weirdStuff"
    wsf = {f.name: f for f in ws.fields}
    assert wsf["explanation"].default == "Please explain why"
    # the rabbit hole: recursive field resolves to the record itself
    assert wsf["rabbitHole"].type is ws
    assert wsf["rabbitHole"].nullable


def test_named_type_reference_in_avsc():
    """io/DelegatingResolver.java:6-52 analogue: named (recursive) type
    references in .avsc resolve through the registry."""
    rt, _ = from_avsc(
        """
    {"type":"record","name":"Node","fields":[
      {"name":"label","type":"string"},
      {"name":"next","type":["null","Node"],"default":null},
      {"name":"kind","type":{"type":"enum","name":"Kind","symbols":["a","b"]}},
      {"name":"kind2","type":"Kind"}
    ]}"""
    )
    f = {x.name: x for x in rt.fields}
    assert f["next"].type is rt and f["next"].nullable
    assert f["kind2"].type is f["kind"].type


# ------------------------------------------------------------ the lattice


def test_number_range_lattice_open_bounds():
    """util/DecimalRange.java:60-150 with null bounds."""
    a = NumberRange(Decimal(0), True, None, False)         # [0, inf)
    b = NumberRange(None, False, Decimal("10.5"), True)    # (-inf, 10.5]
    assert a.restrict_to(b) == NumberRange(Decimal(0), True, Decimal("10.5"), True)
    assert a.extend_with(b) == NumberRange(None, False, None, False)
    assert a.restrict_to(b).required_precision() == 3
    assert a.restrict_to(b).required_scale() == 1
    assert NumberRange().integer_bit_size() == 0


def test_write_type_from_json_schema():
    """The declared-write-schema path: annotations come from the document,
    not hand-built dicts (json/JsonAsAvroParser.java:104-118)."""
    wt = to_write_type(
        """
    {"$schema": "http://json-schema.org/draft-07/schema#",
     "title": "Event", "type": "object",
     "required": ["event_id", "event_type"],
     "properties": {
       "event_id": {"type": "integer", "minimum": 0, "maximum": 9000000000},
       "event_type": {"enum": ["view", "click"]},
       "when": {"type": "string", "format": "date-time"},
       "payload": {"type": "string", "contentEncoding": "base64"},
       "score": {"type": "number", "minimum": 0, "maximum": 1.5}
     }}"""
    )
    from pyspark.sql import types as T

    f = wt.fields
    assert isinstance(f["event_id"].dtype, T.LongType)
    assert (f["event_id"].min_value, f["event_id"].max_value) == (0, 9000000000)
    assert not f["event_id"].nullable and f["when"].nullable
    assert f["event_type"].symbols == ("view", "click")
    assert f["when"].format == "date-time"
    assert f["payload"].content_encoding == "base64"
    assert isinstance(f["score"].dtype, T.FloatType)
