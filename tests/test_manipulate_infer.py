"""Schema manipulation (SURVEY.md §2.5) and inference (§2.6) semantics."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from avro_conversions_spark.infer import (
    DecimalRange,
    elect_numeric_type,
    suggest_read_type,
)
from avro_conversions_spark.manipulate import (
    SchemaManipulator,
    convert_name,
    document_schema_markdown,
    validate_unique_names,
)
from avro_conversions_spark.schema.model import DecimalType, EnumType, PrimitiveType


def test_naming_conventions():
    """util/NamingConvention.java:75-198 casing matrix."""
    assert convert_name("OneTwoThree", "snake_case") == "one_two_three"
    assert convert_name("one_two_three", "PascalCase") == "OneTwoThree"
    assert convert_name("one-two-three", "camelCase") == "oneTwoThree"
    assert convert_name("ONE_TWO", "kebab-case") == "one-two"
    assert convert_name("çaFé", "snake_case") == "ca_fe"  # accent stripping (NFD)
    assert convert_name("HTTPServer", "snake_case") == "http_server"


def test_rename_and_convention(spark):
    df = spark.createDataFrame([(1, (2, "x"))], "oldName int, nested struct<innerVal:int, s:string>")
    out = (
        SchemaManipulator()
        .rename_field("oldName", "renamed")
        .use_naming_convention("snake_case")
        .apply(df)
    )
    assert out.columns == ["renamed", "nested"]
    assert out.schema["nested"].dataType.fieldNames() == ["inner_val", "s"]
    assert out.collect()[0].renamed == 1


def test_unwrap_array(spark):
    """M5 (SchemaManipulator.java:405-459): struct{items: array} → array."""
    df = spark.createDataFrame([(([1, 2, 3],),)], "wrapper struct<items: array<int>>")
    out = SchemaManipulator().unwrap_array("wrapper").apply(df)
    assert isinstance(out.schema["wrapper"].dataType, T.ArrayType)
    assert out.collect()[0].wrapper == [1, 2, 3]


def test_sort_fields(spark):
    df = spark.createDataFrame([(1, 2, 3)], "charlie int, alpha int, bravo int")
    out = SchemaManipulator().sort_fields().apply(df)
    assert out.columns == ["alpha", "bravo", "charlie"]


def test_markdown_doc():
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.ArrayType(T.StringType()), True),
            T.StructField("c", T.StructType([T.StructField("d", T.LongType(), True)]), False),
        ]
    )
    md = document_schema_markdown(schema, "t")
    # reference marker semantics (AvroSchemaUtils.java:72-81): '?' goes on
    # the PATH of the nullable union, before the '[]' array marker
    assert "| a | int |" in md and "| b?[] | string |" in md and "| c.d? | bigint |" in md
    assert "| Field(path) | Type | Documentation |" in md


def test_markdown_doc_readtype_reference_fidelity():
    """M7 full fidelity: logical-type names, field docs + 'Type:' record
    docs, map marker, recursion-safe named-type reuse."""
    from avro_conversions_spark.manipulate import truncate
    from avro_conversions_spark.schema import from_avsc

    rt, _ = from_avsc(
        """
    {"type":"record","name":"Conv","doc":"A conversation","fields":[
      {"name":"when","type":{"type":"int","logicalType":"date"},"doc":"start <day>"},
      {"name":"amount","type":{"type":"bytes","logicalType":"decimal","precision":6,"scale":2}},
      {"name":"next","type":["null","Conv"],"default":null}
    ]}"""
    )
    md = document_schema_markdown(rt)
    assert md.startswith("| Field(path) | Type | Documentation |\n|---")
    assert "|  | record | Type: A conversation |" in md
    assert "| when | date | start &lt;day> |" in md
    assert "| amount | decimal(6,2) |" in md
    # recursive reuse prints one row, no infinite walk
    assert md.count("| next? | record |") == 1
    assert truncate(5, "abcdefg") == "abcd…" and truncate(5, "abc") == "abc"


def test_unique_name_validation():
    bad = T.StructType(
        [T.StructField("x", T.IntegerType()), T.StructField("X", T.LongType())]
    )
    with pytest.raises(ValueError, match="duplicate"):
        validate_unique_names(bad)


# --- inference -------------------------------------------------------------


def test_decimal_range_algebra():
    """util/DecimalRange.java:60-150 extend/restrict."""
    a = DecimalRange(Decimal(0), Decimal(100))
    b = DecimalRange(Decimal(-50), Decimal(50))
    assert a.extend_with(b) == DecimalRange(Decimal(-50), Decimal(100))
    assert a.restrict_to(b) == DecimalRange(Decimal(0), Decimal(50))
    with pytest.raises(ValueError):
        DecimalRange(Decimal(0), Decimal(1)).restrict_to(DecimalRange(Decimal(5), Decimal(9)))


def test_bit_size_and_type_election():
    """SchemaAnalyzer.java:177-207 + DecimalRange.java:177-209."""
    assert elect_numeric_type(DecimalRange(Decimal(0), Decimal(1000)), True) == PrimitiveType("int")
    assert elect_numeric_type(
        DecimalRange(Decimal(0), Decimal(9_000_000_000)), True
    ) == PrimitiveType("long")
    assert isinstance(
        elect_numeric_type(DecimalRange(Decimal(0), Decimal(10**21)), True), DecimalType
    )
    assert elect_numeric_type(
        DecimalRange(Decimal("0.5"), Decimal("999.5")), False
    ) == PrimitiveType("float")
    assert elect_numeric_type(
        DecimalRange(Decimal("0.123456789"), Decimal("1.0")), False
    ) == PrimitiveType("double")


def test_suggest_read_type(spark):
    df = spark.createDataFrame(
        [(1, 5_000_000_000, "yes", None), (2, 1, "no", "x")],
        "small int, big long, flag string, opt string",
    )
    t, n = suggest_read_type(df, "small")
    assert t == PrimitiveType("int") and not n
    t, _ = suggest_read_type(df, "big")
    assert t == PrimitiveType("long")
    t, _ = suggest_read_type(df, "flag")
    assert isinstance(t, EnumType) and t.symbols == ("no", "yes")
    _, n = suggest_read_type(df, "opt")
    assert n  # observed null → nullable
