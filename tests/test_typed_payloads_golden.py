"""FIXTURES.md §3: the reference's full type matrix (TestRecord.schema.json
/ TestRecord.avsc, exercised by JsonAsAvroParserTest.java:20-34) as one
golden end-to-end resolution: every scalar conversion in a single
resolve_record pass over a typed_payloads table, byte-compared.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark.schema import SchemaResolver, from_avsc
from avro_conversions_spark.schema.resolution import from_spark_schema

TYPED_PAYLOADS_AVSC = """
{"type":"record","name":"TestRecord","fields":[
  {"name":"bool","type":"boolean"},
  {"name":"short_int","type":["null","int"]},
  {"name":"long_int","type":"long"},
  {"name":"huge_int","type":{"type":"bytes","logicalType":"decimal","precision":21,"scale":0}},
  {"name":"single_float","type":"float"},
  {"name":"double_float","type":"double"},
  {"name":"fixed_point","type":{"type":"bytes","logicalType":"decimal","precision":17,"scale":6}},
  {"name":"choice","type":{"type":"enum","name":"Choice","symbols":["yes","no","maybe"],"default":"maybe"}},
  {"name":"date_col","type":{"type":"int","logicalType":"date"}},
  {"name":"time_col","type":{"type":"long","logicalType":"time-micros"}},
  {"name":"ts_col","type":{"type":"long","logicalType":"timestamp-micros"}},
  {"name":"bin_b64","type":"bytes"},
  {"name":"bin_b16","type":"bytes"},
  {"name":"texts","type":{"type":"array","items":"string"}},
  {"name":"weird_stuff","type":["null",{"type":"record","name":"Weird","fields":[
     {"name":"explanation","type":"string","default":"Please explain why"},
     {"name":"fancy","type":["null","string"],"default":null}
  ]}],"default":null}
]}
"""


@pytest.fixture(scope="module")
def typed_payloads(spark):
    # writer side: everything textual (the reference's JSON token stream),
    # matching FIXTURES.md §3 column list incl. the emoji sample from
    # src/test/resources/opwvhk/avro/json/TestRecord-full.json:23
    rows = [
        (
            "true", "42", "8123456789", "123456789012345678901", "1.25", "2.5e10",
            "12345678901.654321", "yes", "2024-02-29",
            "17:08:34.567123+01:00", "2023-04-17T08:54:13.123456Z",
            "SGVsbG8h", "48656c6c6f21", ["a", "b", "😀 emoji"], ("why not", None),
        ),
        (
            "false", None, "-1", "0", "-0.5", "1e-3",
            "0.000001", "invalid-symbol", "2024-01-01",
            "00:00:00Z", "2023-01-01 00:00:00",
            "", "", [], None,
        ),
    ]
    schema = (
        "bool string, short_int string, long_int string, huge_int string, "
        "single_float string, double_float string, fixed_point string, "
        "choice string, date_col string, time_col string, ts_col string, "
        "bin_b64 string, bin_b16 string, texts array<string>, "
        "weird_stuff struct<explanation:string, fancy:string>"
    )
    return spark.createDataFrame(rows, schema)


def test_full_type_matrix_golden(spark, typed_payloads):
    read, _ = from_avsc(TYPED_PAYLOADS_AVSC)
    wt = from_spark_schema(
        typed_payloads.schema,
        {
            "bin_b64": {"content_encoding": "base64"},
            "bin_b16": {"content_encoding": "base16"},
            "date_col": {"format": "date"},
            "time_col": {"format": "time"},
            "ts_col": {"format": "date-time"},
        },
    )
    plans = SchemaResolver(strict_nullability=False, trust_reader=True).resolve_record(wt, read)
    out = typed_payloads.select(*[p.value() for p in plans])
    r1, r2 = out.collect()

    assert r1.bool is True and r1.short_int == 42 and r1.long_int == 8123456789
    assert r1.huge_int == Decimal("123456789012345678901")
    assert abs(r1.single_float - 1.25) < 1e-6 and r1.double_float == 2.5e10
    assert r1.fixed_point == Decimal("12345678901.654321")
    assert r1.choice == "yes"
    assert r1.date_col == datetime.date(2024, 2, 29)
    assert r1.time_col == (16 * 3600 + 8 * 60 + 34) * 1_000_000 + 567123
    assert r1.ts_col == datetime.datetime(2023, 4, 17, 8, 54, 13, 123456)
    assert bytes(r1.bin_b64) == b"Hello!" and bytes(r1.bin_b16) == b"Hello!"
    assert r1.texts == ["a", "b", "😀 emoji"]  # unicode preserved byte-exact
    assert r1.weird_stuff.explanation == "why not" and r1.weird_stuff.fancy is None

    assert r2.bool is False and r2.short_int is None
    assert r2.choice == "maybe"  # enum default substitution
    assert r2.time_col == 0
    assert r2.ts_col == datetime.datetime(2023, 1, 1)  # space sep + fallback TZ
    assert r2.texts == []
    # absent nested record stays null; its defaults apply only within
    # present records (RecordResolver.java:108-117 semantics)
    assert r2.weird_stuff is None


def test_nested_record_default_fill(spark):
    """JsonAsAvroParserTest.java:112-132: defaults fill inside a present
    record whose fields are missing."""
    read, _ = from_avsc(TYPED_PAYLOADS_AVSC)
    df = spark.createDataFrame(
        [((None, "f"),), ((None, None),)],
        "weird_stuff struct<explanation:string, fancy:string>",
    )
    weird = next(f for f in read.fields if f.name == "weird_stuff")
    conv = SchemaResolver(strict_nullability=False, trust_reader=True).resolve(
        from_spark_schema(df.schema).fields["weird_stuff"], weird.type
    )
    rows = df.select(conv.convert(F.col("weird_stuff")).alias("w")).collect()
    assert rows[0].w.explanation == "Please explain why" and rows[0].w.fancy == "f"
    assert rows[1].w.explanation == "Please explain why" and rows[1].w.fancy is None
