"""Runtime conversion semantics — the reference's scalar type matrix
(doc/index.md:66-91; golden fixture TestRecord.schema.json) as data-path
assertions: valid values convert, invalid values become violations with
null output, never exceptions.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from avro_conversions_spark.functions import text as TXT
from avro_conversions_spark.functions import vectors as V
from avro_conversions_spark.schema.model import (
    DecimalType,
    EnumType,
    FixedType,
    LogicalType,
    PrimitiveType,
)
from avro_conversions_spark.schema.resolution import SchemaResolver, WriteType


def run_conv(spark, read_type, values, write_dtype=T.StringType(), **wt_kw):
    conv = SchemaResolver(strict_nullability=False, trust_reader=True).resolve(
        WriteType(write_dtype, **wt_kw), read_type
    )
    df = spark.createDataFrame([(v,) for v in values], T.StructType([T.StructField("x", write_dtype)]))
    viol = conv.violation(F.col("x")) if conv.violation is not None else F.lit(False)
    return df.select(conv.convert(F.col("x")).alias("out"), viol.alias("bad")).collect()


def test_date_parse(spark):
    rows = run_conv(spark, LogicalType("date"), ["2024-01-02", "2024-13-99", "nope", None])
    assert rows[0].out == datetime.date(2024, 1, 2) and not rows[0].bad
    assert rows[1].out is None and rows[1].bad  # pattern-valid, semantically bad
    assert rows[2].out is None and rows[2].bad
    assert rows[3].out is None and not rows[3].bad  # null is not a violation


def test_time_micros_with_offset(spark):
    """OffsetTime semantics (io/AsAvroParserBase.java:66-77): offset
    normalized to UTC micros-of-day."""
    rows = run_conv(
        spark,
        LogicalType("time-micros"),
        ["17:08:34.567123+01:00", "00:30:00Z", "23:59:59", "25:00:00", "junk"],
    )
    assert rows[0].out == ((16 * 3600 + 8 * 60 + 34) * 1_000_000 + 567123)
    assert rows[1].out == 30 * 60 * 1_000_000
    assert rows[2].out == (23 * 3600 + 59 * 60 + 59) * 1_000_000  # no offset → as-is
    assert rows[3].bad and rows[4].bad


def test_timestamp_fallback_tz(spark):
    """Missing zone → session TZ (UTC); explicit offset honored
    (io/AsAvroParserBase.java:78-88)."""
    rows = run_conv(
        spark,
        LogicalType("timestamp-micros"),
        ["2023-04-17T08:54:13+02:00", "2023-04-17 08:54:13", "2023-04-17T08:54:13.123456Z", "bad"],
    )
    assert rows[0].out == datetime.datetime(2023, 4, 17, 6, 54, 13)
    assert rows[1].out == datetime.datetime(2023, 4, 17, 8, 54, 13)
    assert rows[2].out == datetime.datetime(2023, 4, 17, 8, 54, 13, 123456)
    assert rows[3].bad


def test_decimal_exactness(spark):
    """RoundingMode.UNNECESSARY (io/AsAvroParserBase.java:457-462): excess
    scale/precision is a violation, not a rounding."""
    rows = run_conv(
        spark, DecimalType(5, 2), ["123.45", "123.456", "1234.5", "-99.9", "1e3"]
    )
    assert str(rows[0].out) == "123.45" and not rows[0].bad
    assert rows[1].bad  # scale 3 > 2 → reject, don't round
    assert rows[2].bad  # 4 integer digits > p-s=3
    assert str(rows[3].out) == "-99.90" and not rows[3].bad
    assert rows[4].bad


def test_base16_base64_and_fixed_size(spark):
    rows = run_conv(
        spark, PrimitiveType("bytes"), ["48692e", "xyz"], content_encoding="base16"
    )
    assert bytes(rows[0].out) == b"Hi." and not rows[0].bad
    assert rows[1].bad
    rows = run_conv(spark, FixedType("f", 3), ["SGku", "SGkuIQ=="], content_encoding="base64")
    assert bytes(rows[0].out) == b"Hi." and not rows[0].bad
    assert rows[1].bad  # decodes to 4 bytes != fixed(3)


def test_enum_default_substitution(spark):
    rows = run_conv(spark, EnumType("E", ("yes", "no"), default="no"), ["yes", "maybe", None])
    assert rows[0].out == "yes" and rows[1].out == "no" and rows[2].out is None


def test_enum_violation_without_default(spark):
    rows = run_conv(spark, EnumType("E", ("yes", "no")), ["yes", "maybe"])
    assert not rows[0].bad and rows[1].bad


def test_boolean_from_string(spark):
    rows = run_conv(spark, PrimitiveType("boolean"), ["true", "False", "1"])
    assert rows[0].out is True and rows[1].out is False and rows[2].bad


def test_array_element_conversion(spark):
    from avro_conversions_spark.schema.model import ArrayType as RArr

    conv = SchemaResolver(strict_nullability=False, trust_reader=True).resolve(
        WriteType(
            T.ArrayType(T.StringType()),
            items=WriteType(T.StringType(), format="date"),
        ),
        RArr(LogicalType("date")),
    )
    df = spark.createDataFrame([(["2024-01-01", "2024-02-30"],), (["2024-03-03"],)], "x array<string>")
    rows = df.select(
        conv.convert(F.col("x")).alias("out"), conv.violation(F.col("x")).alias("bad")
    ).collect()
    assert rows[0].bad and not rows[1].bad
    assert rows[1].out == [datetime.date(2024, 3, 3)]


# --- text / vector functions ---------------------------------------------


def test_text_metrics(spark):
    df = spark.createDataFrame([("The cat and the dog!",)], "text string")
    row = df.select(
        TXT.token_count(F.col("text")).alias("n"),
        TXT.langid(F.col("text")).alias("lang"),
        TXT.fingerprint(F.col("text")).alias("fp"),
        F.round(TXT.punct_ratio(F.col("text")), 4).alias("pr"),
    ).collect()[0]
    assert row.n == 5
    assert row.lang == "en"
    import hashlib

    assert row.fp == hashlib.md5(b"the cat and the dog").hexdigest()
    assert row.pr == round(1 / 20, 4)


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(TXT.shingles(F.col("text"), 3).alias("s")).collect()
    assert sorted(rows[0].s) == ["a b c", "b c d"]
    assert rows[1].s == ["a b"]  # shorter than n → whole text


def test_cosine(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], "a array<float>, b array<float>")
    rows = df.select(F.round(V.cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()
    assert rows[0].c == 0.0 and rows[1].c == 1.0


def test_winnowing_fingerprints(spark):
    """Winnowing guarantee: documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint; disjoint texts don't."""
    from pyspark.sql import functions as F

    from avro_conversions_spark.functions.text import kgram_hashes, winnowed_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, "AAA " + shared + " BBB"),
            (2, "CCCCC " + shared + " DDDDD"),
            (3, "completely different words here entirely"),
        ],
        "doc_id int, text string",
    )
    staged = df.select("doc_id", kgram_hashes(F.col("text"), k=8).alias("g"))
    fps = {
        r.doc_id: set(r.fps)
        for r in staged.select(
            "doc_id", winnowed_fingerprints(F.col("g"), w=4).alias("fps")
        ).collect()
    }
    assert fps[1] & fps[2], "shared substring must yield shared fingerprints"
    assert not (fps[1] & fps[3])
