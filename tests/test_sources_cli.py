"""Document sources (JSON/XML → typed rows under a read schema) and the
declarative constraint-spec loader."""

from __future__ import annotations

import datetime
import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark.schema import from_avsc
from avro_conversions_spark.sources import parse_json_column, parse_xml_column

AVSC = """
{"type":"record","name":"Doc","fields":[
  {"name":"id","type":"long"},
  {"name":"name","type":"string","aliases":["title"]},
  {"name":"amount","type":{"type":"bytes","logicalType":"decimal","precision":6,"scale":2}},
  {"name":"when_","type":{"type":"int","logicalType":"date"}},
  {"name":"status","type":{"type":"enum","name":"S","symbols":["ok","bad"],"default":"ok"}},
  {"name":"tags","type":{"type":"array","items":"string"},"default":[]},
  {"name":"added","type":"string","default":"dflt"}
]}
"""


@pytest.fixture(scope="module")
def read_schema():
    rt, _ = from_avsc(AVSC)
    return rt


def test_parse_json_golden(spark, read_schema):
    """Golden-fixture style (JsonAsAvroParserTest.java:20-51): full doc →
    typed row, alias matching, defaults filled, enum repaired."""
    docs = [
        ('{"id": 1, "name": "a", "amount": "12.34", "when_": "2024-01-02", '
         '"status": "ok", "tags": ["x","y"], "unknown_field": 99}',),
        ('{"id": 2, "title": "renamed", "amount": "1.5", "when_": "2024-03-04", '
         '"status": "weird"}',),
    ]
    out = parse_json_column(spark.createDataFrame(docs, "doc string"), "doc", read_schema)
    rows = {r.id: r for r in out.collect()}
    r1 = rows[1]
    assert r1.name == "a" and r1.amount == Decimal("12.34")
    assert r1.when_ == datetime.date(2024, 1, 2) and r1.tags == ["x", "y"]
    assert r1.added == "dflt" and not r1._corrupt and r1._violations == []
    r2 = rows[2]
    assert r2.name == "renamed"  # alias match (doc/index.md:34-47)
    assert r2.status == "ok"  # enum default substitution
    assert r2.tags == []  # array default


def test_parse_json_violations_and_corrupt(spark, read_schema):
    docs = [
        ('{"id": "NaNope", "name": "x", "amount": "99999999", "when_": "2024-88-88"}',),
        ("utter garbage {{{",),
    ]
    out = parse_json_column(spark.createDataFrame(docs, "doc string"), "doc", read_schema)
    rows = out.collect()
    v = {(x.column, x.reason) for x in rows[0]._violations}
    assert ("id", "INVALID_INTEGER") in v
    assert ("amount", "DECIMAL_OUT_OF_RANGE") in v
    assert ("when_", "INVALID_DATE") in v
    assert not rows[0]._corrupt
    assert rows[1]._corrupt  # reference: IOException("Invalid JSON") per doc


def test_parse_xml_with_repeated_elements(spark, read_schema):
    xmls = [
        ("<r><id>5</id><name>x</name><amount>1.25</amount><when_>2023-05-06</when_>"
         "<status>bad</status><tags>a</tags><tags>b</tags></r>",),
    ]
    out = parse_xml_column(spark.createDataFrame(xmls, "doc string"), "doc", read_schema)
    r = out.collect()[0]
    assert r.id == 5 and r.tags == ["a", "b"] and r.status == "bad"
    assert r.amount == Decimal("1.25") and r.when_ == datetime.date(2023, 5, 6)


def test_string_number_rules(spark):
    """Tokenizer leaves are strings; numeric reads get regex+overflow guards."""
    rt, _ = from_avsc(
        '{"type":"record","name":"N","fields":['
        '{"name":"i","type":["null","int"]},{"name":"d","type":["null","double"]}]}'
    )
    docs = [
        ('{"i": "42", "d": "3.5e2"}',),
        ('{"i": "9999999999", "d": "abc"}',),  # int32 overflow, bad float
    ]
    out = parse_json_column(spark.createDataFrame(docs, "doc string"), "doc", rt)
    rows = out.collect()
    assert rows[0].i == 42 and rows[0].d == 350.0
    assert rows[1].i is None and rows[1].d is None
    reasons = {x.reason for x in rows[1]._violations}
    assert "INVALID_INTEGER" in reasons and "INVALID_NUMBER" in reasons


def test_cli_spec_loader(spark, tmp_path):
    from avro_conversions_spark.cli import engine_from_spec
    from avro_conversions_spark.transcripts import tool_catalog

    tool_catalog(spark).write.mode("overwrite").parquet(str(tmp_path / "tools"))
    spec = {
        "key_cols": ["conv_id", "turn_idx"],
        "constraints": [
            {"kind": "not_null", "column": "conv_id"},
            {"kind": "enum", "column": "role", "symbols": ["user", "assistant"]},
            {"kind": "range", "column": "turn_idx", "lo": 0},
            {"kind": "strlen", "column": "text", "lo": 1},
            {"kind": "regex", "column": "conv_id", "pattern": "^c"},
            {"kind": "unique", "columns": ["conv_id", "turn_idx"]},
            {"kind": "ref", "column": "tool", "dim_path": str(tmp_path / "tools"),
             "dim_column": "tool_name"},
            {"kind": "sequence", "conv_col": "conv_id", "idx_col": "turn_idx"},
        ],
    }
    eng, drift = engine_from_spec(spark, spec)
    assert len(eng.row_constraints) == 5
    assert len(eng.unique_constraints) == 1
    assert len(eng.referential_constraints) == 1
    assert len(eng.sequence_constraints) == 1
    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", None), ("c1", 0, "ghost", "", "badtool")],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    res = eng.run(df, "spec-test")
    fails = {r.constraint for r in res.verdicts.collect() if r.status == "fail"}
    assert {"enum(role)", "strlen(text)", "unique(conv_id,turn_idx)", "ref(tool)"} <= fails

    with pytest.raises(ValueError, match="unknown constraint kind"):
        engine_from_spec(spark, {"constraints": [{"kind": "bogus"}]})


def test_iceberg_binding_probe(spark, tmp_path):
    """The Iceberg binding is attempted for real: the probe must answer
    (not crash) on any session; with the runtime jar present the ledger
    contract runs end-to-end, otherwise it skips (no network here)."""
    import pytest

    from avro_conversions_spark.sources.iceberg import (
        IcebergLedger,
        iceberg_available,
        iceberg_builder_conf,
    )

    conf = iceberg_builder_conf(str(tmp_path / "wh"))
    assert "spark.jars.packages" in conf and "spark.sql.extensions" in conf
    if not iceberg_available(spark):
        pytest.skip("iceberg runtime jar not resolvable offline (parquet ledger is the fallback)")
    led = IcebergLedger(spark, "local.db.acs_watermarks")
    led.commit("r1", "0", 10, "engine=test")
    assert led.completed("r1") == {"0"}


def test_xml_corrupt_document_flagged(spark):
    """A document that is not XML at all must flag _corrupt (the reference
    raises SAXException per document; V9 turns that into a row flag) —
    from_xml alone yields a null-filled struct, so the corrupt-record
    column is required."""
    from avro_conversions_spark.schema import from_avsc
    from avro_conversions_spark.sources.documents import parse_xml_column

    docs = spark.createDataFrame(
        [("<r><x>12</x></r>",), ("<r><x>oops</x></r>",), ("not xml",)], "doc string"
    )
    read, _ = from_avsc(
        '{"type":"record","name":"R","fields":[{"name":"x","type":["null","int"]}]}'
    )
    rows = parse_xml_column(docs, "doc", read).collect()
    assert [r._corrupt for r in rows] == [False, False, True]
    assert rows[1]._violations[0].reason == "INVALID_INTEGER"
