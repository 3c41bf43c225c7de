"""Round-5 regression: out-of-range years are violation ROWS, never
collect-time crashes.

Round-4 judge finding: ``try_to_date`` alone accepted '+00000-01-01' /
'-0001-01-01' / '0000-01-01' and the timestamp path accepted
'0000-01-01T00:00:00'; any year-0 value is a poison pill — Python
``datetime`` can't represent year < 1, so ONE such row killed a whole
collect/toPandas, violating the engine's failure-as-rows contract (V9).
Additionally, even year-1 timestamps before 0001-01-04 crash because
CPython's ``fromtimestamp`` runs a DST fold-probe at t-86400 (verified
live under UTC).

These tests drive poison inputs through the compiled converters mixed
with valid rows and assert the whole batch collects cleanly with the
poison rows flagged INVALID_DATE / INVALID_TIMESTAMP.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

POISON_DATES = ["+00000-01-01", "-0001-01-01", "0000-01-01"]
POISON_TS = [
    "0000-01-01T00:00:00",
    "+00000-01-01T00:00:00",
    "-0001-01-01T00:00:00",
    "0001-01-01T00:00:00",  # fold-probe poison: fromtimestamp(t-86400) → year 0
    "0001-01-03T23:59:59",  # last value under the documented floor
]


def _date_converter():
    from avro_conversions_spark.schema.model import LogicalType
    from avro_conversions_spark.schema.resolution import SchemaResolver, WriteType

    return SchemaResolver(strict_nullability=False).resolve(
        WriteType(T.StringType(), format="date"), LogicalType("date")
    )


def _ts_converter(kind="timestamp-micros", fmt="date-time"):
    from avro_conversions_spark.schema.model import LogicalType
    from avro_conversions_spark.schema.resolution import SchemaResolver, WriteType

    return SchemaResolver(strict_nullability=False).resolve(
        WriteType(T.StringType(), format=fmt), LogicalType(kind)
    )


def test_year_zero_dates_are_violation_rows_not_crashes(spark):
    conv = _date_converter()
    assert conv.reason == "INVALID_DATE"
    vals = POISON_DATES + ["2021-06-30", "0001-01-01", "9999-12-31"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = df.select(
        "v",
        conv.convert(F.col("v")).alias("d"),
        conv.violation(F.col("v")).alias("viol"),
    ).collect()  # must not raise
    got = {r.v: (r.d, r.viol) for r in rows}
    for p in POISON_DATES:
        assert got[p] == (None, True), p
    assert got["2021-06-30"] == (datetime.date(2021, 6, 30), False)
    # year 1 IS representable for dates (date.fromordinal has no fold probe)
    assert got["0001-01-01"] == (datetime.date(1, 1, 1), False)
    assert got["9999-12-31"] == (datetime.date(9999, 12, 31), False)


def test_poison_timestamps_are_violation_rows_not_crashes(spark):
    for kind, fmt in [
        ("timestamp-micros", "date-time"),
        ("local-timestamp-micros", "local-date-time"),
    ]:
        conv = _ts_converter(kind, fmt)
        assert conv.reason == "INVALID_TIMESTAMP"
        vals = POISON_TS + ["0001-01-04T00:00:00", "2021-06-30T12:34:56"]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        rows = df.select(
            "v",
            conv.convert(F.col("v")).alias("ts"),
            conv.violation(F.col("v")).alias("viol"),
        ).collect()  # must not raise
        got = {r.v: (r.ts, r.viol) for r in rows}
        for p in POISON_TS:
            assert got[p] == (None, True), (kind, p)
        assert got["0001-01-04T00:00:00"] == (datetime.datetime(1, 1, 4), False)
        assert got["2021-06-30T12:34:56"] == (
            datetime.datetime(2021, 6, 30, 12, 34, 56),
            False,
        )


def test_trailing_boundary_chars_rejected(spark):
    """Round-4 ADVICE (medium): Spark's cast trims chars <= ' ' at both
    ends, so '2021-01-01T00:00:00 ' silently converted. The right-boundary
    probe now rejects trailing whitespace/control chars, matching the
    reference's ZonedDateTime.parse strictness."""
    conv = _ts_converter()
    bad = [
        "2021-01-01T00:00:00 ",
        "2021-01-01T00:00:00\t",
        "2021-01-01T00:00:00\n",
        "2021-01-01T00:00:00.5Z ",
    ]
    df = spark.createDataFrame([(v,) for v in bad], "v string")
    rows = df.select(
        conv.convert(F.col("v")).alias("ts"), conv.violation(F.col("v")).alias("viol")
    ).collect()
    assert all(r.ts is None and r.viol for r in rows), rows
