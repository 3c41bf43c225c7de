"""Row-level constraint DSL.

Each constraint is the direct analogue of a reference ResolveRule
(opwvhk/avro/io/AsAvroParserBase.java:515-550): a plan-time compatibility
check plus a runtime Column predicate (true → violation) plus an
"observed" projector used to build the violation row. All predicates are
pure ``pyspark.sql.Column`` expressions — they fuse into one whole-stage
codegen pass over the table, so N constraints cost one scan, not N.

Violations are *rows with reason codes*; the engine never throws per row
(the reference throws IOException per document,
opwvhk/avro/json/JsonAsAvroParser.java:304-315 — that does not survive
10^12 rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from avro_conversions_spark.schema.model import ReadType
from avro_conversions_spark.schema.resolution import (
    ColumnPlan,
    ResolvingFailure,
    SchemaResolver,
    WriteType,
    from_spark_schema,
)


@dataclass
class RowConstraint:
    """One per-row invariant over one column."""

    name: str
    column: str
    reason: str
    predicate: Callable[[Column], Column]  # true → violation
    plan_check: Callable[[T.StructType], None] | None = None
    repair: Callable[[Column], Column] | None = None  # optional repaired value

    def check_plan(self, schema: T.StructType) -> None:
        if self.column not in schema.fieldNames():
            raise ResolvingFailure(
                f"constraint {self.name}: column {self.column!r} absent from "
                f"observed schema {schema.fieldNames()}"
            )
        if self.plan_check is not None:
            self.plan_check(schema)

    def violation(self) -> Column:
        return self.predicate(F.col(self.column))

    def observed(self) -> Column:
        return F.col(self.column).cast("string")


# --------------------------------------------------------------------------
# factory functions (the user-facing DSL)
# --------------------------------------------------------------------------


def not_null(column: str, name: str | None = None) -> RowConstraint:
    """V3 required-field presence (io/AsAvroParserBase.java:277-285)."""
    return RowConstraint(
        name=name or f"not_null({column})",
        column=column,
        reason="NULL_REQUIRED_FIELD",
        predicate=lambda c: c.isNull(),
    )


def enum_in(
    column: str,
    symbols: Sequence[str],
    default: str | None = None,
    name: str | None = None,
) -> RowConstraint:
    """V6 enum membership; with ``default`` the constraint *repairs*
    (substitutes) instead of flagging (io/AsAvroParserBase.java:437-445)."""
    syms = list(symbols)
    if default is not None and default not in syms:
        raise ResolvingFailure(f"enum default {default!r} not among symbols {syms}")
    return RowConstraint(
        name=name or f"enum({column})",
        column=column,
        reason="INVALID_ENUM_SYMBOL",
        predicate=(lambda c: F.lit(False))
        if default is not None
        else (lambda c: c.isNotNull() & ~c.isin(syms)),
        repair=None
        if default is None
        else (lambda c: F.when(c.isin(syms) | c.isNull(), c).otherwise(F.lit(default))),
    )


def range_check(
    column: str,
    lo: float | int | None = None,
    hi: float | int | None = None,
    name: str | None = None,
) -> RowConstraint:
    """V5 bounds (e.g. int32 bit-size: lo=-2^31, hi=2^31-1,
    util/DecimalRange.java:177-185)."""

    def pred(c: Column) -> Column:
        conds = []
        if lo is not None:
            conds.append(c < lo)
        if hi is not None:
            conds.append(c > hi)
        out = conds[0]
        for x in conds[1:]:
            out = out | x
        return c.isNotNull() & out

    return RowConstraint(
        name=name or f"range({column})",
        column=column,
        reason="VALUE_OUT_OF_RANGE",
        predicate=pred,
    )


def regex_match(column: str, pattern: str, name: str | None = None) -> RowConstraint:
    return RowConstraint(
        name=name or f"regex({column})",
        column=column,
        reason="PATTERN_MISMATCH",
        predicate=lambda c: c.isNotNull() & ~c.rlike(pattern),
    )


def str_len_between(
    column: str, lo: int = 0, hi: int | None = None, name: str | None = None
) -> RowConstraint:
    def pred(c: Column) -> Column:
        bad = F.length(c) < lo
        if hi is not None:
            bad = bad | (F.length(c) > hi)
        return c.isNotNull() & bad

    return RowConstraint(
        name=name or f"strlen({column})",
        column=column,
        reason="LENGTH_OUT_OF_RANGE",
        predicate=pred,
    )


def decimal_fits(
    column: str, precision: int, scale: int, name: str | None = None
) -> RowConstraint:
    """V4 exact decimal(p,s) — RoundingMode.UNNECESSARY semantics
    (io/AsAvroParserBase.java:457-462): excess fraction digits are a
    violation, never rounded. Accepts either the plain textual form (regex,
    p==s-safe) or a scientific/trailing-zero rendering that round-trips
    exactly through decimal(38,s) — doubles render as '1.0E-4' and must not
    be falsely flagged."""
    from avro_conversions_spark.schema.resolution import (
        decimal_regex,
        decimal_roundtrip_ok,
    )

    rx = decimal_regex(precision, scale)
    return RowConstraint(
        name=name or f"decimal({column},{precision},{scale})",
        column=column,
        reason="DECIMAL_OUT_OF_RANGE",
        predicate=lambda c: c.isNotNull()
        & ~(
            c.cast("string").rlike(rx)
            | decimal_roundtrip_ok(c, precision, scale, from_string=True)
        ),
    )


def fixed_length(column: str, size: int, name: str | None = None) -> RowConstraint:
    """V7 fixed binary/string size (io/AsAvroParserBase.java:478-486)."""
    return RowConstraint(
        name=name or f"fixed({column},{size})",
        column=column,
        reason="WRONG_BINARY_SIZE",
        predicate=lambda c: c.isNotNull() & (F.length(c) != size),
    )


def parseable(
    column: str,
    read_type: ReadType,
    write_type: WriteType | None = None,
    name: str | None = None,
    resolver: SchemaResolver | None = None,
) -> RowConstraint:
    """F3-F7: "does this value parse as read type T" as a constraint —
    built by running the schema resolver on a single column."""
    resolver = resolver or SchemaResolver(strict_nullability=False, trust_reader=True)
    wt = write_type or WriteType(T.StringType())
    conv = resolver.resolve(wt, read_type)
    pred = conv.violation or (lambda c: F.lit(False))
    return RowConstraint(
        name=name or f"parseable({column},{read_type.describe()})",
        column=column,
        reason=conv.reason or "UNPARSEABLE",
        predicate=pred,
        repair=conv.convert,
    )


def from_column_plans(plans: Sequence[ColumnPlan]) -> list[RowConstraint]:
    """Turn a resolved schema (SchemaResolver.resolve_record output) into
    runtime constraints: one per column whose conversion can fail, plus
    not-null for non-nullable fields without defaults."""
    out: list[RowConstraint] = []
    for p in plans:
        if p.source is None:
            continue
        if not p.nullable and not (p.default is not ... and p.default is not None):
            out.append(not_null(p.source, name=f"not_null({p.name})"))
        if p.converter.violation is not None:
            out.append(
                RowConstraint(
                    name=f"convert({p.name})",
                    column=p.source,
                    reason=p.converter.reason,
                    predicate=p.converter.violation,
                    repair=p.converter.convert,
                )
            )
    return out


__all__ = [
    "RowConstraint",
    "not_null",
    "enum_in",
    "range_check",
    "regex_match",
    "str_len_between",
    "decimal_fits",
    "fixed_length",
    "parseable",
    "from_column_plans",
    "from_spark_schema",
]
