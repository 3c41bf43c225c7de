"""Avro-style read-schema model (driver-side, plan-time only).

Semantics follow the reference's data model (SURVEY.md §1.1):

- records with named fields, docs, aliases and defaults
  (reference: opwvhk/avro/io/RecordResolver.java:71-117);
- nullability is a union-with-null unwrapped into a per-field flag
  (reference: opwvhk/avro/util/AvroSchemaUtils.java:179-185);
- enums carry an optional default symbol used for substitution
  (reference: opwvhk/avro/io/AsAvroParserBase.java:433-445);
- decimals carry (precision, scale); fixed carries a byte size;
- logical types: date, time-millis/micros, timestamp-millis/micros,
  local-timestamp-millis/micros (doc/index.md:66-91);
- maps are rejected for the data path, as in the reference
  (opwvhk/avro/io/AsAvroParserBase.java:311).

The model is deliberately tiny and immutable: it exists to be *resolved*
against an observed Spark schema on the driver, never shipped to executors.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES = {"boolean", "int", "long", "float", "double", "string", "bytes", "null"}
_LOGICALS = {
    "date",
    "time-millis",
    "time-micros",
    "timestamp-millis",
    "timestamp-micros",
    "local-timestamp-millis",
    "local-timestamp-micros",
}


class ReadType:
    """Base class for all read-schema types."""

    def describe(self) -> str:
        return type(self).__name__


@dataclass(frozen=True)
class PrimitiveType(ReadType):
    kind: str  # boolean | int | long | float | double | string | bytes

    def __post_init__(self) -> None:
        if self.kind not in _PRIMITIVES - {"null"}:
            raise ValueError(f"unknown primitive {self.kind!r}")

    def describe(self) -> str:
        return self.kind


@dataclass(frozen=True)
class LogicalType(ReadType):
    kind: str  # member of _LOGICALS

    def __post_init__(self) -> None:
        if self.kind not in _LOGICALS:
            raise ValueError(f"unknown logical type {self.kind!r}")

    def describe(self) -> str:
        return self.kind


@dataclass(frozen=True)
class DecimalType(ReadType):
    precision: int
    scale: int

    def describe(self) -> str:
        return f"decimal({self.precision},{self.scale})"


@dataclass(frozen=True)
class EnumType(ReadType):
    name: str
    symbols: tuple[str, ...]
    default: str | None = None

    def describe(self) -> str:
        return f"enum({self.name})"


@dataclass(frozen=True)
class FixedType(ReadType):
    name: str
    size: int

    def describe(self) -> str:
        return f"fixed({self.size})"


@dataclass(frozen=True)
class ArrayType(ReadType):
    items: ReadType
    items_nullable: bool = False

    def describe(self) -> str:
        return f"array<{self.items.describe()}>"


@dataclass(frozen=True)
class Field:
    name: str
    type: ReadType
    nullable: bool = False
    default: Any = ...  # Ellipsis = no default (distinct from None = null default)
    aliases: tuple[str, ...] = ()
    doc: str | None = None

    @property
    def has_default(self) -> bool:
        return self.default is not ...

    def match_names(self) -> tuple[str, ...]:
        return (self.name, *self.aliases)


@dataclass(frozen=True)
class RecordType(ReadType):
    name: str
    fields: tuple[Field, ...]
    doc: str | None = None
    aliases: tuple[str, ...] = ()

    def field_map(self) -> dict[str, Field]:
        out: dict[str, Field] = {}
        for f in self.fields:
            for n in f.match_names():
                out.setdefault(n, f)
        return out

    def describe(self) -> str:
        return f"record({self.name})"


# ---------------------------------------------------------------------------
# Avro .avsc loading (so reference test fixtures translate 1:1)
# ---------------------------------------------------------------------------


def from_avsc(schema: str | dict | list) -> tuple[ReadType, bool]:
    """Parse an Avro schema (JSON string or decoded object) into a
    (ReadType, nullable) pair. Unions other than [null, T] are rejected,
    matching the reference (opwvhk/avro/io/AsAvroParserBase.java:336).

    Named-type references (including recursive ones, e.g. a record field
    typed by its enclosing record's name) resolve through a names registry,
    mirroring the reference's memoized resolver compilation
    (io/AsAvroParserBase.java:355-398; io/DelegatingResolver.java:6-52):
    records register BEFORE their fields parse, so recursion terminates.
    """
    if isinstance(schema, str) and schema.strip().startswith(("{", "[")):
        schema = json.loads(schema)
    return _parse(schema, {})


def _register(names: dict[str, ReadType], s: dict, rt: ReadType) -> None:
    ns = s.get("namespace")
    for n in (s["name"], *s.get("aliases", ())):
        names[n] = rt
        if ns:
            names[f"{ns}.{n}"] = rt


def _parse(s: Any, names: dict[str, ReadType]) -> tuple[ReadType, bool]:
    if isinstance(s, str):
        if s in _PRIMITIVES:
            if s == "null":
                raise ValueError("bare null type is not a value type")
            return PrimitiveType(s), False
        if s in names:
            return names[s], False
        raise ValueError(f"undefined named type reference {s!r}")
    if isinstance(s, list):  # union
        non_null = [b for b in s if b != "null"]
        if len(non_null) != 1 or len(s) > 2:
            raise ValueError(f"only [null, T] unions supported, got {s!r}")
        inner, _ = _parse(non_null[0], names)
        return inner, "null" in s
    if not isinstance(s, dict):
        raise ValueError(f"bad schema node {s!r}")

    logical = s.get("logicalType")
    t = s["type"]
    if logical:
        if logical == "decimal":
            return DecimalType(int(s["precision"]), int(s.get("scale", 0))), False
        if logical in _LOGICALS:
            return LogicalType(logical), False
        # unknown logical types fall back to the underlying type (Avro spec)
    if t == "enum":
        et = EnumType(s["name"], tuple(s["symbols"]), s.get("default"))
        _register(names, s, et)
        return et, False
    if t == "fixed":
        ft = FixedType(s["name"], int(s["size"]))
        _register(names, s, ft)
        return ft, False
    if t == "array":
        items, items_nullable = _parse(s["items"], names)
        return ArrayType(items, items_nullable), False
    if t == "map":
        raise ValueError("map types are unsupported (reference parity: doc/index.md:71)")
    if t == "record":
        # register the (empty) record before parsing fields so recursive
        # references resolve to the same instance
        rec = RecordType(s["name"], (), s.get("doc"), tuple(s.get("aliases", ())))
        _register(names, s, rec)
        fields = []
        for fs in s["fields"]:
            ftype, fnullable = _parse(fs["type"], names)
            fields.append(
                Field(
                    name=fs["name"],
                    type=ftype,
                    nullable=fnullable,
                    default=fs.get("default", ...),
                    aliases=tuple(fs.get("aliases", ())),
                    doc=fs.get("doc"),
                )
            )
        object.__setattr__(rec, "fields", tuple(fields))
        return rec, False
    if isinstance(t, (str, list, dict)) and t not in ("record", "enum", "fixed", "array", "map"):
        return _parse(t, names)
    raise ValueError(f"unsupported schema node {s!r}")


# ---------------------------------------------------------------------------
# Spark-type projection of a read schema
# ---------------------------------------------------------------------------


def to_spark_type(rt: ReadType, _seen: frozenset[int] = frozenset()) -> T.DataType:
    """The Spark type a resolved column will have (SURVEY.md §1.2 mapping).

    time-of-day types map to LongType micros-of-day (Spark has no TIME type);
    local timestamps map to TimestampNTZType.

    A recursive record (named-type self-reference, legal in .avsc) has no
    finite flat Spark type: raise a clear error instead of RecursionError,
    mirroring the explicit recursion checks in both to_write_type paths.
    """
    if isinstance(rt, PrimitiveType):
        return {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "bytes": T.BinaryType(),
        }[rt.kind]
    if isinstance(rt, LogicalType):
        if rt.kind == "date":
            return T.DateType()
        if rt.kind.startswith("time-"):
            return T.LongType()  # micros (or millis) of day
        if rt.kind.startswith("local-timestamp"):
            return T.TimestampNTZType()
        return T.TimestampType()
    if isinstance(rt, DecimalType):
        return T.DecimalType(rt.precision, rt.scale)
    if isinstance(rt, EnumType):
        return T.StringType()
    if isinstance(rt, FixedType):
        return T.BinaryType()
    if isinstance(rt, ArrayType):
        return T.ArrayType(to_spark_type(rt.items, _seen), rt.items_nullable)
    if isinstance(rt, RecordType):
        if id(rt) in _seen:
            raise ValueError(
                f"recursive record {rt.name!r} has no flat Spark type "
                "(self-referencing named types cannot be projected to a struct)"
            )
        inner = _seen | {id(rt)}
        return T.StructType(
            [
                T.StructField(
                    f.name,
                    to_spark_type(f.type, inner),
                    f.nullable,
                    # field docs ride along as Spark column comments so
                    # SchemaManipulator.documentation() keeps them
                    {"comment": f.doc} if f.doc else {},
                )
                for f in rt.fields
            ]
        )
    raise ValueError(f"unmapped read type {rt!r}")
