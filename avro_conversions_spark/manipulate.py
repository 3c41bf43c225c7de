"""Schema manipulation — the Spark re-expression of the reference's
SchemaManipulator (opwvhk/avro/SchemaManipulator.java, 498 LoC) and
AvroSchemaUtils markdown docs (opwvhk/avro/util/AvroSchemaUtils.java).

Operates on Spark StructTypes (driver-side) and produces both a rewritten
schema and the projection expressions that apply it to a DataFrame —
renames/unwraps become `select` projections, never data movement
(SURVEY.md §2.5: M1 recursive walk, M2/M4 rename by path with alias
retention, M3 naming conventions, M5 array unwrapping, M6 field sort,
M7 markdown docs, M8 unique-name validation).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- naming conventions (util/NamingConvention.java:75-198) ---------------


def _words(name: str) -> list[str]:
    """NFD-normalize, strip accents, split into words on case/sep boundaries."""
    s = unicodedata.normalize("NFD", name)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = re.sub(r"[^0-9A-Za-z]+", " ", s)
    s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", " ", s)
    s = re.sub(r"(?<=[A-Z])(?=[A-Z][a-z])", " ", s)
    return [w for w in s.split() if w]


NAMING_CONVENTIONS = {
    "snake_case": lambda ws: "_".join(w.lower() for w in ws),
    "SCREAMING_SNAKE_CASE": lambda ws: "_".join(w.upper() for w in ws),
    "kebab-case": lambda ws: "-".join(w.lower() for w in ws),
    "camelCase": lambda ws: (ws[0].lower() + "".join(w.capitalize() for w in ws[1:])) if ws else "",
    "PascalCase": lambda ws: "".join(w.capitalize() for w in ws),
    "dotted.lower.case": lambda ws: ".".join(w.lower() for w in ws),
    "DOTTED.UPPER.CASE": lambda ws: ".".join(w.upper() for w in ws),
    "lowercase": lambda ws: "".join(w.lower() for w in ws),
    "UPPERCASE": lambda ws: "".join(w.upper() for w in ws),
}


def convert_name(name: str, convention: str) -> str:
    return NAMING_CONVENTIONS[convention](_words(name))


# --- manipulator -----------------------------------------------------------


@dataclass
class SchemaManipulator:
    """Fluent rewrite of a DataFrame's (possibly nested) schema.

    Mirrors the reference's builder (SchemaManipulator.java:258-485):
    renameField / renameWithAliases / useNamingConvention / unwrapArray /
    sortFields, finished by apply(df) or documentation().
    """

    renames: dict[str, str] = field(default_factory=dict)  # dotted path -> new name
    convention: str | None = None
    unwraps: set[str] = field(default_factory=set)  # dotted path of wrapper struct
    sort: bool = False
    # alias retention (M2): old names kept for later resolution matching
    aliases: dict[str, str] = field(default_factory=dict)  # new dotted path -> old name

    def rename_field(self, path: str, new_name: str) -> "SchemaManipulator":
        self.renames[path] = new_name
        parent, _, _ = path.rpartition(".")
        self.aliases[(parent + "." if parent else "") + new_name] = path.rsplit(".", 1)[-1]
        return self

    def use_naming_convention(self, convention: str) -> "SchemaManipulator":
        if convention not in NAMING_CONVENTIONS:
            raise ValueError(f"unknown convention {convention!r}")
        self.convention = convention
        return self

    def unwrap_array(self, wrapper_path: str) -> "SchemaManipulator":
        """M5: replace struct{inner: array<X>} with array<X>
        (SchemaManipulator.java:405-459)."""
        self.unwraps.add(wrapper_path)
        return self

    def sort_fields(self) -> "SchemaManipulator":
        self.sort = True
        return self

    # -- application ---------------------------------------------------------

    def _new_name(self, path: str, name: str) -> str:
        if path in self.renames:
            return self.renames[path]
        if self.convention:
            return convert_name(name, self.convention)
        return name

    def _project(self, col: Column, dtype: T.DataType, path: str) -> tuple[Column, T.DataType]:
        if isinstance(dtype, T.StructType):
            if path in self.unwraps:
                arr_fields = [f for f in dtype.fields if isinstance(f.dataType, T.ArrayType)]
                if len(dtype.fields) != 1 or not arr_fields:
                    raise ValueError(
                        f"cannot unwrap {path}: wrapper must have exactly one array field "
                        "(SchemaManipulator.java:405-459)"
                    )
                inner = dtype.fields[0]
                return self._project(
                    col.getField(inner.name), inner.dataType, f"{path}.{inner.name}"
                )
            fields = list(dtype.fields)
            if self.sort:
                fields = sorted(fields, key=lambda f: self._new_name(f"{path}.{f.name}", f.name))
            members, out_fields = [], []
            for f_ in fields:
                child_path = f"{path}.{f_.name}" if path else f_.name
                new = self._new_name(child_path, f_.name)
                c, dt = self._project(col.getField(f_.name), f_.dataType, child_path)
                members.append(c.alias(new))
                out_fields.append(T.StructField(new, dt, f_.nullable, f_.metadata))
            return F.struct(*members), T.StructType(out_fields)
        if isinstance(dtype, T.ArrayType):
            # rewrite elements through a transform only if anything changes below
            probe = self._project(F.lit(None), dtype.elementType, path)
            new_elem_type = probe[1]
            if new_elem_type == dtype.elementType and not self._touches(path):
                return col, dtype
            return (
                F.transform(col, lambda x: self._project(x, dtype.elementType, path)[0]),
                T.ArrayType(new_elem_type, dtype.containsNull),
            )
        return col, dtype

    def _touches(self, path: str) -> bool:
        pref = path + "."
        return any(
            p == path or p.startswith(pref)
            for p in list(self.renames) + list(self.unwraps)
        ) or self.convention is not None or self.sort

    def apply(self, df: DataFrame) -> DataFrame:
        cols = []
        fields = list(df.schema.fields)
        if self.sort:
            fields = sorted(fields, key=lambda f: self._new_name(f.name, f.name))
        for f_ in fields:
            new = self._new_name(f_.name, f_.name)
            c, _ = self._project(F.col(f_.name), f_.dataType, f_.name)
            cols.append(c.alias(new))
        return df.select(*cols)

    def apply_schema(self, schema: T.StructType) -> T.StructType:
        fields = list(schema.fields)
        if self.sort:
            fields = sorted(fields, key=lambda f: self._new_name(f.name, f.name))
        out = []
        for f_ in fields:
            new = self._new_name(f_.name, f_.name)
            _, dt = self._project(F.lit(None), f_.dataType, f_.name)
            out.append(T.StructField(new, dt, f_.nullable, f_.metadata))
        return T.StructType(out)


# --- documentation (M7: AvroSchemaUtils.java:37-100) -----------------------


def truncate(max_length: int, s: str | None) -> str | None:
    """F11 (util/Utils.java:57-65): truncate with ellipsis, exactly
    ``max_length`` chars when truncated (diagnostics helper)."""
    if s is None or len(s) <= max_length:
        return s
    return s[: max_length - 1] + "…"


_MD_HEADER = "| Field(path) | Type | Documentation |\n|-------------|------|---------------|\n"


def _md_doc(field_doc: str | None, type_doc: str | None) -> str:
    parts = [p for p in (field_doc, f"Type: {type_doc}" if type_doc else None) if p]
    return "\n".join(parts).replace("<", "&lt;").replace("\n", "<br/>")


def document_schema_rows(schema) -> list[tuple[str, str, str]]:
    """The (path, type, documentation) rows behind
    ``document_schema_markdown`` — same walk, queryable as data (the
    driver query `schema_docs_markdown` turns these into a DataFrame
    checked against a literal-rows oracle)."""
    return _document_rows(schema)


def document_schema_markdown(schema, title: str | None = None) -> str:
    """Markdown table of (path, type, documentation) rows with the
    reference's exact header and path markers (AvroSchemaUtils.java:37-100,
    187-198): ``?`` nullable, ``[]`` array, ``()`` map; logical-type names
    (``decimal(p,s)``, ``date``, ...); field docs joined with the type's
    own doc as ``Type: ...``; recursion-safe (a repeated named type prints
    one row at its second occurrence).

    Accepts a Spark StructType (docs from field metadata 'comment') or a
    ReadType RecordType (docs from the Avro model)."""
    lines = [f"# {title}", "", ""] if title else []
    out = _document_rows(schema)
    body = "".join(f"| {p} | {t} | {d} |\n" for p, t, d in out)
    return "\n".join(lines) + _MD_HEADER + body


def _document_rows(schema) -> list[tuple[str, str, str]]:
    from avro_conversions_spark.schema import model as M

    out: list[tuple[str, str, str]] = []
    seen: set[int] = set()

    def type_name(rt) -> str:
        if isinstance(rt, M.DecimalType):
            return f"decimal({rt.precision},{rt.scale})"
        if isinstance(rt, M.LogicalType):
            return rt.kind
        if isinstance(rt, M.EnumType):
            return "enum"
        if isinstance(rt, M.FixedType):
            return "fixed"
        if isinstance(rt, M.PrimitiveType):
            return rt.kind
        if isinstance(rt, M.RecordType):
            return "record"
        return "?"

    def walk_read(rt, path: str, field_doc: str | None, nullable: bool) -> None:
        p = path + "?" if nullable else path
        if isinstance(rt, M.RecordType):
            out.append((p, "record", _md_doc(field_doc, rt.doc)))
            if id(rt) in seen:
                return
            seen.add(id(rt))
            prefix = "" if not p else p.rstrip("?") + "."
            for f_ in rt.fields:
                walk_read(f_.type, prefix + f_.name, f_.doc, f_.nullable)
        elif isinstance(rt, M.ArrayType):
            walk_read(rt.items, p + "[]", field_doc, False)
        else:
            out.append((p, type_name(rt), _md_doc(field_doc, None)))

    def walk_spark(dtype: T.DataType, path: str, doc: str | None, nullable: bool) -> None:
        p = path + "?" if nullable else path
        if isinstance(dtype, T.StructType):
            out.append((p, "record", _md_doc(doc, None)))
            prefix = "" if not p else p.rstrip("?") + "."
            for f_ in dtype.fields:
                walk_spark(
                    f_.dataType,
                    prefix + f_.name,
                    (f_.metadata or {}).get("comment"),
                    f_.nullable,
                )
        elif isinstance(dtype, T.ArrayType):
            walk_spark(dtype.elementType, p + "[]", doc, False)
        elif isinstance(dtype, T.MapType):
            walk_spark(dtype.valueType, p + "()", doc, False)
        else:
            name = (
                f"decimal({dtype.precision},{dtype.scale})"
                if isinstance(dtype, T.DecimalType)
                else dtype.simpleString()
            )
            out.append((p, name, _md_doc(doc, None)))

    if isinstance(schema, T.StructType):
        walk_spark(schema, "", None, False)
    else:
        walk_read(schema, "", None, False)
    return out


def validate_unique_names(schema: T.StructType) -> None:
    """M8 (AvroSchemaUtils.java:108-170): duplicate field names anywhere in
    the tree (case-insensitive) are rejected."""
    def walk(dtype: T.DataType, path: str) -> None:
        if isinstance(dtype, T.StructType):
            seen: dict[str, str] = {}
            for f_ in dtype.fields:
                low = f_.name.lower()
                if low in seen:
                    raise ValueError(
                        f"duplicate field name {f_.name!r} (vs {seen[low]!r}) at {path or 'root'}"
                    )
                seen[low] = f_.name
                walk(f_.dataType, f"{path}.{f_.name}" if path else f_.name)
        elif isinstance(dtype, T.ArrayType):
            walk(dtype.elementType, path + "[]")

    walk(schema, "")


# --- fluent entry points (SchemaManipulator.java:66-108) -------------------


@dataclass
class BoundSchemaManipulator(SchemaManipulator):
    """A SchemaManipulator bound to a starting schema, mirroring the
    reference's ``SchemaManipulator.startFromAvro/JsonSchema/Xsd`` builders
    (SchemaManipulator.java:66-108): the write-schema document is loaded,
    a read schema inferred, and the fluent rename/unwrap/convention calls
    finish with either the rewritten schema or its markdown docs."""

    base: T.StructType | None = None

    def finish_schema(self) -> T.StructType:
        return self.apply_schema(self.base)

    def documentation(self, title: str | None = None) -> str:
        return document_schema_markdown(self.finish_schema(), title)


def start_from_schema(schema: T.StructType) -> BoundSchemaManipulator:
    """startFromAvro analogue over an already-known Spark schema."""
    return BoundSchemaManipulator(base=schema)


def start_from_json_schema(source: str | dict) -> BoundSchemaManipulator:
    """Load a JSON Schema document (draft 3 → 2020-12), infer the read
    schema via the type-election lattice, and open a fluent manipulation
    over it (SchemaManipulator.java:88-97)."""
    from avro_conversions_spark.schema.json_schema import infer_read_schema
    from avro_conversions_spark.schema.model import to_spark_type

    rt, _ = infer_read_schema(source)
    st = to_spark_type(rt)
    if not isinstance(st, T.StructType):
        st = T.StructType([T.StructField("value", st, True)])
    return BoundSchemaManipulator(base=st)


def start_from_xsd(source: str, root_element: str) -> BoundSchemaManipulator:
    """Load an XSD, analyze ``root_element`` (cardinality stack, facet
    math, simple/complexContent), infer the read schema, and open a fluent
    manipulation over it (SchemaManipulator.java:99-108)."""
    from avro_conversions_spark.schema.model import to_spark_type
    from avro_conversions_spark.schema.xsd import infer_read_schema_from_xsd

    rt = infer_read_schema_from_xsd(source, root_element)
    st = to_spark_type(rt)
    if not isinstance(st, T.StructType):
        st = T.StructType([T.StructField("value", st, True)])
    return BoundSchemaManipulator(base=st)
