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
                out_fields.append(T.StructField(new, dt, f_.nullable))
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
            out.append(T.StructField(new, dt, f_.nullable))
        return T.StructType(out)


# --- documentation (M7: AvroSchemaUtils.java:37-100) -----------------------


def document_schema_markdown(schema: T.StructType, title: str = "schema") -> str:
    """Markdown table of (path, type, nullable) rows with the reference's
    markers: `?` optional, `[]` array (AvroSchemaUtils.java:187-198)."""
    lines = [f"# {title}", "", "| Field(path) | Type | Documentation |", "|---|---|---|"]

    def walk(dtype: T.DataType, path: str, nullable: bool, meta: dict) -> None:
        marker = "?" if nullable else ""
        doc = (meta or {}).get("comment", "")
        if isinstance(dtype, T.StructType):
            lines.append(f"| {path or '(root)'} | record{marker} | {doc} |")
            for f_ in dtype.fields:
                walk(f_.dataType, f"{path}.{f_.name}" if path else f_.name, f_.nullable, f_.metadata)
        elif isinstance(dtype, T.ArrayType):
            lines.append(f"| {path}[] | {dtype.elementType.simpleString()}{marker} | {doc} |")
        else:
            lines.append(f"| {path} | {dtype.simpleString()}{marker} | {doc} |")

    walk(schema, "", False, {})
    return "\n".join(lines)


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
