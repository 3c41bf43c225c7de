"""Vector math over array<float> embedding columns.

Built on F.zip_with / F.aggregate (JVM higher-order functions) — stays in
whole-stage codegen, no UDF. Everything computes in float64 after an
explicit cast so results are reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def simhash_bits(v: Column, bits: int = 16) -> Column:
    """SimHash of an embedding: sign bits of the first ``bits`` dimensions
    packed into a long — a cheap LSH bucket key for near-duplicate grouping
    of dense vectors."""
    idx = F.sequence(F.lit(1), F.lit(bits))
    return F.aggregate(
        F.transform(
            idx,
            lambda i: F.when(F.element_at(v, i.cast("int")) > 0, F.lit(1)).otherwise(F.lit(0))
            * F.pow(F.lit(2.0), (i - 1).cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
