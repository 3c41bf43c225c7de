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
    """NULL for undefined similarity (either side NULL, ragged, or
    all-zero): the bare division was an ANSI DIVIDE_BY_ZERO that let ONE
    zero vector (a failed embedding — realistic at corpus scale) crash
    every cosine-scoring job (round-5 adversarial sweep)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def simhash_bits(v: Column, bits: int = 16) -> Column:
    """SimHash of an embedding: sign bits of the first ``bits`` dimensions
    packed into a long — a cheap LSH bucket key for near-duplicate grouping
    of dense vectors. NULL for NULL or shorter-than-``bits`` vectors: under
    ANSI mode element_at past the end is a job-killing
    INVALID_ARRAY_INDEX (round-5 adversarial sweep), and a NULL bucket
    never joins, so malformed vectors simply can't pair."""
    idx = F.sequence(F.lit(1), F.lit(bits))
    packed = F.aggregate(
        F.transform(
            idx,
            lambda i: F.when(F.element_at(v, i.cast("int")) > 0, F.lit(1)).otherwise(F.lit(0))
            * F.pow(F.lit(2.0), (i - 1).cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(v) >= bits, packed)


def dot_double(a: Column, b: Column) -> Column:
    """``dot`` for columns that are ALREADY array<double> — skips the
    defensive per-element cast (each ``to_double`` allocates a fresh
    array per evaluation, which matters in pair-join hot paths where a
    dot runs once per candidate pair)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def const_double_array(values) -> Column:
    """array<double> literal built in ONE py4j call via a SQL text
    expression. PySpark's ``F.lit(list)`` recurses into one ``lit`` py4j
    round trip per element (measured 0.77 s for a 24×64 matrix), which
    dominates driver-side plan build for iterative operators re-issuing
    centroid/weight literals every step; ``F.expr`` ships one string and
    parses on the JVM (~5 ms). ``repr`` emits the shortest decimal that
    round-trips the double and Java's parser is correctly rounded, so the
    literal values are bit-identical to the F.lit form (pinned by test).
    Non-finite values (inf/nan) have no SQL literal — fall back to F.lit."""
    import math

    vals = [float(v) for v in values]
    if vals and all(math.isfinite(v) for v in vals):
        return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")
    return F.lit(vals)


def const_double_matrix(rows) -> Column:
    """array<array<double>> literal in one py4j call — see
    const_double_array."""
    import math

    mat = [[float(v) for v in r] for r in rows]
    if mat and all(r and all(math.isfinite(v) for v in r) for r in mat):
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(v) + "D" for v in r) + ")" for r in mat
            )
            + ")"
        )
    return F.lit(mat)
