"""PII detection and redaction over text columns.

A web-scale training corpus is scrubbed of personally-identifiable
information before anything else touches it; these are the standard
regex-class detectors (email, IPv4, SSN, NANP phone, 16-digit card)
every curation pipeline runs, expressed as JVM-side ``regexp_count`` /
``regexp_replace`` Column expressions — no Python in the data path.

Pattern portability is a hard constraint here: the DuckDB oracle re-runs
the same patterns under RE2, so everything below avoids
lookaround/backreferences (RE2 has neither) and sticks to character
classes, bounded repetition, and ``\\b`` word boundaries, which Java
regex and RE2 interpret identically on ASCII.

Perf note: java-regex in a hot path costs ~16 µs/row (round-3
measurement, BENCH/BASELINE.md) — unavoidable for PII (the operator IS
pattern matching), so the cost is honest and linear; all five patterns
run in one projection over a single scan, no shuffle.

Redaction cascade order is load-bearing and fixed: EMAIL first (an email
local-part like ``user.10.0.0.1@x.com`` must not leak an IPv4 match),
then CARD (longest digit shape), SSN, PHONE (distinct digit shapes,
3-2-4 vs 3-3-4, so order between them is cosmetic), IPv4 last. Each
replacement target is a bracketed type tag, the convention scrubbers use
so downstream tokenizers see one sentinel token.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: (name, pattern, replacement tag) — cascade order matters, see
# module docstring
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
)


def pii_count(text: Column, kind: str) -> Column:
    """Occurrence count of one PII class (``regexp_count``, JVM-side)."""
    pat = {name: rx for name, rx, _ in PII_PATTERNS}[kind]
    return F.regexp_count(text, F.lit(pat))


def pii_counts(text: Column) -> list[Column]:
    """All class counts as ``n_<kind>`` columns, counted on the RAW text
    (before any redaction), so counts are independent of cascade order."""
    return [
        F.regexp_count(text, F.lit(rx)).cast("long").alias(f"n_{name}")
        for name, rx, _ in PII_PATTERNS
    ]


def redact(text: Column) -> Column:
    """Replace every PII span with its bracketed type tag, applying the
    classes in the fixed cascade order (see module docstring). Spark's
    ``regexp_replace`` is global, matching the oracle's ``'g'`` flag."""
    out = text
    for _, rx, tag in PII_PATTERNS:
        out = F.regexp_replace(out, rx, tag)
    return out
