"""Streaming deduplication: the streaming counterpart of the batch dedup
family (dedup.py) — drop documents whose dedup key was already seen in an
earlier micro-batch.

Two state policies, both Spark-native stateful operators (no custom state
code — Catalyst's streaming dedup operator keeps one state row per key):

- **bounded replay / backfill** (``watermark=None``): plain streaming
  ``dropDuplicates`` — state grows with distinct keys, which is exactly
  right for a finite availableNow replay over a staged corpus;
- **continuous ingest** (``watermark='1 hour'`` etc.):
  ``dropDuplicatesWithinWatermark`` — a duplicate arriving within the
  watermark horizon of its first occurrence is dropped, and state for
  keys older than the horizon is evicted, so the state store is bounded
  by the ingest rate × horizon, not by corpus history. This is the only
  policy that survives a forever-running 10^12-turn ingest; exact
  global dedup of an unbounded stream requires unbounded state by
  definition, so the horizon IS the contract (same reasoning as the
  stateful validator's idle timeout, streaming/stateful.py).

Emitted rows are the FIRST occurrence of each key per Spark's stateful
dedup semantics. Which physical row is "first" for keys duplicated
WITHIN one micro-batch depends on partition ordering — consumers needing
deterministic row identity should project the key columns (the key SET
is deterministic) or pre-aggregate, exactly like the driver query does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Attach the batch dedup family's normalization fingerprint
    (functions/text.fingerprint: md5 of lowercased, punctuation-stripped,
    whitespace-collapsed text) — works on static AND streaming frames
    (pure Column expression)."""
    from avro_conversions_spark.functions.text import fingerprint

    return df.withColumn(out_col, fingerprint(F.col(text_col)))


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("fingerprint",),
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Cross-micro-batch exact dedup on ``key_cols``.

    ``watermark=None``: unbounded state (finite replays only).
    ``watermark='10 minutes'``: bounded state via
    dropDuplicatesWithinWatermark on ``ts_col``.
    """
    if watermark is None:
        return stream.dropDuplicates(list(key_cols))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
