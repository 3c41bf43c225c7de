"""Bucketed-table layout for shuffle-free (co-located) joins.

At 100 TB the transcript fact table is joined/grouped by conv_id over and
over (sequence checks, per-conversation stats, tool-call joins). Writing
it bucketed by conv_id once moves that shuffle from every query to the
single write:

    write_bucketed(df, "transcripts_b", buckets=512, key="conv_id")

A subsequent join between two tables bucketed on the same key with the
same bucket count has NO Exchange on either side (verified by
tests/test_bucketed.py via plan inspection), and groupBy(conv_id) reuses
the bucketing as a pre-shuffle.

Bucket count sizing: target ~128 MB per bucket file per partition write;
at 100 TB / 512 buckets each bucket is ~200 GB split across files — size
``buckets`` to cluster cores (2-4x total parallelism) in production.

Spark bucketing requires saveAsTable (a catalog table, hive-style layout);
the default in-session catalog works locally and on clusters alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str = "conv_id",
    sort_by: str | None = "turn_idx",
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort_by:
        # sortBy within buckets: per-conversation order is free at read
        # time — the sequence window becomes a sort-free window
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)
