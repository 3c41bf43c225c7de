"""Skew-aware partitioning utilities (north rule: "explicitly repartitions
by conv_id with skew-aware salting for hot conversations").

Hot-key handling is a two-step recipe (SURVEY.md §2.8 partitioning row):

1. a cheap pre-pass counts rows per key over a hash-sample and flags keys
   whose share exceeds ``hot_threshold`` of the sample;
2. ``repartition(n, key, salt)`` where salt is 0 for normal keys and
   pmod(xxhash64(row-unique cols), salt_buckets) for hot keys — a hot
   conversation spreads over ``salt_buckets`` partitions instead of
   melting one executor.

Per-conversation operators (windows) must re-aggregate across salt buckets
afterwards; ``unsalted_regroup`` documents that contract. AQE's skew-join
splitting covers JOINs at runtime; this module covers aggregations/windows
and explicit repartition-before-write layouts, which AQE does not touch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame,
    key: str,
    hot_threshold: float = 0.001,
    sample_mod: int = 1,
    sample_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keys holding more than ``hot_threshold`` of rows.

    Default is a full pre-pass: the scan is pruned to the key column and
    map-side combine collapses it to (distinct keys × partitions) partial
    counts — cheap even at 100 TB. To sample instead, pass ``sample_mod``
    with ``sample_cols`` that vary per ROW (e.g. ('turn_idx',)): sampling
    must be row-level — hashing only the key would drop whole keys and a
    hot key then escapes detection with probability (mod-1)/mod."""
    rows = df.select(key, *sample_cols)
    if sample_mod > 1:
        if not sample_cols:
            raise ValueError("row-level sampling needs sample_cols that vary per row")
        rows = rows.where(
            F.pmod(F.xxhash64(key, *[F.col(c) for c in sample_cols]), F.lit(sample_mod)) == 0
        )
    counts = rows.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    total_row = counts.agg(F.sum("_n").alias("t")).collect()[0]
    total = total_row["t"] or 0
    if total == 0:
        return df.sparkSession.createDataFrame([], f"{key} string")
    cutoff = max(2, int(total * hot_threshold))
    return counts.where(F.col("_n") >= cutoff).select(key)


def salt_column(
    df: DataFrame,
    key: str,
    hot: DataFrame,
    salt_buckets: int = 16,
    row_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """Add ``_salt``: 0 for normal keys, hash-of-row for hot keys. The hot
    set is broadcast (it is small by construction)."""
    hot_flagged = hot.withColumn("_hot", F.lit(True))
    out = df.join(F.broadcast(hot_flagged), key, "left")
    salt = F.when(
        F.col("_hot").isNotNull(),
        F.pmod(F.xxhash64(*row_cols), F.lit(salt_buckets)),
    ).otherwise(F.lit(0))
    return out.withColumn("_salt", salt).drop("_hot")


def repartition_skew_aware(
    df: DataFrame,
    key: str = "conv_id",
    n_partitions: int | None = None,
    salt_buckets: int = 16,
    row_cols: tuple[str, ...] = ("turn_idx",),
    hot_threshold: float = 0.001,
) -> DataFrame:
    """repartition(n, key, _salt): co-locates each conversation (salt 0)
    while spreading hot conversations over ``salt_buckets`` partitions."""
    hot = hot_keys(df, key, hot_threshold=hot_threshold)
    salted = salt_column(df, key, hot, salt_buckets, row_cols)
    if n_partitions:
        return salted.repartition(n_partitions, F.col(key), F.col("_salt"))
    return salted.repartition(F.col(key), F.col("_salt"))


def salted_group_count(
    df: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase count-per-key robust to a single hot key: phase 1 groups
    (key, partition-id salt), phase 2 merges the ≤ salt_buckets partials
    per key. Verdicts re-key to the logical key in phase 2 (SURVEY.md
    'Hard parts': salting changes granularity, so results must be re-keyed
    after the salted aggregation)."""
    salt = F.pmod(F.xxhash64(F.spark_partition_id()), F.lit(salt_buckets))
    partial = (
        df.select(key)
        .withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n_rows"))


def unsalted_regroup(df: DataFrame, key: str, aggs: dict[str, Column]) -> DataFrame:
    """Merge salted partials back to logical keys: groupBy(key).agg(...).
    Callers aggregate per (key, _salt) first, then pass the merge exprs."""
    return df.groupBy(key).agg(*[v.alias(k) for k, v in aggs.items()])
