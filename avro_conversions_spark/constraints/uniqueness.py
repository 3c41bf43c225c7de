"""Uniqueness of a (composite) key via salted two-phase aggregation.

The reference has no table-level operators (SURVEY.md §2.8); the north rule
requires uniqueness of (conv_id, turn_idx) with explicit skew handling.

Scale notes (100 TB, 1000 executors):
- counting per composite key benefits from Spark's built-in partial
  (map-side) aggregation, but a pathologically hot key would still funnel
  all of its partial counts into one reducer. The salted two-phase plan
  splits phase 1 by ``salt = pmod(xxhash64(all key cols, seed), S)`` so the
  heaviest key spreads over S reducers, then phase 2 merges S partial
  counts per key — a shuffle of |distinct keys| * S tiny rows.
- with AQE on, skewed shuffle partitions are also split at runtime; the
  explicit salt makes the plan robust even when AQE is off.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class UniqueConstraint:
    columns: tuple[str, ...] = ("conv_id", "turn_idx")
    name: str = ""
    salt_buckets: int = 16
    reason: str = "DUPLICATE_KEY"

    def __post_init__(self) -> None:
        if not self.name:
            self.name = f"unique({','.join(self.columns)})"

    def duplicate_keys(self, df: DataFrame) -> DataFrame:
        """Keys occurring more than once, with their multiplicity."""
        cols = list(self.columns)
        salt = F.pmod(F.xxhash64(F.lit("dupsalt"), *cols), F.lit(self.salt_buckets))
        partial = (
            df.select(*cols)
            .withColumn("_salt", salt)
            .groupBy(*cols, "_salt")
            .agg(F.count(F.lit(1)).alias("_partial"))
        )
        return (
            partial.groupBy(*cols)
            .agg(F.sum("_partial").alias("multiplicity"))
            .where(F.col("multiplicity") > 1)
        )

    def violations(self, df: DataFrame) -> DataFrame:
        """One violation row per duplicated key (not per duplicate row):
        (key cols..., constraint, column, reason, observed)."""
        dups = self.duplicate_keys(df)
        return dups.select(
            *self.columns,
            F.lit(self.name).alias("constraint"),
            F.lit(",".join(self.columns)).alias("column"),
            F.lit(self.reason).alias("reason"),
            F.concat(F.lit("multiplicity="), F.col("multiplicity").cast("string")).alias(
                "observed"
            ),
        )
