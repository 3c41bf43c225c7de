"""Referential integrity: values of a column must exist in a dimension.

SURVEY.md §2.8: small dimension → broadcast left_anti join (no shuffle of
the fact table); large dimension → sort-merge left_anti (AQE may still
convert to broadcast at runtime if the built side turns out small).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ReferentialConstraint:
    column: str
    dim: DataFrame
    dim_column: str
    name: str = ""
    broadcast: bool = True
    ignore_nulls: bool = True  # null FK is "absent", not dangling
    reason: str = "DANGLING_REFERENCE"

    def __post_init__(self) -> None:
        if not self.name:
            self.name = f"ref({self.column})"

    def violations(self, df: DataFrame) -> DataFrame:
        """Rows whose ``column`` value is absent from the dimension."""
        dim = self.dim.select(F.col(self.dim_column).alias(self.column)).dropDuplicates()
        if self.broadcast:
            dim = F.broadcast(dim)
        facts = df if not self.ignore_nulls else df.where(F.col(self.column).isNotNull())
        return facts.join(dim, on=self.column, how="left_anti")

    def violation_rows(self, df: DataFrame, key_cols: list[str]) -> DataFrame:
        return self.violations(df).select(
            *key_cols,
            F.lit(self.name).alias("constraint"),
            F.lit(self.column).alias("column"),
            F.lit(self.reason).alias("reason"),
            F.col(self.column).cast("string").alias("observed"),
        )
