"""Optional Iceberg binding for tables + the watermark ledger.

The north rule names Iceberg tables; this sandbox has no network, so the
Iceberg runtime jar usually cannot resolve. This module makes the attempt
real instead of hypothetical:

- ``iceberg_builder_conf()``   -> the exact SparkSession configs needed
  (``spark.jars.packages`` + catalog wiring) — pass to the session factory
  on a cluster where Ivy/network is available;
- ``iceberg_available(spark)`` -> probes the running session for the
  Iceberg SQL extensions by actually creating a table;
- ``IcebergLedger``            -> the ParquetLedger contract on an Iceberg
  table: commits are single-row ACID appends, resume reads are snapshot-
  consistent. Storage stays behind the same duck-typed interface
  (ledger.ParquetLedger), per SURVEY.md §7 "Hard parts".

Tests skip when the runtime jar is absent (the expected state here);
everything else in the engine runs on the parquet fallback unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# iceberg-spark runtime artifact for Spark 4.x / Scala 2.13; resolved via
# Ivy at session start when the network allows
ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def iceberg_builder_conf(warehouse: str, catalog: str = "local") -> dict[str, str]:
    """SparkSession configs enabling an Iceberg hadoop catalog. Use with
    the session factory: ``get_spark(extra_conf=iceberg_builder_conf(...))``
    on an environment with network/preinstalled jars."""
    return {
        "spark.jars.packages": ICEBERG_PACKAGE,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """Probe by creating (and dropping) a throwaway Iceberg table — the
    only reliable signal that the runtime jar actually loaded."""
    try:
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {catalog}.acs_probe (x INT) USING iceberg"
        )
        spark.sql(f"DROP TABLE IF EXISTS {catalog}.acs_probe")
        return True
    except Exception:  # noqa: BLE001 — any failure means "not available"
        return False


@dataclass
class IcebergLedger:
    """Watermark ledger on an Iceberg table — same contract as
    ledger.ParquetLedger (read / commit / completed), with ACID appends
    and snapshot-consistent resume reads instead of file-per-commit."""

    spark: SparkSession
    table: str  # e.g. "local.db.watermarks"

    def _ensure(self) -> None:
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.table} (
                run_id STRING, partition_key STRING, completed_ts TIMESTAMP,
                rows BIGINT, lineage STRING) USING iceberg"""
        )

    def read(self) -> DataFrame:
        self._ensure()
        return self.spark.read.table(self.table)

    def commit(self, run_id: str, partition_key: str, rows: int, lineage: str) -> None:
        self._ensure()
        df = self.spark.createDataFrame(
            [(run_id, partition_key, None, int(rows), lineage)],
            "run_id string, partition_key string, completed_ts timestamp, "
            "rows long, lineage string",
        ).withColumn("completed_ts", F.current_timestamp())
        df.writeTo(self.table).append()

    def completed(self, run_id: str) -> set[str]:
        return {
            r.partition_key
            for r in self.read()
            .where(F.col("run_id") == run_id)
            .select("partition_key")
            .collect()
        }
