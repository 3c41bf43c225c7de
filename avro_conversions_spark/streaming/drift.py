"""Streaming distribution-drift monitoring: per-micro-batch KS statistic
against a persisted baseline snapshot.

``foreachBatch`` is the Spark-first hook here: every micro-batch arrives
as a bounded DataFrame, so the batch ``DriftConstraint`` applies verbatim
— the t-digest reduction stays distributed (zero-exchange mapInPandas
partials per task), only O(delta) centroids per column reach the driver
for the KS evaluation, and the per-batch verdict rows append to the sink. No
custom state store is needed: the reference distribution lives in the
baseline snapshot table (built once by ``DriftConstraint.snapshot``), and
micro-batches are compared independently — exactly the monitoring shape
the north rule describes (drift of live transcript traffic vs a frozen
baseline), scaled by the stream's own partitioning.

At 100 TB/day rates the per-batch digest build is a narrow aggregation of
the constrained columns only; nothing full-width crosses the driver
boundary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from avro_conversions_spark.constraints.drift import DriftConstraint

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("ks", T.DoubleType(), True),
        T.StructField("threshold", T.DoubleType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


@dataclass
class StreamingDriftMonitor:
    """Attach a DriftConstraint to a streaming DataFrame.

    ``results`` captures verdicts in-process (tests / small jobs);
    ``output_path`` appends them as parquet for durable monitoring.
    """

    constraint: DriftConstraint
    output_path: str | None = None
    results: list[dict[str, Any]] = field(default_factory=list)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdicts = [
            {"batch_id": int(batch_id), **v} for v in self.constraint.check(batch_df)
        ]
        self.results.extend(verdicts)
        if self.output_path:
            rows = [
                (v["batch_id"], v["column"], v["ks"], v["threshold"], v["status"])
                for v in verdicts
            ]
            batch_df.sparkSession.createDataFrame(rows, VERDICT_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(self.output_path)

    def run_available_now(self, stream: DataFrame, checkpoint: str):
        """One pass over everything currently available (micro-batched),
        then stop — the batch-parity trigger used by the driver queries."""
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
