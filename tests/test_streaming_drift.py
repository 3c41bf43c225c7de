"""Streaming drift monitoring: per-micro-batch KS vs a frozen baseline
through foreachBatch (streaming/drift.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from avro_conversions_spark.constraints.drift import DriftConstraint, save_snapshot
from avro_conversions_spark.streaming.drift import StreamingDriftMonitor


def _mk_dirs():
    return (
        tempfile.mkdtemp(prefix="sdrift_data_"),
        tempfile.mkdtemp(prefix="sdrift_base_"),
        tempfile.mkdtemp(prefix="sdrift_ckpt_"),
    )


def test_streaming_drift_pass_and_fail(spark):
    data_dir, base_dir, ckpt = _mk_dirs()
    # baseline: uniform [0, 1000)
    base = spark.range(0, 20_000).select(
        (F.col("id") % 1000).cast("double").alias("v")
    )
    c = DriftConstraint(columns=["v"], baseline_path=base_dir, threshold=0.1)
    save_snapshot(c.snapshot(base), base_dir)

    # stream source: same distribution → KS ~ 0 → pass
    base.write.mode("overwrite").parquet(data_dir)
    stream = spark.readStream.schema("v double").parquet(data_dir)
    mon = StreamingDriftMonitor(c)
    mon.run_available_now(stream, ckpt)
    assert mon.results, "no batches processed"
    assert all(v["status"] == "pass" for v in mon.results)
    assert all(v["ks"] is not None and v["ks"] < 0.05 for v in mon.results)

    # shifted distribution → KS large → fail (fresh checkpoint = new query)
    data2, _, ckpt2 = _mk_dirs()
    shifted = spark.range(0, 20_000).select(
        ((F.col("id") % 1000) + 600).cast("double").alias("v")
    )
    shifted.write.mode("overwrite").parquet(data2)
    stream2 = spark.readStream.schema("v double").parquet(data2)
    mon2 = StreamingDriftMonitor(c)
    mon2.run_available_now(stream2, ckpt2)
    assert mon2.results
    assert all(v["status"] == "fail" for v in mon2.results)


def test_streaming_drift_parquet_sink(spark):
    data_dir, base_dir, ckpt = _mk_dirs()
    out_dir = tempfile.mkdtemp(prefix="sdrift_out_")
    base = spark.range(0, 5_000).select((F.col("id") % 100).cast("double").alias("v"))
    c = DriftConstraint(columns=["v"], baseline_path=base_dir, threshold=0.1)
    save_snapshot(c.snapshot(base), base_dir)
    base.write.mode("overwrite").parquet(data_dir)
    stream = spark.readStream.schema("v double").parquet(data_dir)
    mon = StreamingDriftMonitor(c, output_path=out_dir)
    mon.run_available_now(stream, ckpt)
    persisted = spark.read.parquet(out_dir).collect()
    assert len(persisted) == len(mon.results)
    assert {r.status for r in persisted} == {"pass"}
    assert {r.column for r in persisted} == {"v"}
