"""Skew-aware partitioning and t-digest quantile sketches."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from avro_conversions_spark import partitioning as P
from avro_conversions_spark.functions.tdigest import (
    build_digest,
    digest_quantile,
    merge_digests,
    tdigest_quantiles,
)
from avro_conversions_spark.transcripts import transcripts


@pytest.fixture(scope="module")
def skewed(spark):
    # 2 hot conversations at 100x + 200 normal ones
    return transcripts(spark, n_convs=202, turns_per_conv=10, hot_convs=2, hot_factor=100)


def test_hot_key_detection(spark, skewed):
    hot = P.hot_keys(skewed, "conv_id", hot_threshold=0.01)
    ids = {r.conv_id for r in hot.collect()}
    assert ids == {"conv-00000000", "conv-00000001"}


def test_salting_spreads_hot_keys(spark, skewed):
    hot = P.hot_keys(skewed, "conv_id", hot_threshold=0.01)
    salted = P.salt_column(skewed, "conv_id", hot, salt_buckets=8)
    dist = (
        salted.groupBy("conv_id", "_salt").count()
        .groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_salts"))
    )
    by_key = {r.conv_id: r.n_salts for r in dist.collect()}
    assert by_key["conv-00000000"] == 8  # hot key spread over all buckets
    assert by_key["conv-00000005"] == 1  # normal key stays together


def test_repartition_skew_aware_partition_sizes(spark, skewed):
    out = P.repartition_skew_aware(skewed, "conv_id", n_partitions=16, hot_threshold=0.01)
    sizes = out.groupBy(F.spark_partition_id().alias("p")).count().collect()
    total = sum(r["count"] for r in sizes)
    biggest = max(r["count"] for r in sizes)
    # without salting one partition would hold a whole hot conv (~1000 rows
    # of ~4000 total); with salting the max partition stays well below that
    assert biggest < 0.2 * total


def test_salted_group_count_exact(spark, skewed):
    got = {r.conv_id: r.n_rows for r in P.salted_group_count(skewed, "conv_id").collect()}
    want = {r.conv_id: r["count"] for r in skewed.groupBy("conv_id").count().collect()}
    assert got == want


# --- t-digest ---------------------------------------------------------------


def test_tdigest_accuracy_uniform():
    rng = np.random.RandomState(3)
    vals = rng.uniform(0, 100, 50_000)
    m, w = build_digest(vals, delta=100)
    assert len(m) <= 120  # compressed far below input size
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = digest_quantile(m, w, q)
        true = np.quantile(vals, q)
        assert abs(est - true) < 1.5, (q, est, true)


def test_tdigest_merge_matches_single():
    rng = np.random.RandomState(4)
    a, b = rng.normal(0, 1, 20_000), rng.normal(5, 2, 20_000)
    merged = merge_digests([build_digest(a), build_digest(b)])
    allv = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9):
        assert abs(digest_quantile(*merged, q) - np.quantile(allv, q)) < 0.25


def test_tdigest_distributed(spark):
    df = spark.range(100_000).select((F.col("id") % 1000).cast("double").alias("v"))
    got = dict(tdigest_quantiles(df, "v", [0.5, 0.9], n_buckets=8))
    assert abs(got[0.5] - 499.5) < 15
    assert abs(got[0.9] - 899.1) < 15


def test_asof_join_semantics(spark):
    from avro_conversions_spark.operators.asof import asof_join
    import datetime as dt

    TS = dt.datetime
    left = spark.createDataFrame(
        [(1, "a", TS(2024, 1, 1, 10, 0)), (2, "a", TS(2024, 1, 1, 12, 0)),
         (3, "b", TS(2024, 1, 1, 9, 0))],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 9, 30), 1.0),   # before both a-events
         ("a", TS(2024, 1, 1, 11, 0), 2.0),   # between them
         ("a", TS(2024, 1, 1, 12, 0), 3.0),   # same instant as event 2 → visible
         ("b", TS(2024, 1, 1, 9, 30), 9.0)],  # AFTER b's only event → invisible
        "k string, rts timestamp, px double",
    )
    out = {r.event_id: (r.asof_rts, r.asof_px)
           for r in asof_join(left, right, key="k", left_ts="ts", right_ts="rts").collect()}
    assert out[1] == (TS(2024, 1, 1, 9, 30), 1.0)
    assert out[2] == (TS(2024, 1, 1, 12, 0), 3.0)  # <= tie included
    assert out[3] == (None, None)  # no preceding right row
