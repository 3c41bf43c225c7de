"""Sequence packing (round 5): concat-and-split layout inside hash
buckets. Pins the placement arithmetic on a hand-computed single-bucket
case, the stability contract (pure function of (seed, id)), and the
layout invariants (offsets in range, contiguous fill, straddle flag).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark import sampling


@pytest.fixture(scope="module")
def sized(spark):
    # explicit token counts; single bucket so the layout is hand-checkable
    rows = [(i, 1, n) for i, n in enumerate([60, 50, 30, 80, 10])]
    df = spark.createDataFrame(rows, "doc_id long, dummy int, n_tokens long")
    return df


def test_single_bucket_layout_hand_computed(spark, sized):
    out = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(
            sized, budget=100, n_tokens_col="n_tokens", n_buckets=1
        ).collect()
    }
    # cum: 60, 110, 140, 220, 230 — starts: 0, 60, 110, 140, 220
    assert (out[0]["pack_id"], out[0]["pack_offset"], out[0]["spans_boundary"]) == (0, 0, False)
    assert (out[1]["pack_id"], out[1]["pack_offset"], out[1]["spans_boundary"]) == (0, 60, True)
    assert (out[2]["pack_id"], out[2]["pack_offset"], out[2]["spans_boundary"]) == (1, 10, False)
    assert (out[3]["pack_id"], out[3]["pack_offset"], out[3]["spans_boundary"]) == (1, 40, True)
    assert (out[4]["pack_id"], out[4]["pack_offset"], out[4]["spans_boundary"]) == (2, 20, False)


def test_doc_ending_exactly_at_boundary_does_not_straddle(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 50)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(
            df, budget=100, n_tokens_col="n_tokens", n_buckets=1
        ).collect()
    }
    assert out[0]["spans_boundary"] is False  # fills pack 0 exactly
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (1, 0)


def test_oversized_doc_spans_and_next_doc_lands_after_it(spark):
    df = spark.createDataFrame(
        [(0, 250), (1, 10)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(
            df, budget=100, n_tokens_col="n_tokens", n_buckets=1
        ).collect()
    }
    assert out[0]["spans_boundary"] is True  # crosses two cuts
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (2, 50)


def test_assignment_stable_under_repartitioning(spark):
    rows = [(i, f"{'w ' * (i % 37 + 1)}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: (r["bucket"], r["pack_id"], r["pack_offset"])
         for r in sampling.pack_sequences(df, budget=64, n_buckets=8).collect()}
    b = {r["doc_id"]: (r["bucket"], r["pack_id"], r["pack_offset"])
         for r in sampling.pack_sequences(df.repartition(13), budget=64, n_buckets=8).collect()}
    assert a == b


def test_layout_invariants_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sampling.pack_sequences(docs, budget=512, n_buckets=8)
    bad = out.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 512) | (F.col("pack_id") < 0)
    ).count()
    assert bad == 0
    # contiguous fill: per bucket, total tokens == last doc's start + size
    agg = (
        out.groupBy("bucket")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max(F.col("pack_id") * 512 + F.col("pack_offset") + F.col("n_tokens")).alias("end"),
        )
        .where(F.col("total") != F.col("end"))
        .count()
    )
    assert agg == 0


def test_rejects_nonpositive_budget(spark, sized):
    with pytest.raises(ValueError):
        sampling.pack_sequences(sized, budget=0, n_tokens_col="n_tokens")
