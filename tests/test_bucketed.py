"""Bucketed layout: co-located joins have no Exchange (plan-verified)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark.sources.bucketed import read_table, write_bucketed
from avro_conversions_spark.transcripts import transcripts


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    t = transcripts(spark, n_convs=100, turns_per_conv=5)
    write_bucketed(t, "t_a", buckets=8, key="conv_id")
    write_bucketed(
        t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")),
        "t_b", buckets=8, key="conv_id", sort_by=None,
    )
    yield "t_a", "t_b"
    spark.sql("DROP TABLE IF EXISTS t_a")
    spark.sql("DROP TABLE IF EXISTS t_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a, b = bucketed_tables
    # force sort-merge (tiny test tables would otherwise broadcast, which
    # also disables bucketing); at scale SMJ is the default for two facts
    joined = read_table(spark, a).hint("merge").join(read_table(spark, b), "conv_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: no hash-partitioning shuffle on either side
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert joined.count() == read_table(spark, a).count()


def test_bucketed_groupby_avoids_shuffle(spark, bucketed_tables):
    a, _ = bucketed_tables
    agg = read_table(spark, a).groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
