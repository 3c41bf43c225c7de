"""Round-5: train/eval split-leakage audit (curation.split_leakage).
Planted-pair tests — oracle parity at sf0.01 is covered by the driver
crosscheck (split_leakage_documents)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_conversions_spark import curation, sampling


def _leaks(spark, ids, pairs, **kw):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    cands = spark.createDataFrame(pairs, "id_a long, id_b long")
    return curation.split_leakage(df, cands, **kw).collect()


def test_only_crossing_pairs_survive(spark):
    ids = list(range(40))
    # recompute the split map the operator will derive, then plant one
    # within-split pair and one crossing pair from known members
    spark2 = spark
    sp = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(
            spark2.createDataFrame([(i,) for i in ids], "doc_id long"),
            weights={"train": 0.5, "val": 0.5},
        ).collect()
    }
    train = [i for i in ids if sp[i] == "train"]
    val = [i for i in ids if sp[i] == "val"]
    assert len(train) >= 2 and len(val) >= 1
    pairs = [
        (train[0], train[1]),  # within-split: not a leak
        (train[0], val[0]),    # crossing: leak
    ]
    got = _leaks(spark, ids, pairs, weights={"train": 0.5, "val": 0.5})
    assert len(got) == 1
    r = got[0]
    assert {r["split_a"], r["split_b"]} == {"train", "val"}
    assert (r["id_a"], r["id_b"]) == (
        min(train[0], val[0]),
        max(train[0], val[0]),
    )


def test_pairs_normalized_and_deduped(spark):
    ids = list(range(20))
    sp = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(
            spark.createDataFrame([(i,) for i in ids], "doc_id long"),
            weights={"train": 0.5, "val": 0.5},
        ).collect()
    }
    a = next(i for i in ids if sp[i] == "train")
    b = next(i for i in ids if sp[i] == "val")
    # duplicate + reversed + self pairs collapse to ONE audited row
    pairs = [(a, b), (b, a), (a, b), (a, a)]
    got = _leaks(spark, ids, pairs, weights={"train": 0.5, "val": 0.5})
    assert len(got) == 1 and got[0]["id_a"] == min(a, b)


def test_leakage_joins_are_not_cartesian(spark):
    ids = list(range(100))
    pairs = [(i, i + 1) for i in range(99)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    cands = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = curation.split_leakage(df, cands)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
