"""Deterministic hash-split sampling and vocab top-k (round 5).

The property a 100 TB pipeline actually needs from splits is not
randomness, it's STABILITY: the same row must land in the same split on
every run, at every parallelism, and after incremental appends. These
tests pin that contract, plus the expression-only plan shape (no UDF, no
shuffle introduced by the assignment itself).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark import sampling
from avro_conversions_spark.stats import vocab_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"text {i}") for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_split_assign_covers_all_rows_with_valid_names(docs):
    out = sampling.split_assign(docs)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 3000
    # 98/1/1 on 3000 rows: train dominates, val/test small but present-ish
    assert counts["train"] > 2800


def test_split_assign_is_stable_across_runs_and_partitioning(docs):
    a = {r["doc_id"]: r["split"] for r in sampling.split_assign(docs).select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(docs.repartition(7)).select("doc_id", "split").collect()
    }
    assert a == b


def test_split_assign_append_never_moves_existing_rows(docs):
    before = {r["doc_id"]: r["split"] for r in sampling.split_assign(docs).collect()}
    grown = docs.union(docs.select((F.col("doc_id") + 100000).alias("doc_id"), "lang", "text"))
    after = {r["doc_id"]: r["split"] for r in sampling.split_assign(grown).collect()}
    for k, v in before.items():
        assert after[k] == v


def test_split_assign_custom_weights_and_seed_sensitivity(docs):
    w = {"a": 0.5, "b": 0.5}
    out = {r["doc_id"]: r["split"] for r in sampling.split_assign(docs, weights=w).collect()}
    assert set(out.values()) == {"a", "b"}
    other = {r["doc_id"]: r["split"] for r in sampling.split_assign(docs, weights=w, seed=1).collect()}
    assert out != other  # a different seed reshuffles membership


def test_split_assign_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        sampling.split_assign(docs, weights={"a": -0.1, "b": 1.1})


def test_stratified_sample_rate_per_stratum(docs):
    out = sampling.stratified_sample(docs, "lang", 0.2)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang in ("en", "de", "fr"):
        assert 120 <= per[lang] <= 280  # ~200 of 1000 per stratum


def test_stratified_sample_deterministic_and_subset(docs):
    a = sorted(r["doc_id"] for r in sampling.stratified_sample(docs, "lang", 0.2).collect())
    b = sorted(r["doc_id"] for r in sampling.stratified_sample(docs, "lang", 0.2).collect())
    assert a == b
    assert set(a) <= {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_stratified_sample_fraction_bounds(docs):
    with pytest.raises(ValueError):
        sampling.stratified_sample(docs, "lang", 1.5)
    assert sampling.stratified_sample(docs, "lang", 0.0).count() == 0
    assert sampling.stratified_sample(docs, "lang", 1.0).count() == 3000


def test_sampling_plan_is_expression_only(docs):
    # the assignment must not drag in a Python UDF or an exchange
    for df in (sampling.split_assign(docs), sampling.stratified_sample(docs, "lang", 0.2)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan


def test_vocab_topk_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("b b a a c",), ("A a d",)], "text string"
    )
    rows = vocab_topk(df, k=3).collect()
    # a:4 (lowercased), b:2, c:1/d:1 tie broken by token asc → c
    assert [(r["token"], r["n"]) for r in rows] == [("a", 4), ("b", 2), ("c", 1)]


def test_vocab_topk_min_count_prunes_tail(spark):
    df = spark.createDataFrame([("x x y",)], "text string")
    rows = vocab_topk(df, k=10, min_count=2).collect()
    assert [(r["token"], r["n"]) for r in rows] == [("x", 2)]
