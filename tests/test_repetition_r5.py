"""Gopher-style per-document repetition metrics (round 5).

Adversarial fixtures: planted boilerplate repetition, a degenerate
single-token-repeated document, a too-short document (absent from the
output by contract), and a unique-text control. The plan-shape test pins
the CollapseProject discipline — the staged token array must appear once
in the optimized plan, not be re-inlined into the n-gram lambda.
"""

from __future__ import annotations

import pytest

from avro_conversions_spark.stats import repetition_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: unique text — no repeated trigram, every token distinct
        (0, "alpha beta gamma delta epsilon zeta"),
        # 1: degenerate repetition — one token repeated 10x; every trigram
        #    identical, so dup_ngram_frac = top_ngram_frac = 1.0
        (1, " ".join(["spam"] * 10)),
        # 2: planted boilerplate — the 4-token phrase occurs twice amid
        #    unique filler, so exactly the 2 copies of its 2 interior
        #    trigrams (and the phrase-spanning ones) repeat
        (2, "click here to subscribe now and also click here to subscribe today"),
        # 3: too short for trigrams (2 tokens) — absent from n=3 output
        (3, "hello world"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unique_text_has_zero_repetition(docs):
    row = repetition_stats(docs, n=3).where("doc_id = 0").first()
    assert row["n_ngrams"] == 4
    assert row["dup_ngram_frac"] == 0.0
    assert row["top_ngram_frac"] == 0.25


def test_degenerate_single_token_doc_saturates(docs):
    row = repetition_stats(docs, n=3).where("doc_id = 1").first()
    assert row["n_ngrams"] == 8
    assert row["dup_ngram_frac"] == 1.0
    assert row["top_ngram_frac"] == 1.0


def test_planted_boilerplate_counts_instances_not_sets(docs):
    row = repetition_stats(docs, n=3).where("doc_id = 2").first()
    # 12 tokens -> 10 trigram instances; 'click here to' and
    # 'here to subscribe' each occur twice -> 4 duplicated instances
    assert row["n_ngrams"] == 10
    assert row["dup_ngram_frac"] == round(4 / 10, 4)
    assert row["top_ngram_frac"] == round(2 / 10, 4)


def test_short_doc_absent_from_output(docs):
    out = repetition_stats(docs, n=3)
    assert out.where("doc_id = 3").count() == 0
    assert out.count() == 3


def test_unigram_mode_is_token_repetition(docs):
    row = repetition_stats(docs, n=1).where("doc_id = 1").first()
    assert row["n_ngrams"] == 10
    assert row["dup_ngram_frac"] == 1.0
    # n=1 keeps 2-token docs
    assert repetition_stats(docs, n=1).where("doc_id = 3").count() == 1


def test_plan_stages_tokens_once(docs):
    """The token-array split() must be evaluated once per row, not
    re-inlined by CollapseProject into the n-gram transform lambda
    (round-4 finding: inlining costs 3x on row-local MinHash)."""
    plan = repetition_stats(docs, n=3)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(lower(") <= 1
