"""PII detect/redact, benchmark decontamination, and the composed
curation pipeline (round 5).

Adversarial cases: PII classes embedded inside each other (email whose
local part looks like an IPv4 — cascade order must not double-redact),
planted benchmark contamination vs a clean corpus, and curation funnel
ordering (a document failing an early filter must never shadow or be
labeled by a later one).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark import curation
from avro_conversions_spark.functions import pii


# ------------------------------------------------------------------- PII


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "reach me at jane.doe+spam@mail.example.org thanks"),
        (1, "server 192.168.0.254 and card 4111-1111-1111-1111"),
        (2, "ssn 078-05-1120 phone 212-555-0187 also 212.555.0188"),
        # email local part containing an IPv4 shape: ONE [EMAIL], no [IPV4]
        (3, "weird user.10.0.0.1@example.com address"),
        (4, "no pii here at all"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_per_class(pii_df):
    out = pii_df.select("doc_id", *pii.pii_counts(F.col("text"))).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_email"] == 1 and by_id[0]["n_ipv4"] == 0
    assert by_id[1]["n_ipv4"] == 1 and by_id[1]["n_card"] == 1
    assert by_id[2]["n_ssn"] == 1 and by_id[2]["n_phone"] == 2
    assert by_id[4]["n_email"] == 0
    assert by_id[5]["n_email"] is None  # null text -> null counts, no throw


def test_redact_cascade_order_email_shields_inner_ipv4(pii_df):
    out = {
        r["doc_id"]: r["red"]
        for r in pii_df.select(
            "doc_id", pii.redact(F.col("text")).alias("red")
        ).collect()
    }
    assert out[3] == "weird [EMAIL] address"
    assert out[0] == "reach me at [EMAIL] thanks"
    assert out[1] == "server [IPV4] and card [CARD]"
    assert out[2] == "ssn [SSN] phone [PHONE] also [PHONE]"
    assert out[4] == "no pii here at all"  # untouched
    assert out[5] is None


def test_ssn_and_phone_shapes_do_not_cross_match(spark):
    df = spark.createDataFrame(
        [(0, "123-45-6789"), (1, "555-123-4567")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in df.select("doc_id", *pii.pii_counts(F.col("text"))).collect()}
    assert rows[0]["n_ssn"] == 1 and rows[0]["n_phone"] == 0
    assert rows[1]["n_phone"] == 1 and rows[1]["n_ssn"] == 0


# --------------------------------------------------------- contamination


@pytest.fixture(scope="module")
def contamination_sets(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # full copy of the benchmark doc -> overlap 1.0
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            # contains one 8-gram window of it, embedded in filler
            (2, "intro words then quick brown fox jumps over the lazy dog and more filler text"),
            # clean
            (3, "completely unrelated content about spark partitions and shuffles"),
        ],
        "doc_id long, text string",
    )
    return corpus, bench


def test_contamination_detects_copy_and_window(contamination_sets):
    corpus, bench = contamination_sets
    out = {
        r["doc_id"]: r
        for r in curation.contamination_pairs(corpus, bench, n=8).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["bench_overlap_frac"] == 1.0
    # bench doc has 3 distinct 8-grams; the embedded 9-token run covers
    # exactly one of them ('quick brown fox jumps over the lazy dog')
    assert out[2]["n_shared"] == 1
    assert out[2]["bench_overlap_frac"] == round(1 / 3, 4)


def test_contamination_benchmark_side_is_broadcast(contamination_sets):
    corpus, bench = contamination_sets
    plan = (
        curation.contamination_pairs(corpus, bench, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -------------------------------------------------------------- curation


@pytest.fixture(scope="module")
def curated(spark):
    good = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [
        (0, good),  # kept
        (1, good),  # exact duplicate of 0 -> duplicate
        (2, "tiny doc"),  # too_short
        # 10 distinct long punctuation-wrapped tokens: length_ok 0.5,
        # word_ok 0.5 (len>10), punct_ok 0 -> quality 1/3, no repetition
        (3, " ".join(f"###{c * 11}###" for c in "abcdefghij")),
        (4, " ".join(["spam"] * 50)),  # degenerate repetition
        (5, " ".join(["spam"] * 50)),  # its twin: ALSO high_repetition, not duplicate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.curate(df)
    return {r["doc_id"]: r for r in out.collect()}


def test_curation_funnel_verdicts(curated):
    assert curated[0]["verdict"] == "kept"
    assert curated[1]["verdict"] == "duplicate"
    assert curated[2]["verdict"] == "too_short"
    assert curated[3]["verdict"] == "low_quality"


def test_curation_early_reason_wins_over_duplicate(curated):
    # both repetitive twins fail stage 3; neither reaches the dedup stage,
    # so neither may be labeled 'duplicate'
    assert curated[4]["verdict"] == "high_repetition"
    assert curated[5]["verdict"] == "high_repetition"


def test_curation_reports_signals_for_dropped_docs(curated):
    assert curated[2]["n_tokens"] == 2
    assert curated[2]["dup_ngram_frac"] is None  # too short for trigrams
    assert curated[4]["dup_ngram_frac"] == 1.0
    assert curated[0]["fingerprint"] == curated[1]["fingerprint"]
