"""Round-5: edit-distance pair verification + corpus audit card.
Oracle parity is covered by the driver crosscheck; these plant known
structures."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_conversions_spark import dedup
from avro_conversions_spark.operators.queries import q_corpus_audit_documents


def test_edit_distance_pairs_exact_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # 3 edits
            (3, "completely different text entirely here now"),
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
        for r in dedup.edit_distance_pairs(docs, cands).collect()
    }
    assert out[(1, 2)][0] == 3
    assert out[(1, 2)][1] == round(1 - 3 / 43, 4)  # strings are 43 chars
    assert out[(1, 3)][0] > 20


def test_edit_distance_prefix_bound_and_empty(spark):
    # identical 300-char prefix, divergence after -> sim 1.0 at the bound;
    # two empty texts -> guarded 0/0 path returns 1.0
    base = "x" * 300
    docs = spark.createDataFrame(
        [(1, base + "AAA"), (2, base + "BBB"), (3, ""), (4, "")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
        for r in dedup.edit_distance_pairs(docs, cands, prefix_len=200).collect()
    }
    assert out[(1, 2)] == (0, 1.0)
    assert out[(3, 4)] == (0, 1.0)


def test_edit_distance_null_text_propagates_null(spark):
    # NULL text must NOT score 1.0 against anything (the .otherwise trap),
    # including against EMPTY text (greatest() skips NULLs, so mx reads 0)
    docs = spark.createDataFrame(
        [(1, None), (2, "real text"), (3, "")], "doc_id long, text string"
    )
    cands = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
        for r in dedup.edit_distance_pairs(docs, cands).collect()
    }
    assert out[(1, 2)] == (None, None)
    assert out[(1, 3)] == (None, None)


def test_quality_score_empty_text_is_a_row_not_a_crash(spark):
    # ANSI DIVIDE_BY_ZERO on empty text crashed the whole job (found by
    # round-5 edge probe) — failure-as-rows demands a value instead
    from avro_conversions_spark.functions import text as TXT

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "fine words here")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", TXT.quality_score(F.col("text")).alias("q")
        ).collect()
    }
    assert rows[1] is not None  # empty text scores (low), never throws
    assert rows[2] is None  # NULL text stays NULL
    assert 0.0 < rows[3] <= 1.0


def test_corpus_audit_planted(spark, tmp_path):
    rows = [
        (1, "alpha beta gamma", "en", "s", 16),
        (2, "alpha beta gamma", "en", "s", 16),  # exact dup of 1
        (3, "Alpha, beta GAMMA!", "en", "s", 18),  # fingerprint dup of 1
        (4, "uno dos tres", "es", "s", 12),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    out = {r["lang"]: r for r in q_corpus_audit_documents(spark, d).collect()}
    assert out["en"]["n_docs"] == 3 and out["es"]["n_docs"] == 1
    assert out["en"]["n_tokens"] == 9 and out["es"]["n_tokens"] == 3
    assert out["en"]["dup_docs"] == 3  # all three share the fingerprint
    assert out["es"]["dup_docs"] == 0
    assert 0.0 < out["en"]["avg_quality"] <= 1.0


def test_corpus_audit_plan_single_scan(spark):
    df = q_corpus_audit_documents(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert df.count() >= 1
    tot = df.agg(F.sum("n_docs")).collect()[0][0]
    n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert tot == n

def test_vocab_drift_planted(spark, tmp_path):
    from avro_conversions_spark.operators.queries import q_vocab_drift_documents

    # even ids say "alpha", odd ids say "beta": baseline (evens) is 100%
    # alpha, current (all) is 50/50 -> both tokens drift by 0.5
    rows = [(i, "alpha" if i % 2 == 0 else "beta", "en", "s", 5) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    out = {r["token"]: r for r in q_vocab_drift_documents(spark, d).collect()}
    assert out["alpha"]["p_base"] == 1.0 and out["alpha"]["p_cur"] == 0.5
    assert out["beta"]["p_base"] == 0.0 and out["beta"]["p_cur"] == 0.5
    assert out["alpha"]["abs_delta"] == out["beta"]["abs_delta"] == 0.5
