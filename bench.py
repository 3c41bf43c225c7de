"""Bench harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric follows BASELINE.json: validated turns/sec on the
synthetic transcript table (reported as extra keys turns_validated /
turns_per_sec) plus wall-time for the operator suite. Scaling-efficiency
evidence (N vs 4N parallelism) lives in tools/bench_scaling.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from avro_conversions_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "validate_transcripts",
    "verdicts_events",
    "unique_violations_lineitem",
    "sequence_lineitem",
    "profile_lineitem",
    "pricing_summary",
    "rollup_events",
    "quantiles_lineitem",
    "windowed_counts_events",
    "hll_ndv_lineitem",
    "minhash_lsh_documents",
    "jaccard_pairs_documents",
    "token_stats_documents",
    "quality_documents",
    "knn_bruteforce",
    "ann_lsh",
    "simhash_near_dups",
    "except_events",
    "pivot_events",
    "sessionize_events",
    "asof_join_events",
    "repair_events",
    "convert_dates",
    "drift_events",
    "resolve_events_jsonschema",
    "ndv_lineitem",
    "parse_json_events",
    "parse_xml_lineitem",
    "parse_xml_xsd_events",
    "ref_sortmerge_lineitem",
    "stream_drift_events",
    "minhash_rowsig_documents",
    "hll_gate_lineitem",
    "ann_lsh_gate",
    "multimodal_features",
    "stream_dedup_documents",
    "drift_gate_events",
    "multimodal_headers",
    "paragraph_dedup_documents",
    # full dedup pipeline: LSH candidates -> connected-component clusters
    # -> keep-best survivor per cluster (cc_clusters_documents would
    # double-pay the LSH stage, so only the composite query is benched)
    "dedup_keep_best_documents",
    "repetition_documents",
    "pii_documents",
    "contamination_documents",
    # composite funnel (quality -> repetition -> fingerprint dedup); the
    # standalone repetition query above prices the dominant stage alone
    "curation_pipeline_documents",
    "pack_documents",
    "lm_perplexity_documents",
    "kmeans_embeddings",
    # full SemDeDup pipeline (cells + cell-local prune); kmeans above
    # prices the fit stage alone
    "semdedup_embeddings",
    "dsir_documents",
    "bm25_documents",
    "conv_profile_transcripts",
    "chunk_documents",
    "split_leakage_documents",
    "quality_classifier_documents",
    "editdist_pairs_documents",
    "corpus_audit_documents",
    "stream_curate_documents",
    "vocab_drift_documents",
]

BENCH_TRANSCRIPT_CONVS = int(os.environ.get("BENCH_TRANSCRIPT_CONVS", "100000"))


def validated_turns(spark) -> tuple[int, float]:
    """North-rule headline: full constraint suite over a ~2·10^5-turn
    deterministic transcript table (hot-conversation skew included)."""
    from avro_conversions_spark.constraints import (
        ReferentialConstraint,
        SequenceConstraint,
        UniqueConstraint,
        enum_in,
        not_null,
        range_check,
    )
    from avro_conversions_spark.engine import ValidationEngine
    from avro_conversions_spark.transcripts import ROLES, tool_catalog, transcripts

    from pyspark.sql import functions as F

    df = transcripts(
        spark,
        n_convs=BENCH_TRANSCRIPT_CONVS,
        turns_per_conv=10,
        corruptions={"role_invalid", "dangling_tool", "dup_key", "ts_regression"},
    ).persist()
    n = df.count()
    eng = ValidationEngine(
        row_constraints=[
            not_null("conv_id"),
            not_null("turn_idx"),
            enum_in("role", ROLES),
            range_check("turn_idx", 0, 2**31 - 1),
        ],
        unique_constraints=[UniqueConstraint(("conv_id", "turn_idx"))],
        referential_constraints=[
            ReferentialConstraint("tool", tool_catalog(spark), "tool_name")
        ],
        sequence_constraints=[SequenceConstraint()],
    )
    # Warmup on a 1/16 hash-sample: whole-stage-codegen compilation + JIT
    # (~7 s measured at this plan size) is once-per-JVM, not per-run — the
    # north-rule metric is SUSTAINED throughput (same protocol and
    # rationale as tools/bench_scaling.py; the 1e8-turn stress leg shows
    # the engine sustaining 523k turns/s when compile cost amortizes).
    warm = eng.run(
        df.where(F.pmod(F.xxhash64("conv_id"), F.lit(16)) == 0), run_id="warmup"
    )
    warm.verdicts.collect()
    warm.violations.count()
    if warm.cached is not None:
        warm.cached.unpersist()
    t0 = time.perf_counter()
    res = eng.run(df, run_id="bench")
    res.verdicts.collect()
    res.violations.count()
    dt = time.perf_counter() - t0
    df.unpersist()
    return n, dt


def main() -> None:
    from avro_conversions_spark.operators.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    timings: dict[str, float] = {}
    turns = 0
    for name in HEADLINE:
        t0 = time.perf_counter()
        if name == "validate_transcripts":
            turns, dt = validated_turns(spark)
            timings[name] = round(dt, 3)
            continue
        # Materialize every result row to the driver through Arrow batches
        # (toPandas) rather than row-at-a-time pickling (collect).  Round-4
        # finding: for queries returning ~10^5 rows (sequence_lineitem:
        # 439k at sf0.1) collect() pickling dominated the reading — 16.6 s
        # in-suite for a plan that executes in ~1.1 s.  Arrow transfer is
        # the realistic sink (any real consumer reads Arrow/parquet, not
        # pickled Rows) and still executes the full plan on all rows.
        QUERIES[name](spark, sf_dir).toPandas()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "validation+ops suite wall-time (headline: validated turns/sec)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "turns_validated": turns,
                "turns_per_sec": round(turns / timings["validate_transcripts"], 1)
                if timings.get("validate_transcripts")
                else None,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
