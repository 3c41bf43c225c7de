"""Round-5: streaming curation rollup — cross-batch fingerprint state
and row-local signals. Oracle value parity is covered by the driver
crosscheck (stream_curate_documents)."""

from __future__ import annotations

import uuid

from avro_conversions_spark.streaming.curate import (
    curation_signals,
    streaming_curation_rollup,
)


def test_rollup_state_spans_micro_batches(spark, tmp_path):
    d = str(tmp_path / "data")
    b1 = spark.createDataFrame(
        [(1, "the same exact text"), (2, "unique alpha words")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "the same exact text"), (4, "mail me a@b.co now")],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.parquet(d)
    b2.coalesce(1).write.mode("append").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    name = f"t_scur_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_curation_rollup(curation_signals(stream))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    spark.catalog.dropTempView(name)
    by_keeper = {r["keeper_doc"]: r for r in rows}
    # docs 1 and 3 share a fingerprint but arrive in DIFFERENT batches:
    # the rollup must carry state across the trigger boundary
    assert by_keeper[1]["n_copies"] == 2
    assert by_keeper[2]["n_copies"] == 1
    # the planted email is counted by the row-local PII signal
    assert by_keeper[4]["total_pii"] == 1
    assert all(r["min_quality"] is not None for r in rows)


def test_rollup_expression_works_on_static_frames_too(spark):
    # the rollup is the same expression tree for batch and streaming
    # inputs; on a static frame it degrades to a plain groupBy whose copy
    # counts partition the corpus
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    static = streaming_curation_rollup(curation_signals(docs))
    got = [r["n_copies"] for r in static.collect()]
    assert sum(got) == docs.count()