"""Streaming curation rollup: the ingest-time shape of the batch
curation funnel (curation.curate) for a continuously arriving corpus.

Per micro-batch, row-local curation signals (quality score, PII count,
token count) are pure Column expressions — identical code to the batch
path — and the cross-batch state is a streaming aggregation keyed on
the normalization fingerprint: how many copies of each document have
arrived so far, which doc id is the canonical keeper (min id —
deterministic regardless of batch arrival order), and the group's
curation signals. Downstream, `n_copies - 1` is the duplicate mass and
the keeper row feeds the kept/filtered verdict exactly like the batch
funnel.

Scale shape: the only state is one row per distinct fingerprint
(id + counters — the same O(1)-per-key bound as streaming exact dedup);
signals aggregate with min/max/sum, so the state store never holds
text. Complete-mode output here is the memory-sink HARNESS shape for
the driver query; a production job would use update mode into an
upsert sink keyed on fingerprint.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from avro_conversions_spark.functions import pii as PII
from avro_conversions_spark.functions import text as TXT


def curation_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds row-local curation columns — pure expressions, so the same
    call works on a static frame and a streaming one."""
    t = F.col(text_col)
    total_pii = reduce(lambda a, b: a + b, PII.pii_counts(t))
    return (
        docs.withColumn("fingerprint", TXT.fingerprint(t))
        .withColumn("quality", TXT.quality_score(t))
        .withColumn("n_tokens", TXT.token_count(t).cast("long"))
        .withColumn("n_pii", total_pii.cast("long"))
    )


def streaming_curation_rollup(stream: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Streaming aggregation per fingerprint: keeper id, copy count, and
    group curation signals. Deterministic under any batch split because
    every aggregate is order-insensitive (min/count/sum)."""
    return stream.groupBy("fingerprint").agg(
        F.min(id_col).alias("keeper_doc"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("quality").alias("min_quality"),
        F.min("n_tokens").alias("min_tokens"),
        F.sum("n_pii").alias("total_pii"),
    )
