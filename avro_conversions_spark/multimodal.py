"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery here is REAL and tested — schema contracts,
partition sizing, Arrow batch iteration, UDF signatures. The actual media
decoding is STUBBED (this container has no image/audio libraries): decode
functions raise NotImplementedError unless ``fake=True``, which substitutes
a deterministic fake decoder so the distributed plumbing can be exercised
end-to-end.

Scale notes:
- media blobs ride in parquet binary columns; `spark.sql.files.
  maxPartitionBytes` bounds scan partitions, and `maxRecordsPerBatch`
  bounds Arrow batch memory (a 4 MB image × 10k default batch = OOM;
  set ~64-256 records for media);
- metadata-only operations (filtering by width, sampling by hash) never
  touch the blob column — columnar pruning skips the bytes entirely.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = repeated hash bytes."""
    df = spark.range(n)
    h = F.xxhash64(F.lit(seed), "id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(h, 3) + 1).cast("int"),
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/fake")).alias("mime"),
        F.when(kind == "image", (F.pmod(h, 1024) + 64).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(h, 768) + 64).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(h, 60_000) + 1000).cast("long")).alias("duration_ms"),
        F.repeat(F.unhex(F.conv(F.pmod(h, 255) + 1, 10, 16)), (F.pmod(h, 512) + 16).cast("int"))
        .cast("binary")
        .alias("payload"),
    )


def _decode_stub(kind: str, payload: bytes) -> list[float]:
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; pass fake=True for the deterministic stand-in"
    )


def _decode_fake(kind: str, payload: bytes) -> list[float]:
    """Deterministic 8-dim 'feature': byte histogram moments."""
    if payload is None:
        return []
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    s = sum(payload)
    mean = s / n
    return [
        float(n),
        round(mean, 3),
        float(payload[0]),
        float(payload[-1]),
        float(max(payload)),
        float(min(payload)),
        round(sum((b - mean) ** 2 for b in payload[:256]) / min(n, 256), 3),
        float(kind == "image"),
    ]


def extract_features(
    df: DataFrame,
    fake: bool = False,
    batch_records: int = 128,
    decoder: Callable[[str, bytes], list[float]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over media rows. Decoded output per
    chunk is bounded by re-slicing each incoming Arrow batch to
    ``batch_records`` rows INSIDE the worker — the session-wide
    ``arrow.maxRecordsPerBatch`` conf is never touched (an earlier version
    lowered it permanently, degrading every later pandas/Arrow exchange in
    the session to tiny batches — round-4 ADVICE).  The inbound payload
    batch is still sized by the session conf; the local re-chunk bounds
    the decode AMPLIFICATION (features can be much larger than payload
    bytes), which is the memory that matters."""
    decode = decoder or (_decode_fake if fake else _decode_stub)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_records):
                chunk = pdf.iloc[start : start + batch_records]
                feats = [
                    [float(x) for x in decode(k, p)]
                    for k, p in zip(chunk["kind"], chunk["payload"])
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": [
                            len(p) if p is not None else None for p in chunk["payload"]
                        ],
                        "feature": feats,
                    }
                )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp —
    pure Spark (sequence/explode); the decode of each frame is the stubbed
    step above. Demonstrates the explode-then-decode shape used at scale
    (frames parallelize beyond videos)."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
