"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery here is REAL and tested — schema contracts,
partition sizing, Arrow batch iteration, UDF signatures. HEADER-level
decode is also real: ``decode_headers`` parses PNG IHDR dimensions and
WAV sample-rate/duration with pure byte arithmetic (no codec library),
and ``synthetic_containers`` emits genuine PNG/WAV-formatted blobs to
drive it. Only pixel/sample decoding remains STUBBED (this container has
no image/audio libraries): ``extract_features`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic fake decoder so the distributed plumbing can be exercised
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
        "pixel/sample decoding requires image/audio libraries not present "
        "in this container; pass fake=True for the deterministic stand-in "
        "(header-level metadata needs no codec — see decode_headers)"
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


HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),  # png|wav|NULL on error
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def synthetic_containers(spark, n: int = 200, seed: int = 7) -> DataFrame:
    """REAL-format container blobs, deterministic from media_id, cycling
    through four genuine formats by ``media_id % 4``:

    - 0 → PNG: signature + IHDR chunk with a correct CRC + a stub IDAT;
    - 1 → WAV: canonical 44-byte RIFF/WAVE fmt+data header (sample body
      truncated — header byte math only needs the declared data size);
    - 2 → GIF89a: header + logical-screen descriptor + trailer;
    - 3 → BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, with every 8th id
      stored TOP-DOWN (negative height) — the signed-int corner real BMP
      decoders must handle.

    Byte assembly is genuine struct.pack work so an independent oracle can
    re-derive every field from the raw bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        for pdf in batches:
            ids, blobs = [], []
            for raw in pdf["id"]:
                mid = int(raw)
                if mid % 4 == 0:  # PNG
                    w = 16 + (mid * 37 + seed) % 2048
                    h = 16 + (mid * 53 + seed) % 1536
                    chunk = b"IHDR" + struct.pack(">II", w, h) + bytes([8, 6, 0, 0, 0])
                    payload = (
                        _PNG_SIG
                        + struct.pack(">I", 13)
                        + chunk
                        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
                        + struct.pack(">I", 4)
                        + b"IDAT"
                        + bytes([mid % 256] * 4)
                        + b"\x00\x00\x00\x00"
                    )
                elif mid % 4 == 1:  # WAV (PCM 16-bit)
                    channels = 1 + (mid % 2)
                    sample_rate = (8000, 16000, 22050, 44100, 48000)[mid % 5]
                    block_align = channels * 2
                    byte_rate = sample_rate * block_align
                    n_frames = 100 + (mid * 31 + seed) % 4000
                    data_size = n_frames * block_align
                    payload = (
                        b"RIFF"
                        + struct.pack("<I", 36 + data_size)
                        + b"WAVE"
                        + b"fmt "
                        + struct.pack(
                            "<IHHIIHH",
                            16, 1, channels, sample_rate, byte_rate, block_align, 16,
                        )
                        + b"data"
                        + struct.pack("<I", data_size)
                        + bytes((mid + i) % 256 for i in range(min(data_size, 64)))
                    )
                elif mid % 4 == 2:  # GIF89a
                    w = 1 + (mid * 29 + seed) % 1024
                    h = 1 + (mid * 41 + seed) % 768
                    payload = (
                        b"GIF89a"
                        + struct.pack("<HH", w, h)
                        # packed fields / background index / aspect ratio
                        + bytes([0xF7, 0, 0])
                        + b"\x3b"  # trailer
                    )
                else:  # BMP (BITMAPINFOHEADER, 24-bit)
                    w = 1 + (mid * 19 + seed) % 2048
                    h_mag = 1 + (mid * 23 + seed) % 1536
                    h_signed = -h_mag if mid % 8 == 3 else h_mag  # top-down
                    row_size = (w * 3 + 3) // 4 * 4
                    payload = (
                        b"BM"
                        + struct.pack("<IHHI", 54 + row_size * h_mag, 0, 0, 54)
                        + struct.pack(
                            "<IiiHHIIiiII",
                            40, w, h_signed, 1, 24, 0,
                            row_size * h_mag, 2835, 2835, 0, 0,
                        )
                        + bytes((mid + i) % 256 for i in range(min(row_size * h_mag, 64)))
                    )
                ids.append(mid)
                blobs.append(payload)
            yield pd.DataFrame({"media_id": ids, "payload": blobs})

    # a fixture generator, not a scale path: cap task count so tiny n
    # doesn't pay 32 Python-worker spin-ups per stage
    parts = max(1, min(8, n // 64))
    return spark.range(0, n, 1, parts).mapInPandas(
        gen, "media_id long, payload binary"
    )


def decode_headers(df: DataFrame, batch_records: int = 256) -> DataFrame:
    """REAL header decode (no codec library required — pure byte
    arithmetic): PNG IHDR width/height (big-endian u32 at offsets 16/20
    behind the 8-byte signature), WAV fmt-chunk sample-rate plus duration
    derived from the declared data size over the byte rate, GIF87a/89a
    logical-screen width/height (little-endian u16 at offsets 6/8), and
    BMP BITMAPINFOHEADER width/height (little-endian SIGNED i32 at
    offsets 18/22 — a negative height means a top-down bitmap, reported
    as its magnitude).
    Runs as Arrow-batched mapInPandas with worker-side re-chunking (same
    no-session-conf contract as extract_features).  Unknown magic,
    truncation, or a zero byte rate become ``parse_error`` rows — the
    failure-as-rows contract, never a thrown exception.  This shrinks the
    NotImplementedError boundary in ``_decode_stub`` to genuinely
    codec-requiring work (pixel/sample decode)."""

    def parse_one(p: bytes | None) -> tuple:
        # returns (format, width, height, sample_rate, duration_ms, err)
        if p is None:
            return (None, None, None, None, None, "null_payload")
        b = bytes(p)
        if b.startswith(_PNG_SIG):
            if len(b) < 24 or b[12:16] != b"IHDR":
                return (None, None, None, None, None, "truncated_png")
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return ("png", w, h, None, None, None)
        if b[:4] == b"RIFF" and len(b) >= 12 and b[8:12] == b"WAVE":
            if len(b) < 44 or b[12:16] != b"fmt " or b[36:40] != b"data":
                return (None, None, None, None, None, "noncanonical_wav")
            rate = int.from_bytes(b[24:28], "little")
            byte_rate = int.from_bytes(b[28:32], "little")
            data_size = int.from_bytes(b[40:44], "little")
            if byte_rate == 0:
                return (None, None, None, None, None, "zero_byte_rate")
            return ("wav", None, None, rate, data_size * 1000.0 / byte_rate, None)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            if len(b) < 10:
                return (None, None, None, None, None, "truncated_gif")
            w = int.from_bytes(b[6:8], "little")
            h = int.from_bytes(b[8:10], "little")
            if w == 0 or h == 0:
                return (None, None, None, None, None, "zero_dimension")
            return ("gif", w, h, None, None, None)
        if b[:2] == b"BM":
            if len(b) < 26 or int.from_bytes(b[14:18], "little") < 40:
                return (None, None, None, None, None, "noncanonical_bmp")
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            if w <= 0 or h == 0:
                return (None, None, None, None, None, "zero_dimension")
            return ("bmp", w, abs(h), None, None, None)
        return (None, None, None, None, None, "unknown_container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_records):
                chunk = pdf.iloc[start : start + batch_records]
                parsed = [parse_one(p) for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "format": [t[0] for t in parsed],
                        "width": pd.array([t[1] for t in parsed], dtype="Int32"),
                        "height": pd.array([t[2] for t in parsed], dtype="Int32"),
                        "sample_rate": pd.array(
                            [t[3] for t in parsed], dtype="Int32"
                        ),
                        "duration_ms": [t[4] for t in parsed],
                        "parse_error": [t[5] for t in parsed],
                    }
                )

    return df.select("media_id", "payload").mapInPandas(run, HEADER_SCHEMA)


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
