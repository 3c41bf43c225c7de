"""Round-5 VERDICT #3: real PNG/WAV/GIF/BMP header decode.

The decode is pure byte arithmetic (no codec library): PNG IHDR
width/height, WAV fmt sample-rate + declared-data-size duration, GIF
logical-screen dimensions, BMP BITMAPINFOHEADER signed dimensions. These
tests drive the mapInPandas decoder with genuine container bytes built by
``synthetic_containers`` AND adversarial malformed blobs, asserting the
failure-as-rows contract (parse_error column, never an exception).
The independent byte-math cross-check lives in the DuckDB oracle of the
``multimodal_headers`` driver query (tools/crosscheck.py).
"""

from __future__ import annotations

import struct
import zlib


def _png(w: int, h: int) -> bytes:
    chunk = b"IHDR" + struct.pack(">II", w, h) + bytes([8, 6, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _wav(rate: int, channels: int, n_frames: int) -> bytes:
    block = channels * 2
    byte_rate = rate * block
    data_size = n_frames * block
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, block, 16)
        + b"data"
        + struct.pack("<I", data_size)
    )


def _decode(spark, blobs):
    from avro_conversions_spark.multimodal import decode_headers

    df = spark.createDataFrame(
        list(enumerate(blobs)), "media_id long, payload binary"
    )
    return {r.media_id: r for r in decode_headers(df).collect()}


def test_png_and_wav_headers_decode_exactly(spark):
    got = _decode(spark, [_png(640, 480), _png(1, 1), _wav(44100, 2, 44100), _wav(8000, 1, 4000)])
    assert (got[0].format, got[0].width, got[0].height) == ("png", 640, 480)
    assert got[0].parse_error is None and got[0].sample_rate is None
    assert (got[1].width, got[1].height) == (1, 1)
    # 44100 frames at 44100 Hz = exactly 1000 ms
    assert (got[2].format, got[2].sample_rate, got[2].duration_ms) == ("wav", 44100, 1000.0)
    assert (got[3].sample_rate, got[3].duration_ms) == (8000, 500.0)


def test_malformed_blobs_become_parse_error_rows(spark):
    blobs = [
        b"",  # empty
        b"\x89PNG\r\n\x1a\nxx",  # truncated before IHDR
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"XXXX" + b"\0" * 17,  # wrong chunk tag
        b"RIFF\x10\x00\x00\x00WAVE",  # truncated WAV
        b"RIFF" + b"\0" * 4 + b"WAVEjunk" + b"\0" * 40,  # non-canonical fmt
        b"GIF89a" + b"\0" * 40,  # valid GIF magic but 0x0 dimensions
        b"JUNKDATA" + b"\0" * 40,  # unknown magic
        b"GIF89a\x10",  # truncated GIF
        b"BM" + b"\0" * 10,  # truncated BMP
        b"BM" + b"\0" * 12 + (12).to_bytes(4, "little") + b"\0" * 20,  # BITMAPCOREHEADER (unsupported)
        None,  # null payload
        _wav(44100, 1, 10)[:24] + struct.pack("<I", 0) + _wav(44100, 1, 10)[28:],  # rate 0 -> byte_rate math
    ]
    got = _decode(spark, blobs)
    for mid in range(len(blobs) - 1):
        assert got[mid].format is None, (mid, got[mid])
        assert got[mid].parse_error is not None, (mid, got[mid])
    assert got[len(blobs) - 2].parse_error == "null_payload"


def test_zero_byte_rate_flagged_not_divided(spark):
    blob = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
        + b"data" + struct.pack("<I", 0)
    )
    got = _decode(spark, [blob])
    assert got[0].parse_error == "zero_byte_rate" and got[0].duration_ms is None


def test_synthetic_containers_roundtrip_params(spark):
    """Generator params -> real bytes -> decoder recovers the params."""
    from avro_conversions_spark.multimodal import decode_headers, synthetic_containers

    out = {r.media_id: r for r in decode_headers(synthetic_containers(spark, n=60)).collect()}
    assert len(out) == 60
    for mid, r in out.items():
        assert r.parse_error is None
        if mid % 4 == 0:
            assert r.format == "png"
            assert r.width == 16 + (mid * 37 + 7) % 2048
            assert r.height == 16 + (mid * 53 + 7) % 1536
        elif mid % 4 == 1:
            assert r.format == "wav"
            rate = (8000, 16000, 22050, 44100, 48000)[mid % 5]
            channels = 1 + (mid % 2)
            n_frames = 100 + (mid * 31 + 7) % 4000
            assert r.sample_rate == rate
            assert abs(r.duration_ms - n_frames * 1000.0 / rate) < 1e-9, (mid, r)
            assert channels in (1, 2)
        elif mid % 4 == 2:
            assert r.format == "gif"
            assert r.width == 1 + (mid * 29 + 7) % 1024
            assert r.height == 1 + (mid * 41 + 7) % 768
        else:
            assert r.format == "bmp"
            assert r.width == 1 + (mid * 19 + 7) % 2048
            # top-down BMPs (every 8th id) store a negative height; the
            # decoder reports the magnitude either way
            assert r.height == 1 + (mid * 23 + 7) % 1536


def test_bmp_negative_height_reports_magnitude(spark):
    import struct

    def bmp(w, h_signed):
        return (
            b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h_signed, 1, 24, 0, 0, 2835, 2835, 0, 0)
        )

    got = _decode(spark, [bmp(100, 50), bmp(100, -50)])
    assert (got[0].format, got[0].width, got[0].height) == ("bmp", 100, 50)
    assert (got[1].format, got[1].width, got[1].height) == ("bmp", 100, 50)


def test_gif87a_and_gif89a_both_decode(spark):
    import struct

    blobs = [
        b"GIF87a" + struct.pack("<HH", 320, 200) + bytes([0xF7, 0, 0]) + b"\x3b",
        b"GIF89a" + struct.pack("<HH", 1, 65535) + bytes([0xF7, 0, 0]) + b"\x3b",
    ]
    got = _decode(spark, blobs)
    assert (got[0].format, got[0].width, got[0].height) == ("gif", 320, 200)
    assert (got[1].format, got[1].width, got[1].height) == ("gif", 1, 65535)
