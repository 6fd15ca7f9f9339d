"""Real media codecs: PNG encode/decode, JPEG/WAV headers (multimodal.py).

The PNG round-trip is the load-bearing test: the encoder cycles all five
scanline filters, so decode only matches if the unfilter math is right.
PNG outputs are also cross-checked against an independent decoder in
python stdlib form (zlib reference) via handcrafted golden bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dc43_spark.functions import multimodal as mm


@pytest.mark.parametrize("shape", [(1, 1, 1), (5, 3, 1), (7, 4, 3), (6, 2, 2), (3, 3, 4), (48, 64, 3)])
def test_png_round_trip_all_filters(shape):
    rng = np.random.default_rng(hash(shape) % (2**32))
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    payload = mm.png_encode(px)
    assert payload.startswith(b"\x89PNG")
    h, w, c = shape
    assert mm.png_header(payload) == (w, h, c, 8)
    out = mm.png_decode(payload)
    np.testing.assert_array_equal(out, px)


def test_png_decode_golden_filter_none():
    """Handcrafted 2x2 grayscale PNG (filter 0 rows) decoded correctly —
    independent of our own encoder."""
    raw = bytes([0, 10, 20, 0, 30, 40])  # two rows, filter byte + 2 px

    def chunk(kind, data):
        return struct.pack(">I", len(data)) + kind + data + struct.pack(
            ">I", zlib.crc32(kind + data) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = mm.png_decode(payload)
    np.testing.assert_array_equal(out.reshape(-1), [10, 20, 30, 40])


def test_png_header_rejects_non_png():
    assert mm.png_header(b"not a png") is None
    assert mm.png_header(None) is None
    assert mm.png_header(b"\x89PNG\r\n\x1a\n" + b"short") is None


def test_jpeg_header_round_trip():
    payload = mm.jpeg_encode_header(640, 480, 3)
    assert mm.jpeg_header(payload) == (640, 480, 3)
    assert mm.jpeg_header(mm.jpeg_encode_header(1, 1, 1)) == (1, 1, 1)
    assert mm.jpeg_header(b"\xff\xd8\xff\xd9") is None  # no SOF
    assert mm.jpeg_header(b"garbage") is None


def test_jpeg_header_skips_interstitial_markers():
    """A comment marker between APP0 and SOF must be walked over."""
    base = mm.jpeg_encode_header(99, 44, 1)
    comment = b"\xff\xfe" + struct.pack(">H", 9) + b"hello!!"
    patched = base[:2] + comment + base[2:]
    assert mm.jpeg_header(patched) == (99, 44, 1)


def test_wav_round_trip():
    samples = ((np.arange(8000) % 256) - 128).astype(np.int16)
    payload = mm.wav_encode(samples, sample_rate=16000, channels=1)
    assert mm.wav_header(payload) == (16000, 1, 16, 500)
    stereo = mm.wav_encode(
        np.zeros(441 * 2, np.int16), sample_rate=44100, channels=2
    )
    # 441 frames / 44100 Hz -> 10ms
    assert mm.wav_header(stereo) == (44100, 2, 16, 10)
    assert mm.wav_header(b"RIFFxxxx") is None
    assert mm.wav_header(None) is None


def test_probe_media_on_spark(spark):
    rows = [
        (1, mm.png_encode(np.zeros((4, 6, 3), np.uint8))),
        (2, mm.jpeg_encode_header(10, 20, 1)),
        (3, mm.wav_encode(np.zeros(8000, np.int16), sample_rate=8000)),
        (4, b"unknown-bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in mm.probe_media(df).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"], out[1]["channels"]) == ("png", 6, 4, 3)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("jpeg", 10, 20)
    assert (out[3]["format"], out[3]["sample_rate"], out[3]["duration_ms"]) == ("wav", 8000, 1000)
    assert out[4]["format"] is None


def test_image_channel_stats_on_spark(spark):
    px = (np.arange(5 * 4 * 3) % 256).astype(np.uint8).reshape(4, 5, 3)
    df = spark.createDataFrame(
        [(7, mm.png_encode(px)), (8, b"not-png")], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in mm.image_channel_stats(df).collect()}
    n = 5 * 4 * 3
    expected = sum(i % 256 for i in range(n))
    assert out[7]["pixel_sum"] == expected
    assert out[7]["pixel_mean_micro"] == expected * 1_000_000 // n
    assert out[8]["pixel_sum"] is None


def test_extract_features_real_png_decoder(spark):
    """DECODERS['image'] now produces real width/height/channel means for
    PNG payloads and falls back to the deterministic fake otherwise."""
    px = np.full((2, 3, 1), 100, np.uint8)
    df = spark.createDataFrame(
        [(1, "image", mm.png_encode(px), None), (2, "image", b"junk", None)],
        mm.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    assert out[1]["feature"][:4] == [3.0, 2.0, 1.0, 100.0]
    fake = mm._fake_decode(b"junk")
    assert out[2]["feature"] == pytest.approx(fake)


def test_extract_features_real_wav_decoder(spark):
    payload = mm.wav_encode(np.zeros(4000, np.int16), sample_rate=8000)
    df = spark.createDataFrame([(1, "audio", payload, None)], mm.MEDIA_SCHEMA)
    (row,) = mm.extract_features(df).collect()
    assert row["feature"][:4] == [8000.0, 1.0, 16.0, 500.0]


def test_mp4_header_round_trip():
    payload = mm.mp4_encode_header(1920, 1080, 90_500)
    assert payload[4:8] == b"ftyp"
    assert mm.mp4_header(payload) == (1920, 1080, 90_500)
    assert mm.mp4_header(b"not an mp4") is None
    assert mm.mp4_header(None) is None
    # truncated moov parses to nothing rather than raising
    assert mm.mp4_header(payload[:20]) is None


def test_extract_features_real_mp4_decoder(spark):
    payload = mm.mp4_encode_header(640, 360, 12_000)
    df = spark.createDataFrame([(1, "video", payload, None)], mm.MEDIA_SCHEMA)
    (row,) = mm.extract_features(df).collect()
    assert row["feature"][:3] == [640.0, 360.0, 12000.0]
