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


# ------------------------------------------------------- baseline JPEG codec


@pytest.mark.parametrize("shape,quality", [
    ((8, 8, 1), 90), ((17, 23, 1), 95), ((24, 31, 3), 95),
    ((48, 64, 3), 85), ((1, 1, 1), 90), ((9, 5, 3), 75),
])
def test_jpeg_round_trip_error_bound(shape, quality):
    """Encode->decode must reconstruct within a quantization-noise bound;
    a broken zigzag, predictor, or IDCT produces garbage far beyond it."""
    from dc43_spark.functions import jpeg

    rng = np.random.default_rng(hash((shape, quality)) % (2**32))
    h, w, c = shape
    # smooth-ish content (JPEG's operating regime): low-freq ramp + noise
    yy, xx = np.mgrid[0:h, 0:w]
    base = (60 + xx * 2 + yy * 3)[:, :, None] + rng.integers(-12, 13, shape)
    px = np.clip(base, 0, 255).astype(np.uint8)
    enc = jpeg.jpeg_encode(px, quality=quality)
    assert mm.jpeg_header(enc) == (w, h, c)
    dec = jpeg.jpeg_decode(enc)
    assert dec.shape == shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.mean() < 6.0, err.mean()
    assert err.max() < 64, err.max()


def test_jpeg_constant_gray_lossless_at_q50():
    """quality 50 => luma DC quant step exactly 16, so an even constant
    round-trips EXACTLY — the invariant the image_stats driver oracle
    relies on (showcase_scale._encode_batch)."""
    from dc43_spark.functions import jpeg

    for v in (0, 2, 84, 128, 200, 254):
        for shape in ((5, 9, 1), (10, 12, 3)):
            px = np.full(shape, v, dtype=np.uint8)
            dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=50))
            np.testing.assert_array_equal(dec, px)
    # block-varying even constants (the actual gate fixture shape): still
    # DC-only per block, but with nonzero DC diffs across the scan
    for h, w, c in ((23, 37, 1), (30, 44, 3)):
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        v = 2 * ((7 + 5 * bx[None, :] + 11 * by[:, None]) % 128)
        px = np.repeat(v[:, :, None], c, axis=2).astype(np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=50))
        np.testing.assert_array_equal(dec, px)


def test_jpeg_decode_spec_derived_single_block():
    """Decoder vs a HAND-CONSTRUCTED stream derived from T.81 itself (not
    from our encoder): 8x8 grayscale, flat quant table 16, standard DC/AC
    luminance Huffman specs. DC symbol 3 = canonical code '100', magnitude
    bits '110' = 6 -> DC coeff 6*16 = 96; AC EOB = '1010'. A DC-only block
    reconstructs to 96/8 + 128 = 140 everywhere. This catches a symmetric
    encoder+decoder bug that a round-trip test cannot."""
    from dc43_spark.functions import jpeg

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
    )
    dht_dc = (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(jpeg.DC_LUMA_VALS))
        + b"\x00" + bytes(jpeg.DC_LUMA_BITS) + bytes(jpeg.DC_LUMA_VALS)
    )
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(jpeg.AC_LUMA_VALS))
        + b"\x10" + bytes(jpeg.AC_LUMA_BITS) + bytes(jpeg.AC_LUMA_VALS)
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    scan = bytes([0b10011010, 0b10111111])  # 100 110 1010 + 1-padding
    payload = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + scan + b"\xff\xd9"
    out = jpeg.jpeg_decode(payload)
    assert out.shape == (8, 8, 1)
    assert (out == 140).all()


def test_jpeg_decode_rejects_non_baseline_and_headers():
    from dc43_spark.functions import jpeg

    # header-only payload (the old stub shape): no SOS scan
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(mm.jpeg_encode_header(10, 10, 3))
    # progressive SOF2 must raise, not silently mis-decode
    enc = jpeg.jpeg_encode(np.zeros((8, 8, 1), dtype=np.uint8))
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(prog)
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(b"not a jpeg")


def test_jpeg_byte_stuffing_and_gradient():
    """A high-contrast image at high quality produces 0xFF bytes in the
    entropy stream with near-certainty across these 8 seeds; the stuffed
    0xFF00 sequences must be transparent to the decoder."""
    from dc43_spark.functions import jpeg

    saw_stuffing = False
    for seed in range(8):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)
        enc = jpeg.jpeg_encode(px, quality=100)
        scan_start = enc.find(b"\xff\xda")
        saw_stuffing = saw_stuffing or b"\xff\x00" in enc[scan_start:]
        dec = jpeg.jpeg_decode(enc)
        err = np.abs(dec.astype(int) - px.astype(int))
        assert err.max() <= 32, err.max()
    assert saw_stuffing


@pytest.mark.parametrize("shape,interval", [
    ((24, 40, 1), 1), ((24, 40, 1), 3), ((32, 48, 3), 1), ((32, 48, 3), 2),
])
def test_jpeg_restart_markers_round_trip(shape, interval):
    """DRI + RSTn emission and the decoder's resync path: predictors reset
    at every interval, pad bits are discarded, markers stepped over."""
    from dc43_spark.functions import jpeg

    rng = np.random.default_rng(interval)
    h, w, c = shape
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.clip(
        (50 + xx * 2 + yy * 3)[:, :, None] + rng.integers(-10, 11, shape), 0, 255
    ).astype(np.uint8)
    enc = jpeg.jpeg_encode(px, quality=95, restart_interval=interval)
    assert b"\xff\xdd" in enc  # DRI present
    assert any(bytes([0xFF, 0xD0 + m]) in enc for m in range(8))
    dec = jpeg.jpeg_decode(enc)
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.mean() < 6 and err.max() < 64
    # restart stream decodes identically to the plain stream
    plain = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=95))
    np.testing.assert_array_equal(dec, plain)


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    code; the walk must skip them (r5 advice: the second 0xFF was read as
    a marker whose 'length' came from garbage). Covers header markers,
    in-scan RSTn, and EOI."""
    from dc43_spark.functions import jpeg

    rng = np.random.default_rng(3)
    px = np.clip(
        (40 + np.mgrid[0:24, 0:40][1] * 3)[:, :, None]
        + rng.integers(-8, 9, (24, 40, 1)),
        0, 255,
    ).astype(np.uint8)
    import struct as _struct

    for interval in (0, 2):
        enc = jpeg.jpeg_encode(px, quality=90, restart_interval=interval)
        ref = jpeg.jpeg_decode(enc)
        # structural walk: insert fill only at true marker positions (a
        # blind insert before every 0xFF would corrupt segment payloads)
        padded = bytearray(enc[:2])  # SOI stays first (decoder checks SOI)
        pos = 2
        while pos < len(enc):
            marker = enc[pos + 1]
            padded += b"\xff\xff" + enc[pos : pos + 2]
            pos += 2
            if marker == 0xDA:
                break
            (seg_len,) = _struct.unpack(">H", enc[pos : pos + 2])
            padded += enc[pos : pos + seg_len]
            pos += seg_len
        # SOS header then entropy bytes: pad before RSTn and EOI only
        (sos_len,) = _struct.unpack(">H", enc[pos : pos + 2])
        padded += enc[pos : pos + sos_len]
        pos += sos_len
        while pos < len(enc):
            b = enc[pos]
            if b == 0xFF and pos + 1 < len(enc) and enc[pos + 1] != 0x00:
                padded += b"\xff\xff"  # fill before RSTn / EOI
                padded += enc[pos : pos + 2]
                pos += 2
            else:
                padded.append(b)
                pos += 1
        out = jpeg.jpeg_decode(bytes(padded))
        np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("family", ["gradient", "noise", "chroma"])
def test_jpeg_fuzz_families_bounded_error(family):
    """Beyond the lossless block-constant fixture family (r5 verdict):
    gradients, dense noise, and chroma-heavy content must round-trip
    within quantization-noise bounds at several qualities."""
    from dc43_spark.functions import jpeg

    for seed, (h, w) in enumerate([(16, 16), (25, 33), (40, 56)]):
        rng = np.random.default_rng(seed * 7 + hash(family) % 1000)
        yy, xx = np.mgrid[0:h, 0:w]
        if family == "gradient":
            px = np.stack(
                [(xx * 255 / max(w - 1, 1)), (yy * 255 / max(h - 1, 1)),
                 ((xx + yy) * 255 / max(h + w - 2, 1))], axis=2
            ).astype(np.uint8)
            bounds = {95: (4.0, 48), 90: (6.0, 32), 85: (8.0, 80),
                      75: (7.0, 34), 50: (7.0, 40)}
        elif family == "noise":
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            # noise is JPEG's worst case (4:2:0 chroma subsampling alone
            # costs ~mean 44 here); bounds are loose but still rule out a
            # broken IDCT/predictor (random output gives mean ~85)
            bounds = {95: (58.0, 255), 90: (62.0, 255), 85: (62.0, 255),
                      75: (64.0, 255), 50: (70.0, 255)}
        else:  # chroma-heavy: saturated color blocks, near-flat luma
            px = np.zeros((h, w, 3), dtype=np.uint8)
            px[..., 0] = 255 * ((xx // 8 + yy // 8) % 2)
            px[..., 2] = 255 - px[..., 0]
            px[..., 1] = 128
            bounds = {95: (8.0, 96), 90: (3.0, 18), 85: (14.0, 128),
                      75: (8.0, 48), 50: (12.0, 120)}
        for quality, (mean_b, max_b) in bounds.items():
            dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=quality))
            assert dec.shape == px.shape
            err = np.abs(dec.astype(int) - px.astype(int))
            assert err.mean() < mean_b, (family, quality, err.mean())
            assert err.max() <= max_b, (family, quality, err.max())


def test_jpeg_corrupted_streams_raise_value_error():
    """Malformed inputs must raise a clean ValueError — never a stray
    KeyError/struct.error and never garbage pixels (r5 verdict item)."""
    from dc43_spark.functions import jpeg

    px = np.clip(
        60 + np.mgrid[0:16, 0:24][0] * 5, 0, 255
    ).astype(np.uint8)[:, :, None]
    enc = jpeg.jpeg_encode(px, quality=90)
    scan_start = enc.find(b"\xff\xda")
    dht_at = enc.find(b"\xff\xc4")
    dqt_at = enc.find(b"\xff\xdb")
    bad_dht = bytearray(enc)
    bad_dht[dht_at + 5] = 255  # claim 255 codes of length 1
    cases = {
        # scan cut right after the SOS header: zero entropy bytes, no EOI
        "truncated_scan": enc[: scan_start + 10],
        "bad_dht": bytes(bad_dht),
        # drop the DQT segment (69 bytes): SOF references an undefined table
        "missing_dqt": enc[:dqt_at] + enc[dqt_at + 69 :],
        # header chopped before any SOF/SOS
        "short_header": enc[:6],
        "garbage": b"\xff\xd8" + bytes(range(200)),
        # EOI stripped: the entropy reader must detect the exhausted
        # stream instead of fabricating trailing MCUs from padding
        "missing_eoi": enc[:-2],
        # EOI stripped AND entropy tail cut mid-MCU
        "missing_eoi_short_scan": enc[:-12],
    }
    for name, payload in cases.items():
        with pytest.raises(ValueError):
            jpeg.jpeg_decode(bytes(payload))


def test_jpeg_non_integer_sampling_ratio_rejected():
    """A 3-component SOF with factors 3 and 2 (hmax=3, h=2 -> 3/2) must be
    refused at parse time, not silently truncated in the upsample."""
    from dc43_spark.functions import jpeg

    px = np.full((8, 8, 3), 100, dtype=np.uint8)
    enc = jpeg.jpeg_encode(px, quality=90)
    sof_at = enc.find(b"\xff\xc0")
    assert sof_at > 0
    comp0 = sof_at + 2 + 2 + 6  # marker + len + (prec,h,w,nc)
    patched = bytearray(enc)
    patched[comp0 + 1] = 0x33  # comp 0 (Y): h=3,v=3
    patched[comp0 + 4] = 0x21  # comp 1 (Cb): h=2 -> 3 % 2 != 0
    with pytest.raises(ValueError, match="sampling"):
        jpeg.jpeg_decode(bytes(patched))


def test_extract_features_real_jpeg_decoder(spark):
    """image features for a JPEG payload come from REAL decoded pixels:
    feature = [w, h, c, mean...] — not the sha256 fake."""
    from dc43_spark.functions import jpeg

    px = np.full((12, 20, 3), 120, dtype=np.uint8)
    payload = jpeg.jpeg_encode(px, quality=50)
    df = spark.createDataFrame(
        [(1, "image", payload, ("jpeg", 20, 12, None))], schema=mm.MEDIA_SCHEMA
    )
    row = mm.extract_features(df).collect()[0]
    feat = row.feature
    assert feat[:3] == [20.0, 12.0, 3.0]
    assert abs(feat[3] - 120.0) < 0.01  # decoded mean, not hash noise


# ------------------------------------------------------- MJPEG-in-MP4


def _mjpeg_fixture(n_frames=3, w=24, h=16):
    from dc43_spark.functions import jpeg

    frames_px = []
    frames = []
    for f in range(n_frames):
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        v = 2 * ((7 * f + 5 * bx[None, :] + 11 * by[:, None]) % 128)
        px = v[:, :, None].astype(np.uint8)
        frames_px.append(px)
        frames.append(jpeg.jpeg_encode(px, quality=50))  # lossless family
    return frames_px, frames


def test_mjpeg_mp4_round_trip_exact_pixels():
    """Full container round-trip: encode JPEG frames -> MJPEG MP4 (real
    stts/stsc/stsz/stco tables) -> extract samples -> entropy-decode each.
    The block-constant q50 family round-trips losslessly, so pixel
    equality is EXACT per frame."""
    from dc43_spark.functions import jpeg

    frames_px, frames = _mjpeg_fixture()
    payload = mm.mjpeg_mp4_encode(frames, 24, 16, frame_ms=40)
    # the generic header probe still sees the container
    assert mm.mp4_header(payload) == (24, 16, 120)
    out = mm.mjpeg_mp4_frames(payload)
    assert out is not None and len(out) == 3
    assert out == frames  # byte-exact sample extraction
    for got, px in zip(out, frames_px):
        np.testing.assert_array_equal(jpeg.jpeg_decode(got), px)


def test_mjpeg_mp4_guards():
    _, frames = _mjpeg_fixture(n_frames=2)
    payload = bytearray(mm.mjpeg_mp4_encode(frames, 24, 16))
    # header-only MP4 (no track) -> None, not an error
    assert mm.mjpeg_mp4_frames(mm.mp4_encode_header(10, 10, 100)) is None
    assert mm.mjpeg_mp4_frames(b"not an mp4") is None
    # corrupt stsz size overruns the file -> ValueError, never garbage
    stsz_at = bytes(payload).find(b"stsz")
    sz_field = stsz_at + 4 + 4 + 8  # fourcc + version/flags + fixed/count
    import struct as _s

    payload[sz_field : sz_field + 4] = _s.pack(">I", 10_000_000)
    with pytest.raises(ValueError, match="overruns"):
        mm.mjpeg_mp4_frames(bytes(payload))
    with pytest.raises(ValueError):
        mm.mjpeg_mp4_encode([], 8, 8)


def test_extract_features_real_mjpeg_decoder(spark):
    """Video features for an MJPEG payload come from REAL decoded frame
    pixels: [w, h, dur, n_frames, mean_all, mean_first, mean_last, 0]."""
    frames_px, frames = _mjpeg_fixture(n_frames=2, w=16, h=8)
    payload = mm.mjpeg_mp4_encode(frames, 16, 8, frame_ms=50)
    df = spark.createDataFrame(
        [(1, "video", payload, ("mp4", 16, 8, 100))], schema=mm.MEDIA_SCHEMA
    )
    feat = mm.extract_features(df).collect()[0].feature
    assert feat[:4] == [16.0, 8.0, 100.0, 2.0]
    expect_all = float(np.mean([p.mean() for p in frames_px]))
    assert abs(feat[4] - np.concatenate([p.ravel() for p in frames_px]).mean()) < 1e-3
    assert abs(feat[5] - frames_px[0].mean()) < 1e-3
    assert abs(feat[6] - frames_px[1].mean()) < 1e-3
