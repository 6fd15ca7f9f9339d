"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

REAL codecs (stdlib/NumPy only, no Pillow/torchaudio in this container):

- PNG: full encode AND pixel decode — zlib IDAT, all five scanline filters
  (None/Sub/Up/Average/Paeth), gray / RGB / gray+alpha / RGBA;
- JPEG: full BASELINE codec (functions/jpeg.py) — DCT + quantize + Annex K
  Huffman encode (grayscale / YCbCr 4:2:0) and the complete entropy
  decoder (marker walk, byte-unstuffed Huffman, dequant, IDCT, upsample,
  YCbCr->RGB). Progressive/arithmetic streams raise and fall back;
- WAV: RIFF/PCM encode + header decode (rate, channels, bits, duration);
- MP4: header codec (box walk) — sample/frame decode would need real
  video codecs, so video *pixel* features still fall back to the
  deterministic fake in ``FAKE_DECODERS``.

``probe_media`` and ``image_channel_stats`` run them inside the Arrow
``mapInPandas`` plumbing.

Design for 100 TB:
- binary payloads stay opaque until the last possible operator (no decode
  before filters/joins that don't need pixels);
- decode runs in ``mapInPandas`` so payload bytes move driver-free in Arrow
  record batches; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory;
- feature outputs are fixed-width structs, so downstream ops are columnar.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

Decoder = Callable[[bytes], list[float]]


def _fake_decode(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE decoder (no codecs in this container).

    Produces an 8-dim 'feature' from the payload's sha256 — stable across
    runs/machines so tests and oracles can pin outputs. Replace with a real
    decoder via ``DECODERS[media_type] = fn``."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


#: the remaining fake surface: NON-MJPEG video pixel decode (H.264 etc.
#: need codecs this container can't verify) and arbitrary non-container
#: bytes. PNG, baseline JPEG, WAV and MJPEG-in-MP4 all decode for real
#: in-tree (png_decode, jpeg.jpeg_decode, wav_header, mjpeg_mp4_frames).
FAKE_DECODERS: dict[str, Decoder] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def _decode_image_pixels(payload: bytes):
    """(H, W, C) uint8 pixels for PNG or baseline JPEG payloads, else
    None. The single sniff-and-decode used by every pixel-level operator."""
    try:
        return png_decode(payload)
    except Exception:  # noqa: BLE001 — not a PNG (or corrupt)
        pass
    try:
        from dc43_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(payload)
    except Exception:  # noqa: BLE001 — not a baseline JPEG either
        return None


def _image_decode(payload: bytes) -> list[float]:
    """REAL image feature when the payload is PNG or baseline JPEG:
    [width, height, channels, mean_c0..] from actual decoded pixels (see
    ``png_decode`` / ``jpeg.jpeg_decode``). Undecodable payloads (corrupt,
    progressive JPEG, other formats) fall back to the deterministic fake."""
    px = _decode_image_pixels(payload)
    if px is None:
        return _fake_decode(payload)
    h, w, c = px.shape
    means = px.astype(np.float64).mean(axis=(0, 1))
    feature = [float(w), float(h), float(c)] + [float(m) for m in means]
    return feature[:8] + [0.0] * max(0, 8 - len(feature))


def _audio_decode(payload: bytes) -> list[float]:
    """REAL audio feature when the payload is WAV: rate/channels/bits/
    duration from the actual RIFF header; fake otherwise."""
    parsed = wav_header(payload)
    if parsed is None:
        return _fake_decode(payload)
    rate, chans, bits, dur = parsed
    return [float(rate), float(chans), float(bits), float(dur), 0.0, 0.0, 0.0, 0.0]


def _video_decode(payload: bytes) -> list[float]:
    """REAL video feature for MP4 payloads:

    - MJPEG track (``jpeg`` sample entry): every frame entropy-decodes
      through the in-tree baseline JPEG decoder — the feature carries
      [w, h, duration_ms, n_frames, mean over ALL frame pixels,
      first-frame mean, last-frame mean, 0]. Real pixels, no codecs
      beyond this repo.
    - other/elementary MP4 (header-only fixtures, H.264, ...): track
      dimensions + duration from the box structure, frame stats zero —
      compressed-codec pixel decode is the one remaining fake surface.
    - not MP4 at all: the deterministic fake."""
    try:
        frames = mjpeg_mp4_frames(payload)
    except Exception:  # noqa: BLE001 — corrupt sample tables
        frames = None
    parsed = mp4_header(payload)
    if parsed is None:
        return _fake_decode(payload)
    w, h, dur = parsed
    if frames:
        from dc43_spark.functions.jpeg import jpeg_decode

        try:
            pixels = [jpeg_decode(f) for f in frames]
        except ValueError:
            pixels = None
        if pixels:
            total = sum(float(p.sum()) for p in pixels)
            count = sum(p.size for p in pixels)
            return [
                float(w),
                float(h),
                float(dur),
                float(len(pixels)),
                total / count,
                float(pixels[0].mean()),
                float(pixels[-1].mean()),
                0.0,
            ]
    return [float(w), float(h), float(dur), 0.0, 0.0, 0.0, 0.0, 0.0]


DECODERS: dict[str, Decoder] = {
    "image": _image_decode,
    "audio": _audio_decode,
    "video": _video_decode,
}


def extract_features(df: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA frame.

    ``mapInPandas`` streams record batches through Python once; the decoder
    never sees the whole partition, so executor memory stays bounded by the
    Arrow batch size regardless of payload count."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            types = pdf["media_type"]
            features = [
                DECODERS.get(t, _fake_decode)(p if p is not None else b"")
                for t, p in zip(types, payloads)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": types,
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "content_hash": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "feature": features,
                }
            )

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def payload_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM payload statistics — no Python, no decode."""
    return df.select(
        F.col("media_id"),
        F.col("media_type"),
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("content_hash"),
    )


# ------------------------------------------------------------- PNG codec
#
# PNG layout: 8-byte signature, then chunks [len u32 | type | data | crc].
# IHDR data: width u32, height u32, bit_depth u8, color_type u8,
# compression u8, filter u8, interlace u8. IDAT: one zlib stream of
# scanlines, each prefixed by a filter byte (0-4).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def _png_chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, c) with c in {1,2,3,4} -> PNG bytes.

    Rows cycle through all five filter types (row % 5) so a decoder must
    implement real unfiltering to get the pixels back — this is what makes
    the round-trip tests meaningful, not an identity copy."""
    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = _CHANNELS_COLOR_TYPE[c]
    bpp = c  # bytes per pixel at bit depth 8
    # whole-image filter math (PNG filters reference the RAW previous
    # scanline during encoding, so every variant vectorizes):
    flat = arr.reshape(h, w * bpp).astype(np.int16)
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, bpp:] = flat[:-1, :-bpp]
    variants = np.stack(
        [
            flat,                              # 0 None
            flat - left,                       # 1 Sub
            flat - up,                         # 2 Up
            flat - (left + up) // 2,           # 3 Average
            flat - _paeth(left, up, ul),       # 4 Paeth
        ]
    ).astype(np.uint8)
    ftypes = np.arange(h, dtype=np.uint8) % 5
    body = np.empty((h, 1 + w * bpp), dtype=np.uint8)
    body[:, 0] = ftypes
    body[:, 1:] = variants[ftypes, np.arange(h)]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body.tobytes(), 1))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    out = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
    return out


def png_header(payload: bytes) -> Optional[tuple[int, int, int, int]]:
    """(width, height, channels, bit_depth) from IHDR, or None if not PNG."""
    if payload is None or len(payload) < 33 or not payload.startswith(_PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h, depth, color_type = struct.unpack(">IIBB", payload[16:26])
    channels = _COLOR_TYPE_CHANNELS.get(color_type)
    if channels is None:
        return None
    return w, h, channels, depth


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 pixel array (h, w, c). Real decode: zlib
    decompress + unfilter (all five types). Bit depth 8, non-interlaced."""
    header = png_header(payload)
    if header is None:
        raise ValueError("not a PNG payload")
    w, h, c, depth = header
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if payload[28] != 0:
        raise ValueError("interlaced PNG unsupported")
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        kind = payload[pos + 4 : pos + 8]
        if kind == b"IDAT":
            idat.extend(payload[pos + 8 : pos + 8 + length])
        if kind == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int16)
        if ftype == 1:
            for x in range(c, stride):  # Sub needs the reconstructed left
                row[x] = (row[x] + row[x - c]) & 0xFF
        elif ftype == 2:
            row = (row + prev) & 0xFF
        elif ftype == 3:
            for x in range(stride):
                left = row[x - c] if x >= c else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:
            for x in range(stride):
                left = row[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                row[x] = (row[x] + _paeth_scalar(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out.reshape(h, w, c)


def _paeth_scalar(left: int, up: int, ul: int) -> int:
    p = left + up - ul
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
    if pa <= pb and pa <= pc:
        return left
    return up if pb <= pc else ul


# ------------------------------------------------------------ JPEG codec
#
# Header only: SOI then markers [FF mm | len u16 | data]; SOF0/1/2 data is
# precision u8, height u16, width u16, n_components u8. Pixel entropy
# decode is deliberately out of scope.


def jpeg_encode_header(width: int, height: int, channels: int = 3) -> bytes:
    """Minimal structurally-valid JPEG (SOI + JFIF APP0 + SOF0 + EOI).

    Carries no compressed scan data — it exists so the header PARSER has a
    real, spec-shaped artifact to walk; a full encoder needs entropy coding
    this container can't verify anyway."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, channels)
    for i in range(channels):
        sof0 += struct.pack(">BBB", i + 1, 0x11, 0)
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def jpeg_header(payload: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, channels) from the first SOFn marker, or None."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            return None
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
            if pos + 4 + 6 > len(payload):
                return None
            _, h, w, n = struct.unpack(">BHHB", payload[pos + 4 : pos + 10])
            return w, h, n
        if marker == 0xDA:  # SOS — no SOF seen
            return None
        pos += 2 + length
    return None


# ------------------------------------------------------------- MP4 codec
#
# ISO BMFF: a series of boxes [size u32 | fourcc | payload], nested for
# containers. Header-level only (like JPEG): mvhd carries
# timescale/duration, tkhd carries track dimensions as 16.16 fixed-point.
# Sample data (mdat) is out of scope — real video decode needs codecs this
# container cannot verify.


def _mp4_box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def mp4_encode_header(width: int, height: int, duration_ms: int) -> bytes:
    """Minimal structurally-valid MP4 (ftyp + moov[mvhd + trak[tkhd]]).

    timescale is fixed at 1000 so duration units ARE milliseconds."""
    mvhd = (
        b"\x00\x00\x00\x00"          # version + flags
        + struct.pack(">II", 0, 0)     # ctime, mtime
        + struct.pack(">II", 1000, duration_ms)  # timescale, duration
        + b"\x00" * 80                 # rate/volume/reserved/matrix/next_track
    )
    tkhd = (
        b"\x00\x00\x00\x07"          # version + flags (enabled|in movie|in preview)
        + struct.pack(">III", 0, 0, 1)  # ctime, mtime, track_id
        + b"\x00" * 4                  # reserved
        + struct.pack(">I", duration_ms)
        + b"\x00" * 52                 # reserved/layer/alt/volume/matrix
        + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed
    )
    moov = _mp4_box(b"mvhd", mvhd) + _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd))
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _mp4_box(b"moov", moov)


def mjpeg_mp4_encode(
    frames: list, width: int, height: int, *, frame_ms: int = 40
) -> bytes:
    """Motion-JPEG in MP4: each sample is a complete baseline JPEG
    (sample entry ``jpeg``), all samples in ONE chunk inside ``mdat``,
    with real stts/stsc/stsz/stco sample tables. Layout is
    ftyp | mdat | moov so chunk offsets are known when moov is written.

    ``frames`` are encoded JPEG byte strings (functions/jpeg.jpeg_encode);
    timescale is 1000 so durations are milliseconds."""
    if not frames:
        raise ValueError("MJPEG needs at least one frame")
    n = len(frames)
    duration = n * frame_ms
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(frames)
    chunk_offset = len(ftyp) + 8  # first sample starts after the mdat header

    mvhd = (
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, duration)
        + b"\x00" * 80
    )
    tkhd = (
        b"\x00\x00\x00\x07"
        + struct.pack(">III", 0, 0, 1)
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16)
    )
    mdhd = (
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, duration)
        + struct.pack(">HH", 0x55C4, 0)  # language 'und', pre_defined
    )
    hdlr = (
        b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"MJPEG\x00"
    )
    # 'jpeg' visual sample entry (ISO 12-1 VisualSampleEntry, 86 bytes)
    sample_entry = (
        struct.pack(">I", 86)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">H", 24)  # depth
        + struct.pack(">h", -1)  # pre_defined
    )
    stsd = _mp4_box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + sample_entry)
    stts = _mp4_box(
        b"stts", b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">II", n, frame_ms)
    )
    stsc = _mp4_box(
        b"stsc", b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">III", 1, n, 1)
    )
    stsz = _mp4_box(
        b"stsz",
        b"\x00" * 4
        + struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _mp4_box(
        b"stco", b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">I", chunk_offset)
    )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", _mp4_box(b"mdhd", mdhd) + _mp4_box(b"hdlr", hdlr) + minf)
    trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd) + mdia)
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + trak)
    return ftyp + _mp4_box(b"mdat", mdat_payload) + moov


def _stbl_tables(payload: bytes, sb: int, se: int) -> Optional[dict]:
    """Parse the sample tables of one stbl box; None if not MJPEG."""
    entry_fourcc = None
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc_entries: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    for box, bb, be in _mp4_boxes(payload, sb, se):
        if box == b"stsd" and be - bb >= 16:
            entry_fourcc = payload[bb + 12 : bb + 16]
        elif box == b"stsz" and be - bb >= 12:
            fixed, count = struct.unpack(">II", payload[bb + 4 : bb + 12])
            if fixed:
                sizes = [fixed] * count
            else:
                if be - bb < 12 + 4 * count:
                    raise ValueError("stsz truncated")
                sizes = [
                    struct.unpack(">I", payload[bb + 12 + 4 * i : bb + 16 + 4 * i])[0]
                    for i in range(count)
                ]
        elif box in (b"stco", b"co64") and be - bb >= 8:
            (count,) = struct.unpack(">I", payload[bb + 4 : bb + 8])
            width_ = 8 if box == b"co64" else 4
            if be - bb < 8 + width_ * count:
                raise ValueError(f"{box.decode()} truncated")
            fmt = ">Q" if box == b"co64" else ">I"
            chunk_offsets = [
                struct.unpack(
                    fmt, payload[bb + 8 + width_ * i : bb + 8 + width_ * (i + 1)]
                )[0]
                for i in range(count)
            ]
        elif box == b"stsc" and be - bb >= 8:
            (count,) = struct.unpack(">I", payload[bb + 4 : bb + 8])
            if be - bb < 8 + 12 * count:
                raise ValueError("stsc truncated")
            stsc_entries = [
                struct.unpack(
                    ">II", payload[bb + 8 + 12 * i : bb + 16 + 12 * i]
                )
                for i in range(count)
            ]
    if entry_fourcc != b"jpeg" or not sizes or not chunk_offsets:
        return None
    return {"sizes": sizes, "chunks": chunk_offsets, "stsc": stsc_entries}


def mjpeg_mp4_frames(payload: bytes) -> Optional[list]:
    """The JPEG sample byte-strings of an MP4's MJPEG video track, in
    sample order — or None when the payload is not MP4 or carries no
    ``jpeg``-sample-entry video track (header-only fixtures, H.264, ...).

    Walks moov > trak > mdia (handler ``vide``) > minf > stbl and maps
    samples to absolute offsets through stsc x stco (general multi-chunk
    mapping, stco or co64), slicing each sample out of ``mdat`` by its
    stsz size. A structurally-MJPEG file with broken tables raises
    ``ValueError`` rather than yielding garbage frames."""
    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    tables = None
    for fourcc, body, box_end in _mp4_boxes(payload, 0, len(payload)):
        if fourcc != b"moov":
            continue
        for inner, ib, ie in _mp4_boxes(payload, body, box_end):
            if inner != b"trak":
                continue
            for tk, tb, te in _mp4_boxes(payload, ib, ie):
                if tk != b"mdia":
                    continue
                is_video = False
                stbl_span = None
                for md, mb, me in _mp4_boxes(payload, tb, te):
                    if md == b"hdlr" and me - mb >= 12:
                        is_video = payload[mb + 8 : mb + 12] == b"vide"
                    elif md == b"minf":
                        for mi, mib, mie in _mp4_boxes(payload, mb, me):
                            if mi == b"stbl":
                                stbl_span = (mib, mie)
                if is_video and stbl_span is not None:
                    tables = _stbl_tables(payload, *stbl_span)
                    if tables is not None:
                        break
            if tables is not None:
                break
    if tables is None:
        return None
    sizes, chunks, stsc = tables["sizes"], tables["chunks"], tables["stsc"]
    if not stsc:
        stsc = [(1, len(sizes))]
    # expand stsc runs into per-chunk sample counts
    per_chunk: list[int] = []
    for i, (first, spc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunks)
        per_chunk.extend([spc] * (last - first + 1))
    frames = []
    sample = 0
    for chunk_idx, count in enumerate(per_chunk):
        if chunk_idx >= len(chunks):
            break
        offset = chunks[chunk_idx]
        for _ in range(count):
            if sample >= len(sizes):
                break
            size = sizes[sample]
            if offset + size > len(payload):
                raise ValueError(
                    f"MJPEG sample {sample} overruns the file "
                    f"({offset}+{size} > {len(payload)})"
                )
            frames.append(payload[offset : offset + size])
            offset += size
            sample += 1
    if sample != len(sizes):
        raise ValueError(
            f"sample tables name {len(sizes)} samples but chunks cover {sample}"
        )
    return frames


def _mp4_boxes(payload: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        fourcc = payload[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            return
        yield fourcc, pos + 8, pos + size
        pos += size


def mp4_header(payload: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, duration_ms) from moov/mvhd + first tkhd, or None.

    duration is rescaled from mvhd's timescale to integral milliseconds
    (floor), so cross-engine comparison stays exact."""
    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    w = h = dur = None
    for fourcc, body, box_end in _mp4_boxes(payload, 0, len(payload)):
        if fourcc != b"moov":
            continue
        for inner, ib, ie in _mp4_boxes(payload, body, box_end):
            if inner == b"mvhd" and ie - ib >= 20:
                timescale, duration = struct.unpack(">II", payload[ib + 12 : ib + 20])
                if timescale:
                    dur = duration * 1000 // timescale
            elif inner == b"trak":
                for tk, tb, te in _mp4_boxes(payload, ib, ie):
                    if tk == b"tkhd" and te - tb >= 84 and w is None:
                        fw, fh = struct.unpack(">II", payload[te - 8 : te])
                        w, h = fw >> 16, fh >> 16
    if dur is None and w is None:
        return None
    return (w or 0, h or 0, dur if dur is not None else 0)


# ------------------------------------------------------------- WAV codec


def wav_encode(samples: np.ndarray, *, sample_rate: int, channels: int = 1) -> bytes:
    """int16 PCM samples (interleaved if multi-channel) -> RIFF/WAVE bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_header(payload: bytes) -> Optional[tuple[int, int, int, int]]:
    """(sample_rate, channels, bits_per_sample, duration_ms) or None.

    duration_ms is integral (floor), so cross-engine comparison is exact."""
    if payload is None or len(payload) < 36 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    rate = chans = bits = None
    data_len = None
    while pos + 8 <= len(payload):
        kind = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if kind == b"fmt " and length >= 16:
            _, chans, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
        elif kind == b"data":
            data_len = length
        pos += 8 + length + (length & 1)
    if not rate or not chans or not bits or data_len is None:
        return None
    n_frames = data_len // (chans * (bits // 8))
    return rate, chans, bits, (n_frames * 1000) // rate


# -------------------------------------------------- probe / stats operators

PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def probe_media(df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Sniff every payload's REAL container header (PNG/JPEG/WAV) into
    typed metadata — the 100 TB ingest step that validates a lake of opaque
    binaries without decoding pixels. Arrow-batched; one pass."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt = w = h = c = depth = rate = dur = None
                png = png_header(payload)
                if png is not None:
                    fmt, (w, h, c, depth) = "png", png
                else:
                    jpg = jpeg_header(payload)
                    if jpg is not None:
                        fmt, (w, h, c), depth = "jpeg", jpg, 8
                    else:
                        wav = wav_header(payload)
                        if wav is not None:
                            fmt = "wav"
                            rate, c, depth, dur = wav
                        else:
                            mp4 = mp4_header(payload)
                            if mp4 is not None:
                                fmt, (w, h, dur) = "mp4", mp4
                rows.append((mid, fmt, w, h, c, depth, rate, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height",
                    "channels", "bit_depth", "sample_rate", "duration_ms",
                ],
            )

    return df.mapInPandas(process, schema=PROBE_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_mean_micro", T.LongType(), True),
    ]
)


def image_stats_rows(ids, payloads) -> pd.DataFrame:
    """One IMAGE_STATS_SCHEMA-shaped pandas frame for parallel sequences
    of media ids and payload bytes — the per-batch kernel shared by
    ``image_channel_stats`` and fused encode->stats stages (fusing keeps
    chained Python operators from paying two Arrow round-trips per row,
    guide §4)."""
    rows = []
    for mid, payload in zip(ids, payloads):
        px = _decode_image_pixels(payload)
        if px is None:
            rows.append((mid, None, None, None, None, None))
            continue
        h, w, c = px.shape
        total = int(px.astype(np.int64).sum())
        n = h * w * c
        rows.append((mid, w, h, c, total, total * 1_000_000 // n))
    return pd.DataFrame(
        rows,
        columns=[
            "media_id", "width", "height", "channels",
            "pixel_sum", "pixel_mean_micro",
        ],
    )


def image_channel_stats(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL pixel statistics for PNG and baseline-JPEG payloads: full
    decode (zlib unfilter / entropy decode + IDCT), then exact integer sum
    and integral-micro mean (cross-engine stable). Undecodable payloads
    yield NULL stats rather than failing the batch."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield image_stats_rows(pdf[id_col], pdf[payload_col])

    return df.mapInPandas(process, schema=IMAGE_STATS_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Plan video frame sampling WITHOUT decoding: one output row per
    requested frame timestamp, derived from metadata duration. The decode of
    each planned frame happens later in ``extract_features`` (stubbed here).

    This is the scale trick: the expensive decode fan-out is an explode on
    metadata, so Spark can repartition the planned frames before any codec
    runs."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )
