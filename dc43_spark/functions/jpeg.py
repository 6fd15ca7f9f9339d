"""Baseline JPEG codec (ITU-T T.81) in pure NumPy — no Pillow/libjpeg.

Closes the one remaining multimodal stub (ref parity note: the reference
treats media payloads as opaque binaries end-to-end; this repo goes
further and actually decodes them — see functions/multimodal.py):

- ``jpeg_encode``: baseline sequential DCT encoder. Grayscale (one
  component) or YCbCr with 4:2:0 chroma subsampling (three components).
  Standard Annex K quantization tables scaled by the IJG quality curve,
  standard Annex K Huffman tables, byte-stuffed entropy stream.
- ``jpeg_decode``: full baseline entropy decoder — DQT/DHT/SOF0/DRI/SOS
  marker walk, canonical Huffman decode with 0xFF00 unstuffing and RSTn
  restart handling, dequantize, de-zigzag, 8x8 IDCT via the orthonormal
  DCT-II basis (one matmul per block stack), sampling-factor upsample,
  YCbCr->RGB. Returns an (H, W, C) uint8 array.

Progressive (SOF2), arithmetic coding, 12-bit precision, and hierarchical
modes raise ``ValueError`` — callers fall back explicitly instead of
getting silently-wrong pixels.

Scale note: this runs inside Arrow-batched ``mapInPandas`` stages
(multimodal.py), one image at a time per row — the per-image Python cost
is bounded by image size, and the operator parallelises across
partitions, so cluster throughput scales with executors, not with any
driver-side loop.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables
# Zigzag scan order: ZIGZAG[k] = row-major index of the k-th coefficient
# in scan order (generated, not transcribed, to avoid typo risk).


def _zigzag() -> np.ndarray:
    pos = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            diag.reverse()
        pos.extend(diag)
    return np.array([r * 8 + c for r, c in pos], dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 quantization tables (row-major).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M: coeff = M @ block @ M.T."""
    x = np.arange(8)
    u = x.reshape(8, 1)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m


_M = _dct_basis()


def _canonical_codes(bits: list, vals: list) -> dict:
    """symbol -> (code, length) for a BITS/HUFFVAL spec (T.81 C.2)."""
    out, code = {}, 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits: list, vals: list) -> dict:
    """(length, code) -> symbol — inverse of ``_canonical_codes``."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _quality_tables(quality: int) -> tuple:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return ql, qc


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align with 1-padding (stuffed if it forms 0xFF) and emit
        RSTm. Markers themselves are written raw — only entropy bytes are
        subject to stuffing."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])


def _magnitude(v: int) -> tuple:
    """(category, appended-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n, 8, 8) block stack
    in raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _fdct_quant(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize a block stack -> (n, 64) int coefficients in
    ROW-MAJOR order (zigzag is applied at entropy-coding time)."""
    coeff = np.einsum("ij,njk,lk->nil", _M, blocks - 128.0, _M)
    return np.round(coeff.reshape(-1, 64) / q).astype(np.int64)


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    dc = int(coef_zz[0])
    cat, bits = _magnitude(dc - pred)
    code, ln = dc_tab[cat]
    bw.write(code, ln)
    bw.write(bits, cat)
    run = 0
    nz = np.nonzero(coef_zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _dht_segment(tc_th: int, bits: list, vals: list) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, q_rowmajor: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in q_rowmajor[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode(
    pixels: np.ndarray, quality: int = 90, *, restart_interval: int = 0
) -> bytes:
    """Encode (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8 pixels
    as a baseline sequential JFIF JPEG (4:2:0 for color).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every N
    MCUs with DC predictor resets — the mechanism hardware/parallel
    decoders use to resynchronise; exercises the decoder's restart path."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"jpeg_encode supports 1 or 3 channels, got {c}")
    ql, qc = _quality_tables(quality)

    if c == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        # pad all planes to the 16x16 MCU grid, THEN 2x2-mean subsample
        # chroma so the half-res planes tile the 8x8 block grid exactly
        y = _pad_edge(y, 16)
        cb = _pad_edge(cb, 16)
        cr = _pad_edge(cr, 16)
        hp, wp = y.shape
        cb = cb.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))

        yq = _fdct_quant(_blocks_of(y), ql)
        cbq = _fdct_quant(_blocks_of(cb), qc)
        crq = _fdct_quant(_blocks_of(cr), qc)

        dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

        bw = _BitWriter()
        mcu_w, mcu_h = wp // 16, hp // 16
        blocks_per_row = wp // 8
        pred = [0, 0, 0]
        mcu_i = 0
        for my in range(mcu_h):
            for mx in range(mcu_w):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    bw.restart(mcu_i // restart_interval - 1)
                    pred = [0, 0, 0]
                for by in range(2):
                    for bx in range(2):
                        idx = (my * 2 + by) * blocks_per_row + (mx * 2 + bx)
                        pred[0] = _encode_block(
                            bw, yq[idx][ZIGZAG], pred[0], dc_l, ac_l
                        )
                cidx = my * (wp // 16) + mx
                pred[1] = _encode_block(bw, cbq[cidx][ZIGZAG], pred[1], dc_c, ac_c)
                pred[2] = _encode_block(bw, crq[cidx][ZIGZAG], pred[2], dc_c, ac_c)
                mcu_i += 1
        scan = bw.flush()

        sof_comps = b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
        sos_comps = b"\x01\x00" + b"\x02\x11" + b"\x03\x11"
        n_comp = 3
        dqt = _dqt_segment(0, ql) + _dqt_segment(1, qc)
        dht = (
            _dht_segment(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
            + _dht_segment(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
            + _dht_segment(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
            + _dht_segment(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
        )
    else:
        y = _pad_edge(px[:, :, 0], 8)
        yq = _fdct_quant(_blocks_of(y), ql)
        dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        bw = _BitWriter()
        pred0 = 0
        for mcu_i, blk in enumerate(yq):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.restart(mcu_i // restart_interval - 1)
                pred0 = 0
            pred0 = _encode_block(bw, blk[ZIGZAG], pred0, dc_l, ac_l)
        scan = bw.flush()
        sof_comps = b"\x01\x11\x00"
        sos_comps = b"\x01\x00"
        n_comp = 1
        dqt = _dqt_segment(0, ql)
        dht = _dht_segment(0x00, DC_LUMA_BITS, DC_LUMA_VALS) + _dht_segment(
            0x10, AC_LUMA_BITS, AC_LUMA_VALS
        )

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof = struct.pack(">BHHB", 8, h, w, n_comp) + sof_comps
    sos = bytes([n_comp]) + sos_comps + b"\x00\x3f\x00"
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + dqt
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + dht
        + dri
        + b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        + scan
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over a byte-stuffed entropy segment."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream truncated")
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed literal 0xFF
                    self.pos += 2
                elif nxt == 0xFF:  # spec-legal fill byte before a marker
                    self.pos += 1
                    continue
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # restart/EOI: stop filling; caller handles the marker
                    byte = None
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            else:
                self.pos += 1
            if byte is None:
                # pad with 1s past the marker so in-flight reads complete
                self.acc = (self.acc << 8) | 0xFF
            else:
                self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def _skip_fill(self) -> int:
        """Position of the 0xFF that starts the next marker, skipping any
        spec-legal 0xFF fill bytes (a run of 0xFF collapses to the last)."""
        d, p = self.data, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        return p

    def at_restart(self) -> bool:
        d = self.data
        p = self._skip_fill()
        return p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7

    def sync_restart(self) -> None:
        """Discard pad bits, step over the RSTn marker (and any fill)."""
        self.acc = 0
        self.nbits = 0
        self.pos = self._skip_fill() + 2


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (H, W, C) uint8 pixels.

    Any malformed stream raises ``ValueError`` — truncated scans, bad
    Huffman tables, missing segments, short headers — never a stray
    ``KeyError``/``struct.error`` and never garbage pixels: callers
    (multimodal's decode dispatch) gate their fallback on ValueError."""
    try:
        return _jpeg_decode_impl(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, StopIteration) as exc:
        raise ValueError(
            f"corrupt JPEG stream: {type(exc).__name__}: {exc}"
        ) from exc


def _jpeg_decode_impl(payload: bytes) -> np.ndarray:
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps: list = []
    h = w = 0
    restart_interval = 0
    pos = 2
    data = payload
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        # code; treating the second 0xFF as the code read a bogus length
        # from garbage (r5 advice)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                quant[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tabs = seg[1 + ci * 2 : 3 + ci * 2]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append((comp, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if not comps or scan_comps is None:
        raise ValueError("JPEG has no SOS scan (header-only payload)")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        # exotic non-divisible ratios (e.g. 3:2) would silently truncate
        # the upsample repeat factor and mis-shape the plane (r5 advice)
        if c["h"] < 1 or c["v"] < 1 or vmax % c["v"] or hmax % c["h"]:
            raise ValueError(
                f"non-integer sampling ratio h={c['h']}/{hmax} v={c['v']}/{vmax}"
            )
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)

    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if br.at_restart():
                    br.sync_restart()
                else:
                    br.acc = 0
                    br.nbits = 0
                pred = {c["id"]: 0 for c in comps}
            for comp, dc_id, ac_id in scan_comps:
                dtab, atab = huff_dc[dc_id], huff_ac[ac_id]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = _huff_decode(br, dtab)
                        diff = _extend(br.read_bits(cat), cat)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, atab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            cat = sym & 0x0F
                            zz[k] = _extend(br.read_bits(cat), cat)
                            k += 1
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        coef = np.zeros(64, dtype=np.int64)
                        coef[ZIGZAG] = zz
                        comp["coef"][row * comp["bw"] + col] = (
                            coef * quant[comp["tq"]]
                        )
            mcu_count += 1

    planes = []
    for c in comps:
        blocks = c["coef"].reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _M, blocks, _M) + 128.0
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full MCU-grid resolution by sampling-factor repeat
        # (ratios validated divisible at SOF parse)
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = planes[0][:, :, None]
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    else:
        out = np.stack(planes, axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
