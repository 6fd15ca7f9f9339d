"""Delta deletion-vector codec — the PUBLIC protocol formats, no jar.

Implements, from the published Delta protocol (delta.io PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format") and the RoaringBitmap
interoperable spec (RoaringFormatSpec):

- Z85 encoding (the ZeroMQ base85 alphabet the protocol prescribes for
  inline DVs and for the UUID inside ``pathOrInlineDv``),
- the 64-bit ``RoaringBitmapArray`` *portable* serialization — an
  8-byte little-endian bitmap count, then per 32-bit bitmap a 4-byte
  little-endian high key followed by a standard portable 32-bit
  RoaringBitmap,
- the DV blob framing: 4-byte little-endian magic ``1681511377``
  before the bitmap array,
- the DV *file* layout: a format-version byte (1), then per stored
  vector at its descriptor ``offset``: 4-byte **big-endian** blob size,
  the blob, and a 4-byte big-endian CRC-32 of the blob.

Both directions are implemented: parsing (the reader's need) and
serialization (tests hand-write real DV files; the snaplog→Delta export
can emit them). Decoding returns numpy arrays and is executor-safe —
the scan ships descriptors to executors and expands positions there,
never materializing row positions on the driver.

Reference parity: ref spark/io/merge.py:43-127 reads real Delta tables
where DVs are on by default; without this module the jar-less reader
had to refuse them (delta_log.py r8 behavior).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterable, Optional

import numpy as np

#: little-endian magic prefixing every serialized RoaringBitmapArray blob
DV_MAGIC = 1681511377

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

# 32-bit RoaringBitmap portable-format constants (RoaringFormatSpec)
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (length must be a multiple of 4)."""
    if len(data) % 4:
        raise ValueError(f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    """Decode a Z85 string (length must be a multiple of 5)."""
    if len(text) % 5:
        raise ValueError(f"z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------- 32-bit roaring (portable format)


def _parse_roaring32(buf: bytes, pos: int) -> tuple:
    """Parse one portable 32-bit RoaringBitmap starting at ``pos``.
    Returns (uint32 numpy array of set values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        run_flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys[i] = k
        cards[i] = cm1 + 1
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential walk
    parts = []
    for i in range(n):
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        base = np.uint32(keys[i]) << np.uint32(16)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(runs[2 * j], runs[2 * j] + runs[2 * j + 1] + 1,
                              dtype=np.uint32)
                    for j in range(n_runs)
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] > 4096:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
        else:
            vals = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        parts.append(base | vals)
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, pos


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Portable 32-bit RoaringBitmap of sorted-unique uint32 ``values``.
    Array containers for <=4096 per 16-bit key, bitmap containers above —
    no run containers (always legal; run encoding is an optimization)."""
    values = np.asarray(values, dtype=np.uint32)
    high = (values >> np.uint32(16)).astype(np.uint16)
    low = (values & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(high, return_index=True)
    n = len(keys)
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUNCONTAINER, n)
    desc = bytearray()
    bodies = []
    bounds = list(starts) + [len(values)]
    for i, k in enumerate(keys):
        chunk = low[bounds[i] : bounds[i + 1]]
        desc += struct.pack("<HH", int(k), len(chunk) - 1)
        if len(chunk) > 4096:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[chunk] = 1
            bodies.append(np.packbits(bits, bitorder="little").tobytes())
        else:
            bodies.append(chunk.astype("<u2").tobytes())
    offsets = bytearray()
    start = len(header) + len(desc) + 4 * n
    for b in bodies:
        offsets += struct.pack("<I", start)
        start += len(b)
    return header + bytes(desc) + bytes(offsets) + b"".join(bodies)


# ---------------- 64-bit RoaringBitmapArray (portable) + blob framing


def parse_dv_blob(blob: bytes) -> np.ndarray:
    """int64 positions from a serialized DV blob (magic + portable
    RoaringBitmapArray)."""
    if len(blob) < 12:
        raise ValueError(f"DV blob too short ({len(blob)} bytes)")
    (magic,) = struct.unpack_from("<i", blob, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad DV magic {magic} (want {DV_MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", blob, 4)
    pos = 12
    parts = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        vals32, pos = _parse_roaring32(blob, pos)
        parts.append((np.uint64(key) << np.uint64(32)) | vals32.astype(np.uint64))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts).astype(np.int64)


def serialize_dv_blob(positions: Iterable[int]) -> bytes:
    """Serialized DV blob (magic + portable RoaringBitmapArray) from
    row positions."""
    pos64 = np.unique(np.asarray(list(positions), dtype=np.uint64))
    high = (pos64 >> np.uint64(32)).astype(np.uint32)
    keys, starts = np.unique(high, return_index=True)
    bounds = list(starts) + [len(pos64)]
    out = struct.pack("<iq", DV_MAGIC, len(keys))
    for i, k in enumerate(keys):
        chunk = (pos64[bounds[i] : bounds[i + 1]] & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        out += struct.pack("<I", int(k)) + _serialize_roaring32(chunk)
    return out


def read_dv_from_file(path: str, offset: int, size_in_bytes: int) -> np.ndarray:
    """Positions from one DV stored in an on-disk DV file: at ``offset``
    a 4-byte big-endian blob size, the blob, a 4-byte big-endian CRC-32.
    ``size_in_bytes`` is the descriptor's blob size (cross-checked)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        (stored_size,) = struct.unpack(">i", fh.read(4))
        if stored_size != size_in_bytes:
            raise ValueError(
                f"DV size mismatch at {path}:{offset}: file says "
                f"{stored_size}, descriptor says {size_in_bytes}"
            )
        blob = fh.read(stored_size)
        (crc,) = struct.unpack(">I", fh.read(4))
    if zlib.crc32(blob) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch at {path}:{offset}")
    return parse_dv_blob(blob)


def write_dv_file(path: str, blobs: Iterable[bytes]) -> list:
    """Write DV blobs into one on-disk DV file (format version byte 1,
    then per blob: big-endian size, blob, big-endian CRC-32). Returns
    the per-blob ``offset`` values for their descriptors."""
    offsets = []
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        for blob in blobs:
            offsets.append(fh.tell())
            fh.write(struct.pack(">i", len(blob)))
            fh.write(blob)
            fh.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    return offsets


# ---------------- descriptor resolution (add.deletionVector)


def dv_absolute_path(table_path: str, descriptor: dict) -> Optional[str]:
    """Local path of the DV file a descriptor points at, or None for
    inline vectors. ``pathOrInlineDv`` for storageType 'u' is
    ``<randomPrefix><z85 of the 16-byte UUID>`` (the UUID is always the
    last 20 characters); the file lives at
    ``<table>/<prefix>/deletion_vector_<uuid>.bin``."""
    import uuid as _uuid

    storage = descriptor.get("storageType", "u")
    spec = descriptor["pathOrInlineDv"]
    if storage == "i":
        return None
    if storage == "p":
        return spec[len("file:"):] if spec.startswith("file:") else spec
    if storage == "u":
        prefix, encoded = spec[:-20], spec[-20:]
        u = _uuid.UUID(bytes=z85_decode(encoded))
        name = f"deletion_vector_{u}.bin"
        return os.path.join(table_path, prefix, name) if prefix else os.path.join(
            table_path, name
        )
    raise ValueError(f"unknown DV storageType {storage!r}")


def decode_dv_descriptor(table_path: str, descriptor: dict) -> np.ndarray:
    """int64 deleted row positions for one ``add.deletionVector``."""
    if descriptor.get("storageType") == "i":
        blob = z85_decode(descriptor["pathOrInlineDv"])
        size = descriptor.get("sizeInBytes")
        if size is not None and size != len(blob):
            raise ValueError(
                f"inline DV size mismatch: descriptor {size}, blob {len(blob)}"
            )
        positions = parse_dv_blob(blob)
    else:
        positions = read_dv_from_file(
            dv_absolute_path(table_path, descriptor),
            int(descriptor["offset"]),
            int(descriptor["sizeInBytes"]),
        )
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(positions):
        raise ValueError(
            f"DV cardinality mismatch: descriptor {card}, bitmap {len(positions)}"
        )
    return positions
