"""Deletion-vector codec (io/dv.py): Z85, portable RoaringBitmapArray,
blob framing, file framing — round-trips plus a hand-built run-container
bitmap (the serializer never emits runs, so parse coverage needs one
written byte-by-byte from the RoaringFormatSpec)."""

import struct

import numpy as np
import pytest

from dc43_spark.io import dv


def test_z85_roundtrip_and_reference_vector():
    # the ZeroMQ spec's canonical test vector
    assert dv.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    for data in (b"", b"\x00" * 4, b"\xff" * 16, bytes(range(32))):
        assert dv.z85_decode(dv.z85_encode(data)) == data
    with pytest.raises(ValueError, match="multiple of 4"):
        dv.z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        dv.z85_decode("abcd")


@pytest.mark.parametrize(
    "positions",
    [
        [],
        [0],
        [0, 1, 2, 5, 1000, 65535, 65536, 131072],
        list(range(5000)),                      # bitmap container (>4096)
        [2**32 - 1, 2**32, 2**33 + 7],          # multiple 32-bit keys
        list(range(0, 300_000, 3)),             # bitmap + array mix
    ],
)
def test_blob_roundtrip(positions):
    blob = dv.serialize_dv_blob(positions)
    out = dv.parse_dv_blob(blob)
    assert out.tolist() == sorted(set(positions))


def test_blob_magic_checked():
    blob = dv.serialize_dv_blob([1, 2])
    with pytest.raises(ValueError, match="magic"):
        dv.parse_dv_blob(b"\x00" + blob[1:])


def test_run_container_parse():
    """Hand-build a portable 32-bit bitmap with ONE run container
    ([10..13] + [100..100]) inside a one-key RoaringBitmapArray blob."""
    n = 1
    cookie = struct.pack("<I", ((n - 1) << 16) | 12347)
    run_flags = bytes([0b1])
    desc = struct.pack("<HH", 0, 5 - 1)           # key 0, cardinality 5
    # n < NO_OFFSET_THRESHOLD and run cookie -> no offset header
    runs = struct.pack("<H", 2) + struct.pack("<HH", 10, 3) + struct.pack("<HH", 100, 0)
    bitmap32 = cookie + run_flags + desc + runs
    blob = struct.pack("<iq", dv.DV_MAGIC, 1) + struct.pack("<I", 0) + bitmap32
    assert dv.parse_dv_blob(blob).tolist() == [10, 11, 12, 13, 100]


def test_file_roundtrip(tmp_path):
    p = str(tmp_path / "pre" / "deletion_vector_x.bin")
    b1 = dv.serialize_dv_blob([3, 5])
    b2 = dv.serialize_dv_blob(range(10_000))
    off1, off2 = dv.write_dv_file(p, [b1, b2])
    assert open(p, "rb").read(1) == b"\x01"  # format version byte
    assert dv.read_dv_from_file(p, off1, len(b1)).tolist() == [3, 5]
    assert dv.read_dv_from_file(p, off2, len(b2)).tolist() == list(range(10_000))
    with pytest.raises(ValueError, match="size mismatch"):
        dv.read_dv_from_file(p, off1, len(b1) + 1)
    # corrupt one payload byte -> checksum catches it
    raw = bytearray(open(p, "rb").read())
    raw[off1 + 4 + 2] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        dv.read_dv_from_file(p, off1, len(b1))


def test_descriptor_resolution(tmp_path):
    import uuid

    u = uuid.uuid4()
    blob = dv.serialize_dv_blob([1, 4])
    table = str(tmp_path)
    # storageType u with a prefix directory
    path = f"{table}/ab/deletion_vector_{u}.bin"
    (off,) = dv.write_dv_file(path, [blob])
    desc = {
        "storageType": "u",
        "pathOrInlineDv": "ab/" + dv.z85_encode(u.bytes),
        "offset": off,
        "sizeInBytes": len(blob),
        "cardinality": 2,
    }
    assert dv.dv_absolute_path(table, desc) == path
    assert dv.decode_dv_descriptor(table, desc).tolist() == [1, 4]
    # inline
    inline = {
        "storageType": "i",
        "pathOrInlineDv": dv.z85_encode(blob + b"\x00" * (-len(blob) % 4)),
        "sizeInBytes": len(blob) + (-len(blob) % 4),
        "cardinality": 2,
    }
    assert dv.decode_dv_descriptor(table, inline).tolist() == [1, 4]
    # cardinality cross-check
    bad = dict(desc, cardinality=3)
    with pytest.raises(ValueError, match="cardinality"):
        dv.decode_dv_descriptor(table, bad)


# --------------------------------------------------------------------------
# property-based: any position set round-trips (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st

_SPARSE = st.lists(st.integers(0, 2**40), max_size=200)
_DENSE = st.tuples(
    st.integers(0, 2**33), st.integers(4000, 9000)
).map(lambda t: list(range(t[0], t[0] + t[1])))  # forces bitmap containers


@settings(max_examples=60, deadline=None)
@given(positions=st.one_of(_SPARSE, _DENSE))
def test_blob_roundtrip_property(positions):
    assert dv.parse_dv_blob(dv.serialize_dv_blob(positions)).tolist() == sorted(
        set(positions)
    )


@settings(max_examples=30, deadline=None)
@given(
    groups=st.lists(
        st.lists(st.integers(0, 2**20), max_size=50), min_size=1, max_size=4
    )
)
def test_file_framing_roundtrip_property(groups, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dv") / "deletion_vector_p.bin")
    blobs = [dv.serialize_dv_blob(g) for g in groups]
    offsets = dv.write_dv_file(p, blobs)
    for g, blob, off in zip(groups, blobs, offsets):
        assert dv.read_dv_from_file(p, off, len(blob)).tolist() == sorted(set(g))
