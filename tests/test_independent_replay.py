"""Clean-room cross-validation of the jar-less Delta WRITER and DML.

Real cross-implementation validation (delta-spark jar, deltalake/delta-rs
wheel, duckdb's delta extension) is environment-blocked in this container
— all three acquisition attempts are recorded in COVERAGE.md. This module
is the strongest in-container substitute: a from-scratch, spec-derived
SECOND implementation of Delta log replay and deletion-vector decoding,
written against the published protocol documents only —

- delta.io PROTOCOL.md: action reconciliation (per path, the newest
  add/remove wins; a remove tombstones), schemaString, partitionValues
  as string maps, DV descriptors (storageType u/i, z85 UUID-or-inline,
  offset/sizeInBytes/cardinality);
- the ZeroMQ Z85 spec (RFC 32/Z85 alphabet);
- the RoaringFormatSpec portable 32-bit serialization plus Delta's
  64-bit RoaringBitmapArray framing (8-byte LE count, per bitmap a
  4-byte LE high key + portable 32-bit bitmap), the 4-byte LE magic
  1681511377 blob prefix, and the DV file layout (version byte 1;
  at ``offset``: 4-byte BE size, blob, 4-byte BE CRC-32 of the blob).

It deliberately imports NOTHING from dc43_spark.io — the replay below
shares no code with the production reader (pyarrow + stdlib only), so a
writer bug that the production reader compensates for would surface here
as a mismatch. Tables are written by the PRODUCTION writer/DML paths and
then read back by both implementations and compared row-for-row.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import pyarrow.parquet as pq
import pytest

# ---------------------------------------------------------------- z85

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_VAL = {c: i for i, c in enumerate(_Z85)}


def _z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 text length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i:i + 5]:
            v = v * 85 + _Z85_VAL[ch]
        out += v.to_bytes(4, "big")
    return bytes(out)


# --------------------------------------------- portable roaring (32-bit)

_COOKIE_RUN = 12347
_COOKIE_NO_RUN = 12346


def _roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one portable 32-bit RoaringBitmap at ``pos``; return
    (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        runbits = buf[pos:pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= 4
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        runbits = b""
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # container offsets — sequential parse ignores them
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        is_run = bool(runbits) and (runbits[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + start + d for d in range(length + 1))
        elif cards[i] > 4096:  # bitset container, 8 KiB
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:  # array container
            arr = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in arr)
    return values, pos


def _dv_blob_positions(blob: bytes) -> set[int]:
    """Delta's 64-bit RoaringBitmapArray blob -> absolute positions."""
    (magic,) = struct.unpack_from("<I", blob, 0)
    assert magic == 1681511377, f"bad DV magic {magic}"
    (n_bitmaps,) = struct.unpack_from("<Q", blob, 4)
    pos = 12
    out: set[int] = set()
    for _ in range(n_bitmaps):
        (high,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        vals, pos = _roaring32(blob, pos)
        out.update((high << 32) | v for v in vals)
    return out


def _dv_positions(table: str, dv: dict) -> set[int]:
    storage = dv.get("storageType", "u")
    spec = dv["pathOrInlineDv"]
    if storage == "i":
        return _dv_blob_positions(_z85_decode(spec))
    if storage == "u":
        # "[<random prefix>]<z85 uuid>": the uuid is ALWAYS the last 20
        # characters (PROTOCOL.md) — z85 itself can contain '/', so a
        # path split would cut inside the encoding
        prefix, enc = spec[:-20].rstrip("/"), spec[-20:]
        uuid_bytes = _z85_decode(enc)
        import uuid as _uuid

        name = f"deletion_vector_{_uuid.UUID(bytes=uuid_bytes)}.bin"
        path = os.path.join(table, prefix, name) if prefix else os.path.join(
            table, name)
    elif storage == "p":
        path = dv["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown DV storage {storage!r}")
    with open(path, "rb") as fh:
        raw = fh.read()
    assert raw[0] == 1, "DV file format version must be 1"
    off = int(dv.get("offset") or 1)
    (size,) = struct.unpack_from(">I", raw, off)
    blob = raw[off + 4:off + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
    assert zlib.crc32(blob) & 0xFFFFFFFF == crc, "DV blob CRC mismatch"
    return _dv_blob_positions(blob)


# ------------------------------------------------------- log replay

def _typed(value, spark_type: str):
    if value is None:
        return None
    if spark_type in ("long", "integer", "short", "byte"):
        return int(value)
    if spark_type == "double":
        return float(value)
    if spark_type == "boolean":
        return value == "true"
    return str(value)


def _replay_state(table: str) -> tuple:
    """Shared JSON-log replay: ``(schema_fields, part_cols, live,
    phys_of, config)`` where ``schema_fields`` is ``[(logical_name,
    type), ...]``, ``phys_of`` maps logical -> PHYSICAL column name
    (identity without column mapping — under ``mode=name``/``id`` the
    files and partitionValues key by ``delta.columnMapping.
    physicalName``, r14), and ``config`` is the last metaData
    configuration."""
    log = os.path.join(table, "_delta_log")
    versions = sorted(
        int(f[:-5]) for f in os.listdir(log)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    assert versions and versions[0] == 0, "JSON-only replay needs v0"
    schema_fields: list[tuple[str, str]] = []
    part_cols: list[str] = []
    phys_of: dict = {}
    config: dict = {}
    live: dict[str, dict] = {}
    for v in versions:
        with open(os.path.join(log, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                    fields = json.loads(meta["schemaString"])["fields"]
                    schema_fields = [(f["name"], f["type"]) for f in fields]
                    phys_of = {
                        f["name"]: (f.get("metadata") or {}).get(
                            "delta.columnMapping.physicalName", f["name"]
                        )
                        for f in fields
                    }
                    part_cols = list(meta.get("partitionColumns") or [])
                    config = dict(meta.get("configuration") or {})
                elif "add" in action:
                    a = action["add"]
                    import urllib.parse as _up

                    live[_up.unquote(a["path"])] = a
                elif "remove" in action:
                    import urllib.parse as _up

                    live.pop(_up.unquote(action["remove"]["path"]), None)
    return schema_fields, part_cols, live, phys_of, config


def independent_read(table: str) -> list[tuple]:
    """Replay ``<table>/_delta_log/*.json`` from scratch and return the
    table's rows as sorted tuples in schema order — pyarrow + stdlib
    only, no dc43_spark imports. Column-mapped tables (mode=name) read
    files by PHYSICAL names and alias back to logical (r14)."""
    schema_fields, part_cols, live, phys_of, _cfg = _replay_state(table)
    rows: list[tuple] = []
    types = dict(schema_fields)
    data_cols = [n for n, _t in schema_fields if n not in part_cols]
    for rel, add in sorted(live.items()):
        tbl = pq.read_table(
            os.path.join(table, rel),
            columns=[phys_of[n] for n in data_cols],
        )
        cols = {n: tbl.column(phys_of[n]).to_pylist() for n in data_cols}
        dv = add.get("deletionVector")
        dropped = (
            _dv_positions(table, dv)
            if dv and dv.get("pathOrInlineDv") is not None
            else set()
        )
        pvals = {
            c: _typed(
                (add.get("partitionValues") or {}).get(phys_of[c]),
                types[c],
            )
            for c in part_cols
        }
        for i in range(tbl.num_rows):
            if i in dropped:
                continue
            rows.append(tuple(
                pvals[n] if n in pvals else cols[n][i]
                for n, _t in schema_fields
            ))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def independent_row_ids(table: str) -> list[tuple]:
    """Clean-room row-tracking read (r14): per surviving row, ``(*data
    columns, row_id, row_commit_version)`` where the id is the
    MATERIALIZED column value when the file carries it non-null, else
    ``baseRowId + row_index`` (and the commit version analogously from
    the materialized column else ``defaultRowCommitVersion``) —
    PROTOCOL.md Row Tracking, from spec, no dc43_spark imports."""
    schema_fields, part_cols, live, phys_of, config = _replay_state(table)
    id_col = config.get("delta.rowTracking.materializedRowIdColumnName")
    ver_col = config.get(
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    )
    assert id_col and ver_col, "row tracking not configured"
    rows: list[tuple] = []
    data_cols = [n for n, _t in schema_fields if n not in part_cols]
    types = dict(schema_fields)
    for rel, add in sorted(live.items()):
        tbl = pq.read_table(os.path.join(table, rel))
        names = set(tbl.schema.names)
        cols = {n: tbl.column(phys_of[n]).to_pylist() for n in data_cols}
        mat_ids = tbl.column(id_col).to_pylist() if id_col in names else None
        mat_vers = (
            tbl.column(ver_col).to_pylist() if ver_col in names else None
        )
        base = add.get("baseRowId")
        default_ver = add.get("defaultRowCommitVersion")
        dv = add.get("deletionVector")
        dropped = (
            _dv_positions(table, dv)
            if dv and dv.get("pathOrInlineDv") is not None
            else set()
        )
        pvals = {
            c: _typed(
                (add.get("partitionValues") or {}).get(phys_of[c]),
                types[c],
            )
            for c in part_cols
        }
        for i in range(tbl.num_rows):
            if i in dropped:
                continue
            rid = mat_ids[i] if mat_ids is not None else None
            if rid is None:
                assert base is not None, f"{rel}: no id source for row {i}"
                rid = base + i
            rver = mat_vers[i] if mat_vers is not None else None
            if rver is None:
                rver = default_ver
            rows.append(tuple(
                [pvals[n] if n in pvals else cols[n][i]
                 for n, _t in schema_fields]
                + [rid, rver]
            ))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _production_rows(spark, table: str) -> list[tuple]:
    from dc43_spark.io.delta_log import DeltaLogTable

    df = DeltaLogTable(spark, table).read()
    names = [f[0] for f in _schema_of(table)]
    return sorted(
        [tuple(getattr(r, n) for n in names) for r in df.collect()],
        key=lambda r: tuple(str(x) for x in r),
    )


def _schema_of(table: str) -> list[tuple[str, str]]:
    log = os.path.join(table, "_delta_log")
    fields: list[tuple[str, str]] = []
    for f in sorted(os.listdir(log)):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(log, f)) as fh:
            for line in fh:
                if '"metaData"' in line:
                    meta = json.loads(line)["metaData"]
                    fields = [
                        (x["name"], x["type"])
                        for x in json.loads(meta["schemaString"])["fields"]
                    ]
    return fields


def _df(spark, lo, hi, v="x"):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).alias("v")
    ).coalesce(1)


def test_writer_appends_and_overwrite_replay_identically(spark, tmp_path):
    from dc43_spark.io.delta_log import delta_write

    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 50, "a"), t, checkpoint_interval=None)
    delta_write(spark, _df(spark, 50, 80, "b"), t, checkpoint_interval=None)
    delta_write(spark, _df(spark, 100, 120, "c"), t, mode="overwrite",
                checkpoint_interval=None)
    delta_write(spark, _df(spark, 120, 140, "d"), t,
                checkpoint_interval=None)
    got = independent_read(t)
    assert got == _production_rows(spark, t)
    assert got == sorted(
        [(k, "c") for k in range(100, 120)]
        + [(k, "d") for k in range(120, 140)],
        key=lambda r: tuple(str(x) for x in r),
    )


def test_partitioned_writer_replays_identically(spark, tmp_path):
    from pyspark.sql import functions as F

    from dc43_spark.io.delta_log import delta_write

    t = str(tmp_path / "t")
    df = spark.range(40).select(
        (F.col("id") % 3).alias("p"),
        F.col("id").alias("k"),
    )
    delta_write(spark, df, t, partition_by=["p"], checkpoint_interval=None)
    got = independent_read(t)
    assert got == _production_rows(spark, t)
    assert len(got) == 40


def test_dv_dml_replays_identically(spark, tmp_path):
    """DELETE/UPDATE/MERGE through the production DML paths — with
    deletion vectors ON — replay identically under the independent
    decoder: the emitted roaring blobs, file framing, and descriptor
    algebra are readable by a from-spec implementation."""
    from dc43_spark.io.delta_log import delta_write
    from dc43_spark.io.delta_dml import delta_delete, delta_merge, delta_update

    t = str(tmp_path / "t")
    delta_write(
        spark, _df(spark, 0, 200, "a"), t, checkpoint_interval=None,
        configuration={"delta.enableDeletionVectors": "true"},
    )
    delta_write(spark, _df(spark, 200, 260, "b"), t,
                checkpoint_interval=None)
    delta_delete(spark, t, "k % 10 = 3")          # DV delete
    assert independent_read(t) == _production_rows(spark, t)
    delta_delete(spark, t, "k >= 250")            # second DV on file 2
    assert independent_read(t) == _production_rows(spark, t)
    delta_update(spark, t, {"v": "'u'"}, "k < 5")
    assert independent_read(t) == _production_rows(spark, t)
    delta_merge(
        spark,
        _df(spark, 195, 210, "m"),
        t,
        keys=["k"],
    )
    got = independent_read(t)
    assert got == _production_rows(spark, t)
    ks = [r[0] for r in got]
    assert 3 not in ks and 13 not in ks          # deletes held
    assert ("u" in {r[1] for r in got})          # update held
    assert all(k in ks for k in range(200, 210))  # merge inserts held


def test_independent_decoder_rejects_corruption(spark, tmp_path):
    """The clean-room decoder is a real check, not a mirror: flipping a
    bit in an on-disk DV blob fails its CRC."""
    from dc43_spark.io.delta_log import delta_write
    from dc43_spark.io.delta_dml import delta_delete

    t = str(tmp_path / "t")
    delta_write(
        spark, _df(spark, 0, 100, "a"), t, checkpoint_interval=None,
        configuration={"delta.enableDeletionVectors": "true"},
    )
    delta_delete(spark, t, "k % 7 = 1")
    dv_files = [f for f in os.listdir(t) if f.startswith("deletion_vector_")]
    assert dv_files
    path = os.path.join(t, dv_files[0])
    raw = bytearray(open(path, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    with open(path, "wb") as fh:
        fh.write(bytes(raw))
    with pytest.raises(AssertionError, match="CRC"):
        independent_read(t)


def test_column_mapped_export_replays_identically(spark, tmp_path):
    """r14 (VERDICT r13 #8): a RENAMED snaplog table exported as Delta
    column mapping mode=name — files keyed by frozen physical names,
    logical names riding schemaString metadata — replays identically
    under the from-spec reader, including a deletion vector emitted by
    a MOR delete before the export."""
    from dc43_spark.io.delta_log import DeltaLogTable, export_delta_snapshot
    from dc43_spark.io.snaplog import SnaplogTable

    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 30, "a"), mode="overwrite")
    src.rename_column("v", "w")
    src.delete([("k", "<", 5)], strategy="merge_on_read")
    dest = export_delta_snapshot(src, str(tmp_path / "delta"))

    # sanity: the export really is column-mapped
    d = DeltaLogTable(spark, dest)
    assert d.snapshot().column_mapping
    got = independent_read(dest)
    assert got == _production_rows(spark, dest)
    assert [r[1] for r in got] == ["a"] * 25  # renamed col's values intact
    assert {r[0] for r in got} == set(range(5, 30))


def test_row_tracking_replays_identically(spark, tmp_path):
    """r14 (VERDICT r13 #8): row-tracking output — baseRowId/
    defaultRowCommitVersion on adds, the rowIdHighWaterMark domain, and
    MATERIALIZED id columns written by DML rewrites — yields the same
    (row, id, commit-version) set under the from-spec decoder as the
    production read(with_row_ids=True): fresh appends derive ids from
    baseRowId + row_index, rewritten rows keep their STABLE ids via the
    materialized columns."""
    from dc43_spark.io.delta_dml import delta_update
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    t = str(tmp_path / "t")
    rt = {"delta.enableRowTracking": "true"}
    delta_write(spark, _df(spark, 0, 10, "a"), t, configuration=rt,
                checkpoint_interval=None)
    delta_write(spark, _df(spark, 10, 16, "b"), t,
                checkpoint_interval=None)
    # COW rewrite: surviving rows must KEEP their ids (materialized)
    delta_update(spark, t, {"v": "'u'"}, "k < 3", use_dvs=False)

    prod = sorted(
        [
            (r.k, r.v, r._row_id, r._row_commit_version)
            for r in DeltaLogTable(spark, t).read(with_row_ids=True).collect()
        ],
        key=lambda r: tuple(str(x) for x in r),
    )
    got = independent_row_ids(t)
    assert got == prod
    # ids are a permutation of 0..15 (fresh allocation above the HWM
    # never duplicates), and the rewritten rows kept ids < 10
    assert sorted(r[2] for r in got) == list(range(16))
    assert {r[2] for r in got if r[1] == "u"} <= set(range(10))
