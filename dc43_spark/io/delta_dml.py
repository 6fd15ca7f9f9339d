"""Jar-less Delta row-mutating writes — MERGE / UPDATE / DELETE.

The reference's primary write surface is ``DeltaTable.merge`` (ref
spark/io/merge.py:43-127); r9's jar-less writer stopped at append /
overwrite and routed row-level ops to snaplog. This module closes that
gap by composing pieces that already existed and were independently
verified: the deletion-vector codec (io/dv.py — delta.io PROTOCOL.md
"Deletion Vectors" + RoaringFormatSpec), the protocol reader's DV scan
(io/delta_log.py), and the atomic version claimer.

Two physical strategies, matching delta-spark's own split:

- **deletion vectors** (``delta.enableDeletionVectors=true`` or the
  table already carries the feature): touched rows are marked deleted by
  writing ONE protocol DV file per touched data file — serialized ON THE
  EXECUTORS via ``applyInPandas`` grouped by file, so deleted positions
  never materialize on the driver — and the commit re-adds each touched
  file with its new descriptor (remove + add, the protocol's
  supersession convention). A file whose vector would cover every
  physical row emits a plain remove instead. No data rewrite for
  deletes; updates/merge-updates write only the NEW row versions.
- **copy-on-write** (the default for tables without the feature — any
  Delta reader can keep reading them): touched files are rewritten
  without their deleted rows; untouched files carry over by reference.

Row semantics are standard SQL MERGE plus delta-spark's conditional
clauses (same matrix as io/merge.py's ``_outer_join_merge``, which
remains the oracle in tests): matched + ``delete_predicate`` -> dropped
(delete wins, checked first); matched + ``when_matched`` ("update",
a ``{col: expr}`` SET map, gated by ``matched_predicate``) -> updated;
unmatched source + ``when_not_matched`` ("insert" or a VALUES map,
gated by ``insert_predicate``) -> inserted; target rows with NO source
match + ``when_not_matched_by_source`` ("delete" or a SET map, gated by
``not_matched_by_source_predicate``) -> deleted/updated — this clause
disables source-key file pruning (any file can hold such rows).
Everything else untouched. The source must be key-unique (SQL MERGE
refuses multiple matches).

Change data feed: when ``delta.enableChangeDataFeed=true``, every DML
commit stages ``_change_data`` parquet files (insert / delete /
update_preimage / update_postimage rows — partitioned tables store
partition values in directories, exactly delta-spark's layout) and
references them with ``cdc`` actions, which the CDF reader treats as
authoritative. Without CDF the reader still derives inserts and deletes
from the commit's file actions (new adds + DV growth).

Validation parity with delta_write: CHECK constraints, column
invariants, and generated-column rules all run as ONE aggregate over
the new rows; generated columns are recomputed for updates (and refuse
being SET directly, delta-spark's rule); ``delta.appendOnly=true``
refuses all three operations.

Concurrency: the whole operation is optimistic — compute against a
pinned snapshot, claim ``head+1``; ANY head movement (or a lost claim
race) recomputes from the new head, never re-using stale row positions.
Orphaned staging output from lost races is swept by ``delta_vacuum``.

Scale shape: one lineage scan (a single parquet read regardless of
partition count — typed partition values ride the broadcast
file-identity join; existing DV masks applied as a cardinality-gated
anti-join, broadcast below ~10M positions, shuffle above), one join
against the source, DV serialization distributed per file, new rows
staged through the same footer-stats path as delta_write. Touch sets
persist to spillable MEMORY_AND_DISK storage (recomputable from the
pinned snapshot; pre-image columns ride only when CDF needs them —
tools/dml_touch_ladder.py measures the envelope). Nothing is O(table)
on the driver.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dc43_spark.localdf import local_df
from dc43_spark.io.delta_log import (
    _WRITER_VERSION_FEATURES,
    DeltaLogTable,
    DeltaProtocolError,
    DeltaWriteError,
    _apply_generated_columns,
    _check_append_only,
    _check_writer_protocol,
    _delta_row_rules,
    _dv_join_side,
    _dv_total_cardinality,
    _enforce_delta_rules,
    _generated_columns,
    _identity_columns,
    _file_identity_df,
    _materialized_rt_cols,
    _raw_protocol_meta,
    _row_id_hwm,
    _row_tracking_domain_action,
    _row_tracking_enabled,
    _row_tracking_present,
    _assign_fresh_row_ids,
    _stage_data_files,
    write_delta_checkpoint,
)

_REL = "_dc43_rel"
_POS = "_dc43_pos"
#: row-tracking lineage columns (``_live_lineage(..., row_ids=True)``):
#: the row's CURRENT stable id / last-modified version — materialized
#: value if a rewrite stored one, else baseRowId + pos /
#: defaultRowCommitVersion
_RTID = "_dc43_row_id"
_RTVER = "_dc43_row_ver"


class _DmlConflict(Exception):
    """A concurrent commit moved the head (or won the claim) — the
    caller recomputes against the new snapshot."""


def _cdf_enabled(meta: dict) -> bool:
    conf = meta.get("configuration") or {}
    return str(conf.get("delta.enableChangeDataFeed", "")).lower() == "true"


def _dvs_enabled(protocol: dict, meta: dict) -> bool:
    conf = meta.get("configuration") or {}
    if str(conf.get("delta.enableDeletionVectors", "")).lower() == "true":
        return True
    return "deletionVectors" in set(protocol.get("writerFeatures") or ())


def _merge_candidate_files(
    src: DataFrame, snap, keys: Sequence[str], *, check_unique: bool = False
) -> list:
    """Delta-spark's merge file pruning: ONE aggregate over the source
    computes each key's min/max (+ null presence), and only target files
    whose stats envelope intersects every key range can hold a match —
    the rest never enter the lineage scan. Sound for inserts too: a
    pruned file provably contains no key in the source range, so no
    source row can match there. A key with source NULLs skips its
    conditions (NULL joins NULL under eqNullSafe and stats can't bound
    it) — conservative, never wrong. ``check_unique`` fuses the
    duplicate-source-key probe into this same pass (one source scan
    instead of two — merge.source_key_stats)."""
    from dc43_spark.io.merge import source_key_stats

    row = source_key_stats(src, list(keys), check_unique=check_unique)
    conds = []
    for i, k in enumerate(keys):
        if row[f"_null_{i}"] or row[f"_lo_{i}"] is None:
            continue  # NULL keys present (or empty source): unprunable key
        conds.append((k, ">=", row[f"_lo_{i}"]))
        conds.append((k, "<=", row[f"_hi_{i}"]))
    if not conds:
        return list(snap.files)
    from dc43_spark.io.snaplog import FileEntry, _file_may_match

    groups = [conds]  # one AND-group
    return [
        f
        for f in snap.files
        if _file_may_match(FileEntry(f.path, 0, f.size, f.stats, {}), groups)
    ]


def _rt_mat_cols_checked(meta: dict) -> tuple:
    """Materialized row-tracking column names, refusing when enablement
    forgot them — a rewrite without them would silently hand surviving
    rows fresh identities."""
    mat_id, mat_ver = _materialized_rt_cols(meta)
    if not (mat_id and mat_ver):
        raise DeltaWriteError(
            "row tracking is enabled but the materialized column names "
            "are not configured; DML cannot preserve row ids — fix "
            "delta.rowTracking.materialized*ColumnName"
        )
    return mat_id, mat_ver


def _live_lineage(
    t: DeltaLogTable, snap, files=None, *, row_ids: bool = False
) -> DataFrame:
    """Every LIVE row of ``files`` (default: the whole snapshot;
    existing DV masks applied) with two hidden lineage columns:
    ``_dc43_rel`` (the add action's decoded relative path) and
    ``_dc43_pos`` (the parquet row index) — the coordinates a deletion
    vector addresses.

    ONE parquet scan regardless of partition count: the file-identity
    tag join (basename equality + full-relative-path suffix residual,
    same keying as ``_apply_dvs``) carries the add action's TYPED
    partition values on the broadcast side, so partitioned tables pay a
    single broadcast join instead of a one-branch-per-partition-tuple
    union whose Catalyst analysis cost grows superlinearly past ~1k
    partitions (VERDICT r10 #7; tools/lineage_plan_ladder.py measures
    the ladder)."""
    spark = t.spark
    rt_cols = [StructField(_RTID, LongType()),
               StructField(_RTVER, LongType())] if row_ids else []
    out_schema = StructType(
        list(snap.schema.fields)
        + [StructField(_REL, StringType()), StructField(_POS, LongType())]
        + rt_cols
    )
    mat_id = mat_ver = None
    if row_ids:
        mat_id, mat_ver = _materialized_rt_cols(
            {"configuration": snap.configuration}
        )
    scan_files = list(snap.files) if files is None else list(files)
    if not scan_files:
        return local_df(spark, [], out_schema)
    data_fields = [
        f for f in snap.schema.fields if f.name not in snap.partition_columns
    ]
    data_schema = StructType(data_fields)
    rename_back: dict = {}
    if snap.column_mapping:
        # mapped tables: read through the mode's resolution schema
        # (physical names, or logical+field-id for id mode) and alias
        # back to logical right after the scan — a positional zip, so it
        # degenerates to a no-op for id mode (partition columns never
        # live in the files; they ride the tag join below under their
        # logical names)
        data_schema = t._physical_schema(snap, data_fields)
        rename_back = {
            p.name: l.name
            for p, l in zip(data_schema.fields, data_fields)
        }

    if row_ids:
        # the materialized columns are physical-only (absent from the
        # schema); files that predate any rewrite read them as NULL
        data_schema = StructType(
            list(data_schema.fields)
            + [StructField(mc, LongType()) for mc in (mat_id, mat_ver) if mc]
        )
    files_df = F.broadcast(
        _file_identity_df(spark, snap, scan_files, row_tracking=row_ids)
    )

    scan = (
        spark.read.format("parquet")
        .schema(data_schema)
        .load([os.path.join(t.path, m.path) for m in scan_files])
        .select(
            "*",
            F.col("_metadata.file_name").alias("_dc43_base"),
            F.col("_metadata.file_path").alias("_dc43_path"),
            F.col("_metadata.row_index").alias(_POS),
        )
    )
    if rename_back:
        scan = scan.select(
            *[
                F.col(f"`{p}`").alias(rename_back.get(p, p))
                for p in [f.name for f in data_schema.fields]
            ],
            "_dc43_base", "_dc43_path", _POS,
        )
    rt_exprs = []
    if row_ids:
        fresh_id = F.col("_dc43_rt_base") + F.col(_POS)
        rt_exprs = [
            (
                F.coalesce(F.col(f"`{mat_id}`"), fresh_id)
                if mat_id else fresh_id
            ).cast("long").alias(_RTID),
            (
                F.coalesce(F.col(f"`{mat_ver}`"), F.col("_dc43_rt_dver"))
                if mat_ver else F.col("_dc43_rt_dver")
            ).cast("long").alias(_RTVER),
        ]
    tagged = (
        scan.join(
            files_df,
            (scan["_dc43_base"] == files_df["_dc43_fb"])
            & (
                scan["_dc43_path"].endswith(files_df["_dc43_fsfx"])
                | scan["_dc43_path"].endswith(files_df["_dc43_fsfxq"])
            ),
            "inner",
        )
        .select(*[f.name for f in snap.schema.fields], _REL, _POS, *rt_exprs)
    )

    # existing DV masks: expand descriptors on executors, anti-join on
    # the exact (rel, pos) key — already-deleted rows are invisible
    dv_files = [f for f in scan_files if f.dv]
    if dv_files:
        table_path = t.path
        desc = local_df(
            spark,
            [
                (
                    f.path,
                    f.dv["storageType"],
                    f.dv["pathOrInlineDv"],
                    int(f.dv["offset"] or 0),
                    int(f.dv["sizeInBytes"] or -1),
                    int(f.dv["cardinality"])
                    if f.dv["cardinality"] is not None
                    else -1,
                )
                for f in dv_files
            ],
            "rel string, storage string, spec string, off long, "
            "size long, card long",
        )

        def _expand(batches):
            import pandas as pd

            from dc43_spark.io.dv import decode_dv_descriptor

            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    positions = decode_dv_descriptor(
                        table_path,
                        {
                            "storageType": r.storage,
                            "pathOrInlineDv": r.spec,
                            "offset": r.off,
                            "sizeInBytes": None if r.size < 0 else r.size,
                            "cardinality": None if r.card < 0 else r.card,
                        },
                    )
                    yield pd.DataFrame({"rel": r.rel, "pos": positions})

        deleted = desc.mapInPandas(_expand, "rel string, pos long")
        # broadcast only while sum(cardinality) fits the gate — a foreign
        # MOR table can carry billions of deleted positions (see
        # delta_log._dv_join_side)
        tagged = tagged.join(
            _dv_join_side(spark, deleted, _dv_total_cardinality(dv_files)),
            (tagged[_REL] == deleted["rel"]) & (tagged[_POS] == deleted["pos"]),
            "left_anti",
        )
    return tagged


def _to_physical(df: DataFrame, snap) -> DataFrame:
    """Rename logical columns to their physical names before staging a
    mapped table's files, carrying ``parquet.field.id`` alias metadata so
    the staged parquet keeps field ids (required for id-mode resolution;
    delta-spark-faithful for name mode). Extra columns (``_change_type``)
    pass through unchanged."""
    if not snap.column_mapping:
        return df
    phys = {
        f.name: (f.metadata or {}).get(
            "delta.columnMapping.physicalName", f.name
        )
        for f in snap.schema.fields
    }
    fids = {
        f.name: (f.metadata or {}).get("delta.columnMapping.id")
        for f in snap.schema.fields
    }

    def _col(c):
        fid = fids.get(c)
        if fid is not None:
            return F.col(f"`{c}`").alias(
                phys.get(c, c), metadata={"parquet.field.id": int(fid)}
            )
        return F.col(f"`{c}`").alias(phys.get(c, c))

    return df.select(*[_col(c) for c in df.columns])


def _stage_dv_files(t: DeltaLogTable, del_rows: DataFrame, old_dvs: dict) -> dict:
    """Serialize one protocol deletion vector PER TOUCHED FILE on the
    executors: ``applyInPandas`` grouped by ``_dc43_rel`` merges the new
    positions with the file's existing vector (descriptors ride in the
    closure — metadata-scale), writes a single-blob DV file into the
    table directory (invisible until the commit references it), and
    returns only the tiny descriptor rows. -> {rel: descriptor+card}."""
    table_path = t.path

    def _write(key, pdf):
        import uuid as _uuid

        import pandas as pd

        from dc43_spark.io import dv as dvmod

        rel = key[0]
        positions = set(int(p) for p in pdf[_POS])
        old = old_dvs.get(rel)
        if old:
            positions.update(
                int(p) for p in dvmod.decode_dv_descriptor(table_path, old)
            )
        blob = dvmod.serialize_dv_blob(sorted(positions))
        u = _uuid.uuid4()
        (off,) = dvmod.write_dv_file(
            os.path.join(table_path, f"deletion_vector_{u}.bin"), [blob]
        )
        return pd.DataFrame(
            [
                {
                    "rel": rel,
                    "spec": dvmod.z85_encode(u.bytes),
                    "off": off,
                    "size": len(blob),
                    "card": len(positions),
                }
            ]
        )

    rows = (
        del_rows.select(_REL, _POS)
        .groupBy(_REL)
        .applyInPandas(
            _write, "rel string, spec string, off long, size long, card long"
        )
        .collect()
    )
    return {
        r.rel: {
            "storageType": "u",
            "pathOrInlineDv": r.spec,
            "offset": int(r.off),
            "sizeInBytes": int(r.size),
            "cardinality": int(r.card),
        }
        for r in rows
    }


def _dv_protocol_upgrade(protocol: dict) -> Optional[dict]:
    """A protocol action adding the deletionVectors feature (reader 3 /
    writer 7), folding in the features the OLD versions implied — or
    None when the table already carries it."""
    wfeats = set(protocol.get("writerFeatures") or ())
    if protocol.get("minWriterVersion", 2) >= 7 and "deletionVectors" in wfeats:
        return None
    rv = protocol.get("minReaderVersion", 1)
    rfeats = set(protocol.get("readerFeatures") or ())
    if rv < 3:
        rfeats = {"columnMapping"} if rv >= 2 else set()
    wv = protocol.get("minWriterVersion", 2)
    if wv < 7:
        wfeats = set()
        for ver, fs in _WRITER_VERSION_FEATURES.items():
            if wv >= ver:
                wfeats |= fs
    rfeats.add("deletionVectors")
    wfeats.add("deletionVectors")
    return {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": sorted(rfeats),
            "writerFeatures": sorted(wfeats),
        }
    }


def _commit_dml(
    t: DeltaLogTable,
    snap,
    protocol: dict,
    meta: dict,
    *,
    op: str,
    params: dict,
    del_rows: Optional[DataFrame],
    lineage: DataFrame,
    new_rows: Optional[DataFrame],
    cdf_rows: Optional[DataFrame],
    use_dvs: Optional[bool],
    checkpoint_interval: Optional[int] = 10,
    new_meta: Optional[dict] = None,
    ident_alloc: Optional[dict] = None,
) -> int:
    """Stage + claim one DML commit against the pinned ``snap``. Raises
    ``_DmlConflict`` if the head moved or the claim lost — the caller
    recomputes; staged files orphan and are swept by delta_vacuum.

    ``ident_alloc``: identity specs ({name: {"start","step","hwm"}}) the
    caller allocated values under (MERGE inserts) — the commit advances
    each ``delta.identity.highWaterMark`` from the STAGED FOOTER STATS
    of the new files, atomically with them (PROTOCOL.md Identity Columns
    writer requirement, same shape as delta_write). Race safety is
    inherited from the pin: ANY head movement raises ``_DmlConflict``
    and the caller reallocates under the new mark."""
    from dc43_spark.io.snaplog import LinkCommitClaimer

    dest = t.path
    part_cols = list(snap.partition_columns)
    if snap.column_mapping and part_cols:
        # staged files partition by PHYSICAL names (the hive dirs become
        # the add's partitionValues keys — protocol-required physical);
        # _to_physical has already renamed the frames' columns
        phys = {
            f.name: (f.metadata or {}).get(
                "delta.columnMapping.physicalName", f.name
            )
            for f in snap.schema.fields
        }
        part_cols = [phys[c] for c in part_cols]
    ts_ms = int(time.time() * 1000)
    if use_dvs is None:
        use_dvs = _dvs_enabled(protocol, meta)

    raw_adds = t._collect_state(snap.version)[0]  # rel -> raw add action
    actions: list = [
        {
            "commitInfo": {
                "timestamp": ts_ms,
                "operation": op,
                "operationParameters": params,
            }
        }
    ]
    if new_meta is not None:
        # schema evolution rides the DML commit (merge_schema): older
        # files read the appended columns as NULL
        actions.append({"metaData": new_meta})

    dv_written = False
    # r15 (guide §2.6, overlap independent jobs): a DML commit's staged
    # writes — deletion vectors OR rewritten survivors, inserted rows,
    # and CDF change files — are independent Spark jobs over the same
    # pinned lineage scan and persisted inputs; they ran back-to-back
    # only because the driver called them sequentially. Submit every
    # staging first, then drain the futures in the ORIGINAL action
    # order (the commit payload is byte-identical in structure). On a
    # failure the pool still waits for the stragglers; staged files
    # orphan and are swept by delta_vacuum, as before.
    from concurrent.futures import ThreadPoolExecutor

    dv_fut = kept_fut = new_fut = cdf_fut = None
    touched: list = []
    pool = ThreadPoolExecutor(max_workers=3)
    try:
        if del_rows is not None:
            if use_dvs:
                old_dvs = {f.path: f.dv for f in snap.files if f.dv}
                dv_fut = pool.submit(_stage_dv_files, t, del_rows, old_dvs)
            else:
                # copy-on-write: rewrite ONLY the touched files without
                # their deleted rows; untouched files carry over untouched
                touched = [
                    r[0] for r in del_rows.select(_REL).distinct().collect()
                ]
                if touched:
                    # broadcast semi-join, not an isin literal: a wide
                    # table's touched-file list would otherwise bloat the
                    # plan string
                    touch_df = F.broadcast(
                        local_df(
                            t.spark,
                            [(p,) for p in sorted(touched)],
                            "_touch_rel string",
                            coalesce=1,
                        )
                    )
                    kept = lineage.join(
                        touch_df, F.col(_REL) == F.col("_touch_rel"), "left_semi"
                    ).join(
                        del_rows.select(
                            F.col(_REL).alias("_del_rel"),
                            F.col(_POS).alias("_del_pos"),
                        ),
                        (F.col(_REL) == F.col("_del_rel"))
                        & (F.col(_POS) == F.col("_del_pos")),
                        "left_anti",
                    ).drop(_REL, _POS)
                    if _RTID in kept.columns:
                        # row tracking: surviving rows move files, so their
                        # ids AND last-modified versions materialize into
                        # the physical columns (fresh-id fallback would hand
                        # them this commit's identity — wrong on both axes)
                        mat_id, mat_ver = _rt_mat_cols_checked(
                            new_meta if new_meta is not None else meta
                        )
                        kept = kept.withColumnRenamed(_RTID, mat_id)
                        kept = kept.withColumnRenamed(_RTVER, mat_ver)
                    kept_fut = pool.submit(
                        _stage_data_files,
                        _to_physical(kept, snap), dest, part_cols, ts_ms,
                    )
        if new_rows is not None:
            new_fut = pool.submit(
                _stage_data_files,
                _to_physical(new_rows, snap), dest, part_cols, ts_ms,
            )
        if cdf_rows is not None and _cdf_enabled(meta):
            cdf_fut = pool.submit(
                _stage_data_files,
                _to_physical(cdf_rows, snap), dest, part_cols, ts_ms,
                subdir="_change_data",
            )

        if dv_fut is not None:
            descs = dv_fut.result()
            dv_written = bool(descs)
            for rel in sorted(descs):
                raw = raw_adds[rel]
                actions.append(
                    {
                        "remove": {
                            "path": raw["path"],
                            "dataChange": True,
                            "deletionTimestamp": ts_ms,
                        }
                    }
                )
                num = None
                if raw.get("stats"):
                    try:
                        st = raw["stats"]
                        num = (json.loads(st) if isinstance(st, str) else st).get(
                            "numRecords"
                        )
                    except ValueError:
                        num = None
                if num is not None and descs[rel]["cardinality"] >= num:
                    continue  # every physical row dead: plain remove
                new_add = dict(raw)
                new_add["deletionVector"] = descs[rel]
                new_add["dataChange"] = True
                actions.append({"add": new_add})
        if kept_fut is not None:
            for e in kept_fut.result():
                actions.append({"add": e})
        if touched:
            for rel in sorted(touched):
                actions.append(
                    {
                        "remove": {
                            "path": raw_adds[rel]["path"],
                            "dataChange": True,
                            "deletionTimestamp": ts_ms,
                        }
                    }
                )

        new_adds: list = []
        if new_fut is not None:
            for e in new_fut.result():
                actions.append({"add": e})
                new_adds.append(e)
    finally:
        pool.shutdown(wait=True)

    if ident_alloc and new_adds:
        phys = {
            f.name: (f.metadata or {}).get(
                "delta.columnMapping.physicalName", f.name
            )
            for f in snap.schema.fields
        }
        marks: dict = {}
        for n, sp in ident_alloc.items():
            side = "maxValues" if sp["step"] > 0 else "minValues"
            vals = []
            for a in new_adds:
                try:
                    v = json.loads(a["stats"])[side].get(phys.get(n, n))
                except (KeyError, ValueError, TypeError):
                    v = None
                if v is not None:
                    vals.append(int(v))
            if vals:
                new_mark = max(vals) if sp["step"] > 0 else min(vals)
                if sp["hwm"] is not None:
                    new_mark = (
                        max(new_mark, sp["hwm"]) if sp["step"] > 0
                        else min(new_mark, sp["hwm"])
                    )
                marks[n] = new_mark
        if marks:
            # patch the commit's metaData (the evolution one if present,
            # else a fresh copy of the pinned meta) so the files and the
            # advanced marks land atomically
            target = new_meta if new_meta is not None else dict(meta)
            doc = json.loads(target["schemaString"])
            for f0 in doc["fields"]:
                if f0["name"] in marks:
                    md0 = dict(f0.get("metadata") or {})
                    md0["delta.identity.highWaterMark"] = marks[f0["name"]]
                    f0["metadata"] = md0
            patched = dict(target)
            patched["schemaString"] = json.dumps(doc)
            for i, a in enumerate(actions):
                if "metaData" in a:
                    actions[i] = {"metaData": patched}
                    break
            else:
                actions.insert(1, {"metaData": patched})

    if cdf_fut is not None:
        for e in cdf_fut.result():
            actions.append(
                {
                    "cdc": {
                        "path": e["path"],
                        "partitionValues": e["partitionValues"],
                        "size": e["size"],
                        "dataChange": False,
                    }
                }
            )

    if dv_written:
        upgrade = _dv_protocol_upgrade(protocol)
        if upgrade is not None:
            actions.insert(1, upgrade)

    if _row_tracking_present(protocol):
        # DV-superseded re-adds kept their original baseRowId (dict(raw)
        # copies); only genuinely new files draw fresh id ranges
        fresh = [
            a["add"] for a in actions
            if "add" in a and a["add"].get("baseRowId") is None
        ]
        if fresh:
            new_hwm = _assign_fresh_row_ids(
                fresh, _row_id_hwm(t, snap.version), snap.version + 1
            )
            actions.append(_row_tracking_domain_action(new_hwm))

    head = t.version()
    if head != snap.version:
        raise _DmlConflict(f"head moved v{snap.version} -> v{head}")
    next_version = snap.version + 1
    from dc43_spark.io.delta_log import _stamp_ict

    # ICT chains off the pinned head (== the real head, just checked; a
    # lost race raises _DmlConflict and the caller recomputes + restamps)
    _stamp_ict(
        actions, t, head,
        ((new_meta if new_meta is not None else meta) or {}).get(
            "configuration"
        ),
        ts_ms,
    )
    payload = "\n".join(json.dumps(a) for a in actions) + "\n"
    log = os.path.join(dest, "_delta_log")
    if not LinkCommitClaimer().claim(log, f"{next_version:020d}.json", payload):
        raise _DmlConflict(f"lost the claim on v{next_version}")
    if (
        checkpoint_interval
        and next_version
        and next_version % checkpoint_interval == 0
    ):
        write_delta_checkpoint(t, next_version)
    return next_version


def _pin_snapshot(spark: SparkSession, path: str, op: str):
    t = DeltaLogTable(spark, path)
    snap = t.snapshot()
    protocol, meta = _raw_protocol_meta(t, snap.version)
    _check_writer_protocol(
        protocol, meta, snap.schema, allow_column_mapping=True
    )
    _check_append_only(meta, op)
    return t, snap, protocol, meta


def delta_delete(
    spark: SparkSession,
    path: str,
    predicate: Optional[str] = None,
    *,
    use_dvs: Optional[bool] = None,
    max_retries: int = 20,
) -> Optional[int]:
    """DELETE FROM a real ``_delta_log`` table without the jar. Rows
    matching ``predicate`` (SQL over the table's columns; None = all
    rows) are removed via deletion vectors or copy-on-write (module
    docstring). Returns the committed version, or None when nothing
    matched."""
    for _ in range(max_retries):
        t, snap, protocol, meta = _pin_snapshot(spark, path, "delete")
        rt_mat = _row_tracking_present(protocol) and _row_tracking_enabled(meta)
        lineage = _live_lineage(t, snap, row_ids=rt_mat)
        pred = F.expr(predicate) if predicate else F.lit(True)
        data_cols = [f.name for f in snap.schema.fields]
        # persist, not localCheckpoint: spillable executor storage whose
        # lost blocks recompute from the PINNED snapshot scan — a
        # full-table DELETE no longer hard-materializes every hit row
        # (VERDICT r10 #4). CDF needs the full row; without it only the
        # (rel, pos) coordinates persist.
        keep = (data_cols + [_REL, _POS]) if _cdf_enabled(meta) else [_REL, _POS]
        hit = lineage.filter(pred).select(*keep).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            if hit.isEmpty():
                return None
            cdf = None
            if _cdf_enabled(meta):
                cdf = hit.select(
                    *data_cols, F.lit("delete").alias("_change_type")
                )
            return _commit_dml(
                t, snap, protocol, meta,
                op="DELETE",
                params={"predicate": predicate or "true"},
                del_rows=hit.select(_REL, _POS),
                lineage=lineage,
                new_rows=None,
                cdf_rows=cdf,
                use_dvs=use_dvs,
            )
        except _DmlConflict:
            continue
        finally:
            hit.unpersist()
    raise DeltaProtocolError(
        f"DELETE on {path} kept conflicting after {max_retries} attempts"
    )


def delta_update(
    spark: SparkSession,
    path: str,
    set: dict,
    predicate: Optional[str] = None,
    *,
    use_dvs: Optional[bool] = None,
    max_retries: int = 20,
) -> Optional[int]:
    """UPDATE a real ``_delta_log`` table without the jar: rows matching
    ``predicate`` get ``set`` ({column: SQL expression over the OLD row})
    applied; old versions are deletion-vectored (or copy-on-write
    rewritten) and the new row versions land as fresh files. Generated
    columns are recomputed (and refuse being SET directly); constraints,
    invariants, and generated rules validate in one aggregate. Returns
    the committed version, or None when nothing matched."""
    gen_probe = None
    for _ in range(max_retries):
        t, snap, protocol, meta = _pin_snapshot(spark, path, "update")
        data_cols = [f.name for f in snap.schema.fields]
        gen = _generated_columns(snap.schema)
        if gen_probe is None:
            bad_set = sorted(set.keys() & gen.keys())
            if bad_set:
                raise DeltaWriteError(
                    f"column(s) {bad_set} are GENERATED ALWAYS AS; their "
                    "values recompute from the expression — update the "
                    "source columns instead"
                )
            bad_ident = sorted(
                set.keys() & _identity_columns(snap.schema).keys()
            )
            if bad_ident:
                raise DeltaWriteError(
                    f"column(s) {bad_ident} are IDENTITY columns; their "
                    "values are writer-allocated and cannot be SET"
                )
            missing = sorted(k for k in set if k not in data_cols)
            if missing:
                raise DeltaWriteError(f"SET columns not in schema: {missing}")
            gen_probe = True
        rt_mat = _row_tracking_present(protocol) and _row_tracking_enabled(meta)
        mat_id, _mat_ver = (
            _rt_mat_cols_checked(meta) if rt_mat else (None, None)
        )
        lineage = _live_lineage(t, snap, row_ids=rt_mat)
        pred = F.expr(predicate) if predicate else F.lit(True)
        # persist, not localCheckpoint (VERDICT r10 #4) — UPDATE always
        # needs the full row (new values compute from the old); the
        # try/finally below releases it on EVERY exit, including a
        # constraint-violation raise from _enforce_delta_rules
        hit = lineage.filter(pred).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if hit.isEmpty():
                return None
            updated = hit.select(
                *[
                    F.expr(set[c]).cast(snap.schema[c].dataType).alias(c)
                    if c in set
                    else F.col(c)
                    for c in data_cols
                ],
                # updated rows keep their row IDENTITY but take this
                # commit's version: materialize the id, let the version
                # fall back to the new file's defaultRowCommitVersion
                *([F.col(_RTID).alias(mat_id)] if mat_id else []),
            )
            if gen:
                extras = [c for c in updated.columns if c not in data_cols]
                updated, _ = _apply_generated_columns(updated.drop(*gen), gen)
                updated = updated.select(*data_cols, *extras)
            _enforce_delta_rules(updated, _delta_row_rules(meta, snap.schema))
            cdf = None
            if _cdf_enabled(meta):
                cdf = hit.select(
                    *data_cols, F.lit("update_preimage").alias("_change_type")
                ).unionByName(
                    updated.select(
                        *data_cols,
                        F.lit("update_postimage").alias("_change_type"),
                    )
                )
            return _commit_dml(
                t, snap, protocol, meta,
                op="UPDATE",
                params={"predicate": predicate or "true"},
                del_rows=hit.select(_REL, _POS),
                lineage=lineage,
                new_rows=updated,
                cdf_rows=cdf,
                use_dvs=use_dvs,
            )
        except _DmlConflict:
            continue
        finally:
            hit.unpersist()
    raise DeltaProtocolError(
        f"UPDATE on {path} kept conflicting after {max_retries} attempts"
    )


def delta_merge(
    spark: SparkSession,
    source_df: DataFrame,
    path: str,
    keys: Sequence[str],
    *,
    when_matched="update",
    when_not_matched="insert",
    delete_predicate: Optional[str] = None,
    insert_predicate: Optional[str] = None,
    matched_predicate: Optional[str] = None,
    when_not_matched_by_source="ignore",
    not_matched_by_source_predicate: Optional[str] = None,
    matched_clauses: Optional[list] = None,
    not_matched_clauses: Optional[list] = None,
    not_matched_by_source_clauses: Optional[list] = None,
    use_dvs: Optional[bool] = None,
    check_source_keys: bool = True,
    merge_schema: bool = False,
    max_retries: int = 20,
) -> Optional[int]:
    """MERGE INTO a real ``_delta_log`` table without the jar — the
    reference's primary write surface (ref spark/io/merge.py:43-127
    forwards an arbitrary merge-builder modifier, which delta-spark
    users exercise as exactly these clauses) re-expressed over protocol
    deletion vectors / copy-on-write.

    Clause surface (delta-spark's conditional merge):

    - ``when_matched``: ``"update"`` (updateAll), ``"ignore"``, or a
      ``{col: SQL expr}`` SET map over ``t.<col>``/``s.<col>`` — unset
      columns keep the target's value (``UPDATE SET c = expr``).
    - ``matched_predicate``: SQL over ``t.``/``s.`` gating the update
      clause (``WHEN MATCHED AND pred THEN UPDATE``); failing matched
      rows stay unchanged. ``delete_predicate`` wins over update and is
      checked first.
    - ``when_not_matched``: ``"insert"`` (insertAll), ``"ignore"``, or a
      ``{col: SQL expr}`` VALUES map over ``s.<col>`` — unlisted columns
      insert NULL (``INSERT (cols) VALUES (exprs)``);
      ``insert_predicate`` gates which unmatched source rows insert.
    - ``when_not_matched_by_source``: ``"ignore"`` (default),
      ``"delete"``, or a ``{col: SQL expr}`` SET map over ``t.<col>`` —
      delta-spark's ``WHEN NOT MATCHED BY SOURCE`` clauses;
      ``not_matched_by_source_predicate`` (SQL over ``t.``) gates the
      action. A by-source clause scans EVERY candidate file (source-key
      pruning is unsound for rows defined by having no source match).

    The *All string forms require the source to carry the table's
    columns (generated columns may be omitted — they recompute); the
    map forms only need the key columns plus whatever their expressions
    reference, and never evolve the schema.

    ``matched_clauses`` / ``not_matched_clauses`` /
    ``not_matched_by_source_clauses``: the ORDERED multi-clause surface
    (first-match-wins per kind — delta-spark's chained builder, see
    merge.normalize_merge_clauses); per kind pass the list OR the legacy
    kwargs, not both. Returns the committed version, or None when the
    merge changed nothing."""
    from dc43_spark.io.merge import (
        any_clause_ok,
        clause_value,
        first_fate,
        normalize_merge_clauses,
        require_unique_merge_keys,
    )

    m_cls, nm_cls, bs_cls = normalize_merge_clauses(
        when_matched=when_matched,
        when_not_matched=when_not_matched,
        delete_predicate=delete_predicate,
        insert_predicate=insert_predicate,
        matched_predicate=matched_predicate,
        when_not_matched_by_source=when_not_matched_by_source,
        not_matched_by_source_predicate=not_matched_by_source_predicate,
        matched_clauses=matched_clauses,
        not_matched_clauses=not_matched_clauses,
        not_matched_by_source_clauses=not_matched_by_source_clauses,
    )
    keys = list(keys)
    # the duplicate-source-key check fuses into _merge_candidate_files'
    # single source pass (first attempt only; retries reuse the
    # verdict). A by-source clause skips file pruning, so there is no
    # envelope probe — the check rides the fate-count action instead
    # (one extra union leg over the materialized source, not a scan).
    check_dups_in_probe = check_source_keys and not bs_cls
    check_dups_in_count = check_source_keys and bool(bs_cls)
    dict_clauses = any(
        cl.assignments is not None for cl in (*m_cls, *nm_cls, *bs_cls)
    )
    all_update = any(
        cl.action == "update" and cl.assignments is None for cl in m_cls
    )
    all_insert = any(cl.assignments is None for cl in nm_cls)

    for _ in range(max_retries):
        t, snap, protocol, meta = _pin_snapshot(spark, path, "merge")
        table_cols = {f.name for f in snap.schema.fields}
        data_cols = [f.name for f in snap.schema.fields]
        types = {f.name: f.dataType for f in snap.schema.fields}
        gen = _generated_columns(snap.schema)
        ident = _identity_columns(snap.schema)
        ident_alloc: dict = {}
        if ident:
            # updates may never write identity values (deletes and SET
            # maps leaving the columns untouched are fine); merge-inserted
            # rows ALLOCATE fresh values beyond the high water mark in the
            # same commit (r12 — VERDICT r11 #3), exactly like delta_write:
            # start + k*step past the mark, mark advanced from the staged
            # footer stats, races aborted by the snapshot pin.
            if all_update:
                raise DeltaWriteError(
                    "updateAll on an identity-column table would overwrite "
                    f"identity column(s) {sorted(ident)}; use a SET map "
                    "that leaves them untouched"
                )
            for clause in (*m_cls, *bs_cls):
                if clause.assignments is not None:
                    bad = sorted(set(clause.assignments) & set(ident))
                    if bad:
                        raise DeltaWriteError(
                            f"column(s) {bad} are IDENTITY columns; their "
                            "values are writer-allocated and cannot be SET"
                        )
            for n, sp in sorted(ident.items()):
                # a clause writes n EXPLICITLY iff its VALUES map lists it
                # or it is insertAll over a source that carries it
                explicit = [
                    cl for cl in nm_cls
                    if (n in cl.assignments if cl.assignments is not None
                        else n in source_df.columns)
                ]
                if explicit and not sp["allow"]:
                    raise DeltaWriteError(
                        f"column {n!r} is GENERATED ALWAYS AS IDENTITY "
                        "(allowExplicitInsert=false); omit it from the "
                        "insert clauses — values are allocated by the "
                        "writer"
                    )
                if explicit and len(explicit) != len(nm_cls):
                    raise DeltaWriteError(
                        f"identity column {n!r} is written explicitly by "
                        "some insert clauses but not others; mixing "
                        "explicit values with writer allocation in one "
                        "MERGE is ambiguous"
                    )
                if nm_cls and not explicit:
                    ident_alloc[n] = sp
                # explicit inserts (allow=true) pass through unchanged;
                # the HWM does not chase explicit values (delta-spark's
                # rule; ALTER ... SYNC IDENTITY is the catch-up)
        for clause, kind in (
            *[(cl, "when_matched SET") for cl in m_cls],
            *[(cl, "when_not_matched VALUES") for cl in nm_cls],
            *[(cl, "when_not_matched_by_source SET") for cl in bs_cls],
        ):
            if clause.assignments is not None:
                bad = sorted(set(clause.assignments) & set(gen))
                if bad:
                    raise DeltaWriteError(
                        f"column(s) {bad} in {kind} are GENERATED ALWAYS "
                        "AS; their values recompute from the expression"
                    )
                unknown = sorted(
                    c for c in clause.assignments if c not in table_cols
                )
                if unknown:
                    raise DeltaWriteError(
                        f"{kind} columns not in schema: {unknown}"
                    )
        src = source_df
        gen_rules: dict = {}
        if gen and (all_update or all_insert):
            src, gen_rules = _apply_generated_columns(src, gen)
        missing = sorted(
            c for c in data_cols
            if c not in src.columns and c not in ident_alloc
        ) if (all_update or all_insert) else []
        if missing and not merge_schema:
            raise DeltaWriteError(
                f"merge source lacks table column(s) {missing}; align the "
                "source, pass merge_schema=True (updates keep the "
                "target's value there, inserts take NULL — Delta's "
                "updateAll-under-evolution rule), or use column-level "
                "SET/VALUES maps"
            )
        extra = [c for c in src.columns if c not in data_cols]
        if extra and not merge_schema and (all_update or all_insert):
            raise DeltaWriteError(
                f"merge source has column(s) {sorted(extra)} not in the "
                "table; drop them, pass merge_schema=True for additive "
                "evolution (Delta's autoMerge), or reference them from "
                "column-level SET/VALUES maps"
            )
        if extra and merge_schema and dict_clauses and (
            all_update or all_insert
        ):
            # the *All alignment below would silently DROP the extra
            # source columns while the caller asked for evolution —
            # refuse instead of half-applying merge_schema
            raise DeltaWriteError(
                "additive evolution (merge_schema=True) is not supported "
                "when column-level SET/VALUES clauses are mixed with *All "
                "clauses; evolve the schema with delta_add_column first "
                "or use *All clauses only"
            )
        new_meta = None
        if extra and merge_schema and not dict_clauses:
            if snap.mapping_mode == "id":
                raise DeltaWriteError(
                    "additive evolution on an id-mode mapped table is not "
                    "supported in DML (field ids are commit-assigned); add "
                    "the columns with delta_add_column first"
                )
            if snap.column_mapping:
                # name mode (r11): new columns get fresh ids + col-<uuid>
                # physical names in the SAME commit — the evolved snapshot
                # drives both the lineage scan (old files read the new
                # physical columns as NULL) and the physical staging
                import dataclasses as _dc
                import uuid as _uuid

                conf_now = dict(meta.get("configuration") or {})
                max_id = int(
                    conf_now.get("delta.columnMapping.maxColumnId", 0)
                )
                mapped_new = []
                for c in extra:
                    max_id += 1
                    mapped_new.append(StructField(
                        c, src.schema[c].dataType, True,
                        metadata={
                            "delta.columnMapping.id": max_id,
                            "delta.columnMapping.physicalName":
                                f"col-{_uuid.uuid4().hex}",
                        },
                    ))
                evolved = StructType(list(snap.schema.fields) + mapped_new)
                conf_now["delta.columnMapping.maxColumnId"] = str(max_id)
                new_meta = dict(meta)
                new_meta["schemaString"] = evolved.json()
                new_meta["configuration"] = conf_now
                snap = _dc.replace(
                    snap, schema=evolved, configuration=conf_now
                )
                meta = dict(meta)
                meta["configuration"] = conf_now
            else:
                evolved = StructType(
                    list(snap.schema.fields)
                    + [StructField(c, src.schema[c].dataType, True)
                       for c in extra]
                )
                new_meta = dict(meta)
                new_meta["schemaString"] = evolved.json()
            data_cols = data_cols + extra
            types = {f.name: f.dataType for f in evolved.fields}
        if (
            any(cl.assignments is not None for cl in bs_cls) and new_meta
        ):  # pragma: no cover - unreachable (dict_clauses blocks evolution)
            raise DeltaWriteError(
                "by-source SET with schema evolution is not supported"
            )
        if all_update or all_insert:
            # align source types to the table's (delta-spark's implicit
            # up-casts on updateAll/insertAll); evolved/missing columns
            # take the source's type / NULL
            src = src.select(
                *[
                    (
                        F.col(c).cast(snap.schema[c].dataType)
                        if c in table_cols and c in src.columns
                        else (
                            F.col(c)
                            if c in src.columns
                            else F.lit(None).cast(types[c])
                        )
                    ).alias(c)
                    for c in data_cols
                ]
            )
        else:
            # map forms keep the source's own columns (expressions may
            # reference any of them); only the join keys cast to the
            # table's types
            src = src.select(
                *[
                    F.col(c).cast(snap.schema[c].dataType).alias(c)
                    if c in keys and c in table_cols
                    else F.col(c)
                    for c in src.columns
                ]
            )
        bad_keys = sorted(k for k in keys if k not in src.columns)
        if bad_keys:
            raise DeltaWriteError(f"merge keys not in source: {bad_keys}")
        bad_keys = sorted(k for k in keys if k not in data_cols)
        if bad_keys:
            raise DeltaWriteError(f"merge keys not in schema: {bad_keys}")

        # ONE spillable materialization serves every remaining source
        # pass — the pruning-envelope probe, the three fate joins, and
        # the change-feed frame re-scan the source 3-5x otherwise, and a
        # NON-DETERMINISTIC source (rand(), a re-shuffling view) could
        # yield different rows per pass. delta-spark materializes merge
        # sources for both reasons; MEMORY_AND_DISK keeps lineage so
        # blocks lost to executor churn recompute.
        # spark.dc43.delta.mergeMaterializeSource=none opts out for
        # deterministic full-table-sized sources where recompute beats
        # spilling a copy (delta-spark's merge.materializeSource).
        _src_cached = (
            spark.conf.get(
                "spark.dc43.delta.mergeMaterializeSource", "auto"
            ).lower() != "none"
        )
        if _src_cached:
            src = src.persist(StorageLevel.MEMORY_AND_DISK)
        frames: list = []
        try:
            # merge file pruning (delta-spark's shape): only files whose
            # stats envelope intersects the source's key ranges can match —
            # pruned files carry over untouched, and the insert anti-join
            # over the pruned lineage stays exact (see helper docstring).
            # A by-source clause disables pruning: its rows are target rows
            # WITHOUT a source match, which any file can hold.
            if not bs_cls:
                candidates = _merge_candidate_files(
                    src, snap, keys, check_unique=check_dups_in_probe
                )
                check_dups_in_probe = False
            else:
                candidates = list(snap.files)
            rt_mat = _row_tracking_present(protocol) and _row_tracking_enabled(meta)
            mat_id, _mat_ver = (
                _rt_mat_cols_checked(meta) if rt_mat else (None, None)
            )
            lineage = _live_lineage(t, snap, files=candidates, row_ids=rt_mat)
            tl = lineage.alias("t")
            sl = src.alias("s")
            cond = [
                F.col(f"t.`{k}`").eqNullSafe(F.col(f"s.`{k}`")) for k in keys
            ]
            cdf_on = _cdf_enabled(meta)
            keep_t = set(missing) if merge_schema else set()
            upd_form = any(cl.action == "update" for cl in m_cls)

            matched = tl.join(sl, cond, "inner")
            # the row's fate is its FIRST passing clause's action (user
            # order) — rows matching no clause stay untouched
            matched = (
                matched.withColumn("_dc43_del", first_fate(m_cls, "delete"))
                .withColumn("_dc43_upd", first_fate(m_cls, "update"))
                .filter(F.col("_dc43_del") | F.col("_dc43_upd"))
            )

            def _t_side(c):
                # evolved columns don't exist on the target side yet
                if c in table_cols:
                    return F.col(f"t.`{c}`").alias(f"_t_{c}")
                return F.lit(None).cast(types[c]).alias(f"_t_{c}")

            def _n_side(c):
                # the updated row's value for column c (post-image): the
                # first-matching update clause's value, chained in clause
                # order; evolved columns fall back to NULL (no target side)
                fb = (
                    F.col(f"t.`{c}`")
                    if c in table_cols
                    else F.lit(None).cast(types[c])
                )
                base = clause_value(
                    m_cls, "matched", c, types, keep_t=keep_t, otherwise=fb
                )
                return base.alias(f"_n_{c}")

            touch_cols = [
                F.col(f"t.`{_REL}`").alias(_REL),
                F.col(f"t.`{_POS}`").alias(_POS),
                F.col("_dc43_del"),
                F.col("_dc43_upd"),
            ]
            if mat_id and upd_form:
                # the updated row's stable identity, preserved through the
                # rewrite via the materialized column
                touch_cols.append(F.col(f"t.`{_RTID}`").alias(_RTID))
            if cdf_on:
                touch_cols += [_t_side(c) for c in data_cols]
            if upd_form:
                touch_cols += [_n_side(c) for c in data_cols]
            # persist, not localCheckpoint: spillable/evictable executor
            # storage (MEMORY_AND_DISK) with lineage kept — blocks lost to
            # executor churn recompute from the PINNED snapshot scan, and a
            # full-table merge never hard-materializes 2x-width rows the way
            # an eager localCheckpoint did (VERDICT r10 #4; _t_ pre-images
            # ride only when CDF needs them)
            touch = matched.select(*touch_cols).persist(StorageLevel.MEMORY_AND_DISK)

            bs = None
            bs_upd_form = any(cl.action == "update" for cl in bs_cls)
            if bs_cls:
                bs = tl.join(
                    sl.select(*[F.col(k) for k in keys]), cond, "left_anti"
                ).alias("t")
                # a row is touched iff ANY clause fires; its fate (delete vs
                # update) is the FIRST passing clause's action
                bs = (
                    bs.filter(any_clause_ok(bs_cls))
                    .withColumn("_dc43_bsdel", first_fate(bs_cls, "delete"))
                    .withColumn("_dc43_bsupd", first_fate(bs_cls, "update"))
                )
                # width discipline (same as delete's): a by-source DELETE
                # without CDF needs only the (rel, pos) coordinates — don't
                # re-materialize the full table width in executor storage.
                # Evolved (merge_schema) columns don't exist on the lineage
                # side yet: typed NULLs, same as the matched path's _t_side.
                bs_sel = [F.col(_REL), F.col(_POS),
                          F.col("_dc43_bsdel"), F.col("_dc43_bsupd")]
                if mat_id and bs_upd_form:
                    bs_sel.append(F.col(_RTID))
                if cdf_on or bs_upd_form:
                    bs_sel += [
                        (
                            F.col(f"`{c}`")
                            if c in table_cols
                            else F.lit(None).cast(types[c])
                        ).alias(c)
                        for c in data_cols
                    ]
                if bs_upd_form:
                    # by-source post-image values chain in clause order over
                    # t.<col>; computed HERE (the narrow select drops the t
                    # alias) — delete-fate rows' values are unused
                    bs_sel += [
                        clause_value(
                            bs_cls, "not_matched_by_source", c, types,
                            otherwise=(
                                F.col(f"t.`{c}`")
                                if c in table_cols
                                else F.lit(None).cast(types[c])
                            ),
                        ).alias(f"_bsn_{c}")
                        for c in data_cols
                    ]
                bs = bs.select(*bs_sel).persist(StorageLevel.MEMORY_AND_DISK)

            inserts = None
            if nm_cls:
                anti = sl.join(tl.select(*keys).alias("t"), cond, "left_anti")
                anti = anti.alias("s").filter(any_clause_ok(nm_cls))
                inserts = anti.select(
                    *[
                        clause_value(
                            nm_cls, "not_matched", c, types,
                            otherwise=F.lit(None).cast(types[c]),
                        ).alias(c)
                        for c in data_cols
                    ]
                )
                for n, sp in sorted(ident_alloc.items()):
                    # start + k*step strictly beyond the pinned high water
                    # mark (monotonically_increasing_id keeps allocation
                    # distributed; gaps are protocol-legal). A concurrent
                    # commit raises _DmlConflict at claim time and the retry
                    # reallocates under the new mark.
                    base = (
                        sp["hwm"] + sp["step"]
                        if sp["hwm"] is not None
                        else sp["start"]
                    )
                    inserts = inserts.withColumn(
                        n,
                        (
                            F.lit(base)
                            + F.lit(sp["step"]) * F.monotonically_increasing_id()
                        ).cast(types[n]),
                    )
                inserts = inserts.persist(StorageLevel.MEMORY_AND_DISK)

            frames = [f for f in (touch, bs, inserts) if f is not None]

            # ONE counting job for all three persisted frames (a tagged
            # union-count): each leg's scan materializes its cache, so
            # this replaces three separate count() jobs — at local scale
            # that is 3x job overhead, at cluster scale 3 job launches
            # over the same cached bytes (guide §2.4: fewer actions)
            legs = [touch.select(F.lit(0).alias("_dc43_leg"))]
            if bs is not None:
                legs.append(bs.select(F.lit(1).alias("_dc43_leg")))
            if inserts is not None:
                legs.append(inserts.select(F.lit(2).alias("_dc43_leg")))
            if check_dups_in_count:
                # by-source merges have no pruning-envelope probe to fuse
                # the duplicate-source-key check into: ride this same
                # counting job as one extra leg over the materialized
                # source — one row per duplicated key group
                legs.append(
                    src.groupBy(*[F.col(k) for k in keys])
                    .count()
                    .filter(F.col("count") > 1)
                    .select(F.lit(3).alias("_dc43_leg"))
                )
            union = legs[0]
            for leg in legs[1:]:
                union = union.unionAll(leg)
            leg_counts = {
                r["_dc43_leg"]: r["count"]
                for r in union.groupBy("_dc43_leg").count().collect()
            }
            if leg_counts.get(3, 0):
                # re-probe the (cached) source only on the failure path,
                # to name an offending key in the error
                require_unique_merge_keys(src, keys)
                raise ValueError(  # pragma: no cover - probe raises first
                    "merge source has duplicate keys; SQL MERGE is "
                    "ambiguous under multiple source matches"
                )
            check_dups_in_count = False  # retries reuse the verdict
            n_touch = leg_counts.get(0, 0)
            n_bs = leg_counts.get(1, 0)
            n_ins = leg_counts.get(2, 0)
            if n_touch == 0 and n_bs == 0 and n_ins == 0:
                return None

            def _regen(frame: DataFrame) -> DataFrame:
                # map-form rows mix target/source values: recompute generated
                # columns from the final row (delta-spark's rule); *All forms
                # already carry source-side computed values. Extra
                # (materialized row-id) columns ride through untouched.
                if gen and dict_clauses:
                    extras = [
                        c for c in frame.columns
                        if c not in data_cols and c not in gen
                    ]
                    out, _ = _apply_generated_columns(frame.drop(*gen), gen)
                    return out.select(*data_cols, *extras)
                return frame

            updates = None
            if upd_form and n_touch:
                updates = _regen(
                    touch.filter(F.col("_dc43_upd")).select(
                        *[F.col(f"_n_{c}").alias(c) for c in data_cols],
                        *([F.col(_RTID).alias(mat_id)] if mat_id else []),
                    )
                )
            bs_updates = None
            if bs_upd_form and n_bs:
                bs_updates = _regen(
                    bs.filter(F.col("_dc43_bsupd")).select(
                        *[F.col(f"_bsn_{c}").alias(c) for c in data_cols],
                        *([F.col(_RTID).alias(mat_id)] if mat_id else []),
                    )
                )
            if inserts is not None and gen and any(
                cl.assignments is not None for cl in nm_cls
            ):
                inserts = _regen(inserts)

            new_parts = [
                p for p in (updates, bs_updates, inserts) if p is not None
            ]
            new_rows = None
            if new_parts:
                new_rows = new_parts[0]
                for p in new_parts[1:]:
                    # inserts carry no materialized row id (NULL -> the
                    # new file's fresh baseRowId + index)
                    new_rows = new_rows.unionByName(
                        p, allowMissingColumns=True
                    )
                _enforce_delta_rules(
                    new_rows, {**_delta_row_rules(meta, snap.schema), **gen_rules}
                )

            del_parts = []
            if n_touch:
                del_parts.append(touch.select(_REL, _POS))
            if bs is not None and n_bs:
                # every fired by-source row removes its old version
                # (delete-fate rows stay gone; update-fate rows re-land
                # as fresh rows via bs_updates)
                del_parts.append(bs.select(_REL, _POS))
            del_rows = None
            if del_parts:
                del_rows = del_parts[0]
                for p in del_parts[1:]:
                    del_rows = del_rows.unionByName(p)

            cdf = None
            if cdf_on:
                cframes = []
                deletes = touch.filter("_dc43_del").select(
                    *[F.col(f"_t_{c}").alias(c) for c in data_cols],
                    F.lit("delete").alias("_change_type"),
                )
                cframes.append(deletes)
                if upd_form:
                    pre = touch.filter(F.col("_dc43_upd")).select(
                        *[F.col(f"_t_{c}").alias(c) for c in data_cols],
                        F.lit("update_preimage").alias("_change_type"),
                    )
                    post = touch.filter(F.col("_dc43_upd")).select(
                        *[F.col(f"_n_{c}").alias(c) for c in data_cols],
                        F.lit("update_postimage").alias("_change_type"),
                    )
                    if gen and dict_clauses:
                        post = _regen(
                            touch.filter(F.col("_dc43_upd")).select(
                                *[F.col(f"_n_{c}").alias(c) for c in data_cols]
                            )
                        ).select(
                            *data_cols,
                            F.lit("update_postimage").alias("_change_type"),
                        )
                    cframes += [pre, post]
                if bs is not None and n_bs:
                    if any(cl.action == "delete" for cl in bs_cls):
                        cframes.append(
                            bs.filter(F.col("_dc43_bsdel")).select(
                                *data_cols,
                                F.lit("delete").alias("_change_type"),
                            )
                        )
                    if bs_upd_form:
                        cframes.append(
                            bs.filter(F.col("_dc43_bsupd")).select(
                                *data_cols,
                                F.lit("update_preimage").alias("_change_type"),
                            )
                        )
                        cframes.append(
                            bs_updates.select(
                                *data_cols,
                                F.lit("update_postimage").alias("_change_type"),
                            )
                        )
                if inserts is not None:
                    cframes.append(
                        inserts.select(
                            *data_cols, F.lit("insert").alias("_change_type")
                        )
                    )
                cdf = cframes[0]
                for fr in cframes[1:]:
                    cdf = cdf.unionByName(fr)

            matched_params = []
            for cl in m_cls:
                entry = {"actionType": cl.action}
                if cl.condition:
                    entry["predicate"] = cl.condition
                matched_params.append(entry)
            return _commit_dml(
                t, snap, protocol, meta,
                op="MERGE",
                params={
                    "predicate": " AND ".join(f"t.{k} <=> s.{k}" for k in keys),
                    "matchedPredicates": json.dumps(matched_params),
                },
                del_rows=del_rows,
                lineage=lineage,
                new_rows=new_rows,
                cdf_rows=cdf,
                use_dvs=use_dvs,
                new_meta=new_meta,
                ident_alloc=ident_alloc or None,
            )
        except _DmlConflict:
            continue
        finally:
            # release on EVERY exit — success, conflict retry, or a
            # non-conflict failure (constraint violation, protocol
            # error): persisted touch sets and the materialized source
            # must never outlive the op (or the retry iteration)
            if _src_cached:
                src.unpersist()
            for f in frames:
                f.unpersist()
    raise DeltaProtocolError(
        f"MERGE on {path} kept conflicting after {max_retries} attempts"
    )
