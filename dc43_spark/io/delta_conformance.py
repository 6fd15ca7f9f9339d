"""Machine-checkable Delta protocol conformance (VERDICT r10 #6).

delta-spark is unobtainable in this environment (COVERAGE.md records the
pip failure), so the jar-less writer's output cannot be interop-proven by
the real reader. This module is the next-best structural gate: a strict
shape model of every log action, transcribed from the PUBLIC spec
(delta.io PROTOCOL.md — "Actions", "Add File and Remove File",
"Change Metadata", "Protocol Evolution", "Transaction Identifiers",
"Add CDC File", "Deletion Vector Descriptor Schema", "Checkpoints"),
validated over EVERY commit and checkpoint the writer / DML / OPTIMIZE /
RESTORE / CLONE paths emit during the test suite (a conftest fixture
scans each test's ``_delta_log`` dirs at teardown).

The class of bug this catches structurally: b1eb905's checkpoint-sourced
adds re-emitted with tuple-list ``partitionValues`` — a shape no JSON
reader of the protocol accepts — which value-level tests missed until a
downstream read tripped."""

from __future__ import annotations

import json
import os
import re
from typing import Optional


class DeltaConformanceError(AssertionError):
    """An emitted action violates the protocol's documented shape."""


_ACTION_KEYS = {
    "commitInfo", "protocol", "metaData", "add", "remove", "txn", "cdc",
    "domainMetadata", "checkpointMetadata", "sidecar",
}

_DV_STORAGE_TYPES = {"u", "i", "p"}

_COMMIT_JSON_RE = re.compile(r"\d{20}\.json")


def _err(ctx: str, msg: str):
    raise DeltaConformanceError(f"{ctx}: {msg}")


def _require(cond: bool, ctx: str, msg: str):
    if not cond:
        _err(ctx, msg)


def _check_string_map(v, ctx: str, *, allow_null_values: bool):
    """The protocol's ``Map[String, String]`` shape (partitionValues /
    configuration): a JSON OBJECT whose keys are strings and whose
    values are strings (or null where the spec serializes NULL partition
    values that way). Lists of pairs, tuples, or typed values are the
    exact corruption class the checkpoint round-trip once produced."""
    _require(isinstance(v, dict), ctx, f"must be a JSON object, got {type(v).__name__}")
    for k, val in v.items():
        _require(isinstance(k, str), ctx, f"non-string key {k!r}")
        if val is None:
            _require(allow_null_values, ctx, f"null value for key {k!r}")
        else:
            _require(
                isinstance(val, str), ctx,
                f"value for key {k!r} must be a string, got {type(val).__name__}",
            )


def _check_dv(dv: dict, ctx: str):
    """Deletion Vector Descriptor Schema (PROTOCOL.md): storageType one
    of u/i/p; pathOrInlineDv string; offset optional int (required
    meaningfully for 'u'); sizeInBytes and cardinality ints."""
    _require(isinstance(dv, dict), ctx, "deletionVector must be an object")
    st = dv.get("storageType")
    _require(st in _DV_STORAGE_TYPES, ctx, f"storageType {st!r} not in u/i/p")
    _require(
        isinstance(dv.get("pathOrInlineDv"), str) and dv["pathOrInlineDv"],
        ctx, "pathOrInlineDv must be a non-empty string",
    )
    off = dv.get("offset")
    _require(off is None or isinstance(off, int), ctx, "offset must be an int")
    for k in ("sizeInBytes", "cardinality"):
        _require(isinstance(dv.get(k), int), ctx, f"{k} must be an int")
    _require(dv["cardinality"] >= 0, ctx, "cardinality must be >= 0")


def _check_add(a: dict, ctx: str):
    _require(isinstance(a.get("path"), str) and a["path"], ctx,
             "add.path must be a non-empty string")
    _require("partitionValues" in a, ctx, "add.partitionValues is required")
    _check_string_map(a["partitionValues"], f"{ctx}.partitionValues",
                      allow_null_values=True)
    _require(isinstance(a.get("size"), int) and a["size"] >= 0, ctx,
             "add.size must be a non-negative int")
    _require(isinstance(a.get("dataChange"), bool), ctx,
             "add.dataChange must be a boolean")
    mt = a.get("modificationTime")
    _require(mt is None or isinstance(mt, int), ctx,
             "add.modificationTime must be an int")
    stats = a.get("stats")
    if stats is not None:
        _require(isinstance(stats, str), ctx,
                 "add.stats must be a JSON STRING (stringified), not an object")
        try:
            parsed = json.loads(stats)
        except ValueError:
            _err(ctx, "add.stats is not valid JSON")
        _require(isinstance(parsed, dict), ctx, "add.stats must encode an object")
        if "numRecords" in parsed:
            _require(isinstance(parsed["numRecords"], int), ctx,
                     "stats.numRecords must be an int")
    if a.get("deletionVector") is not None:
        _check_dv(a["deletionVector"], f"{ctx}.deletionVector")


def _check_remove(r: dict, ctx: str):
    _require(isinstance(r.get("path"), str) and r["path"], ctx,
             "remove.path must be a non-empty string")
    dt = r.get("deletionTimestamp")
    _require(dt is None or isinstance(dt, int), ctx,
             "remove.deletionTimestamp must be an int")
    dc = r.get("dataChange")
    _require(dc is None or isinstance(dc, bool), ctx,
             "remove.dataChange must be a boolean")
    if r.get("partitionValues") is not None:
        _check_string_map(r["partitionValues"], f"{ctx}.partitionValues",
                          allow_null_values=True)
    if r.get("deletionVector") is not None:
        _check_dv(r["deletionVector"], f"{ctx}.deletionVector")


def _check_metadata(m: dict, ctx: str):
    _require(isinstance(m.get("id"), str) and m["id"], ctx,
             "metaData.id must be a non-empty string")
    fmt = m.get("format")
    _require(isinstance(fmt, dict), ctx, "metaData.format must be an object")
    _require(isinstance(fmt.get("provider"), str), ctx,
             "format.provider must be a string")
    ss = m.get("schemaString")
    _require(isinstance(ss, str), ctx, "metaData.schemaString must be a string")
    try:
        doc = json.loads(ss)
    except ValueError:
        _err(ctx, "schemaString is not valid JSON")
    _require(doc.get("type") == "struct" and isinstance(doc.get("fields"), list),
             ctx, "schemaString must encode a struct with a fields list")
    for f in doc["fields"]:
        _require(isinstance(f, dict) and isinstance(f.get("name"), str),
                 ctx, f"schema field {f!r} must have a string name")
        _require("type" in f, ctx, f"schema field {f['name']} lacks a type")
        _require(isinstance(f.get("nullable"), bool), ctx,
                 f"schema field {f['name']} lacks a boolean nullable")
        _require(isinstance(f.get("metadata"), dict), ctx,
                 f"schema field {f['name']} lacks a metadata object")
    pc = m.get("partitionColumns")
    _require(isinstance(pc, list) and all(isinstance(c, str) for c in pc),
             ctx, "metaData.partitionColumns must be a list of strings")
    names = {f["name"] for f in doc["fields"]}
    # partitionColumns reference schema (logical) columns
    missing = [c for c in pc if c not in names]
    _require(not missing, ctx,
             f"partitionColumns {missing} not in the schema")
    conf = m.get("configuration")
    if conf is not None:
        _check_string_map(conf, f"{ctx}.configuration", allow_null_values=False)
    ct = m.get("createdTime")
    _require(ct is None or isinstance(ct, int), ctx,
             "metaData.createdTime must be an int")


def _check_protocol(p: dict, ctx: str):
    rv, wv = p.get("minReaderVersion"), p.get("minWriterVersion")
    _require(isinstance(rv, int) and rv >= 1, ctx,
             "minReaderVersion must be an int >= 1")
    _require(isinstance(wv, int) and wv >= 1, ctx,
             "minWriterVersion must be an int >= 1")
    rf, wf = p.get("readerFeatures"), p.get("writerFeatures")
    if rf is not None:
        _require(rv >= 3, ctx, "readerFeatures requires minReaderVersion >= 3")
        _require(isinstance(rf, list) and all(isinstance(x, str) for x in rf),
                 ctx, "readerFeatures must be a list of strings")
    if wf is not None:
        _require(wv >= 7, ctx, "writerFeatures requires minWriterVersion >= 7")
        _require(isinstance(wf, list) and all(isinstance(x, str) for x in wf),
                 ctx, "writerFeatures must be a list of strings")
    if rv >= 3 and wf is not None and rf is not None:
        # reader-writer features (deletionVectors, columnMapping, v2Checkpoint)
        # present on the writer side must also be on the reader side
        for feat in ("deletionVectors", "columnMapping", "v2Checkpoint"):
            if feat in wf:
                _require(feat in rf, ctx,
                         f"reader-writer feature {feat} missing from readerFeatures")


def _check_txn(t: dict, ctx: str):
    _require(isinstance(t.get("appId"), str) and t["appId"], ctx,
             "txn.appId must be a non-empty string")
    _require(isinstance(t.get("version"), int), ctx,
             "txn.version must be an int")


def _check_cdc(c: dict, ctx: str):
    _require(isinstance(c.get("path"), str) and c["path"], ctx,
             "cdc.path must be a non-empty string")
    _check_string_map(c.get("partitionValues", {}), f"{ctx}.partitionValues",
                      allow_null_values=True)
    _require(isinstance(c.get("size"), int), ctx, "cdc.size must be an int")
    _require(c.get("dataChange") is False, ctx,
             "cdc.dataChange must be false (PROTOCOL.md: CDC files are "
             "bookkeeping, data change rides the cdc rows themselves)")


_CHECKERS = {
    "add": _check_add,
    "remove": _check_remove,
    "metaData": _check_metadata,
    "protocol": _check_protocol,
    "txn": _check_txn,
    "cdc": _check_cdc,
}


def validate_action(action: dict, ctx: str = "action") -> None:
    """One log line: exactly one recognized action key, whose payload
    satisfies the spec's shape."""
    _require(isinstance(action, dict), ctx, "log line must be a JSON object")
    keys = [k for k in action if k in _ACTION_KEYS]
    _require(len(keys) == 1, ctx,
             f"expected exactly one action key, got {sorted(action)}")
    extra = [k for k in action if k not in _ACTION_KEYS]
    _require(not extra, ctx, f"unknown top-level keys {extra}")
    kind = keys[0]
    checker = _CHECKERS.get(kind)
    if checker is not None:
        payload = action[kind]
        _require(isinstance(payload, dict), ctx, f"{kind} must be an object")
        checker(payload, f"{ctx}.{kind}")


def _parse_and_validate_commit(path: str) -> list:
    """Parse + shape-validate every line of one commit/checkpoint JSON;
    returns the action dicts so downstream chain validators never
    re-read the file."""
    actions = []
    with open(path) as fh:
        for i, line in enumerate(fh):
            line = line.strip()
            if not line:
                continue
            try:
                action = json.loads(line)
            except ValueError:
                _err(f"{os.path.basename(path)}:{i + 1}", "line is not valid JSON")
            validate_action(action, f"{os.path.basename(path)}:{i + 1}")
            actions.append(action)
    return actions


def validate_commit_file(path: str) -> int:
    """Every line of one ``<version>.json`` commit. Returns actions seen."""
    return len(_parse_and_validate_commit(path))


def _checkpoint_actions(path: str):
    """Yield action dicts reconstructed from a classic/v2 parquet
    checkpoint the way a reader would (nulls dropped, map columns to
    plain dicts) — the same surface delta-spark parses."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    for row in tbl.to_pylist():
        for kind in ("add", "remove", "metaData", "protocol", "txn"):
            payload = row.get(kind)
            if payload is None:
                continue
            yield kind, _strip_nulls(payload)


_MAP_KEYS = ("partitionValues", "configuration", "options", "tags")


def _strip_nulls(v):
    if isinstance(v, dict):
        out = {k: _strip_nulls(x) for k, x in v.items() if x is not None}
        # pyarrow yields MAP columns as [(k, v), ...] pair lists (and an
        # EMPTY map as []) — restore the JSON-object shape the protocol
        # mandates for the known map-typed fields, so shape checks run on
        # what a JSON round-trip would see
        for mk in _MAP_KEYS:
            mv = out.get(mk)
            if isinstance(mv, list) and all(
                isinstance(x, tuple) and len(x) == 2 for x in mv
            ):
                out[mk] = {k: x for k, x in mv}
        return out
    if isinstance(v, list):
        return [_strip_nulls(x) for x in v]
    return v


def validate_checkpoint_file(path: str) -> int:
    """Every action row of one parquet checkpoint part. partitionValues
    survive the map round-trip as real objects (the b1eb905 class)."""
    n = 0
    for kind, payload in _checkpoint_actions(path):
        # a checkpoint add whose partitionValues came back as a pair-LIST
        # would fail _check_string_map after _strip_nulls's map fold only
        # if heterogenous; enforce dict-ness explicitly first
        if kind in ("add", "remove", "cdc") and "partitionValues" in payload:
            pv = payload["partitionValues"]
            if not isinstance(pv, dict):
                _err(os.path.basename(path),
                     f"{kind}.partitionValues round-trips as "
                     f"{type(pv).__name__}, not an object")
        if kind in ("add", "remove"):
            # PROTOCOL.md (Checkpoints): dataChange in checkpoint actions
            # "should be set to false" — the parquet column is nullable
            # and a null there reads as the mandated false
            payload.setdefault("dataChange", False)
        validate_action({kind: payload}, os.path.basename(path))
        n += 1
    return n


def _validate_ict_chain(commits: list) -> None:
    """In-Commit Timestamps (PROTOCOL.md): where present,
    ``commitInfo.inCommitTimestamp`` must sit on the FIRST action of its
    commit and be strictly increasing in version order; once a metaData
    enables ``delta.enableInCommitTimestamps``, every later commit must
    carry one until a metaData disables it. ``commits`` holds the
    ALREADY-PARSED (name, actions) pairs in version order — only real
    commit files (a v2 JSON checkpoint is a snapshot, not a commit, and
    legitimately carries no inCommitTimestamp).""" 
    enabled: Optional[bool] = None  # unknown until a metaData is seen
    prev_ict: Optional[int] = None
    for name, lines in commits:
        ict = None
        for i, action in enumerate(lines):
            info = action.get("commitInfo")
            if info and "inCommitTimestamp" in info:
                _require(i == 0, name,
                         "commitInfo with inCommitTimestamp must be the "
                         "FIRST action of its commit")
                ict = int(info["inCommitTimestamp"])
            meta = action.get("metaData")
            if meta is not None:
                conf = meta.get("configuration") or {}
                enabled = str(conf.get(
                    "delta.enableInCommitTimestamps", ""
                )).lower() == "true"
        if ict is not None and prev_ict is not None:
            _require(ict > prev_ict, name,
                     f"inCommitTimestamp {ict} must exceed the previous "
                     f"commit's {prev_ict}")
        if enabled and ict is None:
            _err(name, "table enables delta.enableInCommitTimestamps but "
                       "this commit carries no inCommitTimestamp")
        if ict is not None:
            prev_ict = ict
        elif enabled is False:
            prev_ict = None  # chain legitimately ended (disabled)


def _validate_row_tracking(commits: list) -> None:
    """Row Tracking (PROTOCOL.md): once ``delta.enableRowTracking`` is
    on, every subsequent add must carry ``baseRowId`` +
    ``defaultRowCommitVersion``; id ranges (base..base+numRecords-1)
    must never overlap across live-or-dead adds; and the
    ``delta.rowTracking`` domain's high water mark must cover every
    assigned id. Commit replay only (already-parsed (name, actions)
    pairs) — checkpoint-sourced adds are copies of commits this already
    checked."""
    enabled = False
    hwm: Optional[int] = None
    ranges: set = set()  # (base, end, path) of every assignment seen
    for name, lines in commits:
        for action in lines:
            meta = action.get("metaData")
            if meta is not None:
                conf = meta.get("configuration") or {}
                enabled = str(conf.get(
                    "delta.enableRowTracking", ""
                )).lower() == "true"
            dm = action.get("domainMetadata")
            if dm and dm.get("domain") == "delta.rowTracking" and not dm.get(
                "removed"
            ):
                try:
                    hwm = int(json.loads(
                        dm.get("configuration") or "{}"
                    ).get("rowIdHighWaterMark"))
                except (ValueError, TypeError):
                    _err(name, "delta.rowTracking domain configuration must "
                               "carry an integer rowIdHighWaterMark")
            add = action.get("add")
            if not add:
                continue
            base = add.get("baseRowId")
            if enabled and base is None:
                _err(name, f"add {add.get('path')!r}: table enables row "
                           "tracking but the add carries no baseRowId")
            if base is None:
                continue
            _require(add.get("defaultRowCommitVersion") is not None, name,
                     f"add {add.get('path')!r} has baseRowId but no "
                     "defaultRowCommitVersion")
            st = add.get("stats")
            rows = None
            if st:
                try:
                    rows = (json.loads(st) if isinstance(st, str) else st
                            ).get("numRecords")
                except (ValueError, TypeError):
                    rows = None
            if rows is not None and int(rows) == 0:
                continue  # an empty file occupies NO ids (spec); its
                # base may legally coincide with a later file's
            # unknown width: conservatively one row (still requires a
            # covering HWM, still must not sit inside another range)
            end = int(base) + max(int(rows or 1), 1) - 1
            ranges.add((int(base), end, add.get("path")))
    if ranges:
        # collapse per path first (DV supersession / restore re-add the
        # SAME file with the SAME range; differing re-adds union), then
        # a running max-end sweep over DISTINCT files — adjacent-pair
        # checks miss a wide early range swallowing a later one
        by_path: dict = {}
        for b, e, p in ranges:
            b0, e0 = by_path.get(p, (b, e))
            by_path[p] = (min(b0, b), max(e0, e))
        ordered = sorted((b, e, p) for p, (b, e) in by_path.items())
        run_end, run_path = -1, None
        for b, e, p in ordered:
            if b <= run_end:
                _err("row tracking",
                     f"row id range [{b}, {e}] of {p!r} overlaps "
                     f"{run_path!r}'s range ending at {run_end}")
            if e > run_end:
                run_end, run_path = e, p
        if enabled:
            top = max(e for _b, e, _p in ranges)
            _require(
                hwm is not None and hwm >= top,
                commits[-1][0] if commits else "log",
                f"rowIdHighWaterMark {hwm} does not cover the highest "
                f"assigned row id {top}",
            )


def validate_log_dir(table_path: str) -> dict:
    """Validate every commit json + checkpoint parquet under
    ``<table>/_delta_log``. Returns counters (for test assertions)."""
    log = os.path.join(table_path, "_delta_log")
    out = {"commits": 0, "checkpoints": 0, "actions": 0}
    if not os.path.isdir(log):
        return out
    commits: list = []  # (name, parsed actions) for TRUE commit files
    for name in sorted(os.listdir(log)):
        full = os.path.join(log, name)
        if name.endswith(".json") and name != "_last_checkpoint" and not name.startswith("_"):
            out["commits"] += 1
            actions = _parse_and_validate_commit(full)
            out["actions"] += len(actions)
            if _COMMIT_JSON_RE.fullmatch(name):
                commits.append((name, actions))
        elif name.endswith(".parquet") and ".checkpoint" in name:
            out["checkpoints"] += 1
            out["actions"] += validate_checkpoint_file(full)
    # ONE parse feeds both chain validators (a per-test teardown scans
    # every table the suite creates — triple-parsing long logs adds up)
    _validate_ict_chain(commits)
    _validate_row_tracking(commits)
    lc = os.path.join(log, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as fh:
            doc = json.load(fh)
        _require(isinstance(doc.get("version"), int), "_last_checkpoint",
                 "version must be an int")
        _require(isinstance(doc.get("size"), int), "_last_checkpoint",
                 "size must be an int")
    return out


def find_delta_logs(root: str) -> list:
    """All table paths under ``root`` that carry a ``_delta_log``."""
    hits = []
    for dirpath, dirnames, _files in os.walk(root):
        if "_delta_log" in dirnames:
            hits.append(dirpath)
            dirnames.remove("_delta_log")
    return hits


def validate_tree(root: str) -> dict:
    """Conformance-check every Delta table under ``root`` (the conftest
    teardown hook's entry point). Raises DeltaConformanceError on the
    first violation; returns aggregate counters otherwise."""
    total = {"tables": 0, "commits": 0, "checkpoints": 0, "actions": 0}
    for table in find_delta_logs(root):
        got = validate_log_dir(table)
        total["tables"] += 1
        for k in ("commits", "checkpoints", "actions"):
            total[k] += got[k]
    return total
