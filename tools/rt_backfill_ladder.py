"""Row-tracking backfill ladder (VERDICT r11 #5): measure
``delta_enable_row_tracking`` — which re-adds EVERY live file in one
commit — at 1k / 10k / 100k-file tables.

The add list is driver-resident by protocol design (any snapshot
reconstruction holds it), so the variables under test are the
single-commit JSON build + write and the id-range assignment, both
O(files). Adds are hand-authored WITH stats (numRecords present), so
the backfill never opens a data file — exactly the metadata-only cost a
real table with stats pays.

Usage: python tools/rt_backfill_ladder.py [--files 1000,10000,100000]
Prints a markdown table + one JSON line (SCALE.md material).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dc43_spark.io.delta_log import (  # noqa: E402
    DeltaLogTable,
    delta_enable_row_tracking,
)


def _build(root: str, n_files: int) -> None:
    os.makedirs(os.path.join(root, "_delta_log"))
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "ladder", "format": {"provider": "parquet",
                                                 "options": {}},
                      "schemaString": json.dumps({"type": "struct", "fields": [
                          {"name": "k", "type": "long", "nullable": True,
                           "metadata": {}}]}),
                      "partitionColumns": [], "configuration": {}}},
    ] + [
        {"add": {"path": f"part-{i:06d}.parquet", "partitionValues": {},
                 "size": 4096, "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 1000})}}
        for i in range(n_files)
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", default="1000,10000,100000")
    args = ap.parse_args()

    rows = []
    for n in (int(s) for s in args.files.split(",")):
        root = tempfile.mkdtemp(prefix="rt_backfill_ladder_")
        try:
            _build(root, n)
            t0 = time.perf_counter()
            v = delta_enable_row_tracking(None, root)
            el = time.perf_counter() - t0
            commit = os.path.join(root, "_delta_log", f"{v:020d}.json")
            size_mb = os.path.getsize(commit) / 1e6
            # the enabled table must still reconstruct: every add carries
            # its fresh baseRowId
            t1 = time.perf_counter()
            adds, _m, _p, _x = DeltaLogTable(None, root)._collect_state(v)
            recon = time.perf_counter() - t1
            assert len(adds) == n
            assert all(a.get("baseRowId") is not None for a in adds.values())
            rows.append({"files": n, "enable_sec": round(el, 2),
                         "commit_mb": round(size_mb, 1),
                         "reconstruct_sec": round(recon, 2)})
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print("| live files | enable s | backfill commit MB | reconstruct s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['files']:,} | {r['enable_sec']} | {r['commit_mb']} "
              f"| {r['reconstruct_sec']} |")
    print(json.dumps({"metric": "rt_backfill_ladder", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
