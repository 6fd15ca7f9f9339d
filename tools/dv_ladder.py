"""Driver-envelope ladder for the snaplog->Delta DV export path
(VERDICT r9 #5): measure `_snaplog_dv_positions` + `_emit_dv_file` —
the two driver-side steps of `sync_delta_export` that union a
snapshot's deleted positions and re-encode them as protocol deletion
vectors — at 1M / 10M (and optionally 100M) deleted positions.

No Spark session: the path under test is pure pyarrow/numpy on the
driver, so the ladder writes synthetic (file, pos) DV parquet directly
and drives the real functions through stub table/snapshot objects.

Reports wall seconds and peak RSS delta per rung, a markdown table,
and one JSON line. Threshold question answered in SCALE.md: if a rung
crosses ~1 s / ~1 GB, the sync cadence (not the code) is the knob —
the incremental diff is O(changed positions), so mirror more often or
materialize deletes first.

Usage: python tools/dv_ladder.py [--scales 1000000,10000000] [--files 64]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time
from types import SimpleNamespace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dc43_spark.io.delta_log import _emit_dv_file, _snaplog_dv_positions  # noqa: E402


def _build(root: str, n_positions: int, n_files: int) -> SimpleNamespace:
    """Synthetic snaplog DV state: ``n_positions`` deletes spread over
    ``n_files`` data files, written as the same (file, pos) parquet
    snaplog's merge-on-read deletes stage (2 DV parquet files, the
    multi-commit shape)."""
    rng = np.random.default_rng(7)
    files = np.array([f"part-{i:05d}.parquet" for i in range(n_files)])
    codes = rng.integers(0, n_files, n_positions)
    pos = rng.integers(0, 4_000_000, n_positions)
    half = n_positions // 2
    rels = []
    for i, sl in enumerate((slice(0, half), slice(half, None))):
        rel = f"dv/dv-{i}.parquet"
        os.makedirs(os.path.join(root, "dv"), exist_ok=True)
        pq.write_table(
            pa.table({
                "file": pa.array(files[codes[sl]]),
                "pos": pa.array(pos[sl], pa.int64()),
            }),
            os.path.join(root, rel),
        )
        rels.append(rel)
    table = SimpleNamespace(path=root)
    snap = SimpleNamespace(dvs=[SimpleNamespace(path=r) for r in rels])
    return SimpleNamespace(table=table, snap=snap)


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000000,10000000")
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3,
                    help="min-of-reps (this host's kernel-time storms "
                         "inflate one-shot numbers; see SCALE.md)")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    rows = []
    for n in scales:
        root = tempfile.mkdtemp(prefix="dv_ladder_")
        try:
            fx = _build(root, n, args.files)
            rss0 = _rss_mb()
            t_union = min(
                _timed(lambda: _snaplog_dv_positions(fx.table, fx.snap))[0]
                for _ in range(args.reps)
            )
            pos_by_file = _snaplog_dv_positions(fx.table, fx.snap)
            t_encode, descs = _timed(lambda: _emit_dv_file(root, pos_by_file))
            rss1 = _rss_mb()
            total_card = sum(d["cardinality"] for d in descs.values())
            rows.append({
                "positions": n,
                "files": args.files,
                "union_sec": round(t_union, 3),
                "encode_sec": round(t_encode, 3),
                "rss_delta_mb": round(max(0.0, rss1 - rss0), 1),
                "unique_positions": total_card,
            })
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print("| positions | files | union s | encode s | rss Δ MB |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['positions']:,} | {r['files']} | {r['union_sec']} "
              f"| {r['encode_sec']} | {r['rss_delta_mb']} |")
    print(json.dumps({"metric": "dv_export_ladder", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
