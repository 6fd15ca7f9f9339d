"""Per-query core-count scaling ratios from two bench result files.

Usage: python tools/scaling_capture.py <bench_32.json> <bench_8.json>

Each input is a bench.py stdout capture (full per-query line FIRST).
Prints one JSON object {query: low_cpu_sec / main_cpu_sec, ...} plus the
total ratio — ratio > 1 means the query slowed down with fewer cores
(compute-bound), ~<= 1 means it is overhead-bound at this SF. Commit the
output next to the bench artifacts so compute-bound vs overhead-bound is
a measured label per query (VERDICT r14 #7)."""

from __future__ import annotations

import json
import sys


def _first_line(path: str) -> dict:
    with open(path) as fh:
        return json.loads(fh.readline())


def main() -> int:
    main_run = _first_line(sys.argv[1])
    low_run = _first_line(sys.argv[2])
    qm, ql = main_run["queries"], low_run["queries"]
    ratios = {
        k: round(ql[k] / qm[k], 2)
        for k in sorted(set(qm) & set(ql))
        if qm[k] > 0
    }
    out = {
        "total_main_sec": main_run["value"],
        "total_low_sec": low_run["value"],
        "total_ratio": round(low_run["value"] / main_run["value"], 3),
        "per_query_low_over_main": ratios,
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
