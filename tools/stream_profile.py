"""Profile the streaming trio's fixed overhead (r6 verdict item 6).

Runs each streaming gate at $SPARK_GRAFT_SF_DIR and prints, per query:
total wall time plus the per-batch durationMs breakdown Structured
Streaming reports (triggerExecution / queryPlanning / getBatch / addBatch
/ walCommit / commitOffsets / latestOffset) and the state-store numbers —
so "the ~3 s floor" is attributed to checkpoint FS churn vs planning vs
state commit instead of guessed.

Usage: python tools/stream_profile.py [--reps 2] [--partitions N]
With --partitions, spark.sql.shuffle.partitions is set for the streaming
runs (state-store count == shuffle partitions for stateful queries; the
default 32 means 32 state dirs + commit files per batch at sf0.1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


GATES = [
    "streaming_events_hourly",
    "streaming_dedup_events",
    "streaming_user_sessions",
]


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dc43-stream-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.partitions))

    import __spark_entry__ as entry

    queries = entry.queries()
    progress: dict[str, list] = {}

    from pyspark.sql.streaming import StreamingQueryListener

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = event.progress
            progress.setdefault(p.name or str(p.id), []).append(
                json.loads(p.json)
            )

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    spark.streams.addListener(Capture())

    out = {}
    for gate in GATES:
        walls = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            queries[gate](spark, sf_dir).count()
            walls.append(round(time.monotonic() - t0, 2))
        out[gate] = walls
        print(f"{gate}: walls={walls}")

    # attribute time per batch from the captured progress events
    for name, events in progress.items():
        durs: dict[str, int] = {}
        state_ms = 0
        rows = 0
        for ev in events:
            for k, v in (ev.get("durationMs") or {}).items():
                durs[k] = durs.get(k, 0) + int(v)
            rows += int(ev.get("numInputRows") or 0)
            for so in ev.get("stateOperators") or []:
                state_ms += int(so.get("allUpdatesTimeMs") or 0) + int(
                    so.get("commitTimeMs") or 0
                )
        print(
            f"{name}: batches={len(events)} input_rows={rows} "
            f"durationMs={json.dumps(durs)} state(update+commit)Ms={state_ms}"
        )
    print(json.dumps({"walls": out, "partitions": args.partitions or cpus}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
