"""Per-trigger floor probe for the streaming replay gates (VERDICT
r13 #6): every `*_stream_replay` gate pays a fixed cost per
micro-batch — state-store open/commit × trigger × shuffle partition —
that dominates its bench time at sf0.1 (each trigger streams ~1/6 to
1/8 of a small table).  This tool runs each gate once, captures every
trigger's `StreamingQueryProgress` through a session-level
`StreamingQueryListener` (no gate code touched), and prints a
markdown table decomposing wall time into triggers × per-trigger ms,
with the state-store commit share — so "why is this gate 200× its
oracle" becomes a lookup, not an investigation.

Usage: python tools/probe_trigger_floor.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = [
    "state_stream_replay",
    "window_stream_replay",
    "dedup_stream_replay",
    "join_stream_replay",
    "session_stream_replay",
    "enrich_stream_replay",
    "topk_stream_replay",
    "argmax_stream_replay",
    "outer_join_stream_replay",
    "join_window_stream_replay",
]


def main() -> None:
    from pyspark.sql.streaming import StreamingQueryListener

    import __spark_entry__ as entry
    from csp_gateway_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-trigger-floor")
    spark.sparkContext.setLogLevel("ERROR")

    progress: list[dict] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progress.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _Capture()
    spark.streams.addListener(listener)
    qs = entry.queries()
    rows = []
    try:
        for name in GATES:
            progress.clear()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            # listener delivery is async — drain before reading
            deadline = time.time() + 10
            seen = -1
            while time.time() < deadline and len(progress) != seen:
                seen = len(progress)
                time.sleep(0.5)
            trig_ms = [
                (p.get("durationMs") or {}).get("triggerExecution", 0)
                for p in progress
            ]
            commit_ms = []
            for p in progress:
                for so in p.get("stateOperators") or []:
                    commit_ms.append(so.get("commitTimeMs", 0))
            n = len(trig_ms)
            rows.append(
                {
                    "gate": name,
                    "wall_sec": round(wall, 2),
                    "triggers": n,
                    "trigger_ms_sum": sum(trig_ms),
                    "trigger_ms_mean": round(sum(trig_ms) / n, 0) if n else 0,
                    "state_commit_ms_sum": sum(commit_ms),
                    "state_ops_per_trigger": (
                        len(progress[0].get("stateOperators") or [])
                        if progress
                        else 0
                    ),
                }
            )
            print(json.dumps(rows[-1]))
    finally:
        spark.streams.removeListener(listener)

    print("\n| gate | wall s | triggers | mean trigger ms | Σ state-commit ms | state ops |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['gate']} | {r['wall_sec']:.2f} | {r['triggers']} | "
            f"{r['trigger_ms_mean']:.0f} | {r['state_commit_ms_sum']} | "
            f"{r['state_ops_per_trigger']} |"
        )


if __name__ == "__main__":
    main()
