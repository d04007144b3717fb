"""Time the DuckDB oracle SQL for each query at a given sf — the
comparison column for BASELINE.md (the driver-defined bar is "within 2x
of DuckDB at the same scale").

Usage: python tools/bench_oracle.py [sf_dir]
Prints one JSON line {"queries": {name: sec}, "total": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import duck_connect  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entry

    # identical noise rule to bench.py: first run > 1 s → run once
    # more, report the min (steady-state; keeps the Spark/DuckDB
    # ratio like-for-like under shared-VM scheduler spikes)
    RERUN_ABOVE_SEC = 1.0
    times = {}
    for name, sql in entry.oracle_sql().items():
        # fresh connection per query: DuckDB retains buffers across a
        # 246-query session and eventually OOMs on the tail queries;
        # view registration is milliseconds and stays outside the timer
        con = duck_connect(sf_dir)
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            took = round(time.time() - t0, 3)
            if took > RERUN_ABOVE_SEC:
                t1 = time.time()
                con.execute(sql).fetchall()
                took = min(took, round(time.time() - t1, 3))
            times[name] = took
        except Exception as e:  # noqa: BLE001
            print(f"oracle error {name}: {e}", file=sys.stderr)
            times[name] = -1.0
        finally:
            con.close()
    print(json.dumps({"queries": times, "total": round(sum(t for t in times.values() if t > 0), 3)}))


if __name__ == "__main__":
    main()
