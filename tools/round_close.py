"""Round-close verification sweep — ONE command for the end-of-round
checklist (VERDICT r9 #3):

1. `tools/audit_scalar.py`      — every gate query is scalar-only
                                  (plan build, no execution);
2. full `tools/check.py`        — ALL `queries()` entries vs their
                                  DuckDB oracles at sf0.01 (the
                                  replica of the driver gate, not just
                                  its 50-entry window);
3. `tools/audit_plans.py --write` — regenerate PLANS.md from the
                                  current plans;
4. window-staleness report      — which first-50 window entries have
                                  been driver-checked every recorded
                                  round (rotation candidates) and
                                  which registry entries have never /
                                  longest been out of the window, so
                                  the per-round 2-3 slot rotation is a
                                  scripted decision, not archaeology.

Usage: python tools/round_close.py [sf_dir] [--skip-plans] [--skip-check]
Exit code != 0 if any executed stage fails.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run(cmd: list) -> int:
    print(f"\n=== {' '.join(cmd)}", flush=True)
    return subprocess.call(cmd, cwd=ROOT)


def window_staleness() -> None:
    import __spark_entry__ as entry

    names = list(entry.queries())
    window = names[:50]
    history = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
            history.append((os.path.basename(path), set(data)))
        except Exception:
            continue
    print("\n=== window staleness")
    if not history:
        print("no CORRECTNESS_r*.json history found")
        return
    rounds_in = {
        n: sum(1 for _, keys in history if n in keys) for n in names
    }
    always_in = [n for n in window if rounds_in[n] == len(history)]
    print(
        f"window entries driver-checked in ALL {len(history)} recorded "
        f"rounds (eviction candidates): {always_in[:12]}"
        + (" ..." if len(always_in) > 12 else "")
    )
    evicted = sorted(
        (n for n in names if n not in set(window)),
        key=lambda n: rounds_in[n],
    )
    stale = [f"{n}({rounds_in[n]})" for n in evicted[:12]]
    print(f"longest-out-of-window entries (rotation-in candidates): {stale}")


def main() -> int:
    sf_dir = next(
        (a for a in sys.argv[1:] if os.path.isdir(a)), "/root/testdata/sf0.01"
    )
    failures = 0
    if run([sys.executable, "tools/audit_scalar.py"]) != 0:
        failures += 1
    if "--skip-check" not in sys.argv:
        if run([sys.executable, "tools/check.py", sf_dir]) != 0:
            failures += 1
    if "--skip-plans" not in sys.argv:
        if run([sys.executable, "tools/audit_plans.py", sf_dir, "--write"]) != 0:
            failures += 1
    window_staleness()
    print(f"\nround_close: {'FAIL' if failures else 'OK'} ({failures} stage failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
