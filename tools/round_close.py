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


def readme_drift() -> int:
    """Bookkeeping guard (VERDICT r10 ask #4): README's stated gate
    count and bench total must match the registry and the measured
    BENCH_LOCAL.json — drift here cost a verdict note in round 10."""
    import json
    import re

    import __spark_entry__ as entry

    failures = 0
    readme = open(os.path.join(ROOT, "README.md")).read()
    n_actual = len(entry.queries())
    m = re.search(r"\*\*(\d+) `queries\(\)` entries", readme)
    print("\n=== README drift check")
    if not m or int(m.group(1)) != n_actual:
        print(
            f"README gate count {m.group(1) if m else '???'} != registry {n_actual} — update README.md"
        )
        failures += 1
    else:
        print(f"gate count OK ({n_actual})")
    bench_path = os.path.join(ROOT, "BENCH_LOCAL.json")
    if os.path.exists(bench_path):
        bench = json.load(open(bench_path))
        total, n_timed = bench.get("value"), len(bench.get("queries", {}))
        if n_timed != n_actual:
            print(
                f"BENCH_LOCAL times {n_timed} queries but the registry has "
                f"{n_actual} — add the missing names to bench.py HEADLINE"
            )
            failures += 1
        else:
            print(f"bench covers all {n_timed} queries (total {total:.1f}s)")
    return failures


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
    failures += readme_drift()
    window_staleness()
    print(f"\nround_close: {'FAIL' if failures else 'OK'} ({failures} stage failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
